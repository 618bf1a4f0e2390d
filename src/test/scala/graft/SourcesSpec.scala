package graft

import java.nio.file.Files
import org.apache.spark.sql.types._
import org.apache.spark.sql.functions._

/** Source-format coverage: the engine's tables round-trip through CSV and
  * JSON (schema-explicit reads — at 100 TB schema inference is a full extra
  * pass and is never used).
  */
class SourcesSpec extends SparkSpec {

  private val schema = StructType(Seq(
    StructField("id", LongType),
    StructField("name", StringType),
    StructField("price", DoubleType),
    StructField("when", DateType)))

  private def sample = {
    import spark.implicits._
    Seq((1L, "alpha, with comma", 10.5, "2024-01-15"),
      (2L, "béta \"quoted\"", -2.0, "2024-02-01"),
      (3L, null.asInstanceOf[String], 0.0, "2024-03-31"))
      .toDF("id", "name", "price", "when")
      .withColumn("when", to_date(col("when")))
  }

  test("CSV sink/source round-trip with quoting, nulls and dates") {
    val dir = Files.createTempDirectory("csv_rt").toString + "/t"
    sample.write.option("header", "true").csv(dir)
    val back = spark.read.schema(schema).option("header", "true").csv(dir)
      .orderBy("id").collect()
    val orig = sample.orderBy("id").collect()
    assert(back.length === orig.length)
    back.zip(orig).foreach { case (b, o) => assert(b === o) }
  }

  test("JSON sink/source round-trip") {
    val dir = Files.createTempDirectory("json_rt").toString + "/t"
    sample.write.json(dir)
    val back = spark.read.schema(schema).json(dir).orderBy("id").collect()
    val orig = sample.orderBy("id").collect()
    assert(back.length === orig.length)
    back.zip(orig).foreach { case (b, o) => assert(b === o) }
  }
}
