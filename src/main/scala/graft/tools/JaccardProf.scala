package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev profiler for the jaccard near-dup pipeline: times each phase of
  * [[graft.operators.Dedup.jaccardPairs]] separately so regressions can be
  * attributed (dictionary build vs encode vs pair join) instead of guessed.
  * Not part of the driver contract; run with
  * `sbt "runMain graft.tools.JaccardProf"`.
  */
object JaccardProf {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.ansi.enabled", "false")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // warm
    spark.range(0, 2000000).selectExpr("sum(id * 2)").collect()

    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"PHASE $label%-28s ${(System.nanoTime() - t0) / 1e9}%.3f s")
      r
    }

    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    time("read+count")(docs.count())

    val base = docs.select(col("doc_id"), col("lang").as("block"),
      array_distinct(split(col("text"), " ")).as("ws0"))
    val tok = base.select(col("doc_id"), explode(col("ws0")).as("s"))
    val vocabN = time("vocab probe (limit 65)")(
      tok.select(col("s")).distinct().limit(65).collect().length)
    println(s"vocab = $vocabN")

    val full = time("jaccardPairs build (eager probe)")(graft.operators.Dedup.jaccardPairs(
      docs, "doc_id", "text", "lang", 0.6))
    time("pairs.count run1")(full.count())
    val full2 = graft.operators.Dedup.jaccardPairs(docs, "doc_id", "text", "lang", 0.6)
    time("pairs.count run2 (warm)")(full2.count())
    spark.stop()
  }
}
