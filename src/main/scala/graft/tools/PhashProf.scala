package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev probe: dHash dispersion + band-bucket profile of the synthetic image
  * corpus — quantifies the q_multimodal_phash_near blocking asymptote. */
object PhashProf {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.ansi.enabled", "false")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val withImgs = graft.operators.Multimodal.withSyntheticImages(spark, docs, "doc_id")
    val hashed = graft.operators.Multimodal.phashMeta(spark, withImgs, "doc_id")
      .filter(col("phash_hi").isNotNull).cache()
    val n = hashed.count()
    val nd = hashed.select(col("phash_hi"), col("phash_lo")).distinct().count()
    val buckets = hashed.select(posexplode(array(
        col("phash_lo").bitwiseAND(lit(0xFFFFL)),
        shiftright(col("phash_lo"), 16).bitwiseAND(lit(0xFFFFL)),
        col("phash_hi").bitwiseAND(lit(0xFFFFL)),
        shiftright(col("phash_hi"), 16).bitwiseAND(lit(0xFFFFL)))))
      .groupBy(col("pos"), col("col")).agg(count(lit(1)).as("c"))
    val stats = buckets.agg(count(lit(1)), max(col("c")),
      sum(col("c") * col("c"))).collect()(0)
    println(s"[phash-prof] docs=$n distinct_hashes=$nd n_buckets=${stats.getLong(0)} " +
      s"max_bucket=${stats.getLong(1)} candidate_pairs=${stats.getLong(2)}")
    spark.stop()
  }
}
