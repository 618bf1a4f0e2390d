package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch stage-by-stage profiler for the minhash pipeline (dev-only). */
object MiniProf {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.ansi.enabled", "false")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import graft.operators.Dedup._
    def t[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[prof] $name: ${(System.nanoTime() - t0) / 1e9}%.2fs"); r
    }
    spark.range(1000000).selectExpr("sum(id)").collect() // warm
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    t("read+count")(docs.count())
    val prepared = withShingles(docs, "doc_id", "text")
    t("prepared")(prepared.count())
    t("prepared2")(prepared.count())
    val ex = prepared.select(col("doc_id"), explode(col("sh")).as("s"))
    t("explode")(ex.count())
    t("explode+md5")(ex.withColumn("m", md5(col("s"))).agg(count(col("m"))).collect())
    t("explode+xxh")(ex.withColumn("m", xxhash64(col("s"))).agg(count(col("m"))).collect())
    val hashed = ex
      .withColumn("m", md5(col("s")))
      .select(col("doc_id"),
        conv(substring(col("m"), 1, 15), 16, 10).cast("long").as("h1"),
        (conv(substring(col("m"), 16, 15), 16, 10).cast("long") % 1000000007L).as("h2"))
    t("hashed")(hashed.count())
    t("h1only")(ex.withColumn("m", md5(col("s")))
      .select(conv(substring(col("m"), 1, 15), 16, 10).cast("long").as("h1"))
      .agg(count(col("h1"))).collect())
    val sig = hashed.groupBy(col("doc_id"))
      .agg(min(col("h1") + lit(0L) * col("h2")).as("mh0"),
        (1 until 32).map(j => min(col("h1") + lit(j.toLong) * col("h2")).as(s"mh$j")): _*)
    t("sig")(sig.count())
    t("sig2")(sig.count())
    val banded = sig.select(col("doc_id"), posexplode(array((0 until 8).map { b =>
        hash60(concat_ws(",", (0 until 4).map(r => col(s"mh${b * 4 + r}")): _*))
      }: _*)))
    t("banded")(banded.count())
    // pair-phase decomposition mirroring minhashLshPairs' internals
    val preparedC = prepared.cache()
    t("cache:prepared")(preparedC.count())
    val bandedC = banded.cache()
    t("cache:banded")(bandedC.count())
    val l = bandedC.select(col("doc_id").as("doc_id_a"), col("pos").as("band"), col("col").as("band_hash"))
    val r = bandedC.select(col("doc_id").as("doc_id_b"), col("pos").as("band"), col("col").as("band_hash"))
    val candidates = l.join(r, Seq("band", "band_hash"))
      .filter(col("doc_id_a") < col("doc_id_b"))
      .select("doc_id_a", "doc_id_b").distinct().cache()
    t("candidates")(candidates.count())
    // mirrors minhashLshPairs' verification INCLUDING its shuffle_hash
    // hints — an unhinted copy would profile the pre-fix SMJ plan and
    // misattribute a cliff the production code no longer has
    val verified = candidates.hint("shuffle_hash")
      .join(preparedC.select(col("doc_id").as("doc_id_a"), col("sh").as("sh_a")), Seq("doc_id_a"))
      .hint("shuffle_hash")
      .join(preparedC.select(col("doc_id").as("doc_id_b"), col("sh").as("sh_b")), Seq("doc_id_b"))
      .withColumn("jaccard", graft.functions.VectorExpressions.sortedJaccard(col("sh_a"), col("sh_b")))
      .filter(col("jaccard") >= 0.6)
    t("verify")(verified.count())
    preparedC.unpersist(); bandedC.unpersist(); candidates.unpersist()
    t("full")(minhashLshPairs(docs, "doc_id", "text").count())
    spark.stop()
  }
}
