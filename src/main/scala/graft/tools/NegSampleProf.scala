package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Stage-by-stage decomposition of q_negative_sampling's eager build
  * (r8 verdict #3: 4.3→5.2 s drift across rounds; telemetry shows ~90 CPU-s
  * for ~7 s wall at sf0.1 — find which stage owns it). Mirrors
  * Sampling.negativeSample's internals with a count() barrier per stage.
  */
object NegSampleProf {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.ansi.enabled", "false")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import graft.operators.{Dedup, Surrogate}

    def t[A](label: String)(body: => A): A = {
      val t0 = System.nanoTime()
      val r = body
      println(f"[negprof] $label%-28s ${(System.nanoTime() - t0) / 1e9}%.2fs")
      r
    }

    val pos = spark.read.parquet(s"$sfDir/orders.parquet")
      .join(spark.read.parquet(s"$sfDir/lineitem.parquet"),
        col("o_orderkey") === col("l_orderkey"))
    t("warm: pos join count")(pos.count())
    val p = pos.select(col("o_custkey").cast("long").as("user"),
      col("l_partkey").cast("long").as("item")).distinct().cache()
    t("p distinct+cache")(p.count())
    val distinctItems = p.select(col("item")).distinct().cache()
    t("distinct items+cache")(distinctItems.count())
    val items = Surrogate.zipWithIndexOrdered(
      distinctItems, "idx", Seq(col("item"))).cache()
    t("items zipWithIndex+cache")(items.count())
    val n = items.agg(count(lit(1)).as("n_items"))
    val cand = p
      .select(col("user"), col("item"), explode(sequence(lit(0), lit(1))).as("j"))
      .crossJoin(broadcast(n))
      .withColumn("idx",
        Dedup.hash60(concat_ws("#", col("user"), col("item"), col("j")))
          % col("n_items") + 1L)
      .select(col("user"), col("item").as("pos_item"),
        col("j").cast("long").as("j"), col("idx"))
    t("cand explode+hash")(cand.count())
    val joined = cand.join(items.select(col("idx"), col("item").as("neg_item")), Seq("idx"))
    t("cand join items")(joined.count())
    val full = joined
      .join(p.select(col("user"), col("item").as("neg_item"),
        lit(true).as("__hit")), Seq("user", "neg_item"), "left")
      .filter(col("__hit").isNull)
    t("anti filter")(full.count())
    t("full rebuild (no stage reuse)") {
      graft.operators.Sampling.negativeSample(
        pos, col("o_custkey"), col("l_partkey"), k = 2).count()
    }
    spark.stop()
  }
}
