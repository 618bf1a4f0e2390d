package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev probe: reliable-checkpoint IO cost of the iterative loops beyond
  * pagerank (VERDICT r11 #5 — spread the quantized-LONG checkpoint trick
  * and MEASURE it). Runs a named loop in reliable-checkpoint mode at a
  * scaled dir, twice, and emits wall + an order-free score checksum so a
  * before/after A/B proves both the time delta and bit-identical results.
  *
  * Loops:
  *  - `hits`:  Graph.hits(maxIter=2) on the directed customer→order graph
  *             (the q_hits edges) — 8 node-sized state materializations per
  *             run, the candidate for quantized normalized-score
  *             checkpoints.
  *  - `labelprop`: Graph.labelProp(maxIter=4) on the co-purchase pairs —
  *             state is (node, label LONG): already integer-packed parquet,
  *             the recorded NEGATIVE result (nothing to quantize).
  *  - `kmeans`: Similarity.kmeansRun(maxIter=3) — state is k centroid
  *             rows (corpus/40), vocabulary-not-corpus sized: checkpoint
  *             IO is noise by construction, the second negative result.
  *
  * Usage: runMain graft.tools.IterIoProbe <sfDir> <hits|labelprop|kmeans> [reps]
  */
object IterIoProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val mode = if (args.length > 1) args(1) else "hits"
    val reps = if (args.length > 2) args(2).toInt else 2
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_SHUFFLE_PARTITIONS", cpus))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.ansi.enabled", "false")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val walls = (1 to reps).map { rep =>
      val ck = java.nio.file.Files.createTempDirectory("iter_io_ck").toString
      val t0 = System.nanoTime()
      val checksum: Long = mode match {
        case "hits" =>
          val o = spark.read.parquet(s"$sfDir/orders.parquet")
          val edges = o.select(col("o_custkey").cast("long").as("src"),
            (col("o_orderkey").cast("long") + lit(1L << 40)).as("dst"))
          graft.operators.Graph.hits(edges, maxIter = 2, checkpointDir = Some(ck))
            .agg(sum(xxhash64(col("node"), col("kind"),
              floor(col("score") * 1e10 + 0.5).cast("long"))))
            .collect()(0).getLong(0)
        case "labelprop" =>
          val w = spark.read.parquet(s"$sfDir/lineitem.parquet")
          val pairs = graft.operators.Basket.copurchasePairs(
            w.select(col("l_orderkey"), col("l_partkey")))
          val nodes = pairs.select(col("pk_a").as("node"))
            .union(pairs.select(col("pk_b").as("node"))).distinct()
          graft.operators.Graph.labelProp(pairs, "pk_a", "pk_b",
              nodes.withColumn("label", col("node") % 10), maxIter = 4,
              checkpointDir = Some(ck))
            .agg(sum(xxhash64(col("node"), col("label")))).collect()(0).getLong(0)
        case "kmeans" =>
          val (cents, _) = graft.operators.Similarity.kmeansRun(
            spark.read.parquet(s"$sfDir/embeddings.parquet"), maxIter = 3,
            checkpointDir = Some(ck))
          cents.select(col("cell"), posexplode(col("emb_cent")))
            .agg(sum(xxhash64(col("cell"), col("pos"),
              floor(col("col") * 1e6 + 0.5).cast("long"))))
            .collect()(0).getLong(0)
        case other => sys.error(s"unknown mode '$other' (hits|labelprop|kmeans)")
      }
      val wall = (System.nanoTime() - t0) / 1e9
      println(f"[iter-io] $mode rep$rep wall=$wall%.1fs checksum=$checksum")
      wall
    }
    println(s"""{"metric":"iter_io","mode":"$mode","sf_dir":"$sfDir",""" +
      s""""walls_sec":[${walls.map(w => f"$w%.1f").mkString(",")}]}""")
    spark.stop()
  }
}
