package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scale probe for the SELF-TUNING LSH verify-join strategy (r12 follow-up
  * to SCALE_PROBE_r12_pipeline_sf100: the SHUFFLE_HASH default hard-failed
  * the 1 GB unspillable acquire on the regenerated sf100 replica while
  * `merge` completed — the recorded fix was "derive the hint from the
  * cached band table BEFORE the join", which Dedup.verifyHintFor now does).
  *
  * This probe regenerates the documents-only replica at `copies`× sf0.1
  * using EXACTLY ScaleGen's decorrelation scheme (shifted doc_id + per-copy
  * `⦙c` word suffix, copy 0 byte-identical — the corpus of the failing
  * probe), then runs the full q_dedup_clusters path (minhashLshPairs →
  * connectedComponents) with the DEFAULT conf, i.e. hint = auto, and
  * reports which strategy the tuner chose, its decision inputs
  * (estPairs / avgShingles), wall, pair count and cluster count — so the
  * sf100 run is pass/fail evidence that auto completes WITHOUT the manual
  * conf where the static default died.
  *
  * With `incr` as the 4th arg it instead runs the INCREMENTAL operator
  * with copy 0 (5k docs) as the nightly delta against the full replica
  * base — the delta-aware pair bound (Σ d·(c−1)) must keep the verify
  * join on SHUFFLE_HASH even over a corpus whose full bound says merge:
  * that asymmetry is the point of tracking `__delta` in the estimator.
  *
  * Usage: runMain graft.tools.VerifyHintProbe [copies] [srcDir] [outDir] [full|incr]
  */
object VerifyHintProbe {
  def main(args: Array[String]): Unit = {
    val copies = args.headOption.map(_.toInt).getOrElse(10)
    val src = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val out = if (args.length > 2) args(2) else s"/tmp/graft_vh_$copies"
    val mode = if (args.length > 3) args(3) else "full"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_SHUFFLE_PARTITIONS", "32"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.ansi.enabled", "false")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val docsPath = s"$out/documents.parquet"
    if (!new java.io.File(docsPath).exists()) {
      val base = spark.read.parquet(s"$src/documents.parquet")
      val idType = base.schema("doc_id").dataType
      val c = spark.range(copies).select(col("id").as("__c"))
      val rep = base.repartition(cpus.toInt).crossJoin(c)
        .withColumn("doc_id",
          (col("doc_id") + col("__c") * ScaleGen.Offset).cast(idType))
        .withColumn("text",
          when(col("__c") === 0, col("text")).otherwise(expr(
            "concat_ws(' ', transform(split(text, ' '), w -> concat(w, '⦙', cast(__c AS STRING))))")))
        .select(base.columns.head, base.columns.tail: _*)
      rep.repartition(32).write.mode("overwrite").parquet(docsPath)
    }

    val docs = spark.read.parquet(docsPath)
    val nDocs = docs.count()
    val budgetMb = graft.operators.Dedup.shjBuildBudget(spark) >> 20

    if (mode == "artifact") {
      // the persisted-signature nightly shape: copies 1..N-1 are the base
      // (signatures built ONCE, timed separately), copy 0 is the delta.
      // Headline = the delta run's wall vs `incr` mode's, which re-hashes
      // the whole base every night.
      val artDir = s"$out/signatures"
      val base = docs.filter(col("doc_id") >= ScaleGen.Offset)
      val t0 = System.nanoTime()
      val built = if (!new java.io.File(s"$artDir/bands.parquet").exists()) {
        graft.operators.Dedup.writeSignatureArtifact(base, "doc_id", "text", artDir)
        true
      } else false
      val tBuild = (System.nanoTime() - t0) / 1e9
      val t1 = System.nanoTime()
      val pairs = graft.operators.Dedup.minhashLshPairsDelta(
        docs.filter(col("doc_id") < ScaleGen.Offset), "doc_id", "text", artDir)
      val nPairs = pairs.count()
      val tDelta = (System.nanoTime() - t1) / 1e9
      val d = graft.operators.Dedup.lastAutoVerify
      pairs.unpersist()
      println(s"""{"probe":"verify_hint_artifact","copies":$copies,"docs":$nDocs,""" +
        s""""budget_mb":$budgetMb,"built_now":$built,""" +
        s""""wall_build_s":${math.round(tBuild * 10) / 10.0},""" +
        s""""hint":"${d.map(_._1).getOrElse("?")}",""" +
        s""""est_pairs":${d.map(_._2).getOrElse(-1.0)},""" +
        s""""n_pairs":$nPairs,"wall_delta_s":${math.round(tDelta * 10) / 10.0}}""")
      spark.stop()
      return
    }

    if (mode == "incr") {
      // nightly-delta shape: copy 0 is the delta, everything else the base
      val t0 = System.nanoTime()
      val pairs = graft.operators.Dedup.minhashLshPairsIncremental(
        docs, "doc_id", "text", col("doc_id") < ScaleGen.Offset)
      val nPairs = pairs.count()
      val wall = (System.nanoTime() - t0) / 1e9
      val d = graft.operators.Dedup.lastAutoVerify
      pairs.unpersist()
      println(s"""{"probe":"verify_hint_incr","copies":$copies,"docs":$nDocs,""" +
        s""""budget_mb":$budgetMb,""" +
        s""""hint":"${d.map(_._1).getOrElse("?")}",""" +
        s""""est_pairs":${d.map(_._2).getOrElse(-1.0)},""" +
        s""""avg_shingles":${d.map(_._3).getOrElse(-1.0)},""" +
        s""""n_pairs":$nPairs,"wall_s":${math.round(wall * 10) / 10.0}}""")
      spark.stop()
      return
    }

    val t0 = System.nanoTime()
    val pairs = graft.operators.Dedup.minhashLshPairs(docs, "doc_id", "text")
    val nPairs = pairs.count()
    val tPairs = (System.nanoTime() - t0) / 1e9
    val decision = graft.operators.Dedup.lastAutoVerify

    val t1 = System.nanoTime()
    val cc = graft.operators.Dedup.connectedComponents(
      docs.select(col("doc_id")), "doc_id", pairs, "doc_id_a", "doc_id_b")
    val (ccRows, nClusters) = {
      val r = cc.agg(count(lit(1)), countDistinct(col("cluster_id"))).head()
      (r.getLong(0), r.getLong(1))
    }
    val tCc = (System.nanoTime() - t1) / 1e9
    pairs.unpersist()

    println(s"""{"probe":"verify_hint","copies":$copies,"docs":$nDocs,""" +
      s""""budget_mb":$budgetMb,""" +
      s""""hint":"${decision.map(_._1).getOrElse("?")}",""" +
      s""""est_pairs":${decision.map(_._2).getOrElse(-1.0)},""" +
      s""""avg_shingles":${decision.map(_._3).getOrElse(-1.0)},""" +
      s""""n_pairs":$nPairs,"wall_pairs_s":${math.round(tPairs * 10) / 10.0},""" +
      s""""cc_rows":$ccRows,"n_clusters":$nClusters,""" +
      s""""wall_cc_s":${math.round(tCc * 10) / 10.0}}""")
    spark.stop()
  }
}
