package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.{ArtifactManifest, Dedup, Similarity}
import graft.streaming.{AnnIndexRefresh, ArtifactRefresh}

/** Scale probe for the r14 streaming artifact-refresh paths: at a replica
  * scale (sf1/sf10), fold the delta into the persisted LSH signature
  * artifact and the persisted IVF-PQ index as a MICRO-BATCH STREAM, and
  * compare against the one-shot batch delta/append path on an identical
  * base build. Reports
  *   - output parity (pair counts / index row counts must be equal — the
  *     split-invariance the specs pin, re-proven at scale),
  *   - wall decomposition: the stream pays the SAME delta-sized work plus
  *     nBatches × (manifest recompute over base ∪ consumed) — the honest
  *     gate-scale provenance cost, measured separately so the reading can
  *     say what a snapshot-manifest deployment would keep.
  *
  * Usage: runMain graft.tools.StreamRefreshProbe [sfDir] [nBatches]
  */
object StreamRefreshProbe {
  private def timed[T](f: => T): (T, Double) = {
    val t0 = System.nanoTime()
    val r = f
    (r, (System.nanoTime() - t0) / 1e9)
  }

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/tmp/graft_sf1")
    val nBatches = if (args.length > 1) args(1).toInt else 4
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.ansi.enabled", "false")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def tmp(tag: String) = graft.QueryShared.deleteAtExit(
      java.nio.file.Files.createTempDirectory(tag).toString)
    def r3(x: Double) = math.round(x * 1000) / 1000.0

    // ---------------- LSH signature artifact ------------------------------
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val dBase = docs.filter(col("doc_id") % 4 =!= 0)
    val dDelta = docs.filter(col("doc_id") % 4 === 0)
    val dCols = Seq(col("doc_id"), col("text"))

    // one-shot batch reference on its own base build
    val lshRef = tmp("srp_lsh_ref")
    val (_, lshBuildSec) =
      timed(Dedup.writeSignatureArtifact(dBase, "doc_id", "text", lshRef))
    val (batchPairs, lshBatchSec) = timed {
      val p = Dedup.minhashLshPairsDelta(dDelta, "doc_id", "text", lshRef)
      val n = p.count()
      Dedup.appendToSignatureArtifact(dDelta, "doc_id", "text", lshRef)
      n
    }
    // manifest recompute+check alone at this corpus size (the per-batch tax)
    ArtifactManifest.write(lshRef, docs.select(dCols: _*), dCols)
    val (_, lshManifestSec) =
      timed(ArtifactManifest.check(lshRef, docs.select(dCols: _*), dCols))

    // streamed refresh on an identical base build
    val lshArt = tmp("srp_lsh_art")
    Dedup.writeSignatureArtifact(dBase, "doc_id", "text", lshArt)
    ArtifactManifest.write(lshArt, dBase.select(dCols: _*), dCols)
    val dDeltaDir = tmp("srp_lsh_delta")
    dDelta.repartitionByRange(nBatches, col("doc_id"))
      .write.mode("overwrite").parquet(dDeltaDir)
    val pairsDir = tmp("srp_lsh_pairs")
    val (lshBatches, lshStreamSec) = timed(
      ArtifactRefresh.refreshFromStream(spark, dDeltaDir, dBase,
        "doc_id", "text", lshArt, pairsDir, tmp("srp_lsh_ck")))
    val streamPairs = spark.read.parquet(pairsDir).count()
    require(streamPairs == batchPairs,
      s"stream/batch pair divergence: $streamPairs vs $batchPairs")

    // ---------------- IVF-PQ index ----------------------------------------
    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
    val eBase = emb.filter(col("vec_id") % 4 =!= 0)
    val eDelta = emb.filter(col("vec_id") % 4 === 0)
    val eCols = Seq(col("vec_id"), col("embedding"))

    val annRef = tmp("srp_ann_ref")
    val (_, annBuildSec) = timed(Similarity.writeIvfPqIndex(eBase, annRef))
    val (_, annBatchSec) = timed(Similarity.appendToIvfPqIndex(eDelta, annRef))
    ArtifactManifest.write(annRef, emb.select(eCols: _*), eCols)
    val (_, annManifestSec) =
      timed(ArtifactManifest.check(annRef, emb.select(eCols: _*), eCols))

    val annIdx = tmp("srp_ann_idx")
    Similarity.writeIvfPqIndex(eBase, annIdx)
    ArtifactManifest.write(annIdx, eBase.select(eCols: _*), eCols)
    val eDeltaDir = tmp("srp_ann_delta")
    eDelta.repartitionByRange(nBatches, col("vec_id"))
      .write.mode("overwrite").parquet(eDeltaDir)
    val (annBatches, annStreamSec) = timed(
      AnnIndexRefresh.refreshFromStream(spark, eDeltaDir, eBase, annIdx,
        tmp("srp_ann_ck")))
    for (t <- Seq("cells", "codes")) {
      val a = spark.read.parquet(s"$annRef/$t.parquet").count()
      val b = spark.read.parquet(s"$annIdx/$t.parquet").count()
      require(a == b, s"stream/batch $t divergence: $b vs $a")
    }

    println(
      s"""{"metric":"stream_refresh","sf":"$sfDir","n_batches":$nBatches,""" +
      s""""lsh":{"build_sec":${r3(lshBuildSec)},"batch_delta_sec":${r3(lshBatchSec)},""" +
      s""""stream_total_sec":${r3(lshStreamSec)},"stream_batches":$lshBatches,""" +
      s""""manifest_check_sec":${r3(lshManifestSec)},"pairs":$batchPairs},""" +
      s""""ann":{"build_sec":${r3(annBuildSec)},"batch_append_sec":${r3(annBatchSec)},""" +
      s""""stream_total_sec":${r3(annStreamSec)},"stream_batches":$annBatches,""" +
      s""""manifest_check_sec":${r3(annManifestSec)}}}""")
    spark.stop()
  }
}
