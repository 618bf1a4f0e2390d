package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.{ArtifactManifest, Dedup, Similarity}
import graft.streaming.{AnnIndexRefresh, ArtifactRefresh}

/** Scale probe for the streaming artifact-refresh paths: at a replica
  * scale (sf1/sf10/sf100), fold the delta into the persisted LSH signature
  * artifact and the persisted IVF-PQ index as a MICRO-BATCH STREAM, and
  * compare against the one-shot batch delta/append path on an identical
  * base build. Reports
  *   - output parity (pair counts / index row counts must be equal — the
  *     split-invariance the specs pin, re-proven at scale),
  *   - the per-batch provenance cost both ways (r15): `manifest_check_sec`
  *     is the full corpus rescan (what the r14 loop paid per micro-batch),
  *     `manifest_add_sec` is the O(batch) additive fold the loop pays now —
  *     the reading that must stay FLAT as the base grows across decades.
  *
  * r16 additions: an optional shuffle-partition override for the refresh
  * loops (arg 3 — re-proves output parity at a non-default value, VERDICT
  * r15 #2) and a post-stream [[graft.streaming.FoldCompaction]] pass over
  * the LSH artifact (merge replay-dead keyed files, prune markers) that
  * must leave pair count, band count and the provenance manifest intact.
  *
  * Usage: runMain graft.tools.StreamRefreshProbe [sfDir] [nBatches] [shufflePartitions]
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
    val shufflePartitions = if (args.length > 2) Some(args(2).toInt) else None
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
    // per-batch provenance both ways at this corpus size: the full rescan
    // (r14's per-batch tax, grows with the base) vs the additive fold
    // (r15's, O(batch) — a 4096-row probe batch against the big manifest)
    ArtifactManifest.write(lshRef, docs.select(dCols: _*), dCols)
    val (_, lshManifestSec) =
      timed(ArtifactManifest.check(lshRef, docs.select(dCols: _*), dCols))
    val probeBatchDocs = docs.select(dCols: _*).limit(4096).cache()
    probeBatchDocs.count()
    val (_, lshAddSec) =
      timed(ArtifactManifest.add(lshRef, probeBatchDocs, dCols, 999999L))
    probeBatchDocs.unpersist()

    // streamed refresh on an identical base build
    val lshArt = tmp("srp_lsh_art")
    Dedup.writeSignatureArtifact(dBase, "doc_id", "text", lshArt)
    ArtifactManifest.write(lshArt, dBase.select(dCols: _*), dCols)
    val dDeltaDir = tmp("srp_lsh_delta")
    dDelta.repartitionByRange(nBatches, col("doc_id"))
      .write.mode("overwrite").parquet(dDeltaDir)
    val pairsDir = tmp("srp_lsh_pairs")
    val lshCk = tmp("srp_lsh_ck")
    val (lshBatches, lshStreamSec) = timed(
      ArtifactRefresh.refreshFromStream(spark, dDeltaDir,
        "doc_id", "text", lshArt, pairsDir, lshCk, shufflePartitions))
    val streamPairs = spark.read.parquet(pairsDir).count()
    require(streamPairs == batchPairs,
      s"stream/batch pair divergence: $streamPairs vs $batchPairs")
    // post-stream provenance: the folded manifest must equal the rescan
    ArtifactManifest.check(lshArt, docs.select(dCols: _*), dCols)

    // nightly maintenance at scale (r16): merge the stream's replay-dead
    // keyed files, prune dead markers — pair count, band count and the
    // provenance manifest must all be unchanged by the layout rewrite
    val bandsBefore = spark.read.parquet(s"$lshArt/bands.parquet").count()
    val fileCount = { (d: String) =>
      val p = new org.apache.hadoop.fs.Path(d)
      val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
      fs.listStatus(p).count { st =>
        val n = st.getPath.getName
        st.isFile && !n.startsWith("_") && !n.startsWith(".")
      }
    }
    val pairFilesBefore = fileCount(pairsDir)
    val (_, compactSec) = timed(
      graft.streaming.FoldCompaction.compactArtifact(spark, lshArt,
        Seq(s"$lshArt/shingles.parquet", s"$lshArt/bands.parquet", pairsDir),
        lshCk, targetFileBytes = 256L << 20))
    val pairFilesAfter = fileCount(pairsDir)
    require(spark.read.parquet(pairsDir).count() == batchPairs,
      "compaction changed the pair count")
    require(spark.read.parquet(s"$lshArt/bands.parquet").count() == bandsBefore,
      "compaction changed the band count")
    ArtifactManifest.check(lshArt, docs.select(dCols: _*), dCols)

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
    val probeBatchVecs = emb.select(eCols: _*).limit(4096).cache()
    probeBatchVecs.count()
    val (_, annAddSec) =
      timed(ArtifactManifest.add(annRef, probeBatchVecs, eCols, 999999L))
    probeBatchVecs.unpersist()

    val annIdx = tmp("srp_ann_idx")
    Similarity.writeIvfPqIndex(eBase, annIdx)
    ArtifactManifest.write(annIdx, eBase.select(eCols: _*), eCols)
    val eDeltaDir = tmp("srp_ann_delta")
    eDelta.repartitionByRange(nBatches, col("vec_id"))
      .write.mode("overwrite").parquet(eDeltaDir)
    val (annBatches, annStreamSec) = timed(
      AnnIndexRefresh.refreshFromStream(spark, eDeltaDir, annIdx,
        tmp("srp_ann_ck"), shufflePartitions = shufflePartitions))
    for (t <- Seq("cells", "codes")) {
      val a = spark.read.parquet(s"$annRef/$t.parquet").count()
      val b = spark.read.parquet(s"$annIdx/$t.parquet").count()
      require(a == b, s"stream/batch $t divergence: $b vs $a")
    }
    ArtifactManifest.check(annIdx, emb.select(eCols: _*), eCols)

    println(
      s"""{"metric":"stream_refresh","sf":"$sfDir","n_batches":$nBatches,""" +
      s""""shuffle_partitions":${shufflePartitions.getOrElse(8)},""" +
      s""""lsh":{"build_sec":${r3(lshBuildSec)},"batch_delta_sec":${r3(lshBatchSec)},""" +
      s""""stream_total_sec":${r3(lshStreamSec)},"stream_batches":$lshBatches,""" +
      s""""manifest_check_sec":${r3(lshManifestSec)},"manifest_add_sec":${r3(lshAddSec)},""" +
      s""""compact_sec":${r3(compactSec)},"pair_files_before":$pairFilesBefore,""" +
      s""""pair_files_after":$pairFilesAfter,""" +
      s""""pairs":$batchPairs},""" +
      s""""ann":{"build_sec":${r3(annBuildSec)},"batch_append_sec":${r3(annBatchSec)},""" +
      s""""stream_total_sec":${r3(annStreamSec)},"stream_batches":$annBatches,""" +
      s""""manifest_check_sec":${r3(annManifestSec)},"manifest_add_sec":${r3(annAddSec)}}}""")
    spark.stop()
  }
}
