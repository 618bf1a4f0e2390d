package graft

import org.apache.spark.sql.functions._

import graft.operators.{ArtifactManifest, Similarity}
import graft.streaming.AnnIndexRefresh

/** Pins the streaming IVF-PQ index-refresh lifecycle (r14): a bounded
  * stream of embedding micro-batches folded into the persisted index must
  * (1) leave the index bit-equal to the one-shot batch append — appends are
  * per-row functions of the STORED quantizers, so the micro-batch split
  * cannot change WHAT the index holds — and (2) keep the provenance
  * manifest true after every fold. Search equality against the
  * train-on-base / assign-all oracle chain is gated separately
  * (q_stream_ann_refresh).
  */
class AnnIndexRefreshSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("bounded stream refresh == one-shot batch append, in >= 3 micro-batches") {
    val emb = spark.read.parquet(s"$dir/embeddings.parquet")
    val base = emb.filter(col("vec_id") % 4 =!= 0)
    val delta = emb.filter(col("vec_id") % 4 === 0)

    // one-shot batch reference: build on base, append the whole delta once
    val refIdx = java.nio.file.Files.createTempDirectory("annref_ref").toString
    Similarity.writeIvfPqIndex(base, refIdx)
    Similarity.appendToIvfPqIndex(delta, refIdx)

    // streamed refresh over the same base build
    val idx = java.nio.file.Files.createTempDirectory("annref_idx").toString
    Similarity.writeIvfPqIndex(base, idx)
    ArtifactManifest.write(idx, base.select(col("vec_id"), col("embedding")),
      Seq(col("vec_id"), col("embedding")))
    val deltaDir = java.nio.file.Files.createTempDirectory("annref_delta").toString
    delta.repartitionByRange(3, col("vec_id"))
      .write.mode("overwrite").parquet(deltaDir)
    val nBatches = AnnIndexRefresh.refreshFromStream(spark, deltaDir, base, idx,
      java.nio.file.Files.createTempDirectory("annref_ck").toString)
    assert(nBatches >= 3, s"expected >=3 micro-batches, got $nBatches")

    // the two indexes hold the same rows, table by table
    for (t <- Seq("cents", "codebook", "cells", "codes")) {
      val a = spark.read.parquet(s"$refIdx/$t.parquet")
      val b = spark.read.parquet(s"$idx/$t.parquet")
      assert(a.count() === b.count(), s"$t row count")
      assert(a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty,
        s"$t content diverges between streamed and one-shot append")
    }
    // and searches from them agree
    val q = emb.filter(col("vec_id") % 50 === 0)
    val sa = Similarity.ivfPqSearchIndex(refIdx, q, k = 3)
    val sb = Similarity.ivfPqSearchIndex(idx, q, k = 3)
    assert(sa.exceptAll(sb).isEmpty && sb.exceptAll(sa).isEmpty)

    // provenance after the final fold covers base ∪ delta…
    ArtifactManifest.check(idx,
      emb.select(col("vec_id"), col("embedding")),
      Seq(col("vec_id"), col("embedding")))
    // …and refuses a drifted corpus
    val e = intercept[IllegalArgumentException] {
      ArtifactManifest.check(idx, base.select(col("vec_id"), col("embedding")),
        Seq(col("vec_id"), col("embedding")))
    }
    assert(e.getMessage.contains("was not trained on this corpus"))
  }
}
