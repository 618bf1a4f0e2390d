package graft

import org.apache.spark.sql.functions._

import graft.operators.{ArtifactManifest, Similarity}
import graft.streaming.AnnIndexRefresh

/** Pins the streaming IVF-PQ index-refresh lifecycle (r14) and its replay
  * idempotence (r15): a bounded stream of embedding micro-batches folded
  * into the persisted index must
  * (1) leave the index bit-equal to the one-shot batch append — appends are
  * per-row functions of the STORED quantizers, so the micro-batch split
  * cannot change WHAT the index holds,
  * (2) keep the provenance manifest true after every fold — via the O(batch)
  * additive [[ArtifactManifest.add]], never a base rescan — and
  * (3) converge to the identical final state when a batch is re-delivered
  * after a crash that tore its side-effects (checkpoint-commit drill).
  * Search equality against the train-on-base / assign-all oracle chain is
  * gated separately (q_stream_ann_refresh).
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
    val nBatches = AnnIndexRefresh.refreshFromStream(spark, deltaDir, idx,
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

    // provenance after the final fold covers base ∪ delta (additive fold
    // == full rescan)…
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

  test("checkpoint-commit replay of a partially-committed batch converges to the uninterrupted state") {
    val emb = spark.read.parquet(s"$dir/embeddings.parquet")
    val base = emb.filter(col("vec_id") % 4 =!= 0)
    val delta = emb.filter(col("vec_id") % 4 === 0)
    val eCols = Seq(col("vec_id"), col("embedding"))

    val idx = java.nio.file.Files.createTempDirectory("annreplay_idx").toString
    Similarity.writeIvfPqIndex(base, idx)
    ArtifactManifest.write(idx, base.select(eCols: _*), eCols)
    val deltaDir = java.nio.file.Files.createTempDirectory("annreplay_delta").toString
    delta.repartitionByRange(3, col("vec_id"))
      .write.mode("overwrite").parquet(deltaDir)
    val ck = java.nio.file.Files.createTempDirectory("annreplay_ck").toString
    AnnIndexRefresh.refreshFromStream(spark, deltaDir, idx, ck)

    def table(t: String) = spark.read.parquet(s"$idx/$t.parquet")
    val wantCells = table("cells").collect().map(_.toString).sorted.toSeq
    val wantCodes = table("codes").count()
    val wantManifest = ArtifactManifest.read(idx, spark).get

    val run = graft.streaming.IdempotentFold.runIdentity(spark, ck)
    val fs = new org.apache.hadoop.fs.Path(idx)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val lastBatch = fs.listStatus(new org.apache.hadoop.fs.Path(idx, "_commits"))
      .map(_.getPath.getName.stripPrefix(s"r${run}_b").toLong).max
    assert(lastBatch >= 2)

    // crash window: marker gone, the codes append torn, engine commit gone
    fs.delete(new org.apache.hadoop.fs.Path(idx, s"_commits/r${run}_b$lastBatch"), false)
    val codes = new org.apache.hadoop.fs.Path(s"$idx/codes.parquet")
    val keyed = fs.listStatus(codes)
      .filter(_.getPath.getName.startsWith(s"r${run}_b${lastBatch}_"))
    assert(keyed.nonEmpty, "expected batchId-keyed code files")
    fs.delete(keyed.head.getPath, false)
    val commits = new java.io.File(s"$ck/commits")
      .listFiles().filter(_.getName.forall(_.isDigit))
    commits.filter(_.getName.toLong >= lastBatch).foreach { f =>
      assert(f.delete())
      val crc = new java.io.File(f.getParent, s".${f.getName}.crc")
      if (crc.exists()) assert(crc.delete())
    }

    val replayed = AnnIndexRefresh.refreshFromStream(spark, deltaDir, idx, ck)
    assert(replayed >= 1, "expected the torn batch to be re-delivered")

    assert(table("cells").collect().map(_.toString).sorted.toSeq === wantCells)
    assert(table("codes").count() === wantCodes)
    assert(ArtifactManifest.read(idx, spark).get === wantManifest)
    ArtifactManifest.check(idx, emb.select(eCols: _*), eCols)
  }
}
