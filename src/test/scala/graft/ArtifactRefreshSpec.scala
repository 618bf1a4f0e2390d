package graft

import org.apache.spark.sql.functions._

import graft.operators.{ArtifactManifest, Dedup}
import graft.streaming.ArtifactRefresh

/** Pins the streaming artifact-refresh lifecycle (r14) and its replay
  * idempotence (r15): a bounded stream of delta micro-batches folded into
  * the persisted LSH signature artifact must
  * (1) emit exactly the pair set of the one-shot batch delta path — the
  * micro-batch split cannot change WHAT is discovered, only when,
  * (2) keep the provenance manifest true after every fold — now via the
  * O(batch) additive [[ArtifactManifest.add]], never a base rescan — and
  * (3) converge to the identical final state when foreachBatch's
  * at-least-once delivery replays a batch whose side-effects partially
  * landed before a crash (the checkpoint-commit drill below re-delivers a
  * real batch through the engine against a mangled artifact).
  */
class ArtifactRefreshSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  private def pairsMultiset(path: String): Seq[(Long, Long)] =
    spark.read.parquet(path)
      .select(col("doc_id_a"), col("doc_id_b"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq.sorted

  test("bounded stream refresh == one-shot batch delta path, in >= 3 micro-batches") {
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    val base = docs.filter(col("doc_id") % 4 =!= 0)
    val delta = docs.filter(col("doc_id") % 4 === 0)

    // one-shot batch reference
    val refArt = java.nio.file.Files.createTempDirectory("refresh_ref").toString
    Dedup.writeSignatureArtifact(base, "doc_id", "text", refArt)
    val want = Dedup.minhashLshPairsDelta(delta, "doc_id", "text", refArt)
      .select(col("doc_id_a"), col("doc_id_b"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet

    // streamed refresh
    val art = java.nio.file.Files.createTempDirectory("refresh_art").toString
    Dedup.writeSignatureArtifact(base, "doc_id", "text", art)
    ArtifactManifest.write(art, base.select(col("doc_id"), col("text")),
      Seq(col("doc_id"), col("text")))
    val deltaDir = java.nio.file.Files.createTempDirectory("refresh_delta").toString
    delta.repartitionByRange(3, col("doc_id"))
      .write.mode("overwrite").parquet(deltaDir)
    val pairsDir = java.nio.file.Files.createTempDirectory("refresh_pairs").toString
    val nBatches = ArtifactRefresh.refreshFromStream(spark, deltaDir,
      "doc_id", "text", art, pairsDir,
      java.nio.file.Files.createTempDirectory("refresh_ck").toString)
    assert(nBatches >= 3, s"expected >=3 micro-batches, got $nBatches")

    val got = spark.read.parquet(pairsDir)
      .select(col("doc_id_a"), col("doc_id_b"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got === want)

    // provenance after the final fold: the additively-folded manifest must
    // equal the full rescan over base ∪ delta (VERDICT r14 #1's contract)…
    ArtifactManifest.check(art,
      docs.select(col("doc_id"), col("text")), Seq(col("doc_id"), col("text")))
    // …and refuses anything else (a drifted corpus must fail loudly)
    val e = intercept[IllegalArgumentException] {
      ArtifactManifest.check(art, base.select(col("doc_id"), col("text")),
        Seq(col("doc_id"), col("text")))
    }
    assert(e.getMessage.contains("was not trained on this corpus"))
  }

  test("checkpoint-commit replay of a partially-committed batch converges to the uninterrupted state") {
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    val base = docs.filter(col("doc_id") % 4 =!= 0)
    val delta = docs.filter(col("doc_id") % 4 === 0)
    val dCols = Seq(col("doc_id"), col("text"))

    val art = java.nio.file.Files.createTempDirectory("replay_art").toString
    Dedup.writeSignatureArtifact(base, "doc_id", "text", art)
    ArtifactManifest.write(art, base.select(dCols: _*), dCols)
    val deltaDir = java.nio.file.Files.createTempDirectory("replay_delta").toString
    delta.repartitionByRange(3, col("doc_id"))
      .write.mode("overwrite").parquet(deltaDir)
    val pairsDir = java.nio.file.Files.createTempDirectory("replay_pairs").toString
    val ck = java.nio.file.Files.createTempDirectory("replay_ck").toString
    ArtifactRefresh.refreshFromStream(spark, deltaDir, "doc_id", "text",
      art, pairsDir, ck)

    // the uninterrupted run's full observable state
    val wantPairs = pairsMultiset(pairsDir)
    val wantShingles = spark.read.parquet(s"$art/shingles.parquet").count()
    val wantBands = spark.read.parquet(s"$art/bands.parquet").count()
    val wantManifest = ArtifactManifest.read(art, spark).get

    // last batch that actually folded (its commit marker exists) — markers
    // are keyed by the checkpoint's run tag since r16
    val run = graft.streaming.IdempotentFold.runIdentity(spark, ck)
    val fs = new org.apache.hadoop.fs.Path(art)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val lastBatch = fs.listStatus(new org.apache.hadoop.fs.Path(art, "_commits"))
      .map(_.getPath.getName.stripPrefix(s"r${run}_b").toLong).max
    assert(lastBatch >= 2)

    // Simulate the crash window foreachBatch leaves open: every side-effect
    // of `lastBatch` landed EXCEPT the commit marker, the crashed attempt's
    // bands move was torn (its keyed files half-gone), and the engine never
    // committed the batch to the checkpoint — so a restart re-delivers it.
    fs.delete(new org.apache.hadoop.fs.Path(art, s"_commits/r${run}_b$lastBatch"), false)
    val bands = new org.apache.hadoop.fs.Path(s"$art/bands.parquet")
    val keyed = fs.listStatus(bands)
      .filter(_.getPath.getName.startsWith(s"r${run}_b${lastBatch}_"))
    assert(keyed.nonEmpty, "expected batchId-keyed band files")
    fs.delete(keyed.head.getPath, false) // tear the append
    val commits = new java.io.File(s"$ck/commits")
      .listFiles().filter(_.getName.forall(_.isDigit))
    val lastCommit = commits.maxBy(_.getName.toLong)
    assert(lastCommit.getName.toLong >= lastBatch)
    // wipe engine commits back to (and including) the torn batch — crc
    // sidecars too, or the recommit's rename hits FileAlreadyExists
    commits.filter(_.getName.toLong >= lastBatch).foreach { f =>
      assert(f.delete())
      val crc = new java.io.File(f.getParent, s".${f.getName}.crc")
      if (crc.exists()) assert(crc.delete())
    }

    // restart: the engine re-delivers the batch; the fold must clean the
    // partial append, recompute, and skip the already-folded manifest add
    val replayed = ArtifactRefresh.refreshFromStream(spark, deltaDir,
      "doc_id", "text", art, pairsDir, ck)
    assert(replayed >= 1, "expected the torn batch to be re-delivered")

    assert(pairsMultiset(pairsDir) === wantPairs)
    assert(spark.read.parquet(s"$art/shingles.parquet").count() === wantShingles)
    assert(spark.read.parquet(s"$art/bands.parquet").count() === wantBands)
    assert(ArtifactManifest.read(art, spark).get === wantManifest)
    // and the manifest still equals a full rescan of base ∪ delta
    ArtifactManifest.check(art, docs.select(dCols: _*), dCols)
  }
}
