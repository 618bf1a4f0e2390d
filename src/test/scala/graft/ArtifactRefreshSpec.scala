package graft

import org.apache.spark.sql.functions._

import graft.operators.{ArtifactManifest, Dedup}
import graft.streaming.ArtifactRefresh

/** Pins the streaming artifact-refresh lifecycle (r14): a bounded stream of
  * delta micro-batches folded into the persisted LSH signature artifact must
  * (1) emit exactly the pair set of the one-shot batch delta path — the
  * micro-batch split cannot change WHAT is discovered, only when — and
  * (2) keep the provenance manifest true after every fold, so a consumer
  * can trust the artifact at any point mid-refresh, not only at build time.
  */
class ArtifactRefreshSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

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
    val nBatches = ArtifactRefresh.refreshFromStream(spark, deltaDir, base,
      "doc_id", "text", art, pairsDir,
      java.nio.file.Files.createTempDirectory("refresh_ck").toString)
    assert(nBatches >= 3, s"expected >=3 micro-batches, got $nBatches")

    val got = spark.read.parquet(pairsDir)
      .select(col("doc_id_a"), col("doc_id_b"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got === want)

    // provenance after the final fold: the artifact now covers base ∪ delta…
    ArtifactManifest.check(art,
      docs.select(col("doc_id"), col("text")), Seq(col("doc_id"), col("text")))
    // …and refuses anything else (a drifted corpus must fail loudly)
    val e = intercept[IllegalArgumentException] {
      ArtifactManifest.check(art, base.select(col("doc_id"), col("text")),
        Seq(col("doc_id"), col("text")))
    }
    assert(e.getMessage.contains("was not trained on this corpus"))
  }
}
