package graft

import org.apache.spark.sql.functions._

import graft.operators.ArtifactManifest

/** Pins the input-fingerprint provenance contract (VERDICT r12 #5): a
  * persisted artifact serves ONLY the corpus it was trained on — the
  * manifest check must pass on the identical corpus regardless of row
  * order/partitioning, and throw on any content drift (changed row,
  * missing row, duplicated row). */
class ArtifactManifestSpec extends SparkSpec {
  import spark.implicits._

  private def corpus(rows: Seq[(Long, String)]) =
    rows.toDF("doc_id", "text")

  private val cols = Seq(col("doc_id"), col("text"))
  private val train = Seq(1L -> "alpha", 2L -> "beta", 3L -> "gamma")

  private def freshArtifact(): String = {
    val dir = java.nio.file.Files.createTempDirectory("manifest_spec").toString
    ArtifactManifest.write(dir, corpus(train), cols)
    dir
  }

  test("check passes on the training corpus, in any row order or partitioning") {
    val dir = freshArtifact()
    ArtifactManifest.check(dir, corpus(train), cols)
    ArtifactManifest.check(dir, corpus(train.reverse).repartition(3), cols)
  }

  test("check throws on content drift: changed, missing, and duplicated rows") {
    val dir = freshArtifact()
    val changed = Seq(1L -> "alpha", 2L -> "BETA", 3L -> "gamma")
    val missing = train.take(2)
    val duplicated = train :+ (3L -> "gamma")
    for (bad <- Seq(changed, missing, duplicated)) {
      val e = intercept[IllegalArgumentException] {
        ArtifactManifest.check(dir, corpus(bad), cols)
      }
      assert(e.getMessage.contains("was not trained on this corpus"))
    }
  }

  test("check refuses an artifact with no manifest") {
    val dir = java.nio.file.Files.createTempDirectory("manifest_spec").toString
    val e = intercept[IllegalArgumentException] {
      ArtifactManifest.check(dir, corpus(train), cols)
    }
    assert(e.getMessage.contains("no input manifest"))
  }

  test("the gated consumers serve from the persisted artifact: q_tokenize_artifact output is unchanged by memo reuse") {
    // two invocations share ONE build (the path memo): outputs identical
    val dir = "/root/testdata/sf0.001"
    val a = SparkEntry.queries("q_tokenize_artifact")(spark, dir)
      .agg(sum(xxhash64(col("doc_id"), col("word_idx"), col("token_idx"),
        col("token")))).collect()(0).getLong(0)
    val b = SparkEntry.queries("q_tokenize_artifact")(spark, dir)
      .agg(sum(xxhash64(col("doc_id"), col("word_idx"), col("token_idx"),
        col("token")))).collect()(0).getLong(0)
    assert(a === b)
  }
}
