package graft.streaming

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Replay-idempotent micro-batch side-effects for foreachBatch folds
  * (VERDICT r14 #2). foreachBatch is at-least-once: a crash between a
  * side-effect and the checkpoint commit re-delivers the batch (same
  * batchId, same rows for a replayable source) on restart — so every
  * side-effect must either key its output by batchId or detect the replay.
  * Three pieces, composed by the refresh loops:
  *
  *  - [[appendKeyed]]: append `df` to a flat parquet dataset such that the
  *    batch's contribution is identifiable and re-writable — stage the
  *    write under a hidden `_staging_b<id>` subdir (mode overwrite, so a
  *    replayed stage self-heals), then rename the part files into the
  *    dataset with a `b<id>_` name prefix. Renames are per-file moves on
  *    the dataset's own FileSystem — no row is ever rewritten to "commit".
  *  - [[cleanKeyed]]: delete a batch's `b<id>_` files — run FIRST on
  *    re-entry, restoring the dataset to its pre-batch content so the
  *    replayed fold recomputes against exactly the state the original
  *    attempt saw (partial appends from the crashed attempt vanish).
  *  - [[isCommitted]]/[[markCommitted]]: a per-batch `_commits/b<id>` marker
  *    landed only after EVERY side-effect of the batch (including the
  *    manifest fold) — the fast-path skip for a replay of a fully-committed
  *    batch. The marker is an optimization, not the correctness story: even
  *    without it, clean-then-recompute plus [[graft.operators.ArtifactManifest.add]]'s
  *    fold-batch stamp make the replay converge to the uninterrupted state.
  *
  * The hidden names (`_staging_b*`, `_commits`) are invisible to Spark's
  * file index, so readers of the dataset never see staged or bookkeeping
  * files; the `b<id>_part-*.parquet` data files read like any other part.
  * Single-runner contract throughout (batches arrive sequentially), same
  * as the batch append path ([[graft.operators.Dedup.appendToSignatureArtifact]]).
  */
object IdempotentFold {

  private def fsFor(spark: SparkSession, dir: String) = {
    val p = new Path(dir)
    (p.getFileSystem(spark.sparkContext.hadoopConfiguration), p)
  }

  private def prefix(batchId: Long) = s"b${batchId}_"

  /** Has `batchId` been fully committed into the fold rooted at `dir`? */
  def isCommitted(spark: SparkSession, dir: String, batchId: Long): Boolean = {
    val (fs, p) = fsFor(spark, dir)
    fs.exists(new Path(p, s"_commits/b$batchId"))
  }

  /** Land the batch's commit marker — call ONLY after every side-effect
    * (keyed appends AND the manifest fold) has completed. */
  def markCommitted(spark: SparkSession, dir: String, batchId: Long): Unit = {
    val (fs, p) = fsFor(spark, dir)
    fs.create(new Path(p, s"_commits/b$batchId"), true).close()
  }

  /** Remove `batchId`'s keyed part files (and any stale staging dir) from
    * the dataset at `destDir` — the replay's first move, erasing a crashed
    * attempt's partial append before recomputing. No-op when none exist. */
  def cleanKeyed(spark: SparkSession, destDir: String, batchId: Long): Unit = {
    val (fs, p) = fsFor(spark, destDir)
    if (fs.exists(p)) {
      fs.listStatus(p).foreach { st =>
        val n = st.getPath.getName
        if (st.isFile && n.startsWith(prefix(batchId)))
          fs.delete(st.getPath, false)
      }
      val staging = new Path(p, s"_staging_b$batchId")
      if (fs.exists(staging)) fs.delete(staging, true): Unit
    }
  }

  /** Append `df`'s rows to the flat parquet dataset at `destDir`, keyed by
    * `batchId`: write to `destDir/_staging_b<id>` (overwrite — a replayed
    * stage replaces a torn one), then rename each part file to
    * `destDir/b<id>_<part>`. Caller must [[cleanKeyed]] first on re-entry
    * so a partial prior move cannot double rows. */
  def appendKeyed(df: DataFrame, destDir: String, batchId: Long): Unit = {
    val spark = df.sparkSession
    val (fs, dest) = fsFor(spark, destDir)
    val staging = new Path(dest, s"_staging_b$batchId")
    df.write.mode("overwrite").parquet(staging.toString)
    fs.listStatus(staging).foreach { st =>
      val n = st.getPath.getName
      if (st.isFile && !n.startsWith("_") && !n.startsWith("."))
        require(fs.rename(st.getPath, new Path(dest, prefix(batchId) + n)),
          s"could not move staged part ${st.getPath} into $destDir")
    }
    fs.delete(staging, true): Unit
  }
}
