package graft.streaming

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Replay-idempotent micro-batch side-effects for foreachBatch folds
  * (VERDICT r14 #2). foreachBatch is at-least-once: a crash between a
  * side-effect and the checkpoint commit re-delivers the batch (same
  * batchId, same rows for a replayable source) on restart — so every
  * side-effect must either key its output by batchId or detect the replay.
  *
  * **Keys carry a RUN identity, not just a batch id** (ADVICE r15): batch
  * ids restart at 0 under a NEW checkpoint (a new nightly delta dir), so a
  * marker keyed by batchId alone would make the new run's batch 0 look
  * "already committed" — every batch silently skipped, pairs never emitted,
  * manifest never folded. [[runTag]] derives a stable tag from the
  * checkpoint path (the unit Structured Streaming scopes batch ids to);
  * markers, staging dirs and keyed part files all embed it, so two runs'
  * bookkeeping can never collide and a replayed batch only ever erases its
  * OWN run's partial work.
  *
  * Three pieces, composed by the refresh loops:
  *
  *  - [[appendKeyed]]: append `df` to a flat parquet dataset such that the
  *    batch's contribution is identifiable and re-writable — stage the
  *    write under a hidden `_staging_r<run>_b<id>` subdir (mode overwrite,
  *    so a replayed stage self-heals), then rename the part files into the
  *    dataset with a `r<run>_b<id>_` name prefix. Renames are per-file
  *    moves on the dataset's own FileSystem — no row is ever rewritten to
  *    "commit".
  *  - [[cleanKeyed]]: delete a batch's keyed files — run FIRST on
  *    re-entry, restoring the dataset to its pre-batch content so the
  *    replayed fold recomputes against exactly the state the original
  *    attempt saw (partial appends from the crashed attempt vanish).
  *  - [[isCommitted]]/[[markCommitted]]: a per-batch `_commits/r<run>_b<id>`
  *    marker landed only after EVERY side-effect of the batch (including
  *    the manifest fold) — the fast-path skip for a replay of a
  *    fully-committed batch. The marker is an optimization, not the
  *    correctness story: even without it, clean-then-recompute plus
  *    [[graft.operators.ArtifactManifest.add]]'s fold stamp make the
  *    replay converge to the uninterrupted state.
  *
  * Markers and keyed files are not immortal: Structured Streaming only ever
  * re-delivers a batch missing from the checkpoint's `commits/` log, so
  * everything at or below [[committedHorizon]] is replay-dead —
  * [[pruneMarkers]] deletes those markers, and
  * [[FoldCompaction]] merges those keyed files into plain parts, bounding
  * the artifact's file count on a long-lived feed (VERDICT r15 #3).
  *
  * The hidden names (`_staging_*`, `_commits`) are invisible to Spark's
  * file index, so readers of the dataset never see staged or bookkeeping
  * files; the `r<run>_b<id>_part-*.parquet` data files read like any other
  * part. Single-runner contract throughout (batches arrive sequentially),
  * same as the batch append path
  * ([[graft.operators.Dedup.appendToSignatureArtifact]]).
  */
object IdempotentFold {

  private def fsFor(spark: SparkSession, dir: String) = {
    val p = new Path(dir)
    (p.getFileSystem(spark.sparkContext.hadoopConfiguration), p)
  }

  /** The isolated session a refresh loop runs under: the caller's conf,
    * with `spark.sql.shuffle.partitions` sized for the PER-BATCH work —
    * `shufflePartitions` when the caller set one (a production feed's
    * multi-GB micro-batch needs its own scale), else 8 (right for the
    * gate's tiny batches). VERDICT r15 #2: the old hardcoded 8 overrode
    * the caller unconditionally. */
  def foldSession(spark: SparkSession,
                  shufflePartitions: Option[Int]): SparkSession = {
    val s = spark.newSession()
    spark.conf.getAll.foreach { case (k, v) =>
      try s.conf.set(k, v) catch { case _: Exception => () }
    }
    s.conf.set("spark.sql.shuffle.partitions",
      shufflePartitions.getOrElse(8).toString)
    s
  }

  /** The run identity all fold bookkeeping is keyed by: a stable hash of
    * the checkpoint path, because the checkpoint IS the unit batch ids are
    * scoped to — a restart of the same checkpoint yields the same tag (so
    * replays find their run's markers), a NEW checkpoint yields a new one
    * (so its batch 0 can never collide with a finished run's batch 0). */
  def runTag(checkpointDir: String): String = {
    val normalized = new Path(checkpointDir).toString
    f"${scala.util.hashing.MurmurHash3.stringHash(normalized) & 0xffffffffL}%08x"
  }

  /** Highest batch id recorded in the checkpoint's `commits/` log, or -1
    * when none: batches at or below it are committed by the ENGINE and can
    * never be re-delivered — the safety horizon below which markers are
    * prunable and keyed files compactable. */
  def committedHorizon(spark: SparkSession, checkpointDir: String): Long = {
    val (fs, p) = fsFor(spark, s"$checkpointDir/commits")
    if (!fs.exists(p)) -1L
    else {
      val ids = fs.listStatus(p).toSeq
        .map(_.getPath.getName).filter(n => n.nonEmpty && n.forall(_.isDigit))
        .map(_.toLong)
      if (ids.isEmpty) -1L else ids.max
    }
  }

  /** The keyed-file name prefix for (`run`, `batchId`). */
  def keyedPrefix(run: String, batchId: Long) = s"r${run}_b${batchId}_"

  /** Parse a keyed file name back to its (run, batchId), None for plain
    * (unkeyed) parts — how [[FoldCompaction]] splits a dataset's files
    * into replay-dead and replay-live. */
  def parseKeyed(name: String): Option[(String, Long)] = name match {
    case KeyedRe(run, id) => Some((run, id.toLong))
    case _                => None
  }
  private val KeyedRe = """^r([0-9a-f]{8})_b(\d+)_.*""".r

  private def markerPath(p: Path, run: String, batchId: Long) =
    new Path(p, s"_commits/r${run}_b$batchId")

  /** Has `batchId` of run `run` been fully committed into the fold at
    * `dir`? */
  def isCommitted(spark: SparkSession, dir: String, run: String,
                  batchId: Long): Boolean = {
    val (fs, p) = fsFor(spark, dir)
    fs.exists(markerPath(p, run, batchId))
  }

  /** Land the batch's commit marker — call ONLY after every side-effect
    * (keyed appends AND the manifest fold) has completed. */
  def markCommitted(spark: SparkSession, dir: String, run: String,
                    batchId: Long): Unit = {
    val (fs, p) = fsFor(spark, dir)
    fs.create(markerPath(p, run, batchId), true).close()
  }

  /** Delete run `run`'s markers at or below `horizon` (see
    * [[committedHorizon]] — those batches can never be re-delivered, so
    * their markers are dead weight that would otherwise accumulate
    * one-per-batch forever). Returns how many were pruned. */
  def pruneMarkers(spark: SparkSession, dir: String, run: String,
                   horizon: Long): Int = {
    val (fs, p) = fsFor(spark, dir)
    val commits = new Path(p, "_commits")
    if (!fs.exists(commits)) 0
    else {
      val MarkerRe = """^r([0-9a-f]{8})_b(\d+)$""".r
      val dead = fs.listStatus(commits).toSeq.filter { st =>
        st.getPath.getName match {
          case MarkerRe(r, id) => r == run && id.toLong <= horizon
          case _               => false
        }
      }
      dead.foreach(st => fs.delete(st.getPath, false))
      dead.size
    }
  }

  /** Remove `batchId`'s keyed part files (and any stale staging dir) from
    * the dataset at `destDir` — the replay's first move, erasing a crashed
    * attempt's partial append before recomputing. Only files of THIS run
    * are touched. No-op when none exist. */
  def cleanKeyed(spark: SparkSession, destDir: String, run: String,
                 batchId: Long): Unit = {
    val (fs, p) = fsFor(spark, destDir)
    if (fs.exists(p)) {
      fs.listStatus(p).foreach { st =>
        val n = st.getPath.getName
        if (st.isFile && n.startsWith(keyedPrefix(run, batchId)))
          fs.delete(st.getPath, false)
      }
      val staging = new Path(p, s"_staging_r${run}_b$batchId")
      if (fs.exists(staging)) fs.delete(staging, true): Unit
    }
  }

  /** Append `df`'s rows to the flat parquet dataset at `destDir`, keyed by
    * (`run`, `batchId`): write to `destDir/_staging_r<run>_b<id>`
    * (overwrite — a replayed stage replaces a torn one), then rename each
    * part file to `destDir/r<run>_b<id>_<part>`. Caller must [[cleanKeyed]]
    * first on re-entry so a partial prior move cannot double rows. */
  def appendKeyed(df: DataFrame, destDir: String, run: String,
                  batchId: Long): Unit = {
    val spark = df.sparkSession
    val (fs, dest) = fsFor(spark, destDir)
    val staging = new Path(dest, s"_staging_r${run}_b$batchId")
    df.write.mode("overwrite").parquet(staging.toString)
    fs.listStatus(staging).foreach { st =>
      val n = st.getPath.getName
      if (st.isFile && !n.startsWith("_") && !n.startsWith("."))
        require(fs.rename(st.getPath, new Path(dest, keyedPrefix(run, batchId) + n)),
          s"could not move staged part ${st.getPath} into $destDir")
    }
    fs.delete(staging, true): Unit
  }
}
