package graft.operators

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileSystem, Options, Path}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Input-fingerprint provenance manifest for persisted artifacts (VERDICT
  * r12 #5). A trained artifact (BPE vocab, IVF-PQ index, quality model…)
  * is only as trustworthy as the claim that it was trained on THIS corpus;
  * through r12 three gated queries proved that claim by retraining the
  * artifact inside the query — ~24 s of every bench run that measured
  * provenance, not serving. The manifest replaces the retrain: the build
  * stores an order-free fingerprint (row count + xxhash64 multiset sum
  * over the training columns) next to the artifact, and every consumer
  * recomputes the same fingerprint over the corpus it is about to serve
  * and REFUSES to serve on a mismatch.
  *
  * The fingerprint is deliberately insensitive to row order and partition
  * layout (sum of per-row hashes) and sensitive to any row's content, any
  * missing/extra row, and any duplicate-count change.
  *
  * **The fingerprint is ADDITIVE over disjoint row multisets** —
  * fingerprint(base ∪ batch) = (n₀+n₁, h₀+h₁) exactly, because both
  * components are sums over rows (Long addition wraps identically in the
  * Spark aggregate and here). [[add]] exploits that to fold a streaming
  * micro-batch into a stored manifest in O(batch) — read the sidecar, add
  * the batch's (count, hash sum), write back — with no rescan of the base
  * corpus (VERDICT r14 #1: the per-micro-batch base∪consumed rescan was a
  * genuine scale-killer in the refresh hot path; the additive fold is the
  * same contract, bit-identical result, base-size-independent cost).
  *
  * Sidecar writes are write-tmp-then-rename (atomic on local/HDFS), so a
  * crash mid-update can never leave a torn manifest; [[add]] additionally
  * stamps the folding micro-batch's id into the sidecar and refuses to
  * fold the same batch twice — the at-least-once re-delivery guard the
  * streaming refreshes rely on (VERDICT r14 #2).
  */
object ArtifactManifest {
  private val FILE = "_input_manifest.json"

  /** The stored sidecar: fingerprint plus (for streaming folds) the last
    * folded micro-batch id and its run tag — the replay guard for
    * at-least-once delivery. The run tag matters because batch ids restart
    * at 0 under a new checkpoint (ADVICE r15): without it, a finished
    * run's final stamp could silently swallow a NEW run's same-numbered
    * first batch. */
  final case class Manifest(nRows: Long, inputHash: Long,
                            foldBatch: Option[Long],
                            foldRun: Option[String] = None)

  /** The order-free content fingerprint: (row count, xxhash64 multiset sum
    * over `cols`). Public so consumers that must compare fingerprints
    * WITHOUT publishing a manifest (Compaction's publish gate) share the
    * exact scheme instead of re-deriving it. One scan of `df`. */
  def fingerprintOf(df: DataFrame, cols: Seq[Column]): (Long, Long) = {
    val r = df.agg(count(lit(1)), sum(xxhash64(cols: _*))).collect()(0)
    (r.getLong(0), if (r.isNullAt(1)) 0L else r.getLong(1))
  }

  private def render(n: Long, h: Long, foldBatch: Option[Long],
                     foldRun: Option[String] = None): String = {
    val stamp = foldBatch.map(b => s""","fold_batch":$b""").getOrElse("") +
      foldRun.map(r => s""","fold_run":"$r"""").getOrElse("")
    s"""{"n_rows":$n,"input_hash":$h$stamp}"""
  }

  private val ManifestRe =
    ("""\{"n_rows":(-?\d+),"input_hash":(-?\d+)""" +
      """(?:,"fold_batch":(-?\d+))?(?:,"fold_run":"([0-9a-f]+)")?\}""").r

  private def parse(s: String, where: String): Manifest = s.trim match {
    case ManifestRe(n, h, fb, fr) =>
      Manifest(n.toLong, h.toLong, Option(fb).map(_.toLong), Option(fr))
    case other =>
      throw new IllegalArgumentException(
        s"unparseable input manifest at $where: $other")
  }

  /** Sidecar I/O goes through Hadoop `FileSystem` resolved FROM the
    * artifact path (VERDICT r13 "what's wrong" #2): the parquet parts of
    * every artifact already travel through Spark's Hadoop layer, so the
    * manifest must too — a real deployment parks artifacts on HDFS/S3,
    * where `java.nio.file.Files` cannot reach. Bare local paths keep
    * working (they resolve to the local FS), and `file:`/`hdfs:`/`s3a:`
    * URIs now do as well. */
  private def manifestPath(artifactDir: String, hconf: Configuration) = {
    val p = new Path(artifactDir, FILE)
    (p.getFileSystem(hconf), p)
  }

  /** Write the sidecar via write-tmp-then-rename: land the bytes at
    * `<name>.tmp`, then rename over the target (FileContext rename with
    * OVERWRITE). On the local FS and HDFS the rename is atomic, so a crash
    * mid-write leaves either the old manifest or the new one, never a torn
    * file — the property [[add]]'s replay guard depends on. Filesystems
    * with no AbstractFileSystem binding (some object stores) fall back to
    * a plain delete + FileSystem rename (ADVICE r15): still
    * torn-manifest-free (the tmp write is complete before the swap), but
    * a crash between the delete and the rename can leave the manifest
    * missing — a LOUD state ([[check]]/[[add]] refuse a missing manifest),
    * never a silently wrong one. Note s3a's rename is copy+delete either
    * way; the atomicity claim is scoped to local/HDFS. */
  private def atomicWrite(fs: FileSystem, p: Path, content: String,
                          hconf: Configuration): Unit = {
    val qp = fs.makeQualified(p)
    val tmp = new Path(qp.getParent, qp.getName + ".tmp")
    val out = fs.create(tmp, true)
    try out.write(content.getBytes("UTF-8")) finally out.close()
    try org.apache.hadoop.fs.FileContext.getFileContext(qp.toUri, hconf)
      .rename(tmp, qp, Options.Rename.OVERWRITE)
    catch {
      case _: org.apache.hadoop.fs.UnsupportedFileSystemException =>
        if (fs.exists(qp)) fs.delete(qp, false)
        require(fs.rename(tmp, qp), s"could not move $tmp over $qp")
    }
  }

  private def readManifest(fs: FileSystem, p: Path): Manifest = {
    val in = fs.open(p)
    val raw =
      try new String(org.apache.hadoop.io.IOUtils.readFullyToByteArray(in), "UTF-8")
      finally in.close()
    parse(raw, p.toString)
  }

  /** Read a stored manifest if one exists (None on a missing dir/file).
    * No data scan — this is how a consumer gets the artifact's recorded
    * row count and hash without touching the corpus. */
  def read(artifactDir: String, spark: SparkSession): Option[Manifest] = {
    val (fs, p) = manifestPath(artifactDir, spark.sparkContext.hadoopConfiguration)
    if (fs.exists(p)) Some(readManifest(fs, p)) else None
  }

  /** Store the training input's fingerprint next to an already-written
    * artifact. Call at build time, after the artifact files land. */
  def write(artifactDir: String, trainInput: DataFrame, cols: Seq[Column]): Unit = {
    val (n, h) = fingerprintOf(trainInput, cols)
    writeValues(artifactDir, n, h, trainInput.sparkSession)
  }

  /** Publish an ALREADY-COMPUTED fingerprint (no scan) — for callers that
    * proved content preservation in memory first and only then land the
    * manifest (Compaction's publish gate, the partitioned rollup). */
  def writeValues(artifactDir: String, nRows: Long, inputHash: Long,
                  spark: SparkSession, foldBatch: Option[Long] = None,
                  foldRun: Option[String] = None): Unit = {
    val hconf = spark.sparkContext.hadoopConfiguration
    val (fs, p) = manifestPath(artifactDir, hconf)
    atomicWrite(fs, p, render(nRows, inputHash, foldBatch, foldRun), hconf)
  }

  /** Verify the corpus about to be served equals the corpus the artifact
    * was trained on; throws with both fingerprints on any mismatch (a
    * drifted corpus must fail loudly, never serve a stale model). The
    * compare is on the parsed (n_rows, input_hash) values, so a manifest
    * carrying a streaming fold stamp checks identically to a batch one. */
  def check(artifactDir: String, serveInput: DataFrame, cols: Seq[Column]): Unit = {
    val (fs, p) = manifestPath(artifactDir,
      serveInput.sparkSession.sparkContext.hadoopConfiguration)
    require(fs.exists(p),
      s"artifact at $artifactDir has no input manifest ($FILE)")
    val stored = readManifest(fs, p)
    val (n, h) = fingerprintOf(serveInput, cols)
    require(stored.nRows == n && stored.inputHash == h,
      s"artifact at $artifactDir was not trained on this corpus: " +
        s"manifest=${render(stored.nRows, stored.inputHash, None)} " +
        s"recomputed=${render(n, h, None)}")
  }

  /** O(batch) streaming fold: extend the stored manifest to cover
    * `batch`'s rows as well — EXACT, by the fingerprint's additivity over
    * disjoint row multisets — without scanning anything but the batch.
    * Stamps (`foldRun`, `foldBatchId`) into the sidecar and returns false
    * (no-op) when the stored stamp already equals BOTH: under
    * foreachBatch's at-least-once re-delivery, a replayed micro-batch
    * folds exactly once — and because batch ids restart at 0 under a new
    * checkpoint, the run tag keeps a finished run's final stamp from
    * swallowing a NEW run's same-numbered batch (ADVICE r15).
    * Micro-batches arrive sequentially with increasing ids (the
    * single-runner append contract all the artifact folds share), so one
    * stamp suffices. `foldRun` is
    * [[graft.streaming.IdempotentFold.runIdentity]] of the checkpoint; ""
    * (legacy batch-only stamping) matches a stamp with no run.
    * `aliasRuns` are older-era tags for the SAME resumed stream (ADVICE
    * r16 upgrade): a stored stamp under an alias proves this batch already
    * folded — re-adding it would double-count the fingerprint. */
  def add(artifactDir: String, batch: DataFrame, cols: Seq[Column],
          foldBatchId: Long, foldRun: String = "",
          aliasRuns: Seq[String] = Nil): Boolean = {
    val spark = batch.sparkSession
    val hconf = spark.sparkContext.hadoopConfiguration
    val (fs, p) = manifestPath(artifactDir, hconf)
    require(fs.exists(p),
      s"artifact at $artifactDir has no input manifest ($FILE)")
    val stored = readManifest(fs, p)
    val runOpt = Option(foldRun).filter(_.nonEmpty)
    val stampMatches = stored.foldBatch.contains(foldBatchId) &&
      (stored.foldRun == runOpt ||
        aliasRuns.map(a => Option(a).filter(_.nonEmpty)).contains(stored.foldRun))
    if (stampMatches) false
    else {
      val (n, h) = fingerprintOf(batch, cols)
      atomicWrite(fs, p,
        render(stored.nRows + n, stored.inputHash + h, Some(foldBatchId), runOpt),
        hconf)
      true
    }
  }
}
