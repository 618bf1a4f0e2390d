package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.hadoop.fs.Path

/** Small-file compaction — the OPTIMIZE-style dataset rewrite every
  * streaming ingest eventually needs (§7.5 extension; no reference
  * counterpart — the reference's psycopg2 sink has no file layout at all).
  *
  * Why it's first-class at 100 TB: a micro-batch sink writing every few
  * minutes produces thousands of KB-sized parquet files per day, and scan
  * cost degrades with FILE COUNT (driver planning, footer reads, one
  * task minimum per split) long before it degrades with bytes. The fix is
  * a periodic bin-packing rewrite to a target file size — this operator —
  * run per partition directory so it never touches more than one
  * partition's files at a time.
  *
  * Contract (the part a plain `.repartition().write()` doesn't give you):
  *  - **Size-aware**: output file count is computed from the INPUT's real
  *    bytes (`planOutputFiles`), not guessed; compressed size in ≈ size
  *    out for a rewrite of the same codec.
  *  - **Proven content-preserving, THEN published** (r15, ADVICE r14): the
  *    input's order-free fingerprint (count + xxhash64 multiset sum over
  *    every column — [[ArtifactManifest]]'s scheme) and the read-back
  *    output's are compared IN MEMORY; only after they match does the
  *    manifest land at the output. A lossy rewrite — or a crash anywhere
  *    before the compare passes — leaves NO manifest, so the next run can
  *    never mistake a corrupt output for a finished one.
  *  - **Idempotent**: the published manifest records the input fingerprint;
  *    a re-run whose current input matches it skips the rewrite entirely
  *    (the nightly-cron shape — re-running a compaction job must be a
  *    no-op, exactly like `Fact.backfillSlices`' `_SUCCESS` probing). The
  *    skip decision and the stats row count reuse the ONE fingerprint scan
  *    — no separate `count()` actions (ADVICE r14 low).
  *  - **Clustering-preserving (optional)**: with `sortCol` the rewrite
  *    range-partitions + sorts within files, so per-file min/max stay
  *    disjoint and parquet row-group skipping (the S9 sorted-layout proof,
  *    `Warehouse.scala:70`) survives the compaction instead of being
  *    destroyed by round-robin shuffling.
  *  - **Leaf-only, loudly**: `compact` REFUSES a directory containing
  *    sub-directories (VERDICT r14 #3 — a nested Hive layout fed to the
  *    flat path used to be silently flattened); [[compactPartitioned]]
  *    recurses to the LEAF `key=value` directories of arbitrarily nested
  *    layouts and preserves the full relative layout on the output side.
  *
  * Physical plan: one exchange (round-robin or range) over one scan, then
  * the write — no global sort, no window, no driver-side row movement.
  * The range variant adds Spark's reservoir-sampling pass to pick bounds
  * (bounded by sampling, not data size). All I/O goes through Hadoop
  * `FileSystem` resolved from the path, so `file:`/`hdfs:`/`s3a:` dirs
  * all work (same portability contract as the artifact manifest).
  */
object Compaction {

  /** What a compaction run did. `skipped` = the idempotent no-op path
    * (manifest already matches the current input). */
  final case class CompactionStats(nFilesIn: Long, bytesIn: Long,
                                   nFilesOut: Long, bytesOut: Long,
                                   rows: Long, skipped: Boolean)

  /** Data files under a dataset dir: everything not hidden (`_` metadata
    * like _SUCCESS/_input_manifest.json, `.` checksums). */
  private def dataFiles(spark: SparkSession, dir: String) = {
    val p = new Path(dir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.listStatus(p).toSeq.filter { st =>
      val n = st.getPath.getName
      st.isFile && !n.startsWith("_") && !n.startsWith(".")
    }
  }

  /** Non-hidden sub-directories — a leaf dataset dir must have none. */
  private def dataSubdirs(spark: SparkSession, dir: String) = {
    val p = new Path(dir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) Seq.empty
    else fs.listStatus(p).toSeq.filter { st =>
      val n = st.getPath.getName
      st.isDirectory && !n.startsWith("_") && !n.startsWith(".")
    }
  }

  /** ceil(totalBytes / targetBytes), min 1 — the bin count a same-codec
    * rewrite needs for ~target-sized output files. */
  def planOutputFiles(totalBytes: Long, targetFileBytes: Long): Int = {
    require(targetFileBytes > 0, s"targetFileBytes must be > 0: $targetFileBytes")
    math.max(1L, (totalBytes + targetFileBytes - 1) / targetFileBytes).toInt
  }

  /** `outDir` must be a different directory from `inDir` and neither may
    * nest inside the other: compacting onto the input would read and
    * overwrite the same files mid-job, and a nested output would pollute
    * the other side's listing on the next run. Checked up front so the
    * failure is a clear precondition, not a mid-write stack trace. */
  private def requireDisjoint(spark: SparkSession, inDir: String, outDir: String): Unit = {
    val conf = spark.sparkContext.hadoopConfiguration
    def qualified(d: String) = { val p = new Path(d); p.getFileSystem(conf).makeQualified(p) }
    val (qi, qo) = (qualified(inDir), qualified(outDir))
    require(qi != qo, s"compaction outDir must differ from inDir: $qi")
    def nests(a: Path, b: Path): Boolean =
      Iterator.iterate(b)(_.getParent).takeWhile(_ != null).contains(a)
    require(!nests(qi, qo) && !nests(qo, qi),
      s"compaction inDir and outDir must not nest: in=$qi out=$qo")
  }

  /** Rewrite `inDir`'s parquet dataset into `outDir` at ~`targetFileBytes`
    * per file. `sortCol` switches the exchange from round-robin to
    * range-partition + in-file sort (clustering-preserving mode). The
    * output is verified against the input's content fingerprint and only
    * then is the manifest published; a manifest already matching the input
    * makes the call a no-op. Returns what happened either way. Exactly one
    * content scan of the input (the fingerprint; the rewrite's own write
    * re-reads it, as any rewrite must) and one of the output (read-back).
    */
  def compact(spark: SparkSession, inDir: String, outDir: String,
              targetFileBytes: Long, sortCol: Option[String] = None): CompactionStats = {
    requireDisjoint(spark, inDir, outDir)
    val inFiles = dataFiles(spark, inDir)
    val subdirs = dataSubdirs(spark, inDir)
    require(subdirs.isEmpty,
      s"$inDir contains sub-directories (${subdirs.map(_.getPath.getName).mkString(", ")}): " +
        "compact() rewrites ONE leaf directory — a nested layout would be " +
        "silently flattened; use compactPartitioned for Hive layouts")
    require(inFiles.nonEmpty, s"$inDir has no data files to compact")
    val in = spark.read.parquet(inDir)
    val cols = in.columns.toSeq.map(col)
    val bytesIn = inFiles.map(_.getLen).sum

    // ONE fingerprint scan serves the skip decision, the publish gate's
    // input side, and every stats row count below.
    val (nIn, hIn) = ArtifactManifest.fingerprintOf(in, cols)

    // Idempotent re-run: an output manifest that fingerprint-matches the
    // CURRENT input means this exact content is already compacted there.
    // A missing/unreadable/drifted manifest falls through to a fresh
    // rewrite — redoing is precisely what compaction should do then.
    val alreadyDone =
      try ArtifactManifest.read(outDir, spark)
        .exists(m => m.nRows == nIn && m.inputHash == hIn)
      catch { case _: Exception => false }
    if (alreadyDone) {
      val outFiles = dataFiles(spark, outDir)
      return CompactionStats(inFiles.size.toLong, bytesIn,
        outFiles.size.toLong, outFiles.map(_.getLen).sum,
        nIn, skipped = true)
    }

    val nOut = planOutputFiles(bytesIn, targetFileBytes)
    val packed = sortCol match {
      case Some(c) if nOut > 1 =>
        in.repartitionByRange(nOut, col(c)).sortWithinPartitions(col(c))
      case Some(c) => in.repartition(1).sortWithinPartitions(col(c))
      case None =>
        // Bin-packing needs NO exchange: the parquet scan already groups
        // small files into ~maxPartitionBytes splits, so merging down to
        // nOut is a coalesce — each write task streams a few scan splits
        // straight to one output file, zero shuffle bytes at any scale.
        // repartition only when SPLITTING (more output files than scan
        // splits), where a shuffle is the only way to spread rows.
        val scanParts = in.rdd.getNumPartitions
        if (nOut <= scanParts) in.coalesce(nOut) else in.repartition(nOut)
    }
    packed.write.mode("overwrite").parquet(outDir)

    // Publish gate (ADVICE r14 high): prove the rewrite content-preserving
    // IN MEMORY — read-back fingerprint must equal the input's — and only
    // then land the manifest. A lossy rewrite, or a crash before this
    // point, leaves no manifest, so it can never be skipped as "done".
    val (nOutRows, hOut) =
      ArtifactManifest.fingerprintOf(spark.read.parquet(outDir), cols)
    require(nOutRows == nIn && hOut == hIn,
      s"compaction of $inDir altered content: input (n=$nIn, hash=$hIn) vs " +
        s"read-back output (n=$nOutRows, hash=$hOut) — manifest NOT published")
    ArtifactManifest.writeValues(outDir, nIn, hIn, spark)

    val outFiles = dataFiles(spark, outDir)
    CompactionStats(inFiles.size.toLong, bytesIn,
      outFiles.size.toLong, outFiles.map(_.getLen).sum,
      nIn, skipped = false)
  }

  /** The LEAF partition directories of a (possibly nested) Hive layout,
    * as relative `key=value[/key=value…]` paths: descend while a dir has
    * `key=value` children, stop at dirs that hold the data files.
    *
    * A NON-leaf level must hold nothing but `key=value` children (VERDICT
    * r15 #4): a data file parked at the root or an intermediate level, or
    * a stray non-partition subdirectory, would be silently absent from the
    * compacted copy AND from the rollup manifest — the same silent-loss
    * class as the flatten bug `compact` refuses loudly — so a mixed layout
    * fails here instead. */
  private def leafPartitionDirs(spark: SparkSession, root: String): Seq[String] = {
    val p = new Path(root)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    def go(dir: Path, rel: String): Seq[String] = {
      val entries = fs.listStatus(dir).toSeq
        .filterNot(st => st.getPath.getName.startsWith("_") ||
          st.getPath.getName.startsWith("."))
      val partDirs = entries.filter(st => st.isDirectory && st.getPath.getName.contains("="))
      if (partDirs.isEmpty) { if (rel.isEmpty) Seq.empty else Seq(rel) }
      else {
        val strays = entries.filterNot(partDirs.contains)
        require(strays.isEmpty,
          s"mixed layout under $dir: found " +
            strays.map(st => (if (st.isFile) "file " else "dir ") + st.getPath.getName)
              .mkString(", ") +
            " alongside key=value partition directories — such entries would" +
            " be silently omitted from the compacted copy; clean the layout" +
            " or compact that directory separately")
        partDirs.flatMap { st =>
          val name = st.getPath.getName
          go(st.getPath, if (rel.isEmpty) name else s"$rel/$name")
        }
      }
    }
    go(p, "").sorted
  }

  /** Run `f` over `items` with at most `parallelism` in flight — the fleet
    * compactor's bound (one rewrite's bytes per slot, never the table's). */
  private def runBounded[A, B](items: Seq[A], parallelism: Int)(f: A => B): Seq[B] =
    if (parallelism <= 1) items.map(f)
    else {
      import scala.concurrent.{Await, ExecutionContext, Future}
      import scala.concurrent.duration.Duration
      val pool = java.util.concurrent.Executors.newFixedThreadPool(parallelism)
      implicit val ec: ExecutionContext = ExecutionContext.fromExecutorService(pool)
      try Await.result(Future.traverse(items)(a => Future(f(a))), Duration.Inf)
      finally pool.shutdown()
    }

  /** Per-partition compaction of a Hive-partitioned dataset (`key=value`
    * dirs, nested to any depth): each LEAF partition directory is compacted
    * INDEPENDENTLY into the same relative layout under `outDir` — the shape
    * the 100 TB claim requires, because a fleet-scale compactor must never
    * hold more than one partition's bytes in a single rewrite, must be able
    * to run on just the partitions a sink touched tonight, and must leave
    * every untouched partition's files (and manifest) alone. Each leaf gets
    * its own manifest, so idempotence and drift re-compaction are per-leaf
    * too: re-running after one partition received new data rewrites ONLY
    * that partition (`skipped` everywhere else). `parallelism` bounds how
    * many leaf rewrites run concurrently (default 1 — the single-runner
    * nightly; a fleet driver raises it to its memory budget).
    *
    * After the per-leaf pass, a DATASET-LEVEL rollup manifest lands at
    * `outDir`: the SUM of the leaf manifests — exact, by the fingerprint's
    * additivity over the disjoint leaves — so a consumer can verify the
    * whole table's provenance from sidecars alone, without rescanning any
    * partition (VERDICT r14 next #6). Returns per-leaf stats keyed by the
    * relative `key=value[/…]` path.
    */
  def compactPartitioned(spark: SparkSession, inDir: String, outDir: String,
                         targetFileBytes: Long,
                         sortCol: Option[String] = None,
                         parallelism: Int = 1,
                         partitions: Option[Seq[String]] = None): Map[String, CompactionStats] = {
    requireDisjoint(spark, inDir, outDir)
    val parts = partitions match {
      case None => leafPartitionDirs(spark, inDir)
      case Some(sel) => validateSubset(spark, inDir, sel)
    }
    require(parts.nonEmpty, s"$inDir has no key=value partition directories")
    // Subset mode updates the rollup incrementally: capture the touched
    // leaves' OLD manifests before the rewrites replace them.
    val oldLeaf: Map[String, ArtifactManifest.Manifest] =
      if (partitions.isEmpty) Map.empty
      else parts.flatMap(part =>
        ArtifactManifest.read(s"$outDir/$part", spark).map(part -> _)).toMap
    val stats = runBounded(parts, parallelism) { part =>
      part -> compact(spark, s"$inDir/$part", s"$outDir/$part",
        targetFileBytes, sortCol)
    }
    val newLeaf = parts.map { part =>
      ArtifactManifest.read(s"$outDir/$part", spark).getOrElse(
        throw new IllegalStateException(s"leaf $part compacted but has no manifest"))
    }
    // Rollup manifest at outDir — exact by the fingerprint's additivity
    // over disjoint leaves, never a data rescan. Full runs sum the leaf
    // manifests; subset runs adjust the prior rollup by the touched
    // leaves' delta (subtract old contributions, add new — VERDICT r15
    // #6: "tonight's touched partitions" must not enumerate the fleet),
    // falling back to a full sidecar sum when no prior rollup exists.
    (partitions, ArtifactManifest.read(outDir, spark)) match {
      case (Some(_), Some(roll)) =>
        ArtifactManifest.writeValues(outDir,
          roll.nRows - oldLeaf.values.map(_.nRows).sum + newLeaf.map(_.nRows).sum,
          roll.inputHash - oldLeaf.values.map(_.inputHash).sum + newLeaf.map(_.inputHash).sum,
          spark)
      case (Some(_), None) =>
        val all = leafPartitionDirs(spark, outDir)
        val ms = all.map { part =>
          ArtifactManifest.read(s"$outDir/$part", spark).getOrElse(
            throw new IllegalStateException(
              s"subset compaction with no prior rollup: leaf $part at $outDir" +
                " has no manifest to sum — run a full compactPartitioned first"))
        }
        ArtifactManifest.writeValues(outDir,
          ms.map(_.nRows).sum, ms.map(_.inputHash).sum, spark)
      case (None, _) =>
        ArtifactManifest.writeValues(outDir,
          newLeaf.map(_.nRows).sum, newLeaf.map(_.inputHash).sum, spark)
    }
    stats.toMap
  }

  /** Validate an explicit partition subset without traversing the rest of
    * the layout (the point of subset mode at fleet scale): each entry must
    * be a relative `key=value[/key=value…]` path to an EXISTING LEAF
    * directory under `inDir`. */
  private def validateSubset(spark: SparkSession, inDir: String,
                             sel: Seq[String]): Seq[String] = {
    require(sel.nonEmpty, "subset compaction: empty partition list")
    val conf = spark.sparkContext.hadoopConfiguration
    // Normalize BEFORE dedup (ADVICE r16): "grp=2" and "grp=2/" name the
    // same leaf — a raw-string distinct would keep both, compacting the
    // leaf twice (possibly concurrently under `parallelism`, racing
    // in-place rewrites) and double-counting its delta in the incremental
    // rollup.
    val normalized = sel.map(_.split("/").filter(_.nonEmpty).mkString("/"))
    normalized.distinct.map { rel =>
      require(rel.nonEmpty && rel.split("/").forall(seg =>
        seg.contains("=") && !seg.startsWith("_") && !seg.startsWith(".")),
        s"subset partition '$rel' is not a relative key=value[/key=value…] path")
      val p = new Path(s"$inDir/$rel")
      val fs = p.getFileSystem(conf)
      require(fs.exists(p) && fs.getFileStatus(p).isDirectory,
        s"subset partition '$rel' does not exist under $inDir")
      val kids = fs.listStatus(p).toSeq
        .filter(st => st.isDirectory && st.getPath.getName.contains("="))
      require(kids.isEmpty,
        s"subset partition '$rel' is not a leaf: it has key=value children " +
          kids.map(_.getPath.getName).mkString(", "))
      rel
    }
  }
}
