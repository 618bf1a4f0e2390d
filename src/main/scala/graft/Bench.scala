package graft
import java.lang.management.ManagementFactory
import java.util.concurrent.atomic.AtomicLong

import scala.jdk.CollectionConverters._

import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import org.apache.spark.sql.SparkSession

/** Per-task telemetry accumulator (r8 verdict #1: a contaminated host run —
  * 558 s driver vs 184 s verified same-code — was indistinguishable from a
  * regression in the JSON artifact alone; the adjudication needed a manual
  * re-run). Counters are cumulative; Bench snapshots them around each timed
  * action (after draining the async listener bus) so every query row carries
  * its own GC / spill / peak-execution-memory numbers. A 12x wall-time
  * outlier with proportional gc_ms is host memory pressure; one with flat
  * gc_ms is a real plan change.
  */
private final class BenchTelemetryListener extends SparkListener {
  val taskGcMs = new AtomicLong // sum of per-task JVM GC time (ms)
  val taskRunMs = new AtomicLong // sum of executor run time (ms)
  val taskCpuMs = new AtomicLong // sum of executor ON-CPU time (ns -> ms)
  val taskSchedMs = new AtomicLong // sum of per-task scheduler delay (ms)
  val nTasks = new AtomicLong // task count
  val spillBytes = new AtomicLong // memory + disk spill
  private val windowPeak = new AtomicLong // max per-task peakExecutionMemory
  override def onTaskEnd(te: SparkListenerTaskEnd): Unit = {
    val m = te.taskMetrics
    if (m != null) {
      nTasks.incrementAndGet()
      taskGcMs.addAndGet(m.jvmGCTime)
      taskRunMs.addAndGet(m.executorRunTime)
      // executorCpuTime is the thread's actual ON-CPU nanoseconds; run time
      // is task wall. run >> cpu with flat GC = the thread existed but was
      // not scheduled — host CPU starvation, the r9 driver-outlier signature
      // (q_curation 50.8 s, gc 134 ms) that gc-only telemetry called clean.
      taskCpuMs.addAndGet(m.executorCpuTime / 1000000L)
      spillBytes.addAndGet(m.memoryBytesSpilled + m.diskBytesSpilled)
      windowPeak.accumulateAndGet(m.peakExecutionMemory, (a, b) => math.max(a, b))
      val info = te.taskInfo
      if (info != null) {
        val sched = info.duration - m.executorRunTime -
          m.executorDeserializeTime - m.resultSerializationTime
        taskSchedMs.addAndGet(math.max(0L, sched))
      }
    }
  }
  def resetPeak(): Unit = windowPeak.set(0L)
  def peakExecMem: Long = windowPeak.get
}

object Bench {
  /** Whole-JVM GC ms from the collector MX beans. In local mode the driver
    * and executors share one JVM, so this also captures GC landing between
    * tasks (planning, broadcast build, collect) that per-task jvmGCTime
    * misses — it is the primary contamination signal.
    */
  private def jvmGcMs: Long =
    ManagementFactory.getGarbageCollectorMXBeans.asScala
      .map(_.getCollectionTime.max(0L)).sum

  /** Host-steal CPU ms from `/proc/stat` (field 8, jiffies at USER_HZ=100):
    * time the hypervisor ran OTHER tenants while this guest's vCPUs were
    * runnable. On a contended virtualized host the stolen ticks land inside
    * guest thread CPU accounting, so `cpu_ms` itself inflates — same code,
    * same data, N× the measured "on-CPU" time — which no GC or task/cpu
    * ratio rule can catch (r9's manual q_curation adjudication; measured
    * again r10: q_winnow 0.8 → 11.3 cpu-s, 3 identical tasks, zero GC,
    * while this counter advanced in step). Returns -1 when the file is
    * unreadable (non-Linux / masked procfs) so diag can say "no signal"
    * instead of "no steal".
    */
  private def hostStealMs: Long =
    try {
      val src = scala.io.Source.fromFile("/proc/stat")
      try {
        val toks = src.getLines().next().trim.split("\\s+")
        if (toks.length > 8 && toks(0) == "cpu") toks(8).toLong * 10L else -1L
      } finally src.close()
    } catch { case _: Exception => -1L }

  @volatile private var canarySink = 0L

  /** Host-speed canary: wall time of a FIXED single-thread arithmetic spin
    * (best of 3), microseconds. Run after each query, it measures how fast
    * this host executes a constant instruction stream at that moment —
    * independent of any query's code. Needed because neighbor contention
    * on a shared host can inflate cycles-per-instruction (memory-bandwidth
    * squeeze, frequency drop) without EITHER counter moving: a contended
    * r10 run measured q_bm25 at 19× its committed CPU time with 110 ms of
    * steal and flat GC — real cycles burned stalled, invisible to
    * steal/GC/task-ratio rules, while the canary inflates in step. Best-of-3
    * filters the probe thread's own descheduling; the spin is long enough
    * (~5 ms healthy) to average over scheduler jitter and short enough to
    * cost <1% of a full run.
    */
  private def canaryUs: Long = {
    var best = Long.MaxValue
    var i = 0
    while (i < 3) {
      val t0 = System.nanoTime()
      var s = 0L
      var j = 0
      while (j < 8000000) { s += j.toLong * j; j += 1 }
      canarySink = s // defeat dead-code elimination
      val d = System.nanoTime() - t0
      if (d < best) best = d
      i += 1
    }
    best / 1000L
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    // Default = the host's cores capped at the contract's local[32]; the
    // env override exists for thread-count experiments. A fixed literal
    // default here is a landmine: if the launcher does not export
    // SPARK_GRAFT_CPUS, the recorded round silently benches a different
    // machine shape than the committed gate artifact.
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      math.min(Runtime.getRuntime.availableProcessors, 32).toString)
    // Decouple partition count from thread count for sizing experiments
    // (at 10x+ data the fixed cpus-sized partitions spill; more partitions
    // with the SAME thread count shrinks each sort's working set, where
    // more threads would just oversubscribe the cores). Driver never sets
    // it, so recorded rounds keep partitions = cpus.
    val shufflePartitions =
      sys.env.getOrElse("SPARK_GRAFT_SHUFFLE_PARTITIONS", cpus)
    val spark = ClusterMode.configure(SparkSession.builder(), s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", shufflePartitions)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.ansi.enabled", "false") // F13: null on parse failure
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val stealRunStart = hostStealMs
    val telemetry = new BenchTelemetryListener
    spark.sparkContext.addSparkListener(telemetry)
    // Warm the JVM/session before timing: codegen + shuffle machinery +
    // parquet reader init otherwise land entirely on whichever query the
    // Map iterates first (~5s of one-time cost misattributed to it).
    // Generic operator machinery only — never the benchmark queries
    // themselves: aggregate codegen, parquet reader, WindowExec, broadcast
    // hash join, and the Scala-UDF eval path each compile distinct
    // generated-code shapes on first touch.
    spark.range(0, 2000000).selectExpr("sum(id * 2)").collect()
    spark.read.parquet(s"$sfDir/nation.parquet").groupBy("n_regionkey").count().collect()
    locally {
      import org.apache.spark.sql.expressions.Window
      import org.apache.spark.sql.functions._
      val tiny = spark.range(0, 1000).toDF("id")
      tiny.withColumn("rn", row_number().over(Window.orderBy(col("id"))))
        .agg(sum(col("rn"))).collect()
      tiny.join(broadcast(spark.range(0, 100).toDF("id")), "id").count()
      val warmUdf = udf((s: String) => if (s == null) "" else s.trim)
      tiny.select(warmUdf(col("id").cast("string"))).agg(count(lit(1))).collect()
    }
    // JIT-compile the canary spin before any timed use, then record the
    // run-start host speed as the reference the per-query values divide by.
    (1 to 5).foreach(_ => canaryUs)
    val canaryBaselineUs = canaryUs
    // Dev-only subset filter (mirrors Verify's SPARK_GRAFT_ONLY): iterate on
    // one query's timing without paying for the full suite. The driver never
    // sets it, so recorded BENCH rounds always cover everything.
    val only = sys.env.get("SPARK_GRAFT_ONLY")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSet)
    // Complement filter for scale sweeps (exclude the documented
    // brute-force anchors at sf1 instead of enumerating ~150 keepers).
    // Like ONLY, the driver never sets it.
    val skip = sys.env.get("SPARK_GRAFT_SKIP")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSet)
      .getOrElse(Set.empty[String])
    val selected = (only match {
      case Some(f) => SparkEntry.queries.filter { case (n, _) => f(n) }
      case None => SparkEntry.queries
    }).filter { case (n, _) => !skip(n) }
    // Fixed (family, name) order (r5 verdict: Map iteration was
    // hash-dependent, so warm-cache attribution shifted whenever the query
    // set changed; a deterministic order makes round-over-round per-query
    // comparison meaningful).
    // Cache hygiene at FAMILY boundaries: queries that share a build-once
    // artifact run contiguously (ordered by (family, name) — deterministic)
    // and the cache is dropped at each family boundary, so no query
    // inherits 173 predecessors' storage. Within a family the sharing is
    // the designed materialized-view behavior. Without boundary clearing
    // the r5 driver run measured q_dedup_jaccard at 4x its isolated cost
    // (accumulated caches squeezing the execution pool into GC/spill);
    // clearing before EVERY query instead costs +16 s of shared-artifact
    // rebuilds (measured). Families are name prefixes (q_dim_* share the
    // warehouse dims, q_dedup_* the LSH pair memo, q_ann_* the codebooks)
    // except the explicit warehouse-consumer group, whose members are
    // alphabetically scattered but all call Warehouse.build.
    val warehouseFamily = Set(
      "q_fato_vendas", "q_fato_vendas_v2", "q_report_summary", "q_stream_fato")
    // the graph queries share the memoized co-purchase pair artifact
    // (SparkEntry.copurchasePairsArtifact) — one contiguous cache window
    val graphFamily = Set("q_cooccur_lift", "q_triangle_count", "q_label_prop",
      "q_label_prop_loop", "q_pagerank", "q_pagerank_step", "q_item_neighbors",
      "q_degree_dist", "q_link_predict")
    // q_split_leakage_safe consumes the memoized LSH pair artifact (its CC
    // runs over it) — outside the q_dedup window the boundary clearCache
    // forced a silent in-query LSH rebuild whose cost varied 75–213 s of
    // task_ms at sf1 with shuffle-stage-reuse luck (the r14 executor-scaling
    // probes' one unstable query). Artifact-sharers run contiguously.
    val lshFamily = Set("q_split_leakage_safe")
    def family(n: String): String =
      if (warehouseFamily(n)) "q_dim" // runs with the dim queries' window
      else if (graphFamily(n)) "q_cooccur"
      else if (lshFamily(n)) "q_dedup"
      else n.split("_").take(2).mkString("_")
    val ordered = selected.toSeq.sortBy { case (n, _) => (family(n), n) }
    val failed = scala.collection.mutable.ListBuffer.empty[String]
    // Per timed action: gc_ms is the whole-JVM MX-bean delta (primary
    // contamination signal), task_gc_ms the drained per-task jvmGCTime sum
    // (GC landing inside task execution specifically), task_ms the summed
    // executor run (wall) time, cpu_ms the summed ON-CPU time, sched_ms the
    // summed scheduler delay, n_tasks the task count. task_ms >> cpu_ms
    // with flat GC is host CPU starvation (r10, VERDICT r9 #4).
    final case class Tele(gcMs: Long, taskGcMs: Long, taskMs: Long,
                          cpuMs: Long, schedMs: Long, nTasks: Long,
                          spillMb: Long, peakMb: Long, stealMs: Long,
                          canaryUs: Long)
    val telemetryRows =
      scala.collection.mutable.LinkedHashMap.empty[String, Tele]
    def drain(): Unit =
      org.apache.spark.graftbench.BusAccess.drain(spark.sparkContext)
    /** Time one action with telemetry attribution. Returns elapsed seconds,
      * or None if the action threw (telemetry row still recorded — a crash
      * under memory pressure should be diagnosable too).
      */
    def timed(name: String)(body: => Unit): Option[Double] = {
      drain()
      telemetry.resetPeak()
      val gc0 = jvmGcMs
      val tgc0 = telemetry.taskGcMs.get
      val run0 = telemetry.taskRunMs.get
      val cpu0 = telemetry.taskCpuMs.get
      val sched0 = telemetry.taskSchedMs.get
      val ntask0 = telemetry.nTasks.get
      val spill0 = telemetry.spillBytes.get
      val steal0 = hostStealMs
      val t0 = System.nanoTime()
      val ok =
        try { body; true } catch {
          case e: Throwable =>
            // A crashing query must FAIL the bench (r5 verdict: swallowing
            // it records a near-zero time — a regression would improve the
            // headline). Record, report, and exit nonzero below.
            failed += name
            System.err.println(
              s"[bench] $name FAILED: ${e.getClass.getName}: ${e.getMessage}")
            false
        }
      val sec = (System.nanoTime() - t0) / 1e9
      drain()
      telemetryRows(name) = Tele(
        jvmGcMs - gc0,
        telemetry.taskGcMs.get - tgc0,
        telemetry.taskRunMs.get - run0,
        telemetry.taskCpuMs.get - cpu0,
        telemetry.taskSchedMs.get - sched0,
        telemetry.nTasks.get - ntask0,
        (telemetry.spillBytes.get - spill0) >> 20,
        telemetry.peakExecMem >> 20,
        { val s1 = hostStealMs; if (steal0 < 0 || s1 < 0) -1L else s1 - steal0 },
        canaryUs)
      if (ok) Some(sec) else None
    }
    // Shared-artifact builds are timed as their own `artifact:*` entries at
    // the opening of the family window that consumes them (r7 verdict #2:
    // letting the family's first query absorb the build made any artifact
    // change read as a q_cooccur_lift regression). They count toward the
    // headline total — the suite really pays them — but live in a separate
    // "artifacts" JSON object so per-query times stay comparable.
    val artifactFamily = Map(
      "artifact:copurchase_pairs" -> "q_cooccur",
      "artifact:lsh_pairs" -> "q_dedup",
      "artifact:fixedk_centroids" -> "q_ann",
      // on-disk trained artifacts (VERDICT r12 #5): built once at the FIRST
      // consuming family's window (the path memo survives cache clears, so
      // q_tokenize_artifact later reuses the q_pack-window build); the
      // consuming queries pay only manifest-check + serve
      "artifact:ivfpq_index" -> "q_ann",
      "artifact:bpe_vocab" -> "q_pack")
    val artifactTimes = scala.collection.mutable.LinkedHashMap.empty[String, Double]
    // Heap attribution (VERDICT r11 #7: end-of-run heap doubled round-over-
    // round, unexplained): one unforced heap sample at each family-window
    // boundary — the per-family deltas name WHERE retention grows, at the
    // cost of one Runtime call, no GC, no wall inflation.
    val familyHeap = scala.collection.mutable.LinkedHashMap.empty[String, Long]
    var prevFamily = ""
    val results = ordered.map { case (name, fn) =>
      if (family(name) != prevFamily) {
        spark.catalog.clearCache()
        familyHeap(family(name)) =
          (Runtime.getRuntime.totalMemory - Runtime.getRuntime.freeMemory) >> 20
        artifactFamily.toSeq.sortBy(_._1)
          .filter { case (_, af) => af == family(name) }
          .foreach { case (an, _) =>
            timed(an) { SparkEntry.artifacts(an)(spark, sfDir) }
              .foreach(sec => artifactTimes(an) = sec)
          }
      }
      prevFamily = family(name)
      // elapsed-until-crash is not a query time: persist null for failed
      // queries and keep them out of the total, so BENCH_LOCAL.json never
      // mixes failure times into round-over-round comparison (ADVICE r6)
      name -> timed(name) { fn(spark, sfDir).count(): Unit }
    }
    // The harness records only the last ~2000 chars of output. Per-query
    // times are rounded to 3 decimals to keep the line short, and the
    // headline metric/value go LAST so that even if the line's head is
    // truncated by that window, the total is still visible.
    def r3(v: Double): String = f"$v%.3f"
    val qs = results.map { case (k, v) =>
        s"\"" + k + "\":" + v.map(r3).getOrElse("null")
      }.mkString("{", ",", "}")
    val arts = artifactTimes.map { case (k, v) => s"\"" + k + "\":" + r3(v) }
      .mkString("{", ",", "}")
    // Telemetry lives in its own parallel map so existing consumers of
    // "queries" (round-over-round diffing) keep a flat name->sec shape.
    val tele = telemetryRows.map { case (k, t) =>
        s"\"$k\":{\"gc_ms\":${t.gcMs},\"task_gc_ms\":${t.taskGcMs},\"task_ms\":${t.taskMs}," +
          s"\"cpu_ms\":${t.cpuMs},\"sched_ms\":${t.schedMs},\"n_tasks\":${t.nTasks}," +
          s"\"spill_mb\":${t.spillMb},\"peak_exec_mem_mb\":${t.peakMb},\"steal_ms\":${t.stealMs}," +
          s"\"canary_us\":${t.canaryUs}}"
      }.mkString("{", ",", "}")
    val heapUsedMb =
      (Runtime.getRuntime.totalMemory - Runtime.getRuntime.freeMemory) >> 20
    // Forced-GC live-set sample, AFTER all timed work: heap_used_mb minus
    // this is garbage a collection would reclaim (benign); heap_live_mb
    // growing round-over-round is real retention worth chasing.
    val heapLiveMb = {
      System.gc(); Thread.sleep(200); System.gc()
      (Runtime.getRuntime.totalMemory - Runtime.getRuntime.freeMemory) >> 20
    }
    val famHeapJson = familyHeap.map { case (k, v) => s"\"$k\":$v" }
      .mkString("{", ",", "}")
    val artifactSec = artifactTimes.values.sum
    val total = results.flatMap(_._2).sum + artifactSec
    val failedJson = failed.map("\"" + _ + "\"").mkString("[", ",", "]")
    // A run is the ROUND-GATE artifact only when it covers the full suite at
    // the default sf with the default partitioning — ONLY/SKIP subsets, a
    // non-default sfDir (scale probes) or a partition-sizing override go to
    // BENCH_SUBSET.json so a dev iteration can never clobber BENCH_LOCAL
    // .json (r9: a 7-query sf1 anchor run at d71901c shadowed the committed
    // 167 s / 187 full-suite gate artifact; later a 3-query adjudication run
    // shadowed that).
    val isFullRun = only.isEmpty && skip.isEmpty &&
      sfDir == "/root/testdata/sf0.1" && shufflePartitions == cpus &&
      ClusterMode.master(s"local[$cpus]") == s"local[$cpus]"
    val stealRunTotal = {
      val s1 = hostStealMs
      if (stealRunStart < 0 || s1 < 0) -1L else s1 - stealRunStart
    }
    // Field ORDER is part of the contract (VERDICT r12 #3): the driver's
    // harness records only the last ~2000 chars of stdout, so the big maps
    // (telemetry, queries, family_heap_mb) go FIRST and a compact
    // self-adjudication block — steal total, canary baseline, top-15
    // slowest per-query walls — goes LAST, right before the headline, so a
    // truncated tail still carries everything a driver-vs-local
    // adjudication needs (BENCH_r12's tail was all family_heap_mb; the r12
    // round had to estimate the host factor from the local artifact).
    val slowest = results.collect { case (n, Some(sec)) => n -> sec }
      .sortBy(-_._2).take(15)
      .map { case (n, sec) => s"\"$n\":${r3(sec)}" }.mkString("{", ",", "}")
    val line =
      s"""{"telemetry":$tele,"queries":$qs,"family_heap_mb":$famHeapJson,"artifacts":$arts,"artifact_sec":${r3(artifactSec)},"jvm_gc_total_ms":$jvmGcMs,"heap_used_mb":$heapUsedMb,"heap_live_mb":$heapLiveMb,"sf":"$sfDir","cpus":$cpus,"full_suite":$isFullRun,"n_queries":${results.size},"failed":$failedJson,"host_steal_total_ms":$stealRunTotal,"canary_baseline_us":$canaryBaselineUs,"slowest":$slowest,"metric":"total","unit":"sec","value":${r3(total)}}"""
    // Also persist the full result next to the build (harness tail keeps
    // only ~2000 chars of stdout; the file preserves every per-query time).
    // Anchored to the JVM working directory explicitly, and a write failure
    // is reported rather than silently dropped (ADVICE r4).
    val benchOut = java.nio.file.Paths.get(sys.props("user.dir"),
      if (isFullRun) "BENCH_LOCAL.json" else "BENCH_SUBSET.json")
    try java.nio.file.Files.write(benchOut, line.getBytes("UTF-8"))
    catch { case e: Exception =>
      System.err.println(s"warning: could not persist $benchOut: $e") }
    println(line)
    spark.stop()
    if (failed.nonEmpty) sys.exit(1)
  }
}
