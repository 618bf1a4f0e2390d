package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.streaming.{OutputMode, Trigger}

/** Dev probe: the STATEFUL streaming classes run end-to-end into a
  * DISTRIBUTED parquet sink — the production sink shape — so state-store
  * behavior can be measured at key counts where the oracle harness's
  * driver-side memory sink is itself the bottleneck. Pick the provider with
  * `-Dspark.sql.streaming.stateStore.providerClass=...` via
  * SPARK_GRAFT_EXTRA_JAVA_OPTS.
  *
  * Three modes, one per stateful class with a DISTINCT per-key state shape
  * (VERDICT r10 #3 — the 100M-key heap wall was demonstrated for the
  * watermarked dedup only; the others can hit it differently):
  *  - `dedup`:   streamingDedupWithinWatermark — one bounded state row per
  *               distinct key (the r10 wall: heap OOMs ~100M keys, RocksDB
  *               passes).
  *  - `session`: flatMapGroupsWithState sessionization — one OPEN-SESSION
  *               struct per user, timeout-evicted.
  *  - `join`:    stream-stream interval join (purchase⋈view) — DUAL-SIDED
  *               row buffers keyed by user, watermark-evicted; state holds
  *               whole rows, not aggregates, the heaviest per-key shape.
  *
  * Emits one JSON line with wall, sink rows, and the state-store metrics
  * Spark reports per progress (max total state rows / state memory across
  * the run's micro-batches).
  *
  * `userSalt` (4th arg, default 1) splits every user into `salt` synthetic
  * users (`user_id·salt + event_id%salt`) — session/join state is keyed by
  * USER, and this corpus carries only ~15k users per 1M events, so without
  * the salt the per-key stateful classes never reach the ≥10M-key wall the
  * dedup mode (keyed per EVENT) hits naturally. The salt preserves each
  * synthetic user's event-time ordering (a subsequence of the original
  * user's events), so sessions still form and join intervals still match.
  *
  * Usage: runMain graft.tools.StateScaleProbe [sfDir] [outDir] [mode] [userSalt]
  */
object StateScaleProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    // Append-mode sink: a pre-existing output dir would make this run's
    // final count CUMULATIVE across invocations (each run reprocesses the
    // whole input against a fresh checkpoint) — corrupting exactly the
    // provider A/B this tool exists for. Default to a fresh temp dir;
    // refuse an explicit dir that already exists.
    val out = if (args.length > 1) {
      require(!java.nio.file.Files.exists(java.nio.file.Paths.get(args(1))),
        s"output dir ${args(1)} already exists — appended rows would double-count; remove it first")
      args(1)
    } else java.nio.file.Files.createTempDirectory("state_scale_out").toString
    val mode = if (args.length > 2) args(2) else "dedup"
    val salt = if (args.length > 3) args(3).toInt else 1
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_SHUFFLE_PARTITIONS", cpus))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.ansi.enabled", "false")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val provider = spark.conf.get(
      "spark.sql.streaming.stateStore.providerClass", "(default HDFSBackedStateStoreProvider)")
    println(s"[state-probe] mode = $mode, provider = $provider")
    val ck = java.nio.file.Files.createTempDirectory("state_probe_ck").toString

    import org.apache.spark.sql.functions.{col, lit, pmod}
    def eventsStream = {
      val raw = graft.streaming.EventsStream
        .readEventsStreamNanos(spark, s"$sfDir/events*")
      if (salt <= 1) raw
      else raw.withColumn("user_id",
        col("user_id") * salt + pmod(col("event_id"), lit(salt)))
    }
    val stream: DataFrame = mode match {
      case "dedup" =>
        graft.streaming.EventsStream.streamingDedupWithinWatermark(eventsStream)
      case "session" =>
        import spark.implicits._
        graft.streaming.EventsStream.sessionize(
          eventsStream.as[graft.streaming.EventsStream.Ev]).toDF()
      case "join" =>
        graft.streaming.EventsStream.purchaseViewJoin(eventsStream)
      case other => sys.error(s"unknown mode '$other' (dedup|session|join)")
    }

    // Peak-state accumulation via a listener: q.recentProgress only retains
    // the most recent ~100 progress reports (numRecentProgressUpdates), so
    // reading it after termination under-reports runs with more batches —
    // exactly the long runs this probe exists to measure (ADVICE r11).
    val peakRows = new java.util.concurrent.atomic.AtomicLong(0L)
    val peakMem = new java.util.concurrent.atomic.AtomicLong(0L)
    val nBatches = new java.util.concurrent.atomic.AtomicLong(0L)
    val listener = new org.apache.spark.sql.streaming.StreamingQueryListener {
      import org.apache.spark.sql.streaming.StreamingQueryListener._
      override def onQueryStarted(e: QueryStartedEvent): Unit = ()
      override def onQueryProgress(e: QueryProgressEvent): Unit = {
        nBatches.incrementAndGet()
        e.progress.stateOperators.foreach { so =>
          peakRows.getAndAccumulate(so.numRowsTotal, Math.max(_, _))
          peakMem.getAndAccumulate(so.memoryUsedBytes, Math.max(_, _))
        }
      }
      override def onQueryTerminated(e: QueryTerminatedEvent): Unit = ()
    }
    spark.streams.addListener(listener)

    val t0 = System.nanoTime()
    val q = stream.writeStream
      .outputMode(OutputMode.Append())
      .format("parquet")
      .option("path", out)
      .option("checkpointLocation", ck)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    val wall = (System.nanoTime() - t0) / 1e9
    // Listener delivery is async — the parquet count below gives the bus
    // ample time to drain; still union with recentProgress (bounded, but
    // covers any straggler events) so the reported max can only be ≥ either
    // source alone.
    val n = spark.read.parquet(out).count()
    spark.streams.removeListener(listener)
    val progresses = q.recentProgress.toSeq
    val stateRows = (progresses.flatMap(_.stateOperators.map(_.numRowsTotal)) :+ peakRows.get).max
    val stateMem = (progresses.flatMap(_.stateOperators.map(_.memoryUsedBytes)) :+ peakMem.get).max
    val json =
      s"""{"metric":"state_scale","mode":"$mode","provider":"${provider.split('.').last}",""" +
      s""""sf_dir":"$sfDir","wall_sec":${f"$wall%.1f"},"sink_rows":$n,""" +
      s""""n_batches":${Math.max(nBatches.get, progresses.length)},""" +
      s""""max_state_rows":$stateRows,""" +
      s""""max_state_mem_mb":${f"${stateMem / 1e6}%.1f"}}"""
    println(json)
    spark.stop()
  }
}
