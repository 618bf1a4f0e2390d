package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.streaming.{OutputMode, Trigger}

/** Dev probe: the watermarked streaming dedup (one state row per distinct
  * key) run end-to-end into a DISTRIBUTED parquet sink — the production
  * sink shape — so state-store behavior can be measured at key counts
  * where the oracle harness's driver-side memory sink is itself the
  * bottleneck. Pick the provider with
  * `-Dspark.sql.streaming.stateStore.providerClass=...` via
  * SPARK_GRAFT_EXTRA_JAVA_OPTS.
  *
  * Usage: runMain graft.tools.StateScaleProbe [sfDir] [outDir]
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
    println("[state-probe] provider = " + spark.conf.get(
      "spark.sql.streaming.stateStore.providerClass", "(default HDFSBackedStateStoreProvider)"))
    val ck = java.nio.file.Files.createTempDirectory("state_probe_ck").toString
    val t0 = System.nanoTime()
    val deduped = graft.streaming.EventsStream.streamingDedupWithinWatermark(
      graft.streaming.EventsStream.readEventsStreamNanos(spark, s"$sfDir/events*"))
    val q = deduped.writeStream
      .outputMode(OutputMode.Append())
      .format("parquet")
      .option("path", out)
      .option("checkpointLocation", ck)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    val wall = (System.nanoTime() - t0) / 1e9
    val n = spark.read.parquet(out).count()
    println(f"[state-probe] wall=$wall%.1fs distinct_rows=$n sink=$out")
    spark.stop()
  }
}
