package graft

import java.nio.file.{Files, Path}
import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.streaming.{OutputMode, StreamingQueryProgress, Trigger}

import graft.streaming.EventsStream
import graft.streaming.EventsStream.Ev

/** State-store-provider independence (SURVEY §8.5 streaming): at 100 TB
  * keyspaces the default HDFS-backed provider is an executor-OOM wall —
  * every state partition's map lives ON HEAP — and the production backend
  * is `RocksDBStateStoreProvider` (off-heap/on-disk state, bounded memory,
  * changelog checkpointing). These specs prove the engine's stateful
  * streaming operators are provider-agnostic: identical results under
  * RocksDB and the default provider for each stateful-operator class —
  * windowed aggregation, bounded-watermark dedup, stream-stream interval
  * join (left-outer eviction semantics), and custom
  * flatMapGroupsWithState sessionization — with RocksDB engagement
  * asserted POSITIVELY from the query's own state-operator metrics, not
  * assumed from the conf. The provider is a per-query session conf, so
  * [[EventsStream.runToCompletion]]'s conf-copy carries it from the
  * caller's session unchanged (last spec).
  */
class RocksDbStateSpec extends SparkSpec {

  private val RocksProvider =
    "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"

  private def ts(s: String): Timestamp = Timestamp.valueOf(s)

  private def writeEventsFile(dir: Path, name: String, modTime: Long,
                              evs: Seq[Ev]): Unit = {
    import spark.implicits._
    val tmp = Files.createTempDirectory("rocksev").toFile
    evs.toDS().toDF().coalesce(1).write.mode("overwrite").parquet(tmp.getAbsolutePath)
    val part = tmp.listFiles().filter(_.getName.endsWith(".parquet")).head
    val dest = dir.resolve(name).toFile
    java.nio.file.Files.copy(part.toPath, dest.toPath)
    assert(dest.setLastModified(modTime))
  }

  /** Three files → three micro-batches (maxFilesPerTrigger=1), so state is
    * written by one batch and read back by the next — the round trip that
    * actually exercises the store. The 14:00 tail advances the watermark
    * (2 h delay → 12:00) far enough to close sessions, evict join state,
    * and emit append-mode results.
    */
  private lazy val eventsDir: Path = {
    val dir = Files.createTempDirectory("rocks_events")
    writeEventsFile(dir, "f1.parquet", 1000000L, Seq(
      Ev(1, ts("2024-01-01 10:00:00"), 1L, "view", 1.0),
      Ev(2, ts("2024-01-01 10:05:00"), 1L, "purchase", 20.0),
      Ev(3, ts("2024-01-01 10:10:00"), 2L, "view", 1.5),
      Ev(4, ts("2024-01-01 10:30:00"), 3L, "purchase", 7.0)))
    writeEventsFile(dir, "f2.parquet", 2000000L, Seq(
      Ev(5, ts("2024-01-01 11:00:00"), 2L, "purchase", 12.0),
      Ev(6, ts("2024-01-01 11:00:30"), 2L, "purchase", 12.0), // same minute: dedup key dup
      Ev(7, ts("2024-01-01 11:20:00"), 1L, "view", 2.0),
      Ev(8, ts("2024-01-01 11:40:00"), 4L, "view", 3.0)))
    writeEventsFile(dir, "f3.parquet", 3000000L, Seq(
      Ev(9, ts("2024-01-01 14:00:00"), 4L, "purchase", 5.0)))
    dir
  }

  /** Run `build` to completion on a fresh session clone with the given
    * state-store provider, returning the sink rows (rendered) and the
    * per-batch progress for metric assertions.
    */
  private def run(name: String, mode: OutputMode, provider: Option[String])
                 (build: SparkSession => DataFrame): (Seq[String], Seq[StreamingQueryProgress]) = {
    val s = spark.newSession()
    spark.conf.getAll.foreach { case (k, v) =>
      try s.conf.set(k, v) catch { case _: Exception => () }
    }
    s.conf.set("spark.sql.shuffle.partitions", "4")
    provider.foreach(p =>
      s.conf.set("spark.sql.streaming.stateStore.providerClass", p))
    val q = build(s).writeStream
      .format("memory").queryName(name)
      .outputMode(mode)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    (s.table(name).collect().toSeq.map(_.toString).sorted,
      q.recentProgress.toSeq)
  }

  private def parity(tag: String, mode: OutputMode)
                    (build: SparkSession => DataFrame): Seq[StreamingQueryProgress] = {
    val (defRows, _) = run(s"${tag}_default", mode, None)(build)
    val (rockRows, prog) = run(s"${tag}_rocksdb", mode, Some(RocksProvider))(build)
    assert(defRows.nonEmpty, s"$tag produced no rows — parity would be vacuous")
    assert(rockRows === defRows)
    prog
  }

  /** Positive engagement proof: the state operator's custom metrics are
    * provider-specific — the RocksDB provider reports rocksdb* counters the
    * default provider does not have. If the conf silently failed to apply
    * (typo'd class, static conf), this is what catches it.
    */
  private def assertRocksEngaged(prog: Seq[StreamingQueryProgress]): Unit = {
    import scala.jdk.CollectionConverters._
    val keys = prog.flatMap(_.stateOperators.toSeq)
      .flatMap(_.customMetrics.keySet().asScala)
    assert(keys.exists(_.toLowerCase.contains("rocksdb")),
      s"no rocksdb metric in state operators — provider not engaged (saw: ${keys.distinct.take(8)})")
  }

  test("windowed aggregation: identical under RocksDB, provider engaged") {
    val prog = parity("rocks_hourly", OutputMode.Complete()) { ss =>
      EventsStream.hourlyCounts(
        EventsStream.readEventsStream(ss, eventsDir.toString))
    }
    assertRocksEngaged(prog)
  }

  test("dropDuplicatesWithinWatermark: identical key set under RocksDB") {
    val prog = parity("rocks_dedup", OutputMode.Append()) { ss =>
      EventsStream.streamingDedupWithinWatermark(
        EventsStream.readEventsStream(ss, eventsDir.toString))
    }
    assertRocksEngaged(prog)
  }

  test("stream-stream left-outer interval join: identical under RocksDB") {
    val prog = parity("rocks_join", OutputMode.Append()) { ss =>
      EventsStream.purchaseViewJoinOuter(
        EventsStream.readEventsStream(ss, eventsDir.toString))
    }
    assertRocksEngaged(prog)
  }

  test("flatMapGroupsWithState sessionize: identical under RocksDB") {
    val prog = parity("rocks_sessions", OutputMode.Append()) { ss =>
      import ss.implicits._
      EventsStream.sessionize(
        EventsStream.readEventsStream(ss, eventsDir.toString).as[Ev]).toDF()
    }
    assertRocksEngaged(prog)
  }

  test("runToCompletion carries the provider conf from the caller's session") {
    // The production switch is one conf on the session the caller already
    // has — no operator or harness change. Equality vs the default-provider
    // run through the SAME harness proves the conf-copy path.
    val parent = spark.newSession()
    spark.conf.getAll.foreach { case (k, v) =>
      try parent.conf.set(k, v) catch { case _: Exception => () }
    }
    parent.conf.set("spark.sql.streaming.stateStore.providerClass", RocksProvider)
    def build(ss: SparkSession): DataFrame =
      EventsStream.hourlyCounts(
        EventsStream.readEventsStream(ss, eventsDir.toString))
    val viaHarness = EventsStream.runToCompletion(
      parent, "rocks_harness", OutputMode.Complete())(build)
      .collect().toSeq.map(_.toString).sorted
    val (defRows, _) = run("rocks_harness_def", OutputMode.Complete(), None)(build)
    assert(viaHarness === defRows)
  }
}
