package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.streaming.{OutputMode, Trigger}

/** Diagnostic main: per-micro-batch cost breakdown for the streaming
  * queries, answering "is the q_stream_* time per-row work or fixed
  * micro-batch/state-store tax?" (SURVEY §8 streaming-tax audit).
  *
  * For each audited stream it prints one JSON line per micro-batch with the
  * engine's own `StreamingQueryProgress` numbers: `addBatch` (plan + run
  * the batch), `getBatch`/`latestOffset` (source bookkeeping), `walCommit`
  * + `commitOffsets` (checkpoint log fsyncs), `queryPlanning`, input rows,
  * and per-stateful-operator rows/commit times. Run with
  * `SPARK_GRAFT_SF_DIR=… sbt "runMain graft.StreamAudit"`.
  */
object StreamAudit {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.ansi.enabled", "false")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import streaming.EventsStream

    // memory-sink streams, mirroring EventsStream.runToCompletion (dedicated
    // session clone, 8 state partitions) but keeping the query handle so the
    // progress array is readable after termination
    def audit(name: String, mode: OutputMode)
             (build: SparkSession => DataFrame): Unit = {
      val s = spark.newSession()
      spark.conf.getAll.foreach { case (k, v) =>
        try s.conf.set(k, v) catch { case _: Exception => () }
      }
      s.conf.set("spark.sql.shuffle.partitions", "8")
      val t0 = System.nanoTime()
      val q = build(s).writeStream
        .format("memory").queryName(s"audit_$name")
        .outputMode(mode)
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()
      val wall = (System.nanoTime() - t0) / 1e9
      report(name, wall, q.recentProgress.toSeq)
    }

    def report(name: String, wallSec: Double,
               progress: Seq[org.apache.spark.sql.streaming.StreamingQueryProgress]): Unit = {
      progress.foreach { p =>
        val d = p.durationMs
        def ms(k: String): Long = Option(d.get(k)).map(_.longValue()).getOrElse(0L)
        val state = p.stateOperators.map { so =>
          s"""{"op":"${so.operatorName}","rows":${so.numRowsTotal},""" +
            s""""updateMs":${so.allUpdatesTimeMs},"commitMs":${so.commitTimeMs},""" +
            s""""parts":${so.numShufflePartitions}}"""
        }.mkString("[", ",", "]")
        println(s"""{"stream":"$name","batch":${p.batchId},"rows":${p.numInputRows},""" +
          s""""triggerMs":${ms("triggerExecution")},"addBatchMs":${ms("addBatch")},""" +
          s""""getBatchMs":${ms("getBatch")},"latestOffsetMs":${ms("latestOffset")},""" +
          s""""planMs":${ms("queryPlanning")},"walMs":${ms("walCommit")},""" +
          s""""commitMs":${ms("commitOffsets")},"state":$state}""")
      }
      val batchSum = progress.map(p =>
        Option(p.durationMs.get("triggerExecution")).map(_.longValue()).getOrElse(0L)).sum
      println(s"""{"stream":"$name","wallSec":$wallSec,"nBatches":${progress.size},""" +
        s""""triggerSumMs":$batchSum,"startupOverheadSec":${wallSec - batchSum / 1000.0}}""")
    }

    audit("hourly", OutputMode.Complete()) { ss =>
      EventsStream.hourlyCounts(EventsStream.readEventsStreamNanos(ss, s"$dir/events*"))
    }
    audit("join", OutputMode.Append()) { ss =>
      EventsStream.purchaseViewJoin(EventsStream.readEventsStreamNanos(ss, s"$dir/events*"))
    }
    audit("join_outer", OutputMode.Append()) { ss =>
      EventsStream.purchaseViewJoinOuter(EventsStream.readEventsStreamNanos(ss, s"$dir/events*"))
    }
    audit("session_window", OutputMode.Append()) { ss =>
      EventsStream.sessionWindowAgg(EventsStream.readEventsStreamNanos(ss, s"$dir/events*"))
    }
    audit("cms", OutputMode.Complete()) { ss =>
      EventsStream.cmsRegistersStream(EventsStream.readEventsStreamNanos(ss, s"$dir/events*"))
    }

    // the parquet-sink fact stream (q_stream_fato's dataflow, minus the
    // Warehouse dim build it shares with the batch loader)
    locally {
      val w = Warehouse.build(spark, dir)
      val out = java.nio.file.Files.createTempDirectory("stream_audit_fato")
      val t0 = System.nanoTime()
      val base = dir
      val orders = spark.readStream.schema(streaming.FactStream.ordersSchema)
        .parquet(s"$base/orders*")
      val stream = operators.Fact.fatoVendasNoSk(
        sources.Crm.vendasFrom(orders), sources.Crm.itemVendas(spark, base),
        w.dimTempo, w.dimCliente, w.dimProduto, w.dimVendedor, w.dimLoja)
      val q = stream.writeStream.format("parquet")
        .option("path", s"${out}/data").option("checkpointLocation", s"${out}/ckpt")
        .outputMode(OutputMode.Append()).trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
      report("fato", (System.nanoTime() - t0) / 1e9, q.recentProgress.toSeq)
    }
    spark.stop()
  }
}
