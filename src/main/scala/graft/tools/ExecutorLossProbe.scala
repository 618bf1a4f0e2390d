package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev probe: executor-LOSS drill for the reliable-checkpoint paths
  * (VERDICT r12 #6). IterState and the sliced backfill claim "state
  * survives executor loss", but through r12 that claim was only exercised
  * by SIGKILLing the whole process. Under a local-cluster master this
  * probe kills ONE executor JVM mid-computation and pins that the job
  * either completes with results bit-identical to an unkilled control, or
  * fails loudly and a RERUN completes from the committed state — never
  * silently wrong.
  *
  * Modes:
  *  - `pagerank`: Graph.pagerank(maxIter=8, reliable checkpointDir) on the
  *    directed customer→order graph. Control run first (same session,
  *    checksum over quantized ranks), then the drill run with a killer
  *    thread that SIGKILLs one CoarseGrainedExecutorBackend process at
  *    ~40% of the control wall. Spark retries the lost tasks on the
  *    surviving/relaunched executor; lineage re-opens the last round's
  *    parquet from disk.
  *  - `backfill`: Fact.backfillSlices(nSlices=4) into a fresh sink; the
  *    killer fires 1 s after slice 0 commits (mid-slice-1 by
  *    construction). If the run crashes, the probe reruns backfillSlices
  *    on the SAME outDir — the `_SUCCESS` manifests must make the rerun
  *    complete exactly the missing slices. Checksums compare against a
  *    clean control sink.
  *
  *  - `stream` (r15): the streaming LSH artifact refresh
  *    (ArtifactRefresh.refreshFromStream) with an executor SIGKILLed
  *    mid-stream. Either the micro-batch's tasks retry on the surviving
  *    executor and the run completes, or the query crashes and a RESTART
  *    on the SAME checkpoint re-delivers the torn batch — the
  *    batchId-keyed fold (IdempotentFold) must converge to pair set /
  *    artifact tables / manifest identical to an unkilled control.
  *
  * Requires a multi-JVM master: set SPARK_GRAFT_MASTER (defaults here to
  * local-cluster[2,8,4096] — in local[N] there is no executor process to
  * kill and the probe aborts).
  *
  * Usage: runMain graft.tools.ExecutorLossProbe <sfDir> <pagerank|backfill|stream>
  */
object ExecutorLossProbe {
  /** Executor JVMs belonging to THIS application only: a bare
    * `pgrep -f CoarseGrainedExecutorBackend` matches every executor on
    * the host, so a concurrent Spark job (parallel bench, another drill)
    * could have ITS executor SIGKILLed by this probe. The backend's
    * launch command carries `--app-id <applicationId>`, so filtering the
    * candidate pids by /proc/<pid>/cmdline scopes the kill to us. */
  private def executorPids(appId: String): Seq[Long] = {
    val p = new ProcessBuilder("pgrep", "-f", "CoarseGrainedExecutorBackend").start()
    val out = new String(p.getInputStream.readAllBytes(), "UTF-8")
    p.waitFor()
    out.split("\\s+").filter(_.nonEmpty).map(_.toLong).toSeq.filter { pid =>
      try {
        // /proc cmdline is NUL-separated; appId appears as the --app-id value
        val cmd = new String(java.nio.file.Files.readAllBytes(
          java.nio.file.Paths.get(s"/proc/$pid/cmdline")), "UTF-8").replace('\u0000', ' ')
        cmd.contains(appId)
      } catch { case _: Exception => false } // raced exit — not a candidate
    }
  }

  /** SIGKILL one of this app's executor JVMs; returns the pid, or -1. */
  private def killOneExecutor(appId: String): Long = executorPids(appId) match {
    case pid +: _ =>
      new ProcessBuilder("kill", "-9", pid.toString).start().waitFor()
      println(s"[drill] SIGKILLed executor pid=$pid")
      pid
    case _ =>
      println("[drill] no executor process found to kill")
      -1L
  }

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/tmp/graft_sf1")
    val mode = if (args.length > 1) args(1) else "pagerank"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "16")
    val spark = graft.ClusterMode.configure(
        SparkSession.builder(), "local-cluster[2,8,4096]")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_SHUFFLE_PARTITIONS", cpus))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.ansi.enabled", "false")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val appId = spark.sparkContext.applicationId
    require(spark.sparkContext.master.startsWith("local-cluster"),
      s"needs a local-cluster master, got ${spark.sparkContext.master}")

    def ckDir() = java.nio.file.Files.createTempDirectory("exec_loss_ck").toString

    mode match {
      case "pagerank" =>
        val o = spark.read.parquet(s"$sfDir/orders.parquet")
        val edges = o.select(col("o_custkey").cast("long").as("src"),
          (col("o_orderkey").cast("long") + lit(1L << 40)).as("dst"))
        def run(): (Long, Double) = {
          val t0 = System.nanoTime()
          val sum0 = graft.operators.Graph.pagerank(edges, maxIter = 8,
              checkpointDir = Some(ckDir()))
            .agg(sum(xxhash64(col("node"),
              floor(col("r") * 1e12 + 0.5).cast("long"))))
            .collect()(0).getLong(0)
          (sum0, (System.nanoTime() - t0) / 1e9)
        }
        val (ctlSum, ctlWall) = run()
        println(f"[drill] control checksum=$ctlSum wall=$ctlWall%.1fs")
        @volatile var killedPid = -2L
        val killer = new Thread(() => {
          Thread.sleep(math.max(2000L, (ctlWall * 0.4 * 1000).toLong))
          killedPid = killOneExecutor(appId)
        })
        killer.setDaemon(true)
        killer.start()
        val outcome =
          try {
            val (drillSum, drillWall) = run()
            killer.join(5000)
            s""""drill_checksum":$drillSum,"drill_wall_sec":${f"$drillWall%.1f"},""" +
              s""""completed":true,"equal":${drillSum == ctlSum}"""
          } catch { case e: Throwable =>
            s""""completed":false,"equal":false,"error":"${e.getClass.getSimpleName}: ${
              Option(e.getMessage).getOrElse("").take(200).replace("\"", "'")}""""
          }
        println(s"""{"metric":"executor_loss_pagerank","sf_dir":"$sfDir",""" +
          s""""master":"${spark.sparkContext.master}",""" +
          s""""control_checksum":$ctlSum,"control_wall_sec":${f"$ctlWall%.1f"},""" +
          s""""killed_pid":$killedPid,$outcome}""")

      case "backfill" =>
        val w = graft.Warehouse.build(spark, sfDir)
        val vendas = graft.sources.Crm.vendas(spark, sfDir)
        val itens = graft.sources.Crm.itemVendas(spark, sfDir)
        val nSlices = 4
        def checksum(dir: String) = {
          val r = spark.read.parquet(dir).agg(
            count(lit(1)).as("n"),
            sum(xxhash64(col("id_venda"), col("id_produto"))).as("g"),
            sum(xxhash64(floor(col("valor_final") * 100 + 0.5),
              floor(col("custo_total_item") * 10000 + 0.5))).as("m"))
            .collect()(0)
          (r.getLong(0), r.getLong(1), r.getLong(2))
        }
        def sink() = java.nio.file.Files.createTempDirectory("exec_loss_bf").toString
        // clean control
        val ctlDir = sink()
        graft.operators.Fact.backfillSlices(vendas, itens, w.dimTempo,
          w.dimCliente, w.dimProduto, w.dimVendedor, w.dimLoja, nSlices, ctlDir)
        val ctl = checksum(ctlDir)
        println(s"[drill] control rows=${ctl._1} grain=${ctl._2} measures=${ctl._3}")
        // drill: kill an executor 1s into slice 1
        val drillDir = sink()
        @volatile var killedPid = -2L
        var crashed: String = null
        var ranFirst: Seq[Int] = Nil
        try {
          ranFirst = graft.operators.Fact.backfillSlices(vendas, itens,
            w.dimTempo, w.dimCliente, w.dimProduto, w.dimVendedor, w.dimLoja,
            nSlices, drillDir, onSliceDone = { i =>
              if (i == 0) {
                val killer = new Thread(() => {
                  Thread.sleep(1000); killedPid = killOneExecutor(appId)
                })
                killer.setDaemon(true)
                killer.start()
              }
            })
        } catch { case e: Throwable =>
          crashed = s"${e.getClass.getSimpleName}: ${
            Option(e.getMessage).getOrElse("").take(200).replace("\"", "'")}"
          println(s"[drill] first run crashed: $crashed")
        }
        // restart semantics: rerun on the same dir; _SUCCESS manifests must
        // complete exactly the missing slices (no-op if the first run rode
        // out the loss through task retries)
        val ranResume = graft.operators.Fact.backfillSlices(vendas, itens,
          w.dimTempo, w.dimCliente, w.dimProduto, w.dimVendedor, w.dimLoja,
          nSlices, drillDir)
        val drill = checksum(drillDir)
        println(s"""{"metric":"executor_loss_backfill","sf_dir":"$sfDir",""" +
          s""""master":"${spark.sparkContext.master}","n_slices":$nSlices,""" +
          s""""killed_pid":$killedPid,""" +
          s""""first_run_crashed":${crashed != null},""" +
          (if (crashed != null) s""""error":"$crashed",""" else "") +
          s""""first_run_slices":[${ranFirst.mkString(",")}],""" +
          s""""resume_slices":[${ranResume.mkString(",")}],""" +
          s""""control":[${ctl._1},${ctl._2},${ctl._3}],""" +
          s""""drill":[${drill._1},${drill._2},${drill._3}],""" +
          s""""equal":${ctl == drill}}""")

      case "stream" =>
        import graft.operators.{ArtifactManifest, Dedup}
        val docs = spark.read.parquet(s"$sfDir/documents.parquet")
        val base = docs.filter(col("doc_id") % 4 =!= 0)
        val delta = docs.filter(col("doc_id") % 4 === 0)
        val dCols = Seq(col("doc_id"), col("text"))
        def tmp(tag: String) = graft.QueryShared.deleteAtExit(
          java.nio.file.Files.createTempDirectory(tag).toString)
        def buildArt(): String = {
          val art = tmp("els_art")
          Dedup.writeSignatureArtifact(base, "doc_id", "text", art)
          ArtifactManifest.write(art, base.select(dCols: _*), dCols)
          art
        }
        // observable state: pairs multiset + artifact tables + manifest
        def state(art: String, pairsDir: String): Seq[Long] = {
          val p = spark.read.parquet(pairsDir).agg(
            count(lit(1)), sum(xxhash64(col("doc_id_a"), col("doc_id_b"),
              floor(col("jaccard") * 10000 + 0.5).cast("long"))))
            .collect()(0)
          def tab(t: String) = {
            val df = spark.read.parquet(s"$art/$t.parquet")
            val r = df.agg(count(lit(1)),
              sum(xxhash64(df.columns.map(col).toSeq: _*))).collect()(0)
            Seq(r.getLong(0), r.getLong(1))
          }
          val m = ArtifactManifest.read(art, spark).get
          Seq(p.getLong(0), p.getLong(1)) ++ tab("shingles") ++ tab("bands") ++
            Seq(m.nRows, m.inputHash)
        }
        val nBatches = 4
        val deltaDir = tmp("els_delta")
        delta.repartitionByRange(nBatches, col("doc_id"))
          .write.mode("overwrite").parquet(deltaDir)
        // unkilled control
        val ctlArt = buildArt(); val ctlPairs = tmp("els_ctl_pairs")
        val t0 = System.nanoTime()
        graft.streaming.ArtifactRefresh.refreshFromStream(spark, deltaDir,
          "doc_id", "text", ctlArt, ctlPairs, ckDir())
        val ctlWall = (System.nanoTime() - t0) / 1e9
        val ctl = state(ctlArt, ctlPairs)
        println(f"[drill] control wall=$ctlWall%.1fs state=${ctl.mkString(",")}")
        // drill: identical base build, kill one executor ~40% in
        val drillArt = buildArt(); val drillPairs = tmp("els_drill_pairs")
        val ck = ckDir()
        @volatile var killedPid = -2L
        val killer = new Thread(() => {
          Thread.sleep(math.max(2000L, (ctlWall * 0.4 * 1000).toLong))
          killedPid = killOneExecutor(appId)
        })
        killer.setDaemon(true)
        killer.start()
        var crashed: String = null
        try graft.streaming.ArtifactRefresh.refreshFromStream(spark, deltaDir,
          "doc_id", "text", drillArt, drillPairs, ck)
        catch { case e: Throwable =>
          crashed = s"${e.getClass.getSimpleName}: ${
            Option(e.getMessage).getOrElse("").take(200).replace("\"", "'")}"
          println(s"[drill] stream crashed: $crashed")
        }
        // restart on the SAME checkpoint: re-delivers any uncommitted batch;
        // a no-op if task retries rode out the loss
        graft.streaming.ArtifactRefresh.refreshFromStream(spark, deltaDir,
          "doc_id", "text", drillArt, drillPairs, ck)
        val drill = state(drillArt, drillPairs)
        println(s"""{"metric":"executor_loss_stream_refresh","sf_dir":"$sfDir",""" +
          s""""master":"${spark.sparkContext.master}","n_batches":$nBatches,""" +
          s""""killed_pid":$killedPid,"first_run_crashed":${crashed != null},""" +
          (if (crashed != null) s""""error":"$crashed",""" else "") +
          s""""control":[${ctl.mkString(",")}],"drill":[${drill.mkString(",")}],""" +
          s""""equal":${ctl == drill}}""")

      case other => sys.error(s"unknown mode '$other' (pagerank|backfill|stream)")
    }
    spark.stop()
  }
}
