package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dev probe: the bounded-scratch fact backfill at scale (VERDICT r10 #1).
  *
  * The one-shot sf100 fact build's aggregate shuffle scratch exceeds a
  * single host's free disk (ENOSPC after 17 min, SURVEY §8.8). This probe
  * runs the SAME build as K disjoint id_venda-hash slices
  * ([[graft.operators.Fact.fatoVendasSlice]]) — each slice a separate job
  * whose scratch is ~1/K of the one-shot's, appended to a zstd parquet
  * sink between slices, exactly the operational recipe a 100 TB backfill
  * uses when the fleet's scratch budget per pass is bounded.
  *
  * Evidence emitted (one JSON line):
  *  - per-slice wall seconds + row count;
  *  - `min_free_disk_gb`: the LOW-WATER mark of the filesystem's free
  *    space, sampled at 200 ms by a background thread — the observed peak
  *    of (scratch + accumulated sink) pressure;
  *  - total sink rows + an order-free checksum (sum of xxhash64 over the
  *    grain and the quantized measures) — equality with the in-plan union
  *    is pinned at oracle scale by q_fato_backfill; here the checksum makes
  *    the sf100 run self-consistent across re-runs;
  *  - `expected_rows`: an independent count of the post-date-filter
  *    header⋈lines join (a count-only, two-column join — cheap even where
  *    the full build ENOSPCs) that the sink total must equal.
  *
  * RESTARTABLE (r11 #4): slices go through
  * [[graft.operators.Fact.backfillSlices]] — per-slice `slice=<i>` dirs
  * whose `_SUCCESS` marker is the completion manifest, so re-running this
  * probe against an existing outDir completes exactly the missing/partial
  * slices and skips finished ones (the JSON reports which ran). A re-run
  * can therefore no longer double-count — the old must-not-exist guard is
  * gone by design.
  *
  * Usage: runMain graft.tools.FactBackfillProbe <sfDir> [nSlices] [outDir]
  */
object FactBackfillProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val nSlices = if (args.length > 1) args(1).toInt else 8
    val out = if (args.length > 2) args(2)
      else java.nio.file.Files.createTempDirectory("fact_backfill").toString
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_SHUFFLE_PARTITIONS", "192"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.ansi.enabled", "false")
      .config("spark.ui.enabled", "false")
      // the backfill's whole point is fitting the disk: zstd on the sink
      // (~30% smaller than snappy on this fact's repeated-value measures)
      .config("spark.sql.parquet.compression.codec", "zstd")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // low-water free-disk sampler (the probe's "peak scratch" witness) —
    // sample the nearest EXISTING ancestor: the sink dir itself doesn't
    // exist until the first write, and getUsableSpace on a missing path
    // is 0, which would pin the low-water mark to a lie
    val fsRoot = Iterator.iterate(new java.io.File(out).getAbsoluteFile)(_.getParentFile)
      .dropWhile(f => f != null && !f.exists()).next()
    @volatile var minFree = fsRoot.getUsableSpace
    @volatile var sampling = true
    val sampler = new Thread(() => {
      while (sampling) {
        minFree = math.min(minFree, fsRoot.getUsableSpace)
        Thread.sleep(200)
      }
    })
    sampler.setDaemon(true)
    sampler.start()
    val freeStart = fsRoot.getUsableSpace

    val w = graft.Warehouse.build(spark, sfDir)
    val vendas = graft.sources.Crm.vendas(spark, sfDir)
    val itens = graft.sources.Crm.itemVendas(spark, sfDir)

    val walls = scala.collection.mutable.ArrayBuffer.empty[Double]
    var tSlice = System.nanoTime()
    val ran = graft.operators.Fact.backfillSlices(vendas, itens,
      w.dimTempo, w.dimCliente, w.dimProduto, w.dimVendedor, w.dimLoja,
      nSlices, out, onSliceDone = { i =>
        val wall = (System.nanoTime() - tSlice) / 1e9
        walls += wall
        tSlice = System.nanoTime()
        println(f"[backfill] slice $i/$nSlices wall=$wall%.1fs free_gb=${fsRoot.getUsableSpace / 1e9}%.1f")
      })
    if (ran.length < nSlices)
      println(s"[backfill] resumed: ${nSlices - ran.length} slices already committed, ran ${ran.mkString(",")}")

    // independent expected-row count: the J1 join after the F13 row filter,
    // carrying ONLY the join key — no dims, no measures, no wide shuffle
    val expected = vendas
      .filter(graft.functions.GraftFunctions.keepRowForDate(col("data_venda")))
      .select("id_venda")
      .join(itens.select("id_venda"), Seq("id_venda")).count()

    val sink = spark.read.parquet(out)
    val check = sink.agg(
      count(lit(1)).as("n"),
      sum(xxhash64(col("id_venda"), col("id_produto"))).as("grain_hash"),
      sum(xxhash64(floor(col("valor_final") * 100 + 0.5),
        floor(col("custo_total_item") * 10000 + 0.5))).as("measure_hash"))
      .collect()(0)
    sampling = false
    val sinkBytes = {
      def size(f: java.io.File): Long =
        if (f.isDirectory) f.listFiles().map(size).sum else f.length()
      size(new java.io.File(out))
    }
    val json =
      s"""{"metric":"fact_backfill","sf_dir":"$sfDir","n_slices":$nSlices,""" +
      s""""slices_run":[${ran.mkString(",")}],""" +
      s""""slice_wall_sec":[${walls.map(s => f"$s%.1f").mkString(",")}],""" +
      s""""total_wall_sec":${f"${walls.sum}%.1f"},""" +
      s""""rows":${check.getLong(0)},"expected_rows":$expected,""" +
      s""""rows_match":${check.getLong(0) == expected},""" +
      s""""grain_hash":${check.getLong(1)},"measure_hash":${check.getLong(2)},""" +
      s""""sink_gb":${f"${sinkBytes / 1e9}%.2f"},""" +
      s""""free_start_gb":${f"${freeStart / 1e9}%.1f"},""" +
      s""""min_free_disk_gb":${f"${minFree / 1e9}%.1f"}}"""
    println(json)
    spark.stop()
  }
}
