package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.operators.Compaction

/** Scale probe for [[graft.operators.Compaction]]: the small-file problem
  * at realistic file counts and the operator's three claims under load —
  * size-aware merge, proven content preservation, idempotent re-run.
  *
  * Protocol per table:
  *  1. scatter the source into `nScatter` files (a day of micro-batch sink
  *     output);
  *  2. time a scan-heavy aggregate over the scattered layout;
  *  3. compact (documents: bin-pack; lineitem: range-clustered on
  *     l_orderkey) and time it — the rewrite INCLUDES the read-back
  *     fingerprint verification, so the reported build cost is the honest
  *     publish-gated number;
  *  4. re-run compact and time the idempotent no-op;
  *  5. time the same aggregate over the compacted layout.
  *
  * Usage: runMain graft.tools.CompactionProbe [sfDir] [nScatter]
  * (defaults: /tmp/graft_sf10 512)
  */
object CompactionProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/tmp/graft_sf10")
    val nScatter = if (args.length > 1) args(1).toInt else 512
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.ansi.enabled", "false")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def timed[T](body: => T): (T, Double) = {
      val t0 = System.nanoTime(); val r = body
      (r, (System.nanoTime() - t0) / 1e9)
    }
    def rm(dir: String): Unit = {
      val p = new org.apache.hadoop.fs.Path(dir)
      val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
      if (fs.exists(p)) { fs.delete(p, true); () }
    }

    val results = scala.collection.mutable.LinkedHashMap.empty[String, String]

    def probe(table: String, sortCol: Option[String], targetMb: Int,
              agg: String => Long): Unit = {
      val scatter = s"/tmp/compaction_probe/${table}_scatter"
      val out = s"/tmp/compaction_probe/${table}_compacted"
      rm(scatter); rm(out)
      val (_, tScatter) = timed {
        // scatter WITHOUT a shuffle (maxRecordsPerFile), like the sink that
        // causes the problem: micro-batches append files, they don't exchange
        val src = spark.read.parquet(s"$sfDir/$table.parquet")
        val rowsPerFile = math.max(1L, src.count() / nScatter)
        src.write.option("maxRecordsPerFile", rowsPerFile)
          .mode("overwrite").parquet(scatter)
      }
      val (aggBefore, tAggScattered) = timed(agg(scatter))
      val (st, tBuild) = timed(
        Compaction.compact(spark, scatter, out, targetMb.toLong << 20, sortCol))
      require(!st.skipped, "first compact must rewrite")
      val (st2, tNoop) = timed(
        Compaction.compact(spark, scatter, out, targetMb.toLong << 20, sortCol))
      require(st2.skipped, "second compact must be the idempotent no-op")
      val (aggAfter, tAggCompacted) = timed(agg(out))
      require(aggBefore == aggAfter, s"aggregate drifted: $aggBefore vs $aggAfter")
      results(table) =
        s"""{"rows":${st.rows},"files_in":${st.nFilesIn},"files_out":${st.nFilesOut},
           |"mb_in":${st.bytesIn >> 20},"mb_out":${st.bytesOut >> 20},
           |"scatter_sec":${f"$tScatter%.1f"},"compact_sec":${f"$tBuild%.1f"},
           |"noop_rerun_sec":${f"$tNoop%.1f"},
           |"agg_scattered_sec":${f"$tAggScattered%.1f"},"agg_compacted_sec":${f"$tAggCompacted%.1f"},
           |"agg_checksum":$aggBefore}""".stripMargin.replaceAll("\n", "")
    }

    // documents: text-heavy rows, bin-packed (the LLM-corpus ingest shape)
    probe("documents", None, 128, dir =>
      spark.read.parquet(dir).agg(sum(xxhash64(col("doc_id"), col("text"))))
        .collect()(0).getLong(0))
    // lineitem: narrow fact rows, range-clustered so sorted-layout skipping
    // survives — the warehouse-compaction shape
    probe("lineitem", Some("l_orderkey"), 128, dir =>
      spark.read.parquet(dir)
        .agg(sum(xxhash64(col("l_orderkey"), col("l_linenumber"), col("l_quantity"))))
        .collect()(0).getLong(0))

    val json = results.map { case (k, v) => s""""$k":$v""" }.mkString(",")
    println(s"""{"metric":"compaction_probe","sf_dir":"$sfDir","n_scatter":$nScatter,$json}""")
    spark.stop()
  }
}
