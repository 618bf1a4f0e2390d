package graft.tools

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** One-off sf0.1 → ~sf1 scale-up generator for the measured scale probe
  * (r8 verdict #6: the 100 TB story was argued from plan shapes but never
  * measured past sf0.1 — this writes a 10× replica set so the flagship
  * families can be timed at two scales and the sf0.1→sf1 factor recorded
  * in SURVEY §8).
  *
  * Replication scheme: `copies` shifted copies of each fact-sized table,
  * key-offset by `i · 10^8` so every copy is self-contained (FKs shift on
  * both sides; cross-copy joins cannot form) and join selectivities /
  * per-key fanouts are EXACTLY those of sf0.1. The offset is a multiple of
  * every modulus the queries select on (50 for the ANN query set, 4 for
  * the dedup delta, 7/25/31 for the vendas noise paths), so predicate
  * densities are preserved too. Dimension tables (nation, region) stay
  * fixed — TPC-H semantics, and exactly what "broadcast the dims" must
  * survive at scale.
  *
  * Content decorrelation, so "10× data" never means "10 near-identical
  * replicas" where near-dup structure would explode quadratically:
  *  - documents: every word of copy i>0 gets an `⦙i` suffix — shingles
  *    across copies are disjoint, so candidate pairs scale exactly 10×
  *    (within-copy structure untouched; copy 0 is byte-identical sf0.1).
  *  - embeddings: copy i is the vector rotated left by i positions —
  *    norms and within-copy geometry preserved, cross-copy cosines
  *    decorrelated, IVF cells stay balanced.
  *
  * Usage: runMain graft.tools.ScaleGen [srcDir] [outDir] [copies]
  * (defaults: /root/testdata/sf0.1 /tmp/graft_sf1 10)
  */
object ScaleGen {
  val Offset = 100000000L

  def main(args: Array[String]): Unit = {
    val src = args.headOption.getOrElse("/root/testdata/sf0.1")
    val out = if (args.length > 1) args(1) else "/tmp/graft_sf1"
    val copies = if (args.length > 2) args(2).toInt else 10
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "16")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    /** `copies` shifted replicas: `shift` maps (df-with-__c, i·Offset) to
      * the transformed copy; key columns keep their source dtype. */
    def replicate(df: DataFrame)(shift: (DataFrame, Column) => DataFrame): DataFrame = {
      val cols = df.columns
      val c = spark.range(copies).select(col("id").as("__c"))
      // Fan the single-file sf0.1 source out BEFORE the crossJoin: the
      // broadcast-nested-loop replication inherits the left side's
      // partitioning, so a one-split input serializes the whole copies×rows
      // generation onto ~1 task (measured: 1000-copy orders at ~1.5 busy
      // cores). Row content is partitioning-independent (key shifts are
      // per-row); only file assignment varies, which write() re-shuffles
      // anyway.
      shift(df.repartition(cpus.toInt).crossJoin(c), col("__c") * Offset)
        .select(cols.head, cols.tail: _*)
    }
    def shiftKeys(df: DataFrame, keys: String*): DataFrame =
      replicate(df) { (d, off) =>
        keys.foldLeft(d) { (acc, k) =>
          acc.withColumn(k, (col(k) + off).cast(df.schema(k).dataType))
        }
      }

    /** Fact-sized tables are written as `nParts` files: the crossJoin
      * replication inherits the single-partition sf0.1 input, and a lone
      * 20–250 MB parquet file is ONE scan split — every downstream text/
      * scan-bound query would serialize on one task, measuring the file
      * layout instead of the engine (first sweep: q_feature_hashing 21×
      * wall at ~1 busy thread). Real lake data arrives in many splits;
      * model that. */
    def write(name: String, df: DataFrame, nParts: Int = 32): Unit = {
      val out0 = if (nParts > 0) df.repartition(nParts) else df
      out0.write.mode("overwrite").parquet(s"$out/$name.parquet")
      println(s"[scalegen] $name: ${spark.read.parquet(s"$out/$name.parquet").count()} rows")
    }

    def read(name: String) = spark.read.parquet(s"$src/$name.parquet")

    // fixed dims: copy through unchanged
    Seq("nation", "region").foreach(n => write(n, read(n), nParts = 1))
    // fact-sized tables: self-contained shifted copies
    write("customer", shiftKeys(read("customer"), "c_custkey"))
    write("supplier", shiftKeys(read("supplier"), "s_suppkey"))
    write("part", shiftKeys(read("part"), "p_partkey"))
    write("orders", shiftKeys(read("orders"), "o_orderkey", "o_custkey"))
    write("lineitem",
      shiftKeys(read("lineitem"), "l_orderkey", "l_partkey", "l_suppkey"))
    // documents: shifted ids + per-copy word suffix (copy 0 untouched)
    write("documents", replicate(read("documents")) { (d, off) =>
      d.withColumn("doc_id",
          (col("doc_id") + off).cast(read("documents").schema("doc_id").dataType))
        .withColumn("text",
          when(col("__c") === 0, col("text")).otherwise(expr(
            "concat_ws(' ', transform(split(text, ' '), w -> concat(w, '⦙', cast(__c AS STRING))))")))
    })
    // embeddings: shifted ids + per-copy left rotation (mod dim, so copy
    // counts beyond the dimensionality still rotate legally; copies that
    // share a rotation remain exact cross-copy duplicates — acceptable for
    // a perf probe, noted in the scaladoc)
    write("embeddings", replicate(read("embeddings")) { (d, off) =>
      d.withColumn("__r", expr("cast(__c % size(embedding) AS INT)"))
        .withColumn("vec_id",
          (col("vec_id") + off).cast(read("embeddings").schema("vec_id").dataType))
        .withColumn("embedding", expr(
          "concat(slice(embedding, __r + 1, size(embedding) - __r)," +
            " slice(embedding, 1, __r))"))
        .drop("__r")
    })
    // events: shifted ids, same time range (10× density — the realistic
    // scale-up). Coalesced to ~10 part files so streaming consumers
    // (maxFilesPerTrigger=1) see a bounded micro-batch count: the probe
    // measures data scaling, not file-layout-dependent per-batch tax.
    write("events",
      shiftKeys(read("events"), "event_id", "user_id"), nParts = 10)
    spark.stop()
  }
}
