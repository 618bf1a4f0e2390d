package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Snapshot reconciliation — SURVEY.md §2 S7's operational sibling: after a
  * reload/migration/CDC replay, prove what actually changed between two
  * versions of a table. The reference's drop-and-reload refresh
  * (etl_completo.py's full reload) has no audit trail; this is it.
  */
object Reconcile {

  /** Full-outer key-join diff of two snapshots: every key classified as
    * `added` (only in b), `removed` (only in a), or `changed` (payload
    * differs, null-safe comparison); unchanged keys are dropped — at 100 TB
    * the diff output is the (small) churn, never the table. One
    * co-partitioned shuffle on the key; payload comparison is a flat
    * codegen'd conjunction.
    */
  def snapshotDiff(a: DataFrame, b: DataFrame, key: String,
                   payload: Seq[String]): DataFrame = {
    val left = a.select((key +: payload).map(c => col(c).as(s"a_$c")): _*)
    val right = b.select((key +: payload).map(c => col(c).as(s"b_$c")): _*)
    val same = payload.map(c => col(s"a_$c") <=> col(s"b_$c"))
      .reduceOption(_ && _).getOrElse(lit(true))
    left.join(right, col(s"a_$key") === col(s"b_$key"), "full_outer")
      .withColumn("status",
        when(col(s"a_$key").isNull, lit("added"))
          .when(col(s"b_$key").isNull, lit("removed"))
          .when(same, lit("unchanged"))
          .otherwise(lit("changed")))
      .filter(col("status") =!= "unchanged")
      .withColumn(key, coalesce(col(s"a_$key"), col(s"b_$key")))
      .select(col(key) +: col("status") +:
        payload.flatMap(c => Seq(col(s"a_$c"), col(s"b_$c"))): _*)
  }

  /** Data-integrity manifest — the per-partition record a transfer or
    * replication job publishes so the receiving side can verify content
    * without re-reading the source: row count, an ORDER-INDEPENDENT
    * content checksum (sum of 60-bit md5 row hashes mod 2⁶⁰ — associative,
    * so partial checksums from 1000 executors combine; any changed,
    * dropped or duplicated row moves it), and the key range. One
    * map-side-combinable aggregate per partition key.
    */
  def manifest(df: DataFrame, part: Column, key: Column,
               content: Column): DataFrame =
    df.select(part.as("part"), key.cast("long").as("k"),
        Dedup.hash60(content.cast("string")).as("h"))
      .groupBy(col("part"))
      .agg(count(lit(1)).as("n_rows"),
        // exact DECIMAL(38,0) total (a BIGINT sum of 2^60-sized terms
        // overflows after ~8 rows), one mod at the end — DuckDB's HUGEINT
        // sum mirrors the same exact-total-then-mod arithmetic
        (sum(col("h").cast("decimal(38,0)")) % lit(1152921504606846976L))
          .cast("long").as("content_checksum"),
        min(col("k")).as("min_key"), max(col("k")).as("max_key"))

  /** Distribution drift between two snapshots of a population — the
    * monitoring number that catches "this week's crawl looks nothing like
    * last week's" before it reaches training. Chi-square over a shared
    * bucketing: χ² = Σ_buckets (c_a − c_b)²/(c_a + c_b), chosen over PSI
    * because every term is integer arithmetic plus ONE division (PSI's ln
    * is not engine-portable). Per-bucket terms quantize to 1e-6 integers
    * before the total sum, so partition order cannot move the statistic.
    * Two count aggregates + a bucket-keyed full outer join (buckets are
    * histogram-sized, not data-sized) + one summary row.
    */
  def histogramDrift(a: DataFrame, b: DataFrame, bucket: Column): DataFrame =
    driftFromCounts(
      a.groupBy(bucket.as("bucket")).agg(count(lit(1)).as("c_a")),
      b.groupBy(bucket.as("bucket")).agg(count(lit(1)).as("c_b")))

  /** The χ² finish over PRE-AGGREGATED (bucket, count) tables — the entry
    * point when one side's histogram comes from elsewhere (a streaming
    * complete-mode count, a persisted profile from last week's run). */
  def driftFromCounts(ca: DataFrame, cb: DataFrame): DataFrame = {
    val terms = ca.join(cb, Seq("bucket"), "full_outer")
      .select(col("bucket"),
        coalesce(col("c_a"), lit(0L)).as("c_a"),
        coalesce(col("c_b"), lit(0L)).as("c_b"))
      // The delta is cast to double BEFORE squaring: a BIGINT square wraps
      // silently in Spark (non-ANSI) and throws in DuckDB once a per-bucket
      // delta exceeds ~3.04e9 — exactly the count range a 100 TB histogram
      // can reach. Doubles are exact for deltas < 2^53, far past any count.
      .withColumn("qc", floor(
        (col("c_a") - col("c_b")).cast("double")
          * (col("c_a") - col("c_b")).cast("double")
          / (col("c_a") + col("c_b")) * 1e6 + 0.5).cast("long"))
    terms.agg(count(lit(1)).as("n_buckets"),
        sum(col("c_a")).as("n_a"), sum(col("c_b")).as("n_b"),
        sum(col("qc")).as("__s"))
      .select(col("n_buckets"), col("n_a"), col("n_b"),
        graft.functions.GraftFunctions.detRound(
          col("__s").cast("double") / 1e6, 4).as("chi2"))
  }
}
