package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** PostgreSQL `SERIAL` surrogate-key emulation (SURVEY.md §7.3).
  *
  * The reference assigns 1..N in insert order, fixed by each extract's
  * `ORDER BY` (reference etl_completo.py:157,197,234,271,309,364,513,551,718
  * and :603 for the fact). Downstream semantics only require key
  * *consistency* (join equality), but we reproduce dense 1..N anyway.
  */
object Surrogate {

  /** Dense 1..N keys via a global window — single-partition shuffle, so this
    * is reserved for DIMENSION-sized inputs (≤ millions of rows). At 100 TB
    * the dims are still small; the fact uses [[orderedUniqueKey]].
    */
  def withSurrogateKey(df: DataFrame, skName: String, orderCols: Seq[Column]): DataFrame =
    df.withColumn(skName, row_number().over(Window.orderBy(orderCols: _*)).cast(LongType))

  /** Scale path for FACT-sized inputs: keys that are unique and increasing
    * in total `orderCols` order, in ONE pass with no single-partition stage.
    * `repartitionByRange` gives range partition i < range partition j ⇒ all
    * rows of i sort before j; `monotonically_increasing_id` is
    * `(partitionId << 33) + localOffset`, so ids follow the total order.
    * Keys are NOT dense 1..N — the reference's SERIAL density is not
    * observable downstream (nothing joins on the fact SK and the oracle
    * never compares it, SURVEY §7.3); when density IS required use
    * [[zipWithIndexOrdered]].
    *
    * Everything here is lazy — no job runs at plan-construction time.
    */
  def orderedUniqueKey(df: DataFrame, skName: String, orderCols: Seq[Column]): DataFrame = {
    val sorted =
      if (orderCols.isEmpty) df
      else df.repartitionByRange(orderCols: _*).sortWithinPartitions(orderCols: _*)
    sorted.withColumn(skName, (monotonically_increasing_id() + 1L).cast(LongType))
  }

  /** Dense 1..N in total `orderCols` order WITHOUT a single-partition
    * window: the classic two-pass offset scheme, expressed lazily in
    * DataFrame ops. Pass 1 (the `offsets` branch) counts rows per range
    * partition and prefix-sums the counts (the window there runs over
    * #partitions rows, not data rows); pass 2 ranks within each partition
    * and adds the broadcast offset. Survives 1000-executor scale: no stage
    * ever sees more than one partition's rows.
    *
    * Unlike `rdd.zipWithIndex` (whose constructor runs an eager job to
    * compute start indices — it would execute the whole upstream pipeline at
    * plan-CONSTRUCTION time), this stays a pure logical plan until an action
    * runs (the checkpoint below is LAZY).
    *
    * The partitioned-and-tagged table is materialized ONCE (lazy
    * localCheckpoint) and both passes read the same blocks. This is not an
    * optimization but CORRECTNESS (r12, caught by the full-surface sf1
    * oracle): left as two evaluations of one lineage, the offsets branch
    * and the main branch each re-run the range exchange, and nothing ties
    * their physical partitionings together — AQE re-plans them
    * independently, so the two `spark_partition_id` spaces can disagree,
    * which both corrupts the offsets AND drops every row whose pid has no
    * match in the offsets table (measured at sf1 under Verify's
    * `coalesce(1).write` plan: 826k–845k of 1.5M rows survived,
    * nondeterministically). A physical-partition-derived tag is only
    * meaningful relative to ONE materialization of that partitioning.
    */
  def zipWithIndexOrdered(df: DataFrame, skName: String, orderCols: Seq[Column]): DataFrame = {
    if (orderCols.isEmpty)
      return df.withColumn(skName, (monotonically_increasing_id() + 1L).cast(LongType))
    val sorted = df.repartitionByRange(orderCols: _*).sortWithinPartitions(orderCols: _*)
      .withColumn("__pid", spark_partition_id())
      .localCheckpoint(false)
    val offsets = sorted.groupBy(col("__pid")).agg(count(lit(1)).as("__cnt"))
      .withColumn("__offset",
        coalesce(sum(col("__cnt")).over(
          Window.orderBy(col("__pid")).rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select(col("__pid").as("__opid"), col("__offset"))
    val localRank = row_number().over(Window.partitionBy(col("__pid")).orderBy(orderCols: _*))
    sorted.join(broadcast(offsets), col("__pid") === col("__opid"))
      .withColumn(skName, (col("__offset") + localRank).cast(LongType))
      .drop("__pid", "__opid", "__offset")
  }

  /** Dense global rank AND running total of `valueCol` in total `orderCols`
    * order WITHOUT a single-partition window — the distributed prefix-sum
    * generalization of [[zipWithIndexOrdered]]. Pass 1 aggregates per range
    * partition (count + sum) and prefix-sums over #partitions rows; pass 2
    * ranks/sums within each partition and adds the broadcast offsets. Used
    * by cumulative-distribution queries (vocabulary coverage) where both the
    * rank and the cumsum of a globally-ordered table are needed and the
    * table can be arbitrarily large.
    */
  def rankedRunningTotal(df: DataFrame, valueCol: Column, rankName: String,
                         totalName: String, orderCols: Seq[Column]): DataFrame = {
    // lazy-checkpoint for pid-space consistency across the two passes —
    // same correctness argument as [[zipWithIndexOrdered]]
    val sorted = df.withColumn("__v", valueCol.cast(LongType))
      .repartitionByRange(orderCols: _*).sortWithinPartitions(orderCols: _*)
      .withColumn("__pid", spark_partition_id())
      .localCheckpoint(false)
    val pw = Window.orderBy(col("__pid")).rowsBetween(Window.unboundedPreceding, -1)
    val offsets = sorted.groupBy(col("__pid"))
      .agg(count(lit(1)).as("__cnt"), sum(col("__v")).as("__vsum"))
      .select(col("__pid").as("__opid"),
        coalesce(sum(col("__cnt")).over(pw), lit(0L)).as("__roff"),
        coalesce(sum(col("__vsum")).over(pw), lit(0L)).as("__soff"))
    val lw = Window.partitionBy(col("__pid")).orderBy(orderCols: _*)
    sorted.join(broadcast(offsets), col("__pid") === col("__opid"))
      .withColumn(rankName, (col("__roff") + row_number().over(lw)).cast(LongType))
      .withColumn(totalName,
        (col("__soff") + sum(col("__v")).over(lw.rowsBetween(Window.unboundedPreceding, 0)))
          .cast(LongType))
      .drop("__pid", "__opid", "__roff", "__soff", "__v")
  }

  /** Unique non-dense, order-free key in ZERO extra passes — for outputs
    * whose SERIAL values are not observable downstream (SURVEY §7.3: nothing
    * joins on the fact SK and the oracle never compares it). The range-
    * partitioned [[orderedUniqueKey]] costs a full extra pipeline execution
    * (range-boundary sampling) to reproduce an order nobody can see.
    */
  def uniqueKey(df: DataFrame, skName: String): DataFrame =
    df.withColumn(skName, (monotonically_increasing_id() + 1L).cast(LongType))

  /** First-match dedupe (reference P6/J13, etl_completo.py:565): keep the
    * lowest-`tieBreaker` row per key so a lookup join returns at most one
    * match — PostgreSQL `LIMIT 1` over a sk-ordered heap.
    */
  def firstMatch(df: DataFrame, keyCols: Seq[Column], tieBreakers: Seq[Column]): DataFrame = {
    val w = Window.partitionBy(keyCols: _*).orderBy(tieBreakers: _*)
    df.withColumn("__rn", row_number().over(w)).filter(col("__rn") === 1).drop("__rn")
  }
}
