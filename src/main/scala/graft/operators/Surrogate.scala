package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StructField, StructType}

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
    * the dims are still small; the fact uses [[zipWithIndexOrdered]].
    */
  def withSurrogateKey(df: DataFrame, skName: String, orderCols: Seq[Column]): DataFrame =
    df.withColumn(skName, row_number().over(Window.orderBy(orderCols: _*)).cast(LongType))

  /** Scale path: dense 1..N in total `orderCols` order WITHOUT a
    * single-partition window. `repartitionByRange` + `sortWithinPartitions`
    * gives a total order across partitions; `zipWithIndex` then assigns
    * contiguous global indices per partition in partition order (one extra
    * job to count partition sizes — the classic two-pass offset scheme).
    * Survives 1000-executor scale: the sort is a range-partitioned shuffle,
    * never a single reducer.
    */
  def zipWithIndexOrdered(df: DataFrame, skName: String, orderCols: Seq[Column]): DataFrame = {
    val spark = df.sparkSession
    val sorted =
      if (orderCols.isEmpty) df
      else df.repartitionByRange(orderCols: _*).sortWithinPartitions(orderCols: _*)
    val withIdx = sorted.rdd.zipWithIndex.map { case (row, idx) =>
      Row.fromSeq(row.toSeq :+ (idx + 1L))
    }
    spark.createDataFrame(withIdx, StructType(sorted.schema.fields :+ StructField(skName, LongType, nullable = false)))
  }

  /** First-match dedupe (reference P6/J13, etl_completo.py:565): keep the
    * lowest-`tieBreaker` row per key so a lookup join returns at most one
    * match — PostgreSQL `LIMIT 1` over a sk-ordered heap.
    */
  def firstMatch(df: DataFrame, keyCols: Seq[Column], tieBreakers: Seq[Column]): DataFrame = {
    val w = Window.partitionBy(keyCols: _*).orderBy(tieBreakers: _*)
    df.withColumn("__rn", row_number().over(w)).filter(col("__rn") === 1).drop("__rn")
  }
}
