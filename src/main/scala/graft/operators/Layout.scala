package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Physical data-layout operators — SURVEY.md §7.5 extension; no reference
  * counterpart. A 100 TB table is only as fast as what its scans can SKIP:
  * single-column sort gives min-max skipping on one dimension, a Z-order
  * (Morton) interleave gives useful min-max bounds on SEVERAL dimensions at
  * once, because each Z-cell is a small hyper-rectangle of the key space.
  */
object Layout {

  /** Morton/Z-order interleave of two `bits`-bit non-negative ints: bit i of
    * `x` lands at position 2i, bit i of `y` at 2i+1. Pure shift/and/add
    * column arithmetic — whole-stage codegen'd, and exactly mirrorable in
    * any engine with integer bit ops. The added terms occupy disjoint bits,
    * so `+` is bitwise OR.
    */
  def zValue(x: Column, y: Column, bits: Int): Column =
    (0 until bits).flatMap { i =>
      Seq(shiftleft(shiftright(x, i).bitwiseAND(lit(1L)), 2 * i),
        shiftleft(shiftright(y, i).bitwiseAND(lit(1L)), 2 * i + 1))
    }.reduce(_ + _)

  /** Z-order layout audit over lineitem's (part, supplier) access dims:
    * bucket rows by the top bits of the Morton key and report each cell's
    * (part, supplier) bounding box. The point of the audit: every cell spans
    * a NARROW range of BOTH dimensions — that bounding box is what parquet
    * min-max stats store per file, so `repartitionByRange(zcell) +
    * sortWithinPartitions(z)` at write time makes scans filtered on EITHER
    * dimension skip most files. One hash aggregate; no shuffle before it
    * beyond the scan.
    */
  def zorderCells(li: DataFrame, bits: Int = 8, cellShift: Int = 10): DataFrame = {
    val mask = (1L << bits) - 1
    val withZ = li.select(
      (col("l_partkey").bitwiseAND(mask)).as("px"),
      (col("l_suppkey").bitwiseAND(mask)).as("sx"))
      .withColumn("z", zValue(col("px"), col("sx"), bits))
    withZ.groupBy(shiftright(col("z"), cellShift).as("zcell"))
      .agg(count(lit(1)).as("n_rows"),
        min(col("px")).as("px_min"), max(col("px")).as("px_max"),
        min(col("sx")).as("sx_min"), max(col("sx")).as("sx_max"))
  }
}
