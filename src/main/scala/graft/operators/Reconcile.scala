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
}
