package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Slowly-Changing-Dimension Type 2 — the classic Kimball versioning
  * operator the reference's star schema (SURVEY.md §1) stops short of: the
  * reference rebuilds every dimension from scratch each run
  * (etl_completo.py `run_full_etl` drops both databases), so attribute
  * history is lost. A production DW keeps one row PER VERSION of a natural
  * key, with `[valid_from, valid_to)` effective ranges and an `is_current`
  * flag.
  *
  * Scale design (100 TB): everything is windowed PER NATURAL KEY — the
  * change log shuffles once on the key and each key's history (usually a
  * handful of rows) is processed within its partition. No global window, no
  * driver-side state. The point-in-time lookup is an equi-join on the key
  * plus a range predicate — a hash join whose probe side streams.
  */
object Scd {

  /** Collapse a change log (key, ts, attribute) into SCD2 version rows.
    *
    * Multiple same-`ts` states collapse to a deterministic winner (`min`);
    * consecutive runs of the same attribute value collapse to one version
    * (a "change" to the same value is not a new version). `valid_to` is the
    * next version's `valid_from` (half-open interval), NULL for the current
    * version.
    */
  def scd2(changes: DataFrame, key: Column, ts: Column, attr: Column): DataFrame = {
    val byTs = changes.groupBy(key.as("key"), ts.as("valid_from"))
      .agg(min(attr).as("attr"))
    val w = Window.partitionBy(col("key")).orderBy(col("valid_from"))
    val starts = byTs
      .withColumn("__prev", lag(col("attr"), 1).over(w))
      .filter(col("__prev").isNull || col("__prev") =!= col("attr"))
    starts
      .withColumn("version", row_number().over(w).cast("long"))
      .withColumn("valid_to", lead(col("valid_from"), 1).over(w))
      .select(col("key"), col("version"), col("attr"),
        col("valid_from"), col("valid_to"),
        col("valid_to").isNull.as("is_current"))
  }

  /** Point-in-time lookup: for each probe (key, ts), the version whose
    * `[valid_from, valid_to)` range contains ts. Probes before the first
    * version get no match (left join ⇒ NULL version). The equi key keeps
    * this a hash join; the range predicate prunes within each key's
    * (small) version list.
    */
  def asOfLookup(probes: DataFrame, probeKey: Column, probeTs: Column,
                 versions: DataFrame): DataFrame = {
    val v = versions.select(col("key").as("__vkey"), col("version"), col("attr"),
      col("valid_from"), col("valid_to"))
    probes.join(v,
      probeKey === col("__vkey") &&
        probeTs >= col("valid_from") &&
        (col("valid_to").isNull || probeTs < col("valid_to")),
      "left")
      .drop("__vkey")
  }
}
