package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Change-data-capture apply: collapse an insert/update/delete change log
  * into the current snapshot — the incremental sibling of the reference's
  * drop-and-reload batch refresh (etl_completo.py reloads both databases
  * per run; a production feed arrives as CDC deltas instead).
  *
  * Latest-version-wins per key, and a key whose latest operation is the
  * delete op disappears. One shuffle on the key; the per-key window sorts
  * only that key's versions — bounded by update frequency, never global.
  */
object Cdc {

  /** `ts` (plus `tieBreakers`) must totally order each key's versions —
    * ambiguity there is a data-model bug upstream, not something the apply
    * step can repair.
    */
  def applyChangeLog(log: DataFrame, key: Column, ts: Column, op: Column,
                     deleteOp: String = "D",
                     tieBreakers: Seq[Column] = Nil): DataFrame = {
    val w = Window.partitionBy(key)
      .orderBy((ts.desc +: tieBreakers.map(_.desc)): _*)
    log.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1 && op =!= deleteOp)
      .drop("__rn")
  }
}
