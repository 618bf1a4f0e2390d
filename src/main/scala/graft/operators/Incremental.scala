package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Incremental aggregate (materialized-view) maintenance: keep a MERGEABLE
  * aggregate state per group — counts and exact DECIMAL sums, both
  * associative and commutative — so a new batch refreshes the view by
  * aggregating ONLY the delta and merging states, never reprocessing the
  * base. The reference rebuilds its whole DW per run (etl_completo.py drops
  * and reloads); at 100 TB the nightly delta is the only affordable input.
  *
  * merge(state(base), state(delta)) ≡ state(base ∪ delta) — that identity
  * is exactly what the oracle checks (the driver compares the merged result
  * against DuckDB's single full aggregate).
  */
object Incremental {

  /** Monthly revenue state per order priority: (count, DECIMAL(18,2) sum). */
  def revenueState(orders: DataFrame): DataFrame =
    orders.groupBy(col("o_orderpriority").as("priority"),
        date_trunc("month", col("o_orderdate")).as("month"))
      .agg(count(lit(1)).as("n_orders"),
        sum(col("o_totalprice").cast("decimal(18,2)")).as("rev_state"))

  /** Merge any number of states: union + re-sum of the partial aggregates. */
  def merge(states: Seq[DataFrame]): DataFrame =
    states.reduce(_ unionAll _)
      .groupBy(col("priority"), col("month"))
      .agg(sum(col("n_orders")).as("n_orders"), sum(col("rev_state")).as("rev_state"))

  /** Finalize a state into the user-facing view row. */
  def finish(state: DataFrame): DataFrame =
    state.select(col("priority"), col("month"), col("n_orders"),
      col("rev_state").cast("double").as("revenue"))
}
