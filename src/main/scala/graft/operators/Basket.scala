package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.functions.GraftFunctions.detRound

/** Market-basket co-occurrence statistics — SURVEY.md §7.5 extension; no
  * reference counterpart. The same shape computes word/feature co-occurrence
  * matrices for embedding training (PMI-style association over contexts):
  * context = order, item = part.
  */
object Basket {

  /** Pairwise co-occurrence counts + lift over (order, part) baskets.
    *
    * lift(a,b) = P(a,b) / (P(a)·P(b)) = n·c_ab / (c_a·c_b) — the association
    * strength relational engines can compute cross-engine EXACTLY: one
    * integer product, one IEEE division (PMI = ln(lift) is a monotone
    * transform of it; ln is omitted from the compared output because libm
    * last-ULP varies across engines — same convention as
    * [[TextAnalysis.topTermsByTfRarity]]).
    *
    * Scale design: the pair generator is a self-join CO-PARTITIONED on the
    * basket key (one shuffle of the deduped item list; Catalyst reuses the
    * exchange for both sides), so pairs form only WITHIN a basket —
    * quadratic in basket size (bounded, ~items-per-order), never in corpus
    * size. Item marginals are one hash aggregate; the grand total is a
    * broadcast scalar. `minSupport` prunes the pair tail BEFORE the marginal
    * joins.
    */
  def cooccurrenceLift(li: DataFrame, minSupport: Int = 3): DataFrame = {
    val items = li.select(col("l_orderkey").as("ok"), col("l_partkey").as("pk")).distinct()
    val nOrders = items.select(countDistinct(col("ok")).as("n_orders"))
    val cnt = items.groupBy(col("pk")).agg(count(lit(1)).as("c"))
    val a = items.select(col("ok"), col("pk").as("pk_a"))
    val b = items.select(col("ok"), col("pk").as("pk_b"))
    val pairs = a.join(b, Seq("ok"))
      .filter(col("pk_a") < col("pk_b"))
      .groupBy(col("pk_a"), col("pk_b")).agg(count(lit(1)).as("c_ab"))
      .filter(col("c_ab") >= minSupport)
    pairs
      .join(cnt.select(col("pk").as("pk_a"), col("c").as("c_a")), Seq("pk_a"))
      .join(cnt.select(col("pk").as("pk_b"), col("c").as("c_b")), Seq("pk_b"))
      .crossJoin(broadcast(nOrders))
      .withColumn("lift",
        // c_a·c_b stays in DOUBLE: a BIGINT product wraps silently in Spark
        // (throws in DuckDB) once two items each appear in >3e9 baskets —
        // the same overflow class driftFromCounts fixed (r5 advice).
        detRound(col("c_ab") * col("n_orders").cast("double")
          / (col("c_a").cast("double") * col("c_b")), 4))
      .select(col("pk_a"), col("pk_b"), col("c_ab"), col("c_a"), col("c_b"), col("lift"))
  }
}
