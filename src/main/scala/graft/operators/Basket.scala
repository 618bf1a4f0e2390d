package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.GraftFunctions.detRound

/** Market-basket co-occurrence statistics — SURVEY.md §7.5 extension; no
  * reference counterpart. The same shape computes word/feature co-occurrence
  * matrices for embedding training (PMI-style association over contexts):
  * context = order, item = part.
  *
  * All pair generation funnels through [[copurchasePairs]] — the ONE shared,
  * skew-guarded edge artifact the whole graph family (lift, triangles, label
  * propagation, PageRank) consumes, so the quadratic-in-basket-size step
  * exists in exactly one place and is capped there.
  */
object Basket {

  /** Pair generation is quadratic in basket size, so one pathological
    * mega-basket (10⁵ items on a single order key) would put 10¹⁰ pairs on
    * one shuffle key. Baskets above this size carry no association signal
    * (every pair's support is 1 from that basket) and are dropped BEFORE the
    * self-join. 1024 is far above any real basket (TPC-H max is 7 distinct
    * parts per order) while bounding per-key work at ~0.5M pairs. */
  val DefaultMaxBasketSize = 1024

  /** Minimum pair co-occurrence count kept by [[copurchasePairs]]. Pruning
    * BEFORE any downstream join keeps the edge table broadcast-small. */
  val DefaultMinSupport = 3

  /** Distinct (basket `ok`, item `pk`) pairs with the skew guard applied:
    * baskets holding more than `maxBasketSize` distinct items are dropped.
    * The size is a count-over-partition window on the basket key — one
    * shuffle, and the output stays hash-partitioned on `ok` so the
    * downstream self-join reuses the exchange for both sides.
    */
  def basketItems(li: DataFrame,
                  maxBasketSize: Int = DefaultMaxBasketSize): DataFrame =
    li.select(col("l_orderkey").as("ok"), col("l_partkey").as("pk")).distinct()
      .withColumn("bsz", count(lit(1)).over(Window.partitionBy(col("ok"))))
      .filter(col("bsz") <= maxBasketSize)
      .select(col("ok"), col("pk"))

  /** Min-support-pruned undirected co-purchase pairs:
    * (pk_a < pk_b, c_ab ≥ minSupport).
    *
    * Scale design: the pair generator is a self-join CO-PARTITIONED on the
    * basket key (one shuffle of the deduped, size-capped item list; Catalyst
    * reuses the exchange for both sides), so pairs form only WITHIN a basket
    * — quadratic in basket size (bounded by `maxBasketSize`), never in
    * corpus size. The support prune runs in the pair aggregate itself,
    * BEFORE any downstream join sees the edge table.
    */
  def copurchasePairs(li: DataFrame, minSupport: Int = DefaultMinSupport,
                      maxBasketSize: Int = DefaultMaxBasketSize): DataFrame = {
    val items = basketItems(li, maxBasketSize)
    val a = items.select(col("ok"), col("pk").as("pk_a"))
    val b = items.select(col("ok"), col("pk").as("pk_b"))
    a.join(b, Seq("ok"))
      .filter(col("pk_a") < col("pk_b"))
      .groupBy(col("pk_a"), col("pk_b")).agg(count(lit(1)).as("c_ab"))
      .filter(col("c_ab") >= minSupport)
  }

  /** The pruned co-purchase graph as a DIRECTED edge list (both directions
    * of every undirected pair) — the shape [[Graph.pagerankStep]] and
    * [[Graph.labelPropStep]] consume. Mirroring is a union over the pruned
    * pair table; callers that read the edge list more than once should
    * cache the (tiny, post-prune) [[copurchasePairs]] output first.
    */
  def copurchaseEdges(pairs: DataFrame): DataFrame =
    pairs.select(col("pk_a").as("src"), col("pk_b").as("dst"))
      .unionAll(pairs.select(col("pk_b").as("src"), col("pk_a").as("dst")))

  /** Pairwise co-occurrence counts + lift over (order, part) baskets.
    *
    * lift(a,b) = P(a,b) / (P(a)·P(b)) = n·c_ab / (c_a·c_b) — the association
    * strength relational engines can compute cross-engine EXACTLY: one
    * integer product, one IEEE division (PMI = ln(lift) is a monotone
    * transform of it; ln is omitted from the compared output because libm
    * last-ULP varies across engines — same convention as
    * [[TextAnalysis.topTermsByTfRarity]]).
    *
    * Item marginals are one hash aggregate over the same capped item table
    * the pairs form on (consistent universe); the grand total is a broadcast
    * scalar. Pair generation and pruning live in [[copurchasePairs]].
    */
  def cooccurrenceLift(li: DataFrame, minSupport: Int = DefaultMinSupport,
                       maxBasketSize: Int = DefaultMaxBasketSize): DataFrame = {
    val items = basketItems(li, maxBasketSize)
    val nOrders = items.select(countDistinct(col("ok")).as("n_orders"))
    val cnt = items.groupBy(col("pk")).agg(count(lit(1)).as("c"))
    copurchasePairs(li, minSupport, maxBasketSize)
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
