package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.functions.GraftFunctions.detRound

/** Iterative graph analytics on relational edges — the second graph
  * operator family next to [[Dedup.connectedComponents]]. Same execution
  * contract: one iteration = one co-partitioned join + one
  * map-side-combinable aggregate (O(iterations) jobs, never a driver loop
  * over vertices), state is a (node, value) table.
  */
object Graph {

  /** One PageRank iteration (damping 0.85) over an edge list, engine-exact:
    * each node's outgoing contribution `r/deg` is an IEEE division; the
    * in-neighbor accumulation — the order-sensitive float sum that normally
    * makes distributed PageRank non-reproducible — is quantized to 1e-12
    * integers BEFORE summing (labelCentroids' recipe), so partial
    * aggregates merge bit-identically on any partitioning or engine.
    *
    * `ranks` is (node, r); pass the output back in for the next iteration.
    * Dangling nodes (no out-edges) are assumed absent from `edges` sources
    * — standard for co-occurrence graphs, where edges are symmetric.
    */
  def pagerankStep(edges: DataFrame, ranks: DataFrame,
                   quantScale: Double = 1e12): DataFrame = {
    val deg = edges.groupBy(col("src")).agg(count(lit(1)).as("deg"))
    val contrib = edges.join(deg, Seq("src")).join(
        ranks.withColumnRenamed("node", "src"), Seq("src"))
      .withColumn("c", col("r") / col("deg"))
      .select(col("dst").as("node"),
        floor(col("c") * quantScale + 0.5).as("q"))
    val n = ranks.agg(count(lit(1)).as("n_nodes"))
    contrib.groupBy(col("node")).agg(sum(col("q")).as("sq"))
      .crossJoin(broadcast(n))
      .select(col("node"),
        detRound(lit(0.15) / col("n_nodes") +
          lit(0.85) * (col("sq") / quantScale), 10).as("r"))
  }

  /** Uniform 1/N starting ranks for the nodes appearing in `edges`. */
  def uniformRanks(edges: DataFrame): DataFrame = {
    val nodes = edges.select(col("src").as("node"))
      .unionAll(edges.select(col("dst").as("node"))).distinct()
    nodes.crossJoin(broadcast(nodes.agg(count(lit(1)).as("n"))))
      .select(col("node"), (lit(1.0) / col("n")).as("r"))
  }
}
