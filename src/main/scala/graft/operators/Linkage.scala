package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Record linkage / entity resolution over a fuzzy string key.
  *
  * The candidate generator is the sorted-neighborhood method (Hernández &
  * Stolfo 1995, "The merge/purge problem for large databases"): rank all
  * records by the key, compare each record only to its `w` successors in
  * rank order. Candidates are `N·w` BY CONSTRUCTION — unlike equi-blocking
  * (brand/prefix buckets), whose per-block pair counts grow quadratically
  * with the data and which this engine's own scale probes class as a
  * quadratic anchor. The rank comes from
  * [[Surrogate.zipWithIndexOrdered]] (the two-pass offset scheme — no
  * single-partition window), neighbor expansion is a rank equi-join, and
  * the comparator is the codegen Jaro–Winkler expression
  * ([[graft.functions.StringSim]]) whose bit-exact DuckDB parity keeps the
  * threshold predicate oracle-stable. At 100 TB: one range-shuffle to
  * rank, one equi-shuffle to pair, `w` rows out per record, all scoring
  * inside WholeStageCodegen.
  */
object Linkage {

  /** Matched pairs (id1, id2, name1, name2, sim) with `sim ≥ threshold`,
    * id1 the lower-ranked record; ranks tie-break on id so the pairing is
    * deterministic. `sim` is det-rounded for output; the threshold is
    * applied to the RAW double (bit-identical in the DuckDB oracle). */
  def sortedNeighborhood(df: DataFrame, id: String, key: String,
                         w: Int = 5, threshold: Double = 0.9): DataFrame = {
    require(w >= 1, s"window must be >= 1, got $w")
    val ranked = Surrogate.zipWithIndexOrdered(
      df.select(col(id).as("id1"), col(key).as("name1")), "rk",
      Seq(col("name1"), col("id1")))
      .localCheckpoint(false) // one materialization feeds both join sides
    val lefts = ranked
      .withColumn("off", explode(sequence(lit(1), lit(w))))
      .select(col("id1"), col("name1"), (col("rk") + col("off")).as("rk"))
    val cand = lefts.join(
      ranked.select(col("rk"), col("id1").as("id2"),
        col("name1").as("name2")),
      Seq("rk"))
    cand
      .withColumn("s",
        graft.functions.StringSim.jaroWinklerCol(col("name1"), col("name2")))
      .filter(col("s") >= threshold)
      .select(col("id1"), col("id2"), col("name1"), col("name2"),
        graft.functions.GraftFunctions.detRound(col("s"), 4).as("sim"))
  }
}
