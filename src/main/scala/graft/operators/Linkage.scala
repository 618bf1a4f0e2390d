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

  /** EXACT edit-distance near-duplicate pairs: every unordered pair with
    * `levenshtein ≤ k`, found WITHOUT an all-pairs product via PassJoin
    * segment pigeonholing (Li, Deng & Feng 2011, "PASS-JOIN: a
    * partition-based method for similarity joins"): split each string
    * into k+1 contiguous even segments — if ed(s,t) ≤ k, the k+1 segments
    * of s align to disjoint regions of t absorbing ≤ k edits total, so at
    * least one segment incurs ZERO edits and occurs in t verbatim, start
    * shifted by at most k. Each string therefore emits its k+1 segments
    * (index side) and, for every source length in its ±k band, the
    * substrings that could equal such a segment (probe side: exact
    * expected start ± k, ~(2k+1)²(k+1) ≈ 75 probes at k = 2 — a CONSTANT
    * per row). Candidates come from one equi-join on
    * (source length, segment index, start, content) — maximally selective,
    * no length-class bucketing — then canonicalize, distinct, and verify
    * with the built-in codegen `levenshtein`. Exact: pigeonhole gives
    * recall, the verify gives precision, so output ≡ brute-force all-pairs
    * (which is what the oracle runs, length-banded).
    *
    * At 100 TB: candidate volume is data-sized × a constant, the join key
    * carries the segment CONTENT so uniform-prefix corpora cannot
    * degenerate into quadratic buckets — unless the full keys repeat, in
    * which case the OUTPUT is quadratic in the repeats and no algorithm
    * saves it: collapse exact repeats first (groupBy key, representative
    * id — exact dedup's job) and run this over the distinct key space, as
    * q_edit_neardup does (64 distinct names at every sf → 159 s of raw
    * repeat-pairs at sf0.1 became 2 s, saturating by sf10). Contract: strings
    * shorter than k+1 characters are EXCLUDED from matching (their
    * segments would be empty and match everywhere); callers with
    * meaningful sub-(k+1)-char keys should band them separately.
    */
  def editNearDup(df: DataFrame, id: String, key: String,
                  k: Int = 2): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    val kk = k + 1
    val strs = df
      .select(col(id).as("rid"), col(key).as("rname"))
      .withColumn("len", length(col("rname")).cast("long"))
      .filter(col("len") >= kk)
    // shared segment geometry for a source of length tl: segment i has
    // length base + (i < rem) and 1-based start i*base + min(i, rem) + 1
    def geom(d: DataFrame): DataFrame = d
      .withColumn("base", expr(s"tl div $kk"))
      .withColumn("rem", col("tl") % kk)
      .withColumn("slen",
        col("base") + when(col("i") < col("rem"), 1L).otherwise(0L))
      .withColumn("start",
        col("i") * col("base") + least(col("i"), col("rem")) + 1)
    val segs = geom(strs
      .withColumn("tl", col("len"))
      .withColumn("i", explode(sequence(lit(0L), lit(k.toLong)))))
      .select(col("rid").as("sid"), col("rname").as("sname"),
        col("tl"), col("i"), col("start"),
        expr("substring(rname, CAST(start AS INT), CAST(slen AS INT))")
          .as("seg"))
    val probes = geom(strs
      .withColumn("tl",
        explode(sequence(col("len") - k, col("len") + k)))
      .filter(col("tl") >= kk)
      .withColumn("i", explode(sequence(lit(0L), lit(k.toLong)))))
      .withColumn("lo", greatest(lit(1L), col("start") - k))
      .withColumn("hi", least(col("len") - col("slen") + 1, col("start") + k))
      .withColumn("pstart", explode(when(col("lo") <= col("hi"),
        sequence(col("lo"), col("hi")))
        .otherwise(array().cast("array<bigint>"))))
      .select(col("rid").as("pid"), col("rname").as("pname"),
        col("tl"), col("i"),
        expr("substring(rname, CAST(pstart AS INT), CAST(slen AS INT))")
          .as("seg"))
    // the probe start may legitimately sit up to k off the segment start
    // (that shift IS the edit); the ±k window above already encodes the
    // position constraint, so the join key carries only (tl, i, content)
    val cand = segs.drop("start").join(probes, Seq("tl", "i", "seg"))
      .filter(col("sid") =!= col("pid"))
      .select(
        when(col("sid") < col("pid"), col("sid")).otherwise(col("pid"))
          .as("id1"),
        when(col("sid") < col("pid"), col("pid")).otherwise(col("sid"))
          .as("id2"),
        when(col("sid") < col("pid"), col("sname")).otherwise(col("pname"))
          .as("name1"),
        when(col("sid") < col("pid"), col("pname")).otherwise(col("sname"))
          .as("name2"))
      .distinct()
    cand
      .withColumn("dist",
        levenshtein(col("name1"), col("name2")).cast("long"))
      .filter(col("dist") <= k)
  }
}
