package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Explicit skew mitigation for big ⋈ big equi-joins (SURVEY.md §8 scale
  * toolkit). A hot join key concentrates one reducer's worth of rows in a
  * single task; salting spreads it: the probe (skewed) side gets a
  * deterministic salt in [0, n), the build side is replicated n times, and
  * the join key becomes (key, salt) — so one hot key fans out over n tasks.
  * The result is EXACTLY the plain join: salting is algebraically
  * transparent, which is what makes it oracle-checkable.
  *
  * AQE's skew-join split handles moderate runtime skew on its own; explicit
  * salting is for keys known to be pathological in advance (power-law user
  * ids, null-bucket keys) where replicating the build side n× is cheaper
  * than a stalled straggler. The same triangle-salting idea, specialized to
  * self-joins, lives in [[Dedup.jaccardPairs]].
  */
object Skew {

  /** Inner equi-join with an n-way salt on the probe side. The salt derives
    * from a hash of the probe's whole row (not the join key — salting the
    * key's hash would keep the hot key in one bucket).
    */
  def saltedEquiJoin(probe: DataFrame, build: DataFrame,
                     probeKey: Column, buildKey: Column, salt: Int): DataFrame = {
    val salted = probe.withColumn("__psalt",
      pmod(xxhash64(struct(probe.columns.map(col): _*)), lit(salt.toLong)))
    val replicated = build.withColumn("__bsalt",
      explode(array((0 until salt).map(s => lit(s.toLong)): _*)))
    salted.join(replicated,
        probeKey === buildKey && col("__psalt") === col("__bsalt"), "inner")
      .drop("__psalt", "__bsalt")
  }

  /** Join-fanout audit — the "why did my join explode" diagnostic read
    * BEFORE running a suspect join (the output-size sibling of
    * [[graft.operators.Quality]]'s key-skew read): for an equi join on
    * `key`, the exact output cardinality is Σ_k left(k)·right(k), computed
    * here from the two per-key count aggregates WITHOUT materializing the
    * join, next to each side's row/key counts and the worst per-key fanout
    * product. Two map-side-combinable aggregates + one key-sized equi join
    * — at 100 TB this costs two shuffles of (key, count) pairs instead of
    * the join's full output.
    */
  def joinFanoutAudit(left: DataFrame, leftKey: Column,
                      right: DataFrame, rightKey: Column): DataFrame = {
    val lc = left.groupBy(leftKey.as("k")).agg(count(lit(1)).as("nl"))
    val rc = right.groupBy(rightKey.as("k")).agg(count(lit(1)).as("nr"))
    lc.join(rc, Seq("k"))
      // DECIMAL(38,0) product (oracle: HUGEINT): the fanout estimate exists
      // precisely to warn about explosive joins, where nl·nr is LARGE — a
      // BIGINT product would wrap silently in Spark past ~3e9×3e9 on one
      // key. Outputs cast back to BIGINT (exact to 9.2e18).
      .select(col("k"),
        (col("nl").cast("decimal(19,0)") * col("nr")).as("fan"))
      .agg(count(lit(1)).as("n_matching_keys"),
        sum(col("fan")).cast("long").as("n_out_rows"),
        max(col("fan")).cast("long").as("max_key_fanout"))
      // side totals from the already-built count tables — no second scan
      // of either input (review r5)
      .crossJoin(broadcast(
        lc.agg(coalesce(sum(col("nl")), lit(0L)).as("n_left"))))
      .crossJoin(broadcast(
        rc.agg(coalesce(sum(col("nr")), lit(0L)).as("n_right"))))
      .select(col("n_left"), col("n_right"), col("n_matching_keys"),
        col("n_out_rows"), col("max_key_fanout"),
        graft.functions.GraftFunctions.detRound(
          col("n_out_rows").cast("double") / col("n_matching_keys"), 4)
          .as("avg_key_fanout"))
  }
}
