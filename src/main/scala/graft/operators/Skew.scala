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
}
