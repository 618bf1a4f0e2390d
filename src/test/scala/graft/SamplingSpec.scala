package graft

import org.apache.spark.sql.functions._
import graft.operators.Sampling

class SamplingSpec extends SparkSpec {
  import spark.implicits._

  private lazy val keys = (1L to 5000L).toDF("k")

  test("deterministic sample: same rows on every run, regardless of partitioning") {
    val a = Sampling.sample(keys, $"k", 0.3).collect().map(_.getLong(0)).toSet
    val b = Sampling.sample(keys.repartition(13), $"k", 0.3)
      .collect().map(_.getLong(0)).toSet
    assert(a === b)
    // Bernoulli(0.3) over 5000 keys: expect ~1500, allow generous slack
    assert(a.size > 1300 && a.size < 1700, s"got ${a.size}")
  }

  test("train/eval split is disjoint, exhaustive and nested across fractions") {
    val s8 = Sampling.trainEvalSplit(keys, $"k", 0.8)
    val byTag = s8.groupBy("split").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(byTag("train") + byTag("eval") === 5000L)
    assert(byTag("train") > 3800 && byTag("train") < 4200)
    // an 0.5 sample is a subset of the 0.8 train side (same hash, lower cut)
    val half = Sampling.sample(keys, $"k", 0.5).collect().map(_.getLong(0)).toSet
    val train = s8.filter($"split" === "train").collect().map(_.getLong(0)).toSet
    assert(half.subsetOf(train))
  }

  test("rebalanceToTarget caps dominant strata near the target, keeps small ones whole") {
    val df = ((1L to 4000L).map(i => (i, "big")) ++ (9001L to 9050L).map(i => (i, "small")))
      .toDF("k", "s")
    val kept = Sampling.rebalanceToTarget(df, $"k", $"s", 400)
    val byS = kept.groupBy("s").count().collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(byS("small") === 50L, "under-target stratum must be kept whole")
    // Bernoulli(0.1) over 4000: expect ~400, generous slack
    assert(byS("big") > 280 && byS("big") < 520, s"got ${byS("big")}")
    // determinism across partitionings
    val again = Sampling.rebalanceToTarget(df.repartition(7), $"k", $"s", 400)
      .select("k").collect().map(_.getLong(0)).toSet
    assert(again === kept.select("k").collect().map(_.getLong(0)).toSet)
  }

  test("stratified sample with an empty fraction map drops everything (no throw)") {
    val strat = keys.withColumn("s", ($"k" % 2).cast("string"))
    assert(Sampling.stratifiedSample(strat, $"k", $"s", Map.empty).count() === 0L)
  }
}
