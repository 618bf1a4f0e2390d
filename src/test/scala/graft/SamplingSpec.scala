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

  test("negativeSample: negatives are real items, never positives, k per pair max") {
    // user u buys items u..u+2 from a catalog that the positives span
    val pos = (1L to 20L).flatMap(u => (u to u + 2).map(i => (u, i))).toDF("u", "i")
    val out = Sampling.negativeSample(pos, $"u", $"i", k = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val posSet = (1L to 20L).flatMap(u => (u to u + 2).map(i => (u, i))).toSet
    val items = posSet.map(_._2)
    assert(out.nonEmpty)
    out.foreach { case (u, pi, j, ni) =>
      assert(posSet((u, pi)), "pos_item must be a true positive")
      assert(items(ni), "neg_item must come from the item universe")
      assert(!posSet((u, ni)), s"drew a true positive ($u,$ni) as negative")
      assert(j >= 0 && j < 3)
    }
    // at most k draws per positive, and fully deterministic across partitionings
    assert(out.groupBy(t => (t._1, t._2)).values.map(_.size).max <= 3)
    val again = Sampling.negativeSample(pos.repartition(7), $"u", $"i", k = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(again.toSet === out.toSet)
  }

  test("stratified sample with an empty fraction map drops everything (no throw)") {
    val strat = keys.withColumn("s", ($"k" % 2).cast("string"))
    assert(Sampling.stratifiedSample(strat, $"k", $"s", Map.empty).count() === 0L)
  }
}
