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

  test("leakageSafeSplit: near-dup pairs never straddle; singletons match the naive split") {
    val docs = (1L to 200L).toDF("doc_id")
    // two multi-doc clusters (1-2-3 via chain, 10-11) + 195 singletons
    val pairs = Seq((1L, 2L), (2L, 3L), (10L, 11L)).toDF("a", "b")
    val out = Sampling.leakageSafeSplit(docs, "doc_id", pairs, "a", "b", 0.8)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
    assert(out.length === 200)
    val side = out.map(t => t._1 -> t._3).toMap
    // the leakage invariant: both endpoints of every pair on one side
    Seq((1L, 2L), (2L, 3L), (10L, 11L), (1L, 3L)).foreach { case (a, b) =>
      assert(side(a) === side(b), s"pair ($a,$b) straddles the split")
    }
    // cluster ids are the min reachable doc
    val cid = out.map(t => t._1 -> t._2).toMap
    assert(cid(1L) === 1L && cid(2L) === 1L && cid(3L) === 1L && cid(11L) === 10L)
    // singletons (cluster_id = own id) split exactly as trainEvalSplit would
    val naive = Sampling.trainEvalSplit((12L to 200L).toDF("doc_id"), $"doc_id", 0.8)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    naive.foreach { case (id, s) => assert(side(id) === s) }
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
    // eager contract (r7): only the returned (cached) result may be a NEW
    // storage entry — the build-side positives/item-index caches must have
    // been released inside the operator
    val before = spark.sparkContext.getPersistentRDDs.keySet
    val again = Sampling.negativeSample(pos.repartition(7), $"u", $"i", k = 3)
    val againRows = again
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(againRows.toSet === out.toSet)
    val added = spark.sparkContext.getPersistentRDDs.keySet -- before
    // ≤2: the returned (cached) result, plus zipWithIndexOrdered's internal
    // lazy localCheckpoint — the r12 pid-space-consistency fix necessarily
    // materializes the sorted+tagged table once (two evaluations of one
    // range exchange may disagree on spark_partition_id, which corrupted
    // offsets and dropped rows at sf1); that checkpoint RDD is unreferenced
    // after the result materializes and the ContextCleaner reclaims it on GC.
    assert(added.size <= 2,
      s"negativeSample left ${added.size} storage entries (expected the result + the offsets checkpoint)")
    again.unpersist(blocking = true)
  }

  test("stratified sample with an empty fraction map drops everything (no throw)") {
    val strat = keys.withColumn("s", ($"k" % 2).cast("string"))
    assert(Sampling.stratifiedSample(strat, $"k", $"s", Map.empty).count() === 0L)
  }

  test("poissonBootstrap: Poisson(1) replicate weights — mean n_eff near n, deterministic") {
    val df = keys.withColumn("v", ($"k" % 100).cast("double"))
    val out = Sampling.poissonBootstrap(df, $"k", $"v", b = 8)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getDouble(3)))
    assert(out.length === 8 && out.map(_._1).toSet === (0L to 7L).toSet)
    // E[n_eff] = 5000 per replicate; Poisson sd ≈ 71 — allow 5σ
    out.foreach { case (r, nEff, total, mean) =>
      assert(math.abs(nEff - 5000L) < 360, s"replicate $r n_eff=$nEff")
      assert(math.abs(mean - total / nEff) < 1e-3)
    }
    // replicates differ (independent weights), but reruns are identical
    assert(out.map(_._2).distinct.length > 1)
    val again = Sampling.poissonBootstrap(df.repartition(11), $"k", $"v", b = 8)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(again === out.map(t => (t._1, t._2)).toSet)
  }

  test("PoissonCuts are monotone and cover all but ~1e-4 of the hash space") {
    val cuts = Sampling.PoissonCuts
    assert(cuts === cuts.sorted && cuts.distinct.length === cuts.length)
    assert(cuts.last > (Sampling.HashSpace * 0.9999).toLong)
  }

  test("temperatureMix flattens the power law: tail keeps a larger share than head") {
    // head 4000 docs, tail 40 docs; α=0.5 weights ∝ sqrt(n)
    val df = ((1L to 4000L).map(i => (i, "head")) ++ (9001L to 9040L).map(i => (i, "tail")))
      .toDF("k", "s")
    val kept = Sampling.temperatureMix(df, $"k", $"s", budget = 400)
    val byS = kept.groupBy("s").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    // sqrt weights: sw_head ≈ 63.2e6, sw_tail ≈ 6.32e6 → shares 0.909/0.091;
    // head frac ≈ 400·0.909/4000 ≈ 0.0909, tail frac ≈ 400·0.091/40 ≈ 0.91.
    // Proportional sampling would keep tail at 400·(40/4040) ≈ 4 docs;
    // temperature keeps ~36 — the flattening is the point.
    assert(byS("tail") > 25, s"tail under-sampled: ${byS.mkString(",")}")
    val headFrac = byS("head").toDouble / 4000
    val tailFrac = byS("tail").toDouble / 40
    assert(tailFrac > headFrac * 5, s"no flattening: head=$headFrac tail=$tailFrac")
    // determinism across partitionings
    val again = Sampling.temperatureMix(df.repartition(7), $"k", $"s", budget = 400)
      .select("k").collect().map(_.getLong(0)).toSet
    assert(again === kept.select("k").collect().map(_.getLong(0)).toSet)
  }

  test("temperatureMix keeps a stratum whole when its fair share exceeds its size") {
    val df = ((1L to 1000L).map(i => (i, "big")) ++ Seq((5001L, "tiny"), (5002L, "tiny")))
      .toDF("k", "s")
    val byS = Sampling.temperatureMix(df, $"k", $"s", budget = 500)
      .groupBy("s").count().collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(byS("tiny") === 2L, "min(1, ·) cap must keep tiny strata whole")
  }

  test("weightedSample keeps high-weight rows at a higher rate, deterministically") {
    val df = (1L to 4000L).toDF("k")
      .withColumn("w", when($"k" <= 2000L, 1.0).otherwise(10.0))
    val kept = Sampling.weightedSample(df, $"k", $"w", targetFraction = 0.9)
      .collect().map(_.getLong(0))
    val lo = kept.count(_ <= 2000L) / 2000.0  // p = 0.9 * 1/10 = 0.09
    val hi = kept.count(_ > 2000L) / 2000.0   // p = 0.9
    assert(hi > 0.8 && hi < 1.0, s"hi rate $hi")
    assert(lo > 0.04 && lo < 0.15, s"lo rate $lo")
    val again = Sampling.weightedSample(df.repartition(9), $"k", $"w", 0.9)
      .collect().map(_.getLong(0)).toSet
    assert(again === kept.toSet)
  }

  test("groupKFold: every group lands in exactly one fold, folds cover 0..k-1") {
    val df = (1L to 2000L).map(i => (i, s"domain${i % 37}")).toDF("k", "g")
    val out = Sampling.groupKFold(df, $"g", 5).collect()
      .map(r => (r.getString(1), r.getLong(2)))
    assert(out.forall { case (_, f) => f >= 0 && f < 5 })
    // leakage-safety: one fold per group
    assert(out.groupBy(_._1).values.forall(_.map(_._2).distinct.size == 1))
    // with 37 domains over 5 folds, every fold should be populated
    assert(out.map(_._2).distinct.size === 5)
  }
}
