package graft

import org.apache.spark.sql.functions._
import graft.operators.{Curation, Events, TextAnalysis}

/** Round-5 corpus/ops operators: winnowing fingerprints, vocabulary
  * coverage (distributed prefix sum), per-domain cap, z-score anomalies.
  */
class Round5OpsSpec extends SparkSpec {
  import spark.implicits._

  /** Scala-side mirror of Dedup.hash60 for expected-value computation. */
  private def h60(s: String): Long = {
    val hex = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    java.lang.Long.parseLong(hex.take(15), 16)
  }

  test("winnow: one window over a 6-word doc picks the leftmost-min gram hash") {
    val df = Seq((1L, "a b c d e f")).toDF("doc_id", "text")
    val out = TextAnalysis.winnow(df, "doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    // grams: "a b c","b c d","c d e","d e f" → 4 hashes, window w=4 → 1 window
    val hs = Seq("a b c", "b c d", "c d e", "d e f").map(h60)
    val minH = hs.min
    val pos = hs.indexOf(minH) + 1
    assert(out.toSeq === Seq((1L, pos.toLong, minH)))
  }

  test("winnow: docs sharing a >= w+k-1 word substring share a fingerprint") {
    val shared = "the quick brown fox jumps over" // 6 words = w+k-1
    val df = Seq(
      (1L, s"intro words here $shared more tail text"),
      (2L, s"$shared completely different ending")
    ).toDF("doc_id", "text")
    val out = TextAnalysis.winnow(df, "doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getLong(2)))
    val d1 = out.filter(_._1 == 1L).map(_._2).toSet
    val d2 = out.filter(_._1 == 2L).map(_._2).toSet
    assert(d1.intersect(d2).nonEmpty, "winnowing guarantee violated")
  }

  test("winnow: short doc falls back to a single whole-text fingerprint") {
    val df = Seq((7L, "hi there")).toDF("doc_id", "text")
    val out = TextAnalysis.winnow(df, "doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(out.toSeq === Seq((7L, 1L, h60("hi there"))))
  }

  test("vocabCoverage: tiny corpus cumulative ranks are exact") {
    val df = Seq((1L, "a a a b b c")).toDF("doc_id", "text")
    val out = TextAnalysis.vocabCoverage(df, "doc_id", "text", Seq(0.5, 0.9, 0.99))
      .collect().map(r => (r.getDouble(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    // counts a:3 b:2 c:1, total 6; cum fracs 0.5, 5/6, 1.0
    assert(out.toSeq === Seq((0.5, 1L, 3L, 6L), (0.9, 3L, 6L, 6L), (0.99, 3L, 6L, 6L)))
  }

  test("capPerDomain keeps at most cap docs per domain, best quality first") {
    val docs = (1L to 60L).map(i => (i, s"some document text number $i with words", "big")) ++
      Seq((100L, "short", "small"), (101L, "also short", "small"))
    val df = docs.toDF("doc_id", "text", "source")
    val out = Curation.capPerDomain(df, "doc_id", "text", "source", 50)
    val byDomain = out.groupBy("domain").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(byDomain("big") === 50L)
    assert(byDomain("small") === 2L)
    // ranks are 1..n within each domain
    val ranks = out.filter($"domain" === "big")
      .select("rank_in_domain").collect().map(_.getLong(0)).sorted
    assert(ranks.toSeq === (1L to 50L))
  }

  test("containmentPairs finds a doc subsumed in a longer one (asymmetric)") {
    val inner = "alpha beta gamma delta epsilon"
    val df = Seq(
      (1L, inner),                                     // ⊂ doc 2
      (2L, s"prefix words $inner suffix tail words"),
      (3L, "totally unrelated content with many different words here")
    ).toDF("doc_id", "text")
    val out = graft.operators.Dedup.containmentPairs(df, "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    // doc 1's 3 shingles all occur in doc 2 → containment(1 in 2) = 1.0;
    // doc 2 has 10 shingles, only 3 shared → 0.3 < 0.9 (not emitted)
    assert(out === Set((1L, 2L, 1.0)))
  }

  test("slidingCounts: each event lands in exactly its two hopping windows") {
    val base = java.sql.Timestamp.valueOf("2024-01-01 05:30:00")
    val df = Seq((base, "view", 1L)).toDF("ts", "event_type", "user_id")
    val out = Events.slidingCounts(df).orderBy("win_start").collect()
      .map(r => (r.getTimestamp(0), r.getLong(2), r.getLong(3)))
    val h4 = java.sql.Timestamp.valueOf("2024-01-01 04:00:00")
    val h5 = java.sql.Timestamp.valueOf("2024-01-01 05:00:00")
    assert(out.toSeq === Seq((h4, 1L, 1L), (h5, 1L, 1L)))
  }

  test("applyChangeLog: latest version wins, deleted keys disappear") {
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    val log = Seq(
      (1L, ts("2024-01-01 00:00:00"), "I", 10.0),
      (1L, ts("2024-01-02 00:00:00"), "U", 11.0),
      (2L, ts("2024-01-01 00:00:00"), "I", 20.0),
      (2L, ts("2024-01-03 00:00:00"), "D", 0.0),
      (3L, ts("2024-01-01 00:00:00"), "I", 30.0)
    ).toDF("k", "vts", "op", "price")
    val out = graft.operators.Cdc.applyChangeLog(log, $"k", $"vts", $"op")
      .orderBy($"k").collect().map(r => (r.getLong(0), r.getString(2), r.getDouble(3)))
    assert(out.toSeq === Seq((1L, "U", 11.0), (3L, "I", 30.0)))
  }

  test("reservoirPerGroup: k per group, deterministic across partitionings") {
    val df = (1L to 500L).map(i => (i, if (i % 3 == 0) "a" else "b")).toDF("id", "g")
    val r1 = graft.operators.Sampling.reservoirPerGroup(df, $"id", $"g", 10)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(r1.count(_._1 == "a") === 10 && r1.count(_._1 == "b") === 10)
    val r2 = graft.operators.Sampling.reservoirPerGroup(df.repartition(17), $"id", $"g", 10)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(r1.sorted.toSeq === r2.sorted.toSeq)
    // a group smaller than k is kept whole
    val small = graft.operators.Sampling.reservoirPerGroup(
      Seq((1L, "x"), (2L, "x")).toDF("id", "g"), $"id", $"g", 10).count()
    assert(small === 2L)
  }

  test("kmeansStep: hand-checked assignment and quantized cell means") {
    val emb = Seq(
      (0L, Seq(1.0f, 0.0f), 0),
      (1L, Seq(2.0f, 0.0f), 0), // cos with v0 = 1 → cell 0
      (2L, Seq(0.0f, 1.0f), 0),
      (3L, Seq(0.0f, 3.0f), 0)  // cos with v2 = 1 → cell 2
    ).toDF("vec_id", "embedding", "label")
    val out = graft.operators.Similarity.kmeansStep(emb, centroidEvery = 2)
      .orderBy($"cell", $"pos").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getLong(3)))
    assert(out.toSeq === Seq(
      (0L, 0L, 1.5, 2L), (0L, 1L, 0.0, 2L),
      (2L, 0L, 0.0, 2L), (2L, 1L, 2.0, 2L)))
  }

  test("Quality.report counts violations per rule with one aggregate per table") {
    import graft.operators.Quality
    val t = Seq((1L, "ok"), (2L, null), (3L, ""), (4L, "fine"))
      .toDF("id", "name")
    val out = Quality.report(Map("t" -> t), Seq(
      Quality.Rule("blank_name", "t", $"name".isNull || $"name" === ""),
      Quality.Rule("high_id", "t", $"id" > 3)))
      .orderBy("rule").collect()
      .map(r => (r.getString(0), r.getLong(2), r.getLong(3), r.getDouble(4)))
    assert(out.toSeq === Seq(
      ("blank_name", 4L, 2L, 0.5), ("high_id", 4L, 1L, 0.25)))
  }

  test("Incremental: merged partial states equal the full aggregate") {
    import graft.operators.Incremental
    val df = (1 to 300).map { i =>
      (s"P$i", java.sql.Timestamp.valueOf(f"1995-${i % 12 + 1}%02d-03 00:00:00"),
        i * 1.25)
    }.toDF("o_orderpriority", "o_orderdate", "o_totalprice")
    val full = Incremental.finish(Incremental.revenueState(df))
      .orderBy("priority", "month").collect()
    val parts = Seq(
      Incremental.revenueState(df.filter($"o_totalprice" < 100)),
      Incremental.revenueState(df.filter($"o_totalprice" >= 100 && $"o_totalprice" < 250)),
      Incremental.revenueState(df.filter($"o_totalprice" >= 250)))
    val merged = Incremental.finish(Incremental.merge(parts))
      .orderBy("priority", "month").collect()
    assert(merged.toSeq === full.toSeq)
  }

  test("retention: hand-built two-week cohort curve") {
    // week of 2024-01-01 is a Monday; users 1,2 active week 0, user 1 again
    // in week 1 → cohort size 2, retention (age 0) = 1.0, (age 1) = 0.5
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    val df = Seq(
      (1L, ts("2024-01-02 10:00:00")), (2L, ts("2024-01-03 11:00:00")),
      (1L, ts("2024-01-09 09:00:00"))
    ).toDF("user_id", "ts")
    val out = Events.retention(df).orderBy("age_weeks").collect()
      .map(r => (r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4)))
    assert(out.toSeq === Seq((0L, 2L, 2L, 1.0), (1L, 1L, 2L, 0.5)))
  }

  test("capPerDomainAgg (TopKByScore aggregate) equals the window form exactly") {
    val docs = (1L to 200L).map(i =>
      (i, s"doc number $i with some words ${"repeat " * (i % 7).toInt}", s"d${i % 3}"))
    val df = docs.toDF("doc_id", "text", "source")
    val win = Curation.capPerDomain(df, "doc_id", "text", "source", 10)
      .orderBy($"domain", $"rank_in_domain").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getDouble(2), r.getLong(3)))
    val agg = Curation.capPerDomainAgg(df, "doc_id", "text", "source", 10)
      .orderBy($"domain", $"rank_in_domain").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getDouble(2), r.getLong(3)))
    assert(agg.toSeq === win.toSeq)
    // the aggregate must split partial/final (map-side combinable state)
    val plan = Curation.capPerDomainAgg(df, "doc_id", "text", "source", 10)
      .queryExecution.executedPlan.toString
    assert(plan.contains("ObjectHashAggregate") || plan.contains("SortAggregate"),
      plan.take(1200))
    assert(plan.contains("partial_topk_by_score"), "no map-side partial aggregation")
  }

  test("domainConcentration: gini 0 on equal shares, hand-computed on skew") {
    val equal = (1L to 40L).map(i => (i, "t", s"d${i % 4}")).toDF("doc_id", "text", "source")
    val g0 = Curation.domainConcentration(equal, "source").collect()(0)
    assert((g0.getLong(0), g0.getLong(1), g0.getDouble(2)) === ((4L, 40L, 0.0)))
    // counts {1,1,1,97}: ranks 1..4 → G = (2·394 − 5·100) / (4·100) = 0.72
    val skew = ((1L to 3L).map(i => (i, "t", s"s$i")) ++
      (10L to 106L).map(i => (i, "t", "mega"))).toDF("doc_id", "text", "source")
    val g1 = Curation.domainConcentration(skew, "source").collect()(0)
    assert((g1.getLong(0), g1.getLong(1), g1.getDouble(2)) === ((4L, 100L, 0.72)))
  }

  test("TopKBuffer: NaN sorts strongest (window parity) and never freezes eviction") {
    // Spark window desc and DuckDB ORDER BY DESC both put NaN above every
    // double — the buffer must agree so agg == window on NaN inputs.
    val b = new graft.functions.TopKBuffer(2)
    b.insert(Double.NaN, 1L)
    b.insert(0.1, 2L)
    b.insert(0.9, 3L) // evicts 0.1 — the weakest-scan must not park on the NaN
    assert(b.sorted.toSeq.map(t => (t._1.isNaN, t._2)) ===
      Seq((true, 1L), (false, 3L)))
    // all-NaN group still ranks deterministically by id
    val c = new graft.functions.TopKBuffer(2)
    c.insert(Double.NaN, 5L); c.insert(Double.NaN, 4L); c.insert(Double.NaN, 6L)
    assert(c.sorted.map(_._2).toSeq === Seq(4L, 5L))
  }

  test("zscoreAnomalies flags an injected spike with the hand-computed z") {
    // 24 trailing hours alternating 10/12 events, then a 100-event spike:
    // mean 11, var (24*2928 - 264^2)/576 = 1 → z = (100-11)/1 = 89
    val base = java.sql.Timestamp.valueOf("2024-01-01 00:00:00")
    def at(h: Int, k: Int) = new java.sql.Timestamp(base.getTime + h * 3600000L + k * 1000L)
    val evs = (0 until 24).flatMap { h =>
      val n = if (h % 2 == 0) 10 else 12
      (0 until n).map(k => (at(h, k), "t"))
    } ++ (0 until 100).map(k => (at(24, k), "t"))
    val df = evs.toDF("ts", "event_type")
    val out = Events.zscoreAnomalies(df, trail = 24, topK = 5).collect()
    assert(out.nonEmpty)
    val top = out.head
    assert(top.getAs[String]("event_type") === "t")
    assert(top.getAs[Long]("n_events") === 100L)
    assert(top.getAs[Double]("trail_mean") === 11.0)
    assert(top.getAs[Double]("z") === 89.0)
  }
}
