package graft

import org.apache.spark.sql.functions._
import graft.operators.{Basket, Layout, Olap, Packing, Reconcile, Sampling, Similarity, Sketches, TextAnalysis}

/** Continuation-round operators: BM25, top n-grams, co-occurrence lift,
  * Z-order layout, sequence packing, semantic dedup, histogram quantiles.
  */
class CorpusStatsSpec extends SparkSpec {
  import spark.implicits._

  private def detRound(v: Double, scale: Int = 4): Double = {
    val m = math.pow(10, scale)
    math.floor(v * m + 0.5) / m
  }

  // ---- Z-order ------------------------------------------------------------

  test("zValue interleaves bits: (x=3, y=5) -> 39") {
    // x=0b011 -> bits at 0,2; y=0b101 -> bits at 1,5: 1+2+4+32 = 39
    val out = Seq((3L, 5L)).toDF("x", "y")
      .select(Layout.zValue(col("x"), col("y"), 8).as("z")).head().getLong(0)
    assert(out === 39L)
  }

  test("zorderCells: every cell bounds a narrow px AND sx rectangle") {
    val grid = (0 until 256).flatMap(p => Seq(64, 192).map(s => (p.toLong, s.toLong)))
    val li = grid.toDF("l_partkey", "l_suppkey")
    val cells = Layout.zorderCells(li).collect()
    assert(cells.nonEmpty)
    cells.foreach { r =>
      val (pxMin, pxMax) = (r.getAs[Long]("px_min"), r.getAs[Long]("px_max"))
      val (sxMin, sxMax) = (r.getAs[Long]("sx_min"), r.getAs[Long]("sx_max"))
      // zcell = top 6 interleaved bits -> top 3 bits of each dim are fixed
      assert(pxMin >> 5 === pxMax >> 5, s"px box too wide in $r")
      assert(sxMin >> 5 === sxMax >> 5, s"sx box too wide in $r")
    }
  }

  // ---- Sequence packing ---------------------------------------------------

  test("packPlan: offsets are the exclusive prefix sum; straddlers flagged") {
    val docs = Seq((1L, "a b c"), (2L, "d e f g h"), (3L, "i j k l"))
      .toDF("doc_id", "text")
    val out = Packing.packPlan(docs, "doc_id", "text", 6).orderBy("doc_id")
      .select("doc_id", "n_tokens", "rank", "offset", "seq_id", "crosses_boundary")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getBoolean(5)))
    assert(out.toSeq === Seq(
      (1L, 3L, 1L, 0L, 0L, false),   // tokens 0..2
      (2L, 5L, 2L, 3L, 0L, true),    // tokens 3..7 straddle the 6 boundary
      (3L, 4L, 3L, 8L, 1L, false)))  // tokens 8..11
  }

  test("packFromCounts: zero-token docs hold no positions and never straddle") {
    // doc 2 contributes nothing: doc 3's offset is unchanged by it, and the
    // zero-token row is pinned crosses_boundary = false even when it sits
    // exactly ON a boundary (cum == offset there — the (cum−1) div case the
    // guard exists for: Spark's truncating div and DuckDB's flooring //
    // disagree at cum = 0)
    val counts = Seq((1L, 6L), (2L, 0L), (3L, 4L)).toDF("doc_id", "n_tokens")
    val out = graft.operators.Packing.packFromCounts(counts, 6).orderBy("doc_id")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(3),
        r.getLong(4), r.getBoolean(5)))
    assert(out.toSeq === Seq(
      (1L, 6L, 0L, 0L, false),  // exactly fills sequence 0
      (2L, 0L, 6L, 1L, false),  // ON the boundary, zero-width: no straddle
      (3L, 4L, 6L, 1L, false)))
    // the all-zero corpus is defined too (cum = 0 everywhere)
    val zeros = Seq((1L, 0L), (2L, 0L)).toDF("doc_id", "n_tokens")
    val z = graft.operators.Packing.packFromCounts(zeros, 6)
      .collect().map(_.getBoolean(5))
    assert(z.forall(_ == false))
  }

  // ---- Semantic dedup -----------------------------------------------------

  test("semanticDedup: identical vector with higher id is dropped, orthogonal kept") {
    val emb = Seq(
      (0L, Seq(1f, 0f)), // centroid (0 % 40 == 0) and corpus member
      (1L, Seq(1f, 0f)), // cos 1.0 with vec 0 -> dropped
      (2L, Seq(0f, 1f))  // cos 0.0 with both -> kept
    ).toDF("vec_id", "embedding")
    val out = Similarity.semanticDedup(emb, centroidEvery = 40, threshold = 0.3)
      .orderBy("vec_id").collect()
      .map(r => (r.getLong(0), r.getBoolean(2)))
    assert(out.toSeq === Seq((0L, true), (1L, false), (2L, true)))
  }

  // ---- Histogram quantiles ------------------------------------------------

  test("histogramQuantiles: interpolated median of 1..100 at width 10 is 51.0") {
    val df = (1 to 100).map(_.toDouble).toDF("v")
    val out = Sketches.histogramQuantiles(df, col("v"), 10.0, Seq(0.5)).head()
    assert(out.getAs[Long]("target") === 50L)
    assert(out.getAs[Long]("bin") === 5L)       // cum reaches 50 in bin 5 (50..59)
    assert(out.getAs[Double]("estimate") === 51.0)
    assert(math.abs(out.getAs[Double]("estimate") - 50.5) <= 10.0) // one-bin bound
  }

  // ---- Co-occurrence lift -------------------------------------------------

  test("cooccurrenceLift: exact lift on a known basket set") {
    val li = Seq((1L, 10L), (1L, 20L), (2L, 10L), (2L, 20L),
      (3L, 10L), (3L, 20L), (4L, 10L), (4L, 30L))
      .toDF("l_orderkey", "l_partkey")
    val out = Basket.cooccurrenceLift(li, minSupport = 3).collect()
    assert(out.length === 1)
    val r = out.head
    // c_ab=3, c_a(10)=4, c_b(20)=3, n=4 -> lift = 3*4/(4*3) = 1.0
    assert((r.getAs[Long]("pk_a"), r.getAs[Long]("pk_b")) === ((10L, 20L)))
    assert(r.getAs[Long]("c_ab") === 3L)
    assert(r.getAs[Double]("lift") === 1.0)
  }

  test("copurchasePairs: a mega-basket above the skew cap produces NO pairs") {
    // one pathological 12-item basket + three honest 2-item baskets; with
    // the cap at 10, the mega-basket is dropped BEFORE pair generation, so
    // the quadratic blow-up (66 pairs here, 10^10 at 10^5 items) never forms
    val mega = (1L to 12L).map(pk => (100L, pk))
    val small = Seq(1L, 2L, 3L).flatMap(ok => Seq((ok, 1L), (ok, 2L)))
    val li = (mega ++ small).toDF("l_orderkey", "l_partkey")
    val out = Basket.copurchasePairs(li, minSupport = 3, maxBasketSize = 10).collect()
    assert(out.length === 1)
    assert((out.head.getLong(0), out.head.getLong(1), out.head.getLong(2)) === ((1L, 2L, 3L)))
    // and the capped item universe also excludes the mega-basket from
    // marginals: lift sees n_orders = 3, c_a = c_b = 3 -> lift = 1.0
    val lift = Basket.cooccurrenceLift(li, minSupport = 3, maxBasketSize = 10).collect()
    assert(lift.length === 1 && lift.head.getAs[Double]("lift") === 1.0)
  }

  test("copurchaseEdges mirrors every pruned pair in both directions") {
    val li = Seq(1L, 2L, 3L).flatMap(ok => Seq((ok, 10L), (ok, 20L)))
      .toDF("l_orderkey", "l_partkey")
    val edges = Basket.copurchaseEdges(Basket.copurchasePairs(li))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(edges === Set((10L, 20L), (20L, 10L)))
  }

  // ---- BM25 ---------------------------------------------------------------

  test("bm25TopTerms: matches the hand-computed formula and saturates tf") {
    val docs = Seq((1L, "x x x x y"), (2L, "y z")).toDF("doc_id", "text")
    val out = TextAnalysis.bm25TopTerms(docs, "doc_id", "text", k = 3)
      .collect().map(r => ((r.getLong(0), r.getString(2)), r.getDouble(5))).toMap
    val nDocs = 2.0
    val avgdl = 7.0 / 2.0
    def idf(df: Double) = (nDocs - df + 0.5) / (df + 0.5) + 1.0
    def score(tf: Double, df: Double, dl: Double) =
      detRound(idf(df) * (tf * 2.2) / (tf + 1.2 * (0.25 + 0.75 * dl / avgdl)))
    assert(out((1L, "x")) === score(4, 1, 5))
    assert(out((1L, "y")) === score(1, 2, 5))
    assert(out((2L, "y")) === score(1, 2, 2))
    assert(out((2L, "z")) === score(1, 1, 2))
    // saturation: 4 occurrences score far less than 4x one occurrence
    assert(out((1L, "x")) < 4 * score(1, 1, 5))
  }

  // ---- Product quantization ----------------------------------------------

  test("pqCode: each subvector codes to its nearest codebook entry under L2²") {
    val emb = Seq(
      (0L, Seq(1f, 0f, 0f, 0f)), // codebook (0 % 2 == 0)
      (1L, Seq(1f, 0f, 0f, 1f)),
      (2L, Seq(0f, 1f, 1f, 0f))  // codebook
    ).toDF("vec_id", "embedding")
    val out = Similarity.pqCode(emb, m = 2, dim = 4, centroidEvery = 2)
      .orderBy("vec_id", "sub").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    // vec 1 sub0 [1,0]: d(c0=[1,0])=0, d(c2=[0,1])=2 -> code 0
    // vec 1 sub1 [0,1]: d(c0=[0,0])=1, d(c2=[1,0])=2 -> code 0
    assert(out.filter(_._1 == 1L).toSeq === Seq((1L, 0L, 0L, 0.0), (1L, 1L, 0L, 1.0)))
    // codebook members code to themselves at distance 0
    assert(out.filter(r => r._1 == 0L || r._1 == 2L).forall(r => r._4 === 0.0))
  }

  // ---- Power iteration ----------------------------------------------------

  test("powerIterationStep: n identical e1 vectors accumulate n·(e1·v) at pos 0") {
    val emb = Seq(
      (1L, Seq(1f, 0f, 0f, 0f)),
      (2L, Seq(1f, 0f, 0f, 0f)),
      (3L, Seq(1f, 0f, 0f, 0f))).toDF("vec_id", "embedding")
    val out = Similarity.powerIterationStep(emb, dim = 4)
      .orderBy("pos").collect()
      .map(r => (r.getLong(0), r.getDouble(1), r.getLong(2)))
    val s = Similarity.planeCoeff(0, 0) // e1·v = v[0]
    val expected0 = detRound(math.floor(s * 1.0 * 1e6 + 0.5) * 3 / 1e6, 6)
    assert(out.toSeq === Seq((0L, expected0, 3L), (1L, 0.0, 3L),
      (2L, 0.0, 3L), (3L, 0.0, 3L)))
  }

  // ---- Token chunking -----------------------------------------------------

  test("chunkTokens: 10 words at len 4 / hop 3 give 4 chunks, last truncated") {
    val docs = Seq((1L, "w0 w1 w2 w3 w4 w5 w6 w7 w8 w9")).toDF("doc_id", "text")
    val out = TextAnalysis.chunkTokens(docs, "doc_id", "text", chunkLen = 4, hop = 3)
      .orderBy("chunk_idx").collect()
      .map(r => (r.getLong(1), r.getLong(2), r.getLong(3), r.getString(4)))
    assert(out.toSeq === Seq(
      (0L, 0L, 4L, "w0 w1 w2 w3"),
      (1L, 3L, 4L, "w3 w4 w5 w6"),
      (2L, 6L, 4L, "w6 w7 w8 w9"),
      (3L, 9L, 1L, "w9")))
  }

  // ---- Fair interleave ----------------------------------------------------

  test("interleaveBySource: key order alternates sources while both have docs") {
    val docs = Seq((1L, "a"), (2L, "a"), (3L, "a"), (4L, "b"), (5L, "b"))
      .toDF("doc_id", "source")
    val out = Sampling.interleaveBySource(docs, "doc_id", "source")
      .orderBy("interleave_key").collect()
      .map(r => (r.getString(1), r.getLong(3)))
    assert(out.map(_._1).toSeq === Seq("a", "b", "a", "b", "a"))
    assert(out.map(_._2).toSeq === Seq(0L, 1L, 2L, 3L, 4L))
  }

  // ---- Snapshot diff ------------------------------------------------------

  test("snapshotDiff classifies added/removed/changed and drops unchanged") {
    val a = Seq((1L, 10.0, "O"), (2L, 20.0, "F"), (3L, 30.0, "O"))
      .toDF("k", "price", "st")
    val b = Seq((1L, 10.0, "O"), (2L, 25.0, "F"), (4L, 40.0, "P"))
      .toDF("k", "price", "st")
    val out = Reconcile.snapshotDiff(a, b, "k", Seq("price", "st"))
      .orderBy("k").collect().map(r => (r.getLong(0), r.getString(1)))
    assert(out.toSeq === Seq((2L, "changed"), (3L, "removed"), (4L, "added")))
  }

  test("manifest checksum is partition-order-free and moves on any row change") {
    import graft.operators.Reconcile
    val df = (1L to 500L).map(i => (i, s"content $i", s"p${i % 3}"))
      .toDF("id", "text", "p")
    def sums(d: org.apache.spark.sql.DataFrame) =
      Reconcile.manifest(d, col("p"), col("id"), col("text"))
        .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    val base = sums(df)
    assert(sums(df.repartition(17)) === base, "checksum must not depend on layout")
    // one changed row flips exactly its partition's checksum, counts unchanged
    val changed = sums(df.withColumn("text",
      when($"id" === 7L, lit("tampered")).otherwise($"text")))
    assert(changed("p1")._2 !== base("p1")._2)
    assert(changed("p1")._1 === base("p1")._1)
    assert(changed("p0") === base("p0"))
    assert(changed("p2") === base("p2"))
    // a dropped row moves both the count and the checksum
    val dropped = sums(df.filter($"id" =!= 9L))
    assert(dropped("p0")._1 === base("p0")._1 - 1)
    assert(dropped("p0")._2 !== base("p0")._2)
  }

  test("manifest merges: manifest(a union b) is derivable from the two part manifests") {
    import graft.operators.Reconcile
    val a = (1L to 300L).map(i => (i, s"doc $i", "p")).toDF("id", "text", "p")
    val b = (301L to 500L).map(i => (i, s"doc $i", "p")).toDF("id", "text", "p")
    def one(d: org.apache.spark.sql.DataFrame) =
      Reconcile.manifest(d, col("p"), col("id"), col("text")).head()
    val (ma, mb, mu) = (one(a), one(b), one(a.unionAll(b)))
    val m = 1152921504606846976L
    assert(mu.getLong(1) === ma.getLong(1) + mb.getLong(1))
    // checksums combine by modular addition — the 1000-executor merge rule
    assert(mu.getLong(2) === (ma.getLong(2) + mb.getLong(2)) % m)
    assert(mu.getLong(3) === math.min(ma.getLong(3), mb.getLong(3)))
    assert(mu.getLong(4) === math.max(ma.getLong(4), mb.getLong(4)))
  }

  test("joinFanoutAudit predicts the exact equi-join output size without running it") {
    val left = Seq((1L, "x"), (1L, "y"), (2L, "z"), (3L, "w")).toDF("k", "a")
    val right = Seq((1L, 10), (1L, 20), (1L, 30), (2L, 40), (9L, 50)).toDF("k", "b")
    val r = graft.operators.Skew.joinFanoutAudit(left, col("k"), right, col("k")).head()
    val actual = left.join(right, Seq("k")).count()
    assert(r.getAs[Long]("n_out_rows") === actual)
    assert(r.getAs[Long]("n_left") === 4L && r.getAs[Long]("n_right") === 5L)
    assert(r.getAs[Long]("n_matching_keys") === 2L)
    assert(r.getAs[Long]("max_key_fanout") === 6L) // key 1: 2 x 3
    assert(r.getAs[Double]("avg_key_fanout") === 3.5) // (6 + 1) / 2
  }

  test("histogramDrift: identical snapshots give chi2 0; disjoint buckets give n_a + n_b") {
    val a = (1L to 100L).map(i => (i, i % 5)).toDF("id", "f")
    val same = Reconcile.histogramDrift(a, a, col("f")).head()
    assert(same.getAs[Long]("n_buckets") === 5L)
    assert(same.getAs[Double]("chi2") === 0.0)
    // disjoint bucket support: every bucket contributes its full count
    val b = (1L to 60L).map(i => (i, 100L + i % 3)).toDF("id", "f")
    val dis = Reconcile.histogramDrift(a, b, col("f")).head()
    assert(dis.getAs[Long]("n_buckets") === 8L)
    assert(dis.getAs[Double]("chi2") === 160.0)
  }

  // ---- Regional revenue (Q5 shape) ---------------------------------------

  test("regionalRevenue enforces the non-FK customer-nation = supplier-nation edge") {
    val region = Seq((0L, "ASIA")).toDF("r_regionkey", "r_name")
    val nation = Seq((1L, "JAPAN", 0L), (2L, "PERU", 9L))
      .toDF("n_nationkey", "n_name", "n_regionkey")
    val customer = Seq((100L, 1L)).toDF("c_custkey", "c_nationkey")
    val supplier = Seq((7L, 1L), (8L, 2L)).toDF("s_suppkey", "s_nationkey")
    val orders = Seq((1000L, 100L)).toDF("o_orderkey", "o_custkey")
    val lineitem = Seq(
      (1000L, 7L, 100.0, 0.1),  // same-nation supplier -> counts (90.0)
      (1000L, 8L, 500.0, 0.0))  // cross-nation supplier -> excluded
      .toDF("l_orderkey", "l_suppkey", "l_extendedprice", "l_discount")
    val out = Olap.regionalRevenue(region, nation, customer, supplier,
      orders, lineitem, "ASIA").collect()
    assert(out.length === 1)
    assert(out.head.getString(0) === "JAPAN")
    assert(out.head.getDouble(1) === 90.0)
    assert(out.head.getLong(2) === 1L)
  }

  // ---- BPE merge candidates ----------------------------------------------

  test("bpeMergeCandidates weights pairs by word frequency over the vocab") {
    val docs = Seq((1L, "aa ab aa")).toDF("doc_id", "text")
    val out = TextAnalysis.bpeMergeCandidates(docs, "doc_id", "text", k = 5)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(out.toSeq === Seq(("a a", 2L, 1L), ("a b", 1L, 1L)))
  }

  // ---- PageRank step ------------------------------------------------------

  test("triangleStats: K4 has 4 triangles; adding a pendant edge adds none") {
    val k4 = for (a <- 1 to 4; b <- 1 to 4 if a < b) yield (a.toLong, b.toLong)
    val r = graft.operators.Graph.triangleStats(
      k4.toDF("a", "b"), "a", "b").head()
    assert(r.getAs[Long]("n_nodes") === 4L)
    assert(r.getAs[Long]("n_edges") === 6L)
    assert(r.getAs[Long]("n_triangles") === 4L)
    val r2 = graft.operators.Graph.triangleStats(
      (k4 :+ (4L, 5L)).toDF("a", "b"), "a", "b").head()
    assert(r2.getAs[Long]("n_nodes") === 5L)
    assert(r2.getAs[Long]("n_triangles") === 4L)
  }

  test("triangleStats: duplicate and reversed input pairs collapse to one edge") {
    val tri = Seq((1L, 2L), (2L, 1L), (2L, 3L), (3L, 1L), (1L, 3L))
    val r = graft.operators.Graph.triangleStats(tri.toDF("a", "b"), "a", "b").head()
    assert(r.getAs[Long]("n_edges") === 3L)
    assert(r.getAs[Long]("n_wedges") === 1L)
    assert(r.getAs[Long]("n_triangles") === 1L)
  }

  test("labelPropStep takes the neighbor-label MODE, not the min (ties to smaller)") {
    val pairs = Seq((1L, 2L), (1L, 3L), (1L, 4L)).toDF("a", "b")
    val labels = Seq((1L, 5L), (2L, 7L), (3L, 7L), (4L, 0L)).toDF("node", "label")
    val out = graft.operators.Graph.labelPropStep(pairs, "a", "b", labels)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    // node 1 sees labels {7, 7, 0}: mode 7 wins over min 0 — NOT connected components
    assert(out(1L) === ((7L, 2L)))
    // leaves see only node 1's label
    assert(out(2L) === ((5L, 1L)) && out(3L) === ((5L, 1L)) && out(4L) === ((5L, 1L)))
  }

  test("skyline2d: frontier keeps non-dominated points, all both-dim ties") {
    // (id, price, size): 1 dominates 3 (cheaper, bigger); 2 on frontier
    // (biggest); 4 on frontier (cheapest); 5 ties 1 on both dims -> kept.
    val df = Seq((1L, 5.0, 10.0), (2L, 8.0, 12.0), (3L, 6.0, 9.0),
      (4L, 3.0, 4.0), (5L, 5.0, 10.0)).toDF("id", "price", "sz")
    val out = graft.operators.Olap.skyline2d(
      df, col("id"), col("price"), col("sz")).orderBy("id").collect()
      .map(_.getLong(0))
    assert(out.toSeq === Seq(1L, 2L, 4L, 5L))
  }

  test("pagerankStep: star graph concentrates rank on the hub; ranks sum to ~1") {
    // symmetric star: hub 1 <-> leaves 2, 3
    val edges = Seq((1L, 2L), (2L, 1L), (1L, 3L), (3L, 1L)).toDF("src", "dst")
    val out = graft.operators.Graph.pagerankStep(
      edges, graft.operators.Graph.uniformRanks(edges))
      .orderBy("node").collect().map(r => (r.getLong(0), r.getDouble(1))).toMap
    // mirror the quantized arithmetic exactly
    def q(c: Double) = math.floor(c * 1e12 + 0.5)
    def r10(v: Double) = math.floor(v * 1e10 + 0.5) / 1e10
    val r0 = 1.0 / 3
    val hub = r10(0.15 / 3 + 0.85 * ((q(r0 / 1) + q(r0 / 1)) / 1e12))
    val leaf = r10(0.15 / 3 + 0.85 * (q(r0 / 2) / 1e12))
    assert(out(1L) === hub)
    assert(out(2L) === leaf && out(3L) === leaf)
    assert(math.abs(out.values.sum - 1.0) < 1e-9)
    assert(out(1L) > out(2L), "hub must out-rank leaves")
  }

  test("pagerank: path graph converges to the analytic stationary ranks, early-exits on tol") {
    // symmetric path 1 - 2 - 3: stationary solution of
    //   a = 0.15/3 + 0.85 * (b/2)   (ends)
    //   b = 0.15/3 + 0.85 * (a + c) (middle, a = c)
    // => b = 0.135/0.2775 ≈ 0.486486, a ≈ 0.256757
    // contraction is ~0.85/round, so tol=1e-6 is hit near round 90 and the
    // residual error is within ~6x tol of the fixpoint
    val edges = Seq((1L, 2L), (2L, 1L), (2L, 3L), (3L, 2L)).toDF("src", "dst")
    val (out, iters) = graft.operators.Graph.pagerankRun(edges, maxIter = 300, tol = 1e-6)
    val ranks = out.collect().map(r => (r.getLong(0), r.getDouble(1))).toMap
    assert(iters < 300, "tol early-exit never fired")
    assert(math.abs(ranks(2L) - 0.135 / 0.2775) < 1e-5)
    assert(math.abs(ranks(1L) - (0.05 + 0.425 * 0.135 / 0.2775)) < 1e-5)
    assert(math.abs(ranks(1L) - ranks(3L)) < 1e-12, "symmetric ends must tie")
    assert(math.abs(ranks.values.sum - 1.0) < 1e-5)

    // a symmetric 2-node graph is AT the fixpoint from round one: the
    // early exit must fire immediately
    val pair = Seq((1L, 2L), (2L, 1L)).toDF("src", "dst")
    val (fix, fixIters) = graft.operators.Graph.pagerankRun(pair, maxIter = 50, tol = 1e-12)
    assert(fixIters === 1, s"fixpoint graph ran $fixIters rounds")
    assert(fix.collect().map(_.getDouble(1)).forall(_ === 0.5))
  }

  test("pagerank: tol=0 runs exactly maxIter rounds (matches manually chained steps)") {
    val edges = Seq((1L, 2L), (2L, 1L), (1L, 3L), (3L, 1L)).toDF("src", "dst")
    val viaLoop = graft.operators.Graph.pagerank(edges, maxIter = 3)
    val viaSteps = {
      var r = graft.operators.Graph.uniformRanks(edges)
      (1 to 3).foreach(_ => r = graft.operators.Graph.pagerankStep(edges, r))
      r
    }
    val a = viaLoop.orderBy("node").collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    val b = viaSteps.orderBy("node").collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    viaLoop.unpersist()
    assert(a === b)
  }

  test("pagerank: dangling mass is redistributed — directed chain ranks sum to 1") {
    // 1 -> 2 -> 3: node 3 is dangling (no out-edges), node 1 has no
    // in-edges; without redistribution Σr decays by ~0.85·r(3) per round
    // and node 1 vanishes from the output
    val edges = Seq((1L, 2L), (2L, 3L)).toDF("src", "dst")
    // single step, hand-checked: 1 -> 2 with r0 = (0.5, 0.5); node 2 is
    // dangling with mass 0.5 shared across N=2
    val pair = Seq((1L, 2L)).toDF("src", "dst")
    val step = graft.operators.Graph.pagerankStep(pair,
        graft.operators.Graph.uniformRanks(pair))
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toMap
    assert(step === Map(1L -> 0.2875, 2L -> 0.7125)) // 0.075+0.2125 / +0.425
    val (out, _) = graft.operators.Graph.pagerankRun(edges, maxIter = 10)
    val ranks = out.collect().map(r => (r.getLong(0), r.getDouble(1))).toMap
    assert(ranks.size === 3, "source-only and dangling nodes must both survive")
    assert(math.abs(ranks.values.sum - 1.0) < 1e-8,
      s"mass leaked: ${ranks.values.sum}")
    assert(ranks(3L) > ranks(2L) && ranks(2L) > ranks(1L),
      "rank must accumulate downstream")
    // in-degree-0 node on a graph with NO dangling nodes (every node has
    // out-edges): the fast path must still keep the full node universe
    val noDangling = Seq((1L, 2L), (2L, 1L), (3L, 1L)).toDF("src", "dst")
    val (out2, _) = graft.operators.Graph.pagerankRun(noDangling, maxIter = 6)
    val r2 = out2.collect().map(r => (r.getLong(0), r.getDouble(1))).toMap
    assert(r2.size === 3, s"in-degree-0 node vanished: $r2")
    assert(math.abs(r2.values.sum - 1.0) < 1e-8, s"mass leaked: ${r2.values.sum}")
    assert(r2(3L) === 0.05, "in-degree-0 node holds exactly its base share")
  }

  test("personalizedPagerank: teleport and dangling mass return to the seeds") {
    // 1 -> 2 -> 3 directed chain, seed = {1}: node 3 is dangling and its
    // mass teleports ONLY to node 1; nodes 2 and 3 have zero base share.
    val edges = Seq((1L, 2L), (2L, 3L)).toDF("src", "dst")
    val seeds = Seq(1L).toDF("node")
    // hand-checked round 1 from r0 = (1, 0, 0): contributions 1->2 carry
    // r=1, so r'(2) = 0.85; r'(1) = 0.15·1 (dangling mass is 0 at r0);
    // r'(3) = 0 (its in-contribution r(2)=0 and s=0)
    val (out1, _) = graft.operators.Graph.personalizedPagerankRun(
      edges, seeds, maxIter = 1)
    val r1 = out1.collect().map(r => (r.getLong(0), r.getDouble(1))).toMap
    assert(r1 === Map(1L -> 0.15, 2L -> 0.85, 3L -> 0.0))
    // iterated: mass conserved (teleport + dangling both land on seeds),
    // full node universe kept, and the non-seed source-only node 1's rank
    // is exactly its teleport share each round
    val (out, _) = graft.operators.Graph.personalizedPagerankRun(
      edges, seeds, maxIter = 10)
    val ranks = out.collect().map(r => (r.getLong(0), r.getDouble(1))).toMap
    assert(ranks.size === 3)
    assert(math.abs(ranks.values.sum - 1.0) < 1e-8,
      s"mass leaked: ${ranks.values.sum}")
    // a node NOT reachable from the seeds holds rank 0, not a base share
    val edges2 = Seq((1L, 2L), (3L, 4L), (4L, 3L)).toDF("src", "dst")
    val (out2, _) = graft.operators.Graph.personalizedPagerankRun(
      edges2, Seq(1L).toDF("node"), maxIter = 5)
    val r2 = out2.collect().map(r => (r.getLong(0), r.getDouble(1))).toMap
    assert(r2(3L) === 0.0 && r2(4L) === 0.0,
      s"unreachable component must hold rank 0: $r2")
    assert(r2(1L) > 0 && r2(2L) > 0)
    // seeds that are not graph nodes are ignored; all-external seeds reject
    val (out3, _) = graft.operators.Graph.personalizedPagerankRun(
      edges, Seq(1L, 99L).toDF("node"), maxIter = 1)
    assert(out3.collect().map(_.getDouble(1)).sum > 0.99)
    intercept[IllegalArgumentException] {
      graft.operators.Graph.personalizedPagerankRun(
        edges, Seq(99L).toDF("node"), maxIter = 1)
    }
  }

  test("personalizedPagerank: seeding every node approximates uniform pagerank") {
    // with S = all nodes, s = 1/N and the teleport arithmetic differs from
    // the uniform loop only by 0.15·(1/N) vs 0.15/N — equal to within an
    // ulp per term, so ranks agree to well past the 1e-10 detRound grid
    val pairs = Seq((1L, 2L), (2L, 3L), (3L, 1L), (3L, 4L), (4L, 3L))
      .toDF("src", "dst")
    val allNodes = (1L to 4L).toDF("node")
    val (ppr, _) = graft.operators.Graph.personalizedPagerankRun(
      pairs, allNodes, maxIter = 8)
    val (pr, _) = graft.operators.Graph.pagerankRun(pairs, maxIter = 8)
    val a = ppr.collect().map(r => (r.getLong(0), r.getDouble(1))).toMap
    val b = pr.collect().map(r => (r.getLong(0), r.getDouble(1))).toMap
    assert(a.keySet === b.keySet)
    a.keySet.foreach { k =>
      assert(math.abs(a(k) - b(k)) < 1e-9, s"node $k: ${a(k)} vs ${b(k)}")
    }
  }

  test("labelProp: two triangles joined by a bridge settle into two communities") {
    // triangle {1,2,3} - bridge - triangle {4,5,6}; seeds = node id
    val pairs = Seq((1L, 2L), (2L, 3L), (1L, 3L), (4L, 5L), (5L, 6L), (4L, 6L), (3L, 4L))
      .toDF("a", "b")
    val nodes = (1L to 6L).toDF("node")
    val out = graft.operators.Graph.labelProp(pairs, "a", "b",
      nodes.withColumn("label", col("node")), maxIter = 10)
    val lab = out.collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    out.unpersist()
    // each triangle agrees internally on the smallest seed that won the vote
    assert(lab(1L) === lab(2L) && lab(2L) === lab(3L), s"left triangle split: $lab")
    assert(lab(4L) === lab(5L) && lab(5L) === lab(6L), s"right triangle split: $lab")
  }

  // ---- Line dedup ---------------------------------------------------------

  test("lineDedup: a repeated 10-word line is flagged only on its later copy") {
    val ten = (1 to 10).map(i => s"w$i").mkString(" ")
    val docs = Seq(
      (1L, s"$ten a b c d e f g h i j"), // lines: ten (first), a..j (first)
      (2L, s"$ten k l m n o p q r s t")) // line 0 duplicates doc 1's line 0
      .toDF("doc_id", "text")
    val out = graft.operators.Dedup.lineDedup(docs, "doc_id", "text")
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(out.toSeq === Seq((1L, 2L, 0L), (2L, 2L, 1L)))
  }

  // ---- Exact-sum statistics ----------------------------------------------

  test("pearsonByGroup: y = 2x correlates at exactly 1.0") {
    val df = (1 to 5).map(i => ("g", i.toDouble, 2.0 * i)).toDF("k", "x", "y")
    val r = Olap.pearsonByGroup(df, col("k"), col("x"), col("y")).head()
    assert(r.getAs[Double]("corr_r") === 1.0)
  }

  test("abTestZ: identical segments give z = 0, not significant") {
    val df = Seq(("a", 10.0), ("a", 12.0), ("a", 14.0),
      ("b", 10.0), ("b", 12.0), ("b", 14.0)).toDF("g", "v")
    val r = Olap.abTestZ(df, col("g"), col("v"), "a", "b").head()
    assert(r.getAs[Double]("z") === 0.0)
    assert(!r.getAs[Boolean]("significant"))
    assert(r.getAs[Double]("mean_a") === 12.0 && r.getAs[Double]("mean_b") === 12.0)
  }

  test("degenerate statistics yield NULL (DuckDB x/0 semantics), never NaN/Inf") {
    // constant column in a group → zero variance → corr NULL
    val const = Seq(("g", 1.0, 5.0), ("g", 2.0, 5.0), ("g", 3.0, 5.0)).toDF("k", "x", "y")
    assert(Olap.pearsonByGroup(const, col("k"), col("x"), col("y"))
      .head().isNullAt(2))
    // 1-row segment → no variance → z NULL; empty segment → mean NULL too
    val oneRow = Seq(("a", 10.0), ("a", 11.0), ("b", 7.0)).toDF("g", "v")
    val r1 = Olap.abTestZ(oneRow, col("g"), col("v"), "a", "b").head()
    assert(r1.isNullAt(r1.fieldIndex("z")))
    val empty = Seq(("a", 10.0), ("a", 11.0)).toDF("g", "v")
    val r2 = Olap.abTestZ(empty, col("g"), col("v"), "a", "b").head()
    assert(r2.isNullAt(r2.fieldIndex("mean_b")) && r2.isNullAt(r2.fieldIndex("z")))
    // constant values on BOTH sides → se = 0 → z NULL (not ±Inf)
    val flat = Seq(("a", 5.0), ("a", 5.0), ("b", 5.0), ("b", 5.0)).toDF("g", "v")
    val r3 = Olap.abTestZ(flat, col("g"), col("v"), "a", "b").head()
    assert(r3.isNullAt(r3.fieldIndex("z")))
    // tokenless text → chars_per_token NULL (not Infinity)
    val docs = Seq((1L, "   "), (2L, "ab cd")).toDF("doc_id", "text")
    val t = TextAnalysis.tokenCounts(docs, "doc_id", "text")
      .orderBy(col("doc_id")).collect()
    assert(t(0).isNullAt(t(0).fieldIndex("chars_per_token")))
    assert(t(1).getAs[Double]("chars_per_token") === 2.5)
  }

  // ---- Tokenizer stream ----------------------------------------------------

  test("tokenStream: letter/digit/punct splits, 1-based positions per doc") {
    val docs = Seq((1L, "ab3 c!"), (2L, "")).toDF("doc_id", "text")
    val out = TextAnalysis.tokenStream(docs, "doc_id", "text")
      .orderBy("doc_id", "token_idx").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
    // "ab3 c!" -> ab | 3 | c | !  (space is a separator, not a token)
    assert(out.toSeq === Seq(
      (1L, 1L, "ab"), (1L, 2L, "3"), (1L, 3L, "c"), (1L, 4L, "!")))
  }

  test("hashFeatures: counts conserve tokens, buckets stay inside the dim") {
    val docs = Seq((1L, "a a b"), (2L, "c!")).toDF("doc_id", "text")
    val out = TextAnalysis.hashFeatures(docs, "doc_id", "text", dim = 16)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(out.map(_._3).sum === 5L, "feature mass must equal token count")
    assert(out.forall(t => t._2 >= 0 && t._2 < 16))
    // 'a' twice in doc 1 -> some bucket of doc 1 carries f = 2
    assert(out.filter(_._1 == 1L).map(_._3).max === 2L)
  }

  test("bigramLmCounts: raw, continuation, and diversity counts on a toy corpus") {
    val docs = Seq((1L, "a b a b"), (2L, "a b c"), (3L, "c b")).toDF("doc_id", "text")
    // bigrams: d1 (a b)(b a)(a b), d2 (a b)(b c), d3 (c b)
    val out = TextAnalysis.bigramLmCounts(docs, "doc_id", "text", minCount = 1)
      .orderBy("w1", "w2").collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    // "a b": count 3 (2 in d1 + 1 in d2); b left contexts {a, c} -> 2; a right {b} -> 1
    assert(out.find(t => t._1 == "a" && t._2 == "b").get === (("a", "b", 3L, 2L, 1L)))
    // "b c": count 1; c left contexts {b} -> 1; b right contexts {a, c} -> 2
    assert(out.find(t => t._1 == "b" && t._2 == "c").get === (("b", "c", 1L, 1L, 2L)))
    assert(out.length === 4) // a-b, b-a, b-c, c-b
  }

  test("sparseCosinePairs: identical docs score 1.0, disjoint docs never pair") {
    val docs = Seq(
      (1L, "red fox jumps high over lazy dog"),
      (2L, "red fox jumps high over lazy dog"),
      (3L, "blue cat sits low under busy sky")).toDF("doc_id", "text")
    val out = TextAnalysis.sparseCosinePairs(docs, "doc_id", "text",
      maxDf = 10, threshold = 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(out.toSeq === Seq((1L, 2L, 1.0)))
  }

  // ---- Top n-grams per language -------------------------------------------

  test("topNgramsPerLang: counts and ranks bigrams within each language") {
    val docs = Seq(
      (1L, "a b a b", "en"), (2L, "a b c", "en"), (3L, "x y", "pt"))
      .toDF("doc_id", "text", "lang")
    val out = TextAnalysis.topNgramsPerLang(docs, "text", "lang", k = 2)
      .orderBy("lang", "rank").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getString(2), r.getLong(3)))
    // en bigrams: "a b" x3 ("a b","b a","a b" from doc1 + "a b" from doc2... )
    // doc1: "a b","b a","a b"; doc2: "a b","b c" -> a b:3, b a:1, b c:1
    val en = out.filter(_._1 == "en")
    assert(en.head === (("en", 1L, "a b", 3L)))
    assert(en.length === 2 && en(1)._4 === 1L) // second rank is one of the 1-count ties
    assert(out.filter(_._1 == "pt").toSeq === Seq(("pt", 1L, "x y", 1L)))
  }

  // ---- LM quality buckets -------------------------------------------------

  test("lmQualityBuckets: repeated-bigram docs score high, rare-bigram docs low") {
    // "a a" occurs 8 times (docs 1-2), each one-off doc contributes bigrams
    // with low p(w2|w1) only for the shared-start tokens
    val docs = Seq(
      (1L, "a a a a a"), (2L, "a a a a a"),   // p(a|a)=16/18 per bigram
      (3L, "a b c d e"), (4L, "a c e b d")    // mostly count-1 continuations
    ).toDF("doc_id", "text")
    val out = TextAnalysis.lmQualityBuckets(docs, "doc_id", "text")
      .orderBy($"doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getString(3)))
    assert(out.forall(_._2 === 4L))
    val byDoc = out.map(t => t._1 -> t._3).toMap
    assert(byDoc(1L) === byDoc(2L))
    assert(byDoc(1L) > byDoc(3L) && byDoc(1L) > byDoc(4L),
      s"fluent docs must outscore rare-bigram docs: $byDoc")
    // 4 docs → t2 = max score, so nothing clears `> t2`: the high scorers
    // land in middle (score > t1), the low ties at t1 land in tail
    val buckets = out.map(t => t._1 -> t._4).toMap
    assert(buckets(1L) === "middle" && buckets(2L) === "middle", buckets.toString)
    assert(buckets(3L) === "tail" && buckets(4L) === "tail", buckets.toString)
  }

  test("lmQualityBuckets: docs with fewer than two tokens land in the tail at score 0") {
    val docs = Seq((1L, "x x x x"), (2L, "x x x"), (3L, "solo"), (4L, "y y y y"))
      .toDF("doc_id", "text")
    val out = TextAnalysis.lmQualityBuckets(docs, "doc_id", "text")
      .filter($"doc_id" === 3L).collect()
      .map(r => (r.getLong(1), r.getDouble(2), r.getString(3)))
    assert(out.toSeq === Seq((0L, 0.0, "tail")))
  }

  // ---- Hashed-feature linear scorer ---------------------------------------

  test("hashLinearScore matches a hand-computed margin and is partition-stable") {
    val docs = Seq((1L, "alpha beta alpha"), (2L, "gamma")).toDF("doc_id", "text")
    def h60(s: String): Long = {
      val hex = java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
      java.lang.Long.parseLong(hex.take(15), 16)
    }
    def w(tok: String): Long = h60("w" + (h60(tok) % 1024L)) % 2001L - 1000L
    val expected1 = (2 * w("alpha") + 1 * w("beta")).toDouble / (3 * 1000.0)
    val out = TextAnalysis.hashLinearScore(docs, "doc_id", "text")
      .orderBy($"doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getBoolean(3)))
    assert(out(0)._1 === 1L && out(0)._2 === 3L)
    assert(math.abs(out(0)._3 - expected1) < 1e-6)
    assert(out(0)._4 === (out(0)._3 >= 0.0))
    val again = TextAnalysis.hashLinearScore(docs.repartition(5), "doc_id", "text")
      .orderBy($"doc_id").collect().map(r => (r.getLong(0), r.getDouble(2)))
    assert(again.map(_._2).toSeq === out.map(_._3).toSeq)
  }

  test("dsirSelect: target-vocabulary docs outrank off-domain docs, cutoff is total-ordered") {
    // target domain = lang 'en'; its vocabulary is {alpha}; off-domain is {beta}
    val docs = Seq(
      (1L, "alpha alpha alpha", "en"), (2L, "alpha alpha", "en"),
      (3L, "alpha alpha alpha", "xx"), (4L, "beta beta beta", "xx"),
      (5L, "beta beta", "xx"), (6L, "alpha beta", "xx"))
      .toDF("doc_id", "text", "lang")
    val out = TextAnalysis.dsirSelect(docs, "doc_id", "text",
        col("lang") === "en", n = 3)
      .orderBy($"score".desc, $"doc_id").collect()
      .map(r => (r.getLong(0), r.getDouble(1)))
    assert(out.length === 3)
    // the three all-alpha docs (1, 2, 3) are the most target-like; the
    // raw-domain doc 3 proves selection scores CONTENT, not the label
    assert(out.map(_._1).toSet === Set(1L, 2L, 3L))
    // every selected score beats every rejected one (beta-heavy docs)
    val rejected = TextAnalysis.dsirSelect(docs, "doc_id", "text",
        col("lang") === "en", n = 6)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toMap
    assert(out.map(_._2).min > rejected(4L) && rejected(4L) <= rejected(6L))
    // partitioning invariance: quantize-before-sum means the exact same set
    val again = TextAnalysis.dsirSelect(docs.repartition(7), "doc_id", "text",
        col("lang") === "en", n = 3)
      .orderBy($"score".desc, $"doc_id").collect()
      .map(r => (r.getLong(0), r.getDouble(1)))
    assert(again.toSeq === out.toSeq)
    // releaseCache hook: identical result, and the corpus-sized feature
    // cache does NOT survive the call (long-lived-session contract)
    spark.catalog.clearCache()
    val released = TextAnalysis.dsirSelect(docs, "doc_id", "text",
        col("lang") === "en", n = 3, releaseCache = true)
      .orderBy($"score".desc, $"doc_id").collect()
      .map(r => (r.getLong(0), r.getDouble(1)))
    assert(released.toSeq === out.toSeq)
    // only the n-row localCheckpoint may remain registered — the feats
    // cache (a plan-cached Dataset) must be gone from the cache manager
    assert(spark.sharedState.cacheManager.isEmpty,
      "dsirSelect(releaseCache = true) left its feature cache registered")
  }

  test("hits: star graph — the 3-edge hub out-scores the 1-edge hub, scores stay L2-normalized") {
    // 1→{10,11,12}, 2→10: node 1 is the stronger hub, node 10 (two
    // pointers, one of them the best hub) the strongest authority
    val edges = Seq((1L, 10L), (1L, 11L), (1L, 12L), (2L, 10L)).toDF("src", "dst")
    val out = graft.operators.Graph.hits(edges, maxIter = 2)
      .collect().map(r => (r.getString(1), r.getLong(0)) -> r.getDouble(2)).toMap
    assert(out(("hub", 1L)) > out(("hub", 2L)))
    assert(out(("auth", 10L)) > out(("auth", 11L)))
    assert(out(("auth", 11L)) === out(("auth", 12L)), "symmetric leaves tie")
    // each side stays (quantized-)L2-normalized
    val hubSq = out.collect { case (("hub", _), v) => v * v }.sum
    val authSq = out.collect { case (("auth", _), v) => v * v }.sum
    assert(math.abs(hubSq - 1.0) < 1e-3 && math.abs(authSq - 1.0) < 1e-3)
    // determinism: repartitioned input gives bit-identical scores
    val again = graft.operators.Graph.hits(edges.repartition(5), maxIter = 2)
      .collect().map(r => (r.getString(1), r.getLong(0)) -> r.getDouble(2)).toMap
    assert(again === out)
  }

  test("resourceAllocation: hand-computed RA scores on a wedge + triangle, edges excluded") {
    // triangle {1,2,3} plus pendant 3-4: candidate non-edges are (1,4) and
    // (2,4), each via shared neighbor 3 (deg 3) -> score 1/3; wedge pair
    // (1,2) etc. are existing edges and must not appear
    val pairs = Seq((1L, 2L), (1L, 3L), (2L, 3L), (3L, 4L)).toDF("a", "b")
    val out = graft.operators.Graph.resourceAllocation(pairs, "a", "b", k = 10)
      .orderBy($"item_a", $"item_b").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    // floor(1e6/3 + 0.5) = 333333 -> detRound(0.333333, 4) = 0.3333
    assert(out.toSeq === Seq((1L, 4L, 0.3333), (2L, 4L, 0.3333)))
    // k cutoff is a total order: k = 1 keeps the (a, b)-smallest of the tie
    val top1 = graft.operators.Graph.resourceAllocation(pairs, "a", "b", k = 1)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(top1.toSeq === Seq((1L, 4L)))
  }
}
