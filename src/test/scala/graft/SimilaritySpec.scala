package graft

import org.apache.spark.sql.functions._
import graft.operators.Similarity

/** ANN variants against the brute-force anchor on a small deterministic
  * corpus: every LSH/IVF hit must carry the same cosine the brute-force
  * assigns, and recall of the top-1 neighbor should be non-trivial.
  */
class SimilaritySpec extends SparkSpec {
  import spark.implicits._

  private val dim = 16
  private lazy val corpus = {
    val rnd = new scala.util.Random(123)
    (0L until 200L).map { i =>
      (i, Array.fill(dim)(rnd.nextFloat() * 2 - 1))
    }.toDF("vec_id", "embedding")
  }
  private lazy val queries = corpus.filter($"vec_id" % 20 === 0)

  test("bruteForceTopK: k rows per query, cosine in [-1, 1], rank ordered") {
    val r = Similarity.bruteForceTopK(corpus, queries, k = 5)
      .orderBy($"query_id", $"rank").collect()
    assert(r.length === 10 * 5)
    r.foreach { row =>
      assert(row.getDouble(3) >= -1.0001 && row.getDouble(3) <= 1.0001)
    }
    r.groupBy(_.getLong(0)).foreach { case (_, rows) =>
      val cs = rows.sortBy(_.getLong(1)).map(_.getDouble(3))
      assert(cs.zip(cs.tail).forall { case (a, b) => a >= b })
    }
  }

  test("lshTopK results are a subset of per-bucket exact scores with same cosines") {
    val bf = Similarity.bruteForceTopK(corpus, queries, k = 200)
      .select($"query_id", $"vec_id", $"cos").collect()
      .map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2))).toMap
    val lsh = Similarity.lshTopK(corpus, queries, dim = dim, k = 5).collect()
    lsh.foreach { r =>
      val key = (r.getLong(0), r.getLong(2))
      assert(bf.contains(key))
      assert(bf(key) === r.getDouble(3)) // same quantized cosine
    }
  }

  test("knnGraph: no self edges, at most k per vector, ranks ordered by cosine") {
    val g = Similarity.knnGraph(corpus, k = 3, centroidEvery = 20).collect()
    assert(g.nonEmpty)
    g.foreach(r => assert(r.getLong(0) !== r.getLong(2)))
    g.groupBy(_.getLong(0)).foreach { case (_, rows) =>
      assert(rows.length <= 3)
      val byRank = rows.sortBy(_.getLong(1))
      assert(byRank.map(_.getLong(1)).toSeq === (1L to rows.length).toSeq)
      val cs = byRank.map(_.getDouble(3))
      assert(cs.zip(cs.tail).forall { case (a, b) => a >= b })
    }
    // neighbors share the vector's cell: rank-1 neighbor must be a corpus id
    assert(g.forall(r => r.getLong(2) >= 0 && r.getLong(2) < 200))
  }

  test("centroidConfusion: separable clusters classify onto the diagonal") {
    // two well-separated labels: label 0 near +e0, label 1 near +e1
    val emb = (0L until 40L).map { i =>
      val l = (i % 2).toInt
      val v = Array.fill(dim)(0.001f * i)
      v(l) = 1.0f
      (i, v, l)
    }.toDF("vec_id", "embedding", "label")
    val cm = Similarity.centroidConfusion(emb).collect()
      .map(r => ((r.getInt(0), r.getInt(1)), r.getLong(2))).toMap
    assert(cm((0, 0)) === 20L)
    assert(cm((1, 1)) === 20L)
    assert(cm.keySet === Set((0, 0), (1, 1)), "off-diagonal misclassification")
  }

  test("ivfTopK returns scored results consistent with brute force") {
    val bf = Similarity.bruteForceTopK(corpus, queries, k = 200)
      .select($"query_id", $"vec_id", $"cos").collect()
      .map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2))).toMap
    val ivf = Similarity.ivfTopK(corpus, queries, k = 5, centroidEvery = 20, nprobe = 2)
      .collect()
    assert(ivf.nonEmpty)
    ivf.foreach { r =>
      assert(bf(( r.getLong(0), r.getLong(2))) === r.getDouble(3))
    }
  }

  test("annNdcg: bounded by 1, equals 1 exactly when the IVF list matches the exact list") {
    val k = 5
    val out = Similarity.annNdcg(corpus, queries, k, centroidEvery = 20, nprobe = 2)
      .collect().map(r => (r.getLong(0), r.getDouble(2))).toMap
    assert(out.values.forall(v => v >= 0.0 && v <= 1.0 + 1e-9), out.toString)
    val exact = Similarity.bruteForceTopK(corpus, queries, k)
      .collect().groupBy(_.getLong(0))
      .map { case (q, rs) => q -> rs.sortBy(_.getLong(1)).map(_.getLong(2)).toSeq }
    val approx = Similarity.ivfTopK(corpus, queries, k, centroidEvery = 20, nprobe = 2)
      .collect().groupBy(_.getLong(0))
      .map { case (q, rs) => q -> rs.sortBy(_.getLong(1)).map(_.getLong(2)).toSeq }
    exact.keys.foreach { q =>
      if (approx.getOrElse(q, Nil) == exact(q))
        assert(out(q) === 1.0, s"query $q: identical lists must score ndcg 1")
      else assert(out(q) < 1.0, s"query $q: differing lists cannot score 1")
    }
    // at least one of each case should exist on this fixture for the test to bite
    assert(exact.keys.exists(q => approx.getOrElse(q, Nil) == exact(q)) ||
      out.values.forall(_ < 1.0))
  }

  test("rrfFuse: both-list docs beat single-list docs; ranks follow 1/(c+rank) sums") {
    val a = Seq((1L, 1L, 100L), (1L, 2L, 200L)).toDF("query_id", "rank", "vec_id")
    val b = Seq((1L, 1L, 200L), (1L, 2L, 300L)).toDF("query_id", "rank", "vec_id")
    val out = Similarity.rrfFuse(a, b, k = 3).orderBy($"fused_rank").collect()
      .map(r => (r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4)))
    // d200 in both lists (1/61 + 1/62) > d100 (1/61) > d300 (1/62)
    assert(out.map(t => (t._1, t._2, t._3)).toSeq ===
      Seq((1L, 200L, 2L), (2L, 100L, 1L), (3L, 300L, 1L)))
    val e = (x: Double) => math.floor(x * 1e9 + 0.5) / 1e9
    assert(math.abs(out(0)._4 - (e(1.0 / 61) + e(1.0 / 62))) < 1e-6)
  }

  test("maxSimTopK: sub-vector matches count wherever they sit (late interaction)") {
    val emb = Seq(
      (10L, Array(1.0f, 0.0f, 0.0f, 1.0f)), // the query
      (1L, Array(0.0f, 1.0f, 1.0f, 0.0f)),  // same parts, SWAPPED halves
      (2L, Array(1.0f, 0.0f, 0.0f, 1.0f)),  // aligned twin
      (3L, Array(0.0f, 0.0f, 0.0f, 0.0f))   // nothing
    ).toDF("vec_id", "embedding")
    val out = Similarity.maxSimTopK(emb, emb.filter($"vec_id" === 10L),
      k = 3, m = 2, dim = 4)
      .collect().map(r => (r.getLong(2), r.getDouble(3))).toMap
    // single-vector cosine would score doc 1 ZERO; MaxSim matches each query
    // half against its best counterpart wherever it sits: both score 2
    assert(out(1L) === 2.0 && out(2L) === 2.0)
    assert(out(3L) === 0.0)
  }

  test("hardNegatives: duplicate band excluded, results are re-ranked knn candidates") {
    val out = Similarity.hardNegatives(corpus, k = 3, candidateK = 10,
      dupThreshold = 0.9, centroidEvery = 20).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(out.nonEmpty)
    assert(out.forall(_._4 < 0.9), "duplicate band must be cut")
    out.groupBy(_._1).foreach { case (_, rows) =>
      val sorted = rows.sortBy(_._2)
      assert(sorted.map(_._2).toSeq === (1L to sorted.length).toSeq)
      assert(sorted.map(_._4).toSeq === sorted.map(_._4).sorted.reverse.toSeq)
    }
    val knn = Similarity.knnGraph(corpus, k = 10, centroidEvery = 20)
      .select($"vec_id", $"neighbor_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    out.foreach { case (v, _, n, _) => assert(knn.contains((v, n))) }
  }

  test("covarianceMatrix matches the closed form on a tiny 2-d corpus") {
    val emb = Seq(
      (1L, Array(1.0f, 0.0f)), (2L, Array(0.0f, 1.0f)),
      (3L, Array(1.0f, 1.0f)), (4L, Array(0.0f, 0.0f))
    ).toDF("vec_id", "embedding")
    val out = Similarity.covarianceMatrix(emb).collect()
      .map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2))).toMap
    // means (.5, .5); E[x0^2]=E[x1^2]=.5 -> var .25; E[x0 x1]=.25 -> cov 0
    assert(out === Map((0L, 0L) -> 0.25, (0L, 1L) -> 0.0, (1L, 1L) -> 0.25))
  }

  test("ivfPqTopK: candidates come from probed cells, ranks ascend by quantized ADC sum") {
    val out = Similarity.ivfPqTopK(corpus, queries, k = 5, centroidEvery = 20, nprobe = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(out.nonEmpty)
    // per query: ranks 1..n dense, approx_l2 non-decreasing, no self match
    out.groupBy(_._1).foreach { case (q, rows) =>
      val sorted = rows.sortBy(_._2)
      assert(sorted.map(_._2).toSeq === (1L to sorted.length).toSeq)
      assert(sorted.map(_._4).toSeq === sorted.map(_._4).sorted.toSeq, s"query $q not ascending")
      assert(!rows.exists(_._3 == q))
    }
    // IVF pruning: every scored vector is in a probed cell — i.e. it appears
    // in the (same-parameter) IVF candidate ranking with an unbounded k
    val ivfAll = Similarity.ivfTopK(corpus, queries, k = Int.MaxValue,
      centroidEvery = 20, nprobe = 2)
      .select($"query_id", $"vec_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    out.foreach { case (q, _, v, _) =>
      assert(ivfAll.contains((q, v)), s"($q, $v) scored outside the probed cells")
    }
  }

  test("annMrr: rr = 1/rank of the exact neighbor, 0 encodes the miss") {
    val k = 5
    val out = Similarity.annMrr(corpus, queries, k, centroidEvery = 20, nprobe = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(out.length.toLong === queries.count())
    out.foreach { case (q, rank, rr) =>
      assert(rank >= 0 && rank <= k, s"query $q rank $rank")
      if (rank == 0) assert(rr === 0.0, s"query $q: miss must have rr 0")
      else assert(rr === math.floor(1e6 / rank + 0.5) / 1e6, s"query $q rank $rank rr $rr")
    }
    // cross-check one query against the builders directly
    val (q0, rank0, _) = out.head
    val truth = Similarity.bruteForceTopK(corpus, queries.filter($"vec_id" === q0), 1)
      .select($"vec_id").collect().head.getLong(0)
    val ivfRank = Similarity.ivfTopK(corpus, queries.filter($"vec_id" === q0), k,
      centroidEvery = 20, nprobe = 2)
      .filter($"vec_id" === truth).select($"rank").collect().headOption.map(_.getLong(0))
    assert(rank0 === ivfRank.getOrElse(0L))
  }

  test("annRecall: one row per query, n_hits <= n_approx <= k, recall = n_hits/k") {
    val k = 5
    val out = Similarity.annRecall(corpus, queries, k, centroidEvery = 20, nprobe = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    val nQueries = queries.count()
    assert(out.length.toLong === nQueries)
    out.foreach { case (q, nApprox, nHits, recall) =>
      assert(nHits <= nApprox && nApprox <= k, s"query $q: $nHits/$nApprox")
      assert(math.abs(recall - nHits.toDouble / k) < 1e-9)
    }
    // the overlap is computed against the true exact top-k: spot-verify one query
    val q0 = out.head._1
    val exact = Similarity.bruteForceTopK(corpus, queries.filter($"vec_id" === q0), k)
      .select($"vec_id").collect().map(_.getLong(0)).toSet
    val approx = Similarity.ivfTopK(corpus, queries.filter($"vec_id" === q0), k,
      centroidEvery = 20, nprobe = 2).select($"vec_id").collect().map(_.getLong(0)).toSet
    assert(out.head._3 === approx.intersect(exact).size.toLong)
  }

  test("ivfTopKTrained: hits carry brute-force cosines; ranks ordered per query") {
    val cents = Similarity.kmeans(corpus, centroidEvery = 20, maxIter = 2)
    val r = Similarity.ivfTopKTrained(corpus, queries, k = 5, cents, nprobe = 2)
      .orderBy($"query_id", $"rank").collect()
    assert(r.nonEmpty)
    // every (query, vec) hit must score exactly what brute force scores it
    val brute = Similarity.bruteForceTopK(corpus, queries, k = 200)
      .select($"query_id", $"vec_id", $"cos").collect()
      .map(x => ((x.getLong(0), x.getLong(1)), x.getDouble(2))).toMap
    r.foreach { row =>
      val key = (row.getLong(0), row.getLong(2))
      assert(brute(key) === row.getDouble(3), s"cosine mismatch at $key")
    }
    r.groupBy(_.getLong(0)).foreach { case (_, rows) =>
      val cs = rows.sortBy(_.getLong(1)).map(_.getDouble(3))
      assert(cs.zip(cs.tail).forall { case (a, b) => a >= b }, "ranks not ordered")
    }
  }

  test("assignment: undefined cosines (zero-norm) sort LAST and still yield a deterministic cell, never null") {
    // vec 0 is the zero vector and (centroidEvery=2) a seed centroid.
    // Spark's non-ANSI double division makes every cosine against it NULL
    // (0/0 → NULL, not NaN); the packed ordering maps undefined to the
    // −10001 sentinel — DuckDB's NULLS LAST under the mirror's ORDER BY
    // cos DESC — so the zero-norm CENTROID loses to any real cosine, and
    // the zero-norm VECTOR (all orderings undefined) deterministically
    // takes the lowest cell id instead of a null cell.
    val emb = Seq(
      (0L, Seq(0.0f, 0.0f)), (1L, Seq(1.0f, 0.0f)),
      (2L, Seq(0.0f, 1.0f)), (3L, Seq(3.0f, 0.0f))
    ).toDF("vec_id", "embedding")
    val step = Similarity.kmeansStep(emb, centroidEvery = 2)
      .orderBy($"cell", $"pos").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getLong(3)))
    // vec 0 → cell 0 (sentinel tie → lowest cell); vecs 1,2,3 → cell 2
    assert(step.toSeq === Seq(
      (0L, 0L, 0.0, 1L), (0L, 1L, 0.0, 1L),
      (2L, 0L, 1.333333, 3L), (2L, 1L, 0.333333, 3L)))
  }

  test("pqCode: an all-undefined distance group yields NULL dist, never the decoded sentinel") {
    // vec 1's embedding is NULL, so every sub-distance against the codebook
    // is undefined; the packed argmin's 2^20 sentinel wins, and the decode
    // must surface dist = NULL (the DuckDB mirror's all-NULL ORDER BY
    // group), NOT the fabricated 104.8576 (ADVICE r9). The code still
    // resolves deterministically to the lowest cent_id on both engines.
    val emb = Seq(
      (0L, Seq(1.0f, 0.0f, 0.0f, 1.0f)),
      (1L, null.asInstanceOf[Seq[Float]]),
      (2L, Seq(0.0f, 1.0f, 1.0f, 0.0f))
    ).toDF("vec_id", "embedding")
    val out = Similarity.pqCode(emb, m = 2, dim = 4, centroidEvery = 2)
      .orderBy($"vec_id", $"sub").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        if (r.isNullAt(3)) None else Some(r.getDouble(3))))
    assert(out.toSeq === Seq(
      (0L, 0L, 0L, Some(0.0)), (0L, 1L, 0L, Some(0.0)),
      (1L, 0L, 0L, None), (1L, 1L, 0L, None),
      (2L, 0L, 2L, Some(0.0)), (2L, 1L, 2L, Some(0.0))))
  }

  test("trainedPqCodebook: one Lloyd round refines the fixed seed toward sub-space means") {
    // 4 vectors, m=2 (subDim 2), kPq=2 → seeds are vecs 0,1. Vectors 0,2
    // share sub-vector geometry with seed 0; 1,3 with seed 1 — after one
    // round each codebook entry is the detRound-6 quantized mean of its
    // two members, per subspace.
    val emb = Seq(
      (0L, Seq(1.0f, 0.0f, 0.0f, 1.0f)),
      (1L, Seq(0.0f, 1.0f, 1.0f, 0.0f)),
      (2L, Seq(3.0f, 0.0f, 0.0f, 3.0f)),
      (3L, Seq(0.0f, 3.0f, 3.0f, 0.0f))
    ).toDF("vec_id", "embedding")
    val cb = Similarity.trainedPqCodebook(emb, m = 2, dim = 4, k = 2, iters = 1)
      .orderBy($"cent_id", $"sub").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getSeq[Double](2)))
    assert(cb.toSeq === Seq(
      (0L, 0L, Seq(2.0, 0.0)), (0L, 1L, Seq(0.0, 2.0)),
      (1L, 0L, Seq(0.0, 2.0)), (1L, 1L, Seq(2.0, 0.0))))
  }

  test("ivfPqTopKTrained: trained ADC ranks in-cell candidates by approximate L2") {
    // 8 vectors in two clean clusters; queries = the two cluster anchors.
    // kCoarse=2 (seeds 0,1), kPq=2, one PQ round. Each query's top
    // neighbors must come from its own cluster with ascending approx_l2.
    val emb = Seq(
      (0L, Seq(1.0f, 0.0f, 0.0f, 1.0f)), (1L, Seq(0.0f, 1.0f, 1.0f, 0.0f)),
      (2L, Seq(2.0f, 0.0f, 0.0f, 2.0f)), (3L, Seq(0.0f, 2.0f, 2.0f, 0.0f)),
      (4L, Seq(3.0f, 0.0f, 0.0f, 3.0f)), (5L, Seq(0.0f, 3.0f, 3.0f, 0.0f)),
      (6L, Seq(1.5f, 0.0f, 0.0f, 1.5f)), (7L, Seq(0.0f, 1.5f, 1.5f, 0.0f))
    ).toDF("vec_id", "embedding")
    val out = Similarity.ivfPqTopKTrained(
        emb, emb.filter($"vec_id" < 2), k = 3,
        m = 2, dim = 4, kCoarse = 2, coarseIters = 1, kPq = 2, pqIters = 1,
        nprobe = 1)
      .orderBy($"query_id", $"rank").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(out.nonEmpty)
    // cluster purity: query 0's list ⊂ even ids, query 1's ⊂ odd ids
    out.foreach { case (q, _, v, _) =>
      assert(v % 2 === q % 2, s"query $q got cross-cluster neighbor $v")
    }
    // ranks ascend in approx_l2 within each query
    out.groupBy(_._1).foreach { case (_, rows) =>
      val ds = rows.sortBy(_._2).map(_._4)
      assert(ds.zip(ds.tail).forall { case (a, b) => a <= b })
    }
  }

  test("ivfPqSearchIndex: searching the persisted index == the in-memory path") {
    val emb = Seq(
      (0L, Seq(1.0f, 0.0f, 0.0f, 1.0f)), (1L, Seq(0.0f, 1.0f, 1.0f, 0.0f)),
      (2L, Seq(2.0f, 0.0f, 0.0f, 2.0f)), (3L, Seq(0.0f, 2.0f, 2.0f, 0.0f)),
      (4L, Seq(3.0f, 0.0f, 0.0f, 3.0f)), (5L, Seq(0.0f, 3.0f, 3.0f, 0.0f)),
      (6L, Seq(1.5f, 0.0f, 0.0f, 1.5f)), (7L, Seq(0.0f, 1.5f, 1.5f, 0.0f))
    ).toDF("vec_id", "embedding")
    val queries = emb.filter($"vec_id" < 2)
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.orderBy($"query_id", $"rank").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3))).toSeq
    val direct = rows(Similarity.ivfPqTopKTrained(emb, queries, k = 3,
      m = 2, dim = 4, kCoarse = 2, coarseIters = 1, kPq = 2, pqIters = 1,
      nprobe = 1))
    val dir = java.nio.file.Files.createTempDirectory("ivfpq_index").toString
    Similarity.writeIvfPqIndex(emb, dir, m = 2, dim = 4,
      kCoarse = 2, coarseIters = 1, kPq = 2, pqIters = 1)
    val fromIndex = rows(Similarity.ivfPqSearchIndex(dir, queries, k = 3,
      m = 2, dim = 4, nprobe = 1))
    assert(fromIndex === direct && direct.nonEmpty)
    // the index really is the four expected tables, and the heavy two are
    // narrow: codes carry (vec_id, sub, code) ints — never embeddings
    val codes = spark.read.parquet(s"$dir/codes.parquet")
    assert(codes.columns.toSet === Set("vec_id", "sub", "code"))
    assert(spark.read.parquet(s"$dir/cells.parquet").columns.toSet ===
      Set("vec_id", "cell"))
  }

  test("appendToIvfPqIndex: added vectors are searchable, trained tables untouched") {
    val base = Seq(
      (0L, Seq(1.0f, 0.0f, 0.0f, 1.0f)), (1L, Seq(0.0f, 1.0f, 1.0f, 0.0f)),
      (2L, Seq(2.0f, 0.0f, 0.0f, 2.0f)), (3L, Seq(0.0f, 2.0f, 2.0f, 0.0f)),
      (4L, Seq(3.0f, 0.0f, 0.0f, 3.0f)), (5L, Seq(0.0f, 3.0f, 3.0f, 0.0f))
    ).toDF("vec_id", "embedding")
    val dir = java.nio.file.Files.createTempDirectory("ivfpq_add").toString
    Similarity.writeIvfPqIndex(base, dir, m = 2, dim = 4,
      kCoarse = 2, coarseIters = 1, kPq = 2, pqIters = 1)
    val centsBefore = spark.read.parquet(s"$dir/cents.parquet").collect().toSet
    val cbBefore = spark.read.parquet(s"$dir/codebook.parquet").collect().toSet
    // nightly delta: an exact copy of vec 2 under a new id, plus a fresh
    // odd-cluster vector — assigned by the STORED quantizers only
    val delta = Seq(
      (10L, Seq(2.0f, 0.0f, 0.0f, 2.0f)),
      (11L, Seq(0.0f, 2.5f, 2.5f, 0.0f))).toDF("vec_id", "embedding")
    Similarity.appendToIvfPqIndex(delta, dir, m = 2, dim = 4)
    // corpus tables grew by exactly the delta; trained tables untouched
    assert(spark.read.parquet(s"$dir/cells.parquet").count() === 8L)
    assert(spark.read.parquet(s"$dir/codes.parquet").count() === 16L) // 8 × m
    assert(spark.read.parquet(s"$dir/cents.parquet").collect().toSet === centsBefore)
    assert(spark.read.parquet(s"$dir/codebook.parquet").collect().toSet === cbBefore)
    // the appended exact duplicate of vec 2 is found by a query AT vec 2's
    // position with the same quantized distance as the original's other
    // cluster-mates — i.e. added vectors are first-class search results
    val res = Similarity.ivfPqSearchIndex(
        dir, base.filter($"vec_id" === 2), k = 5, m = 2, dim = 4, nprobe = 1)
      .collect().map(r => (r.getLong(2), r.getDouble(3))).toMap
    assert(res.contains(10L), s"appended duplicate must be searchable: $res")
    assert(res(10L) === 0.0, "exact duplicate scores ADC distance 0 to its twin's codes")
    // the appended odd-cluster vector was assigned (by the stored coarse
    // quantizer) to the cell an even-cluster query never probes at
    // nprobe=1 — cell pruning applies to appended vectors exactly as to
    // originals
    assert(!res.contains(11L),
      s"unprobed-cell vector must stay pruned: $res")
  }

  test("ivfPqRerank: exact re-rank repairs ADC quantization-error ordering") {
    // Same two-cluster corpus as the trained-ADC test. With kPq=2 every
    // same-cluster vector collapses onto ONE codebook entry, so ADC sees
    // identical distances for all candidates (rank = vec_id tie-break),
    // while the exact distances differ by construction: the refine stage
    // MUST reorder — this pins it as load-bearing, not a pass-through.
    val emb = Seq(
      (0L, Seq(1.0f, 0.0f, 0.0f, 1.0f)), (1L, Seq(0.0f, 1.0f, 1.0f, 0.0f)),
      (2L, Seq(2.0f, 0.0f, 0.0f, 2.0f)), (3L, Seq(0.0f, 2.0f, 2.0f, 0.0f)),
      (4L, Seq(3.0f, 0.0f, 0.0f, 3.0f)), (5L, Seq(0.0f, 3.0f, 3.0f, 0.0f)),
      (6L, Seq(1.5f, 0.0f, 0.0f, 1.5f)), (7L, Seq(0.0f, 1.5f, 1.5f, 0.0f))
    ).toDF("vec_id", "embedding")
    val queries = emb.filter($"vec_id" < 2)
    val adc = Similarity.ivfPqTopKTrained(emb, queries, k = 3,
        m = 2, dim = 4, kCoarse = 2, coarseIters = 1, kPq = 2, pqIters = 1,
        nprobe = 1)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    val rr = Similarity.ivfPqRerank(emb, queries, k = 3, shortlist = 3,
        m = 2, dim = 4, kCoarse = 2, coarseIters = 1, kPq = 2, pqIters = 1,
        nprobe = 1)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3))).toSeq
    // shortlist containment: the re-ranked ids are exactly the ADC ids
    assert(rr.map(t => (t._1, t._3)).toSet === adc.map(t => (t._1, t._3)).toSet)
    // ADC collapsed to one code per cluster => its order is the id tie-break
    assert(adc.sortBy(t => (t._1, t._2)).map(_._3) === Seq(2L, 4L, 6L, 3L, 5L, 7L))
    // exact re-rank restores true-distance order with the true L2²
    assert(rr.sortBy(t => (t._1, t._2)) === Seq(
      (0L, 1L, 6L, 0.5), (0L, 2L, 2L, 2.0), (0L, 3L, 4L, 8.0),
      (1L, 1L, 7L, 0.5), (1L, 2L, 3L, 2.0), (1L, 3L, 5L, 8.0)))
  }

  test("ivfTopKTrained over kmeansFixedK: constant-K coarse cells give cluster-pure full lists") {
    // two clean clusters, fixed K=2 (seeds are vecs 0,1 — one per cluster).
    // K stays 2 no matter how many vectors arrive: the linear production
    // parameterization q_ann_ivf_fixedk gates.
    val emb = Seq(
      (0L, Seq(1.0f, 0.0f, 0.0f, 1.0f)), (1L, Seq(0.0f, 1.0f, 1.0f, 0.0f)),
      (2L, Seq(2.0f, 0.0f, 0.0f, 2.0f)), (3L, Seq(0.0f, 2.0f, 2.0f, 0.0f)),
      (4L, Seq(3.0f, 0.0f, 0.0f, 3.0f)), (5L, Seq(0.0f, 3.0f, 3.0f, 0.0f)),
      (6L, Seq(1.5f, 0.0f, 0.0f, 1.5f)), (7L, Seq(0.0f, 1.5f, 1.5f, 0.0f))
    ).toDF("vec_id", "embedding")
    val cents = Similarity.kmeansFixedK(emb, k = 2, maxIter = 2)
    assert(cents.count() === 2L, "K must stay the fixed constant")
    val out = Similarity.ivfTopKTrained(
        emb, emb.filter($"vec_id" < 2), k = 3, cents, nprobe = 1)
      .orderBy($"query_id", $"rank").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    // each query gets its full k=3 in-cluster list (4 same-cluster vectors
    // minus itself), ranked by descending cosine
    assert(out.count(_._1 == 0L) === 3 && out.count(_._1 == 1L) === 3)
    out.foreach { case (q, _, v, _) =>
      assert(v % 2 === q % 2, s"query $q got cross-cluster neighbor $v")
    }
    out.groupBy(_._1).foreach { case (_, rows) =>
      val cs = rows.sortBy(_._2).map(_._4)
      assert(cs.zip(cs.tail).forall { case (a, b) => a >= b })
    }
  }

  test("kmeans: one tol=0 round reproduces kmeansStep exactly") {
    val emb = Seq(
      (0L, Seq(1.0f, 0.0f)), (1L, Seq(2.0f, 0.0f)),
      (2L, Seq(0.0f, 1.0f)), (3L, Seq(0.0f, 3.0f))
    ).toDF("vec_id", "embedding")
    val one = Similarity.kmeans(emb, centroidEvery = 2, maxIter = 1)
      .select($"cell", $"n_vectors", posexplode($"emb_cent"))
      .select($"cell", $"pos".cast("long"), $"col", $"n_vectors")
      .orderBy($"cell", $"pos").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getLong(3)))
    val step = Similarity.kmeansStep(emb, centroidEvery = 2)
      .orderBy($"cell", $"pos").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getLong(3)))
    assert(one.toSeq === step.toSeq)
  }

  test("kmeans: tol > 0 stops at the fixpoint before maxIter") {
    val emb = Seq(
      (0L, Seq(1.0f, 0.0f)), (1L, Seq(2.0f, 0.0f)),
      (2L, Seq(0.0f, 1.0f)), (3L, Seq(0.0f, 3.0f))
    ).toDF("vec_id", "embedding")
    // assignments never change after round 1, so round 2 recomputes the same
    // centroids, the movement probe reads 0, and the loop exits at iter 2
    val (cents, iters) = Similarity.kmeansRun(emb, centroidEvery = 2,
      maxIter = 10, tol = 1e-9)
    assert(iters === 2)
    val rows = cents.orderBy($"cell").collect()
      .map(r => (r.getLong(0), r.getSeq[Double](1), r.getLong(2)))
    assert(rows.toSeq === Seq(
      (0L, Seq(1.5, 0.0), 2L), (2L, Seq(0.0, 2.0), 2L)))
  }
}
