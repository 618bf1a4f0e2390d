package graft

import org.apache.spark.sql.functions._
import scala.util.Random

/** Seeded randomized properties for the operators whose correctness rests
  * on a non-obvious argument (the scalatest+scalacheck bridge artifact is
  * not in the offline cache, so these use the same seeded-generator style
  * as PyTextSpec). Trial counts are small — each trial runs Spark jobs —
  * but the generators hit the adversarial shapes: duplicate keys, shared
  * substrings, empty strata.
  */
class PropertySpec extends SparkSpec {
  import spark.implicits._

  private val rnd = new Random(20260812L)

  private def randWords(n: Int, vocab: Int): String =
    Seq.fill(n)(s"w${rnd.nextInt(vocab)}").mkString(" ")

  test("containmentPairs has NO false negatives vs brute force (prefix-filter completeness)") {
    (1 to 3).foreach { _ =>
      // small vocab → lots of shared shingles → containment pairs exist
      val docs = (1L to 25L).map(i => (i, randWords(4 + rnd.nextInt(10), 8)))
      val df = docs.toDF("doc_id", "text")
      val got = graft.operators.Dedup.containmentPairs(df, "doc_id", "text")
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      // brute force over the same shingle definition (whole-text fallback <3 words)
      def shingles(t: String): Set[String] = {
        val w = t.split(" ", -1)
        if (w.length < 3) Set(t)
        else w.sliding(3).map(_.mkString(" ")).toSet
      }
      val sets = docs.map { case (id, t) => id -> shingles(t) }.toMap
      val want = (for {
        (a, sa) <- sets.toSeq; (b, sb) <- sets.toSeq if a != b
        c = sa.intersect(sb).size.toDouble / sa.size
        cr = math.floor(c * 10000 + 0.5) / 10000
        if cr >= 0.9
      } yield (a, b)).toSet
      assert(want.subsetOf(got), s"missed pairs: ${want.diff(got)}")
      assert(got === want, s"extra pairs: ${got.diff(want)}") // exact too
    }
  }

  test("jaccardPairs equals brute force in BOTH encodings (bitmask and int-array)") {
    // vocab 12 → bitmask path; vocab 90 → dictionary int-array path. Both
    // must be EXACTLY the all-pairs-within-block word-set jaccard.
    Seq(12, 90).foreach { vocab =>
      (1 to 2).foreach { _ =>
        val docs = (1L to 30L).map(i =>
          (i, randWords(3 + rnd.nextInt(12), vocab), s"b${i % 3}"))
        val df = docs.toDF("doc_id", "text", "blk")
        val t = 0.3
        val got = graft.operators.Dedup.jaccardPairs(df, "doc_id", "text", "blk", t)
          .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2))).toMap
        val sets = docs.map { case (id, txt, b) => (id, b) -> txt.split(" ", -1).toSet }
        val want = (for {
          ((a, ba), sa) <- sets; ((b, bb), sb) <- sets
          if a < b && ba == bb
          j = sa.intersect(sb).size.toDouble / sa.union(sb).size
          if j >= t
        } yield (a, b) -> j).toMap
        assert(got.keySet === want.keySet,
          s"vocab=$vocab missed=${want.keySet.diff(got.keySet)} extra=${got.keySet.diff(want.keySet)}")
        want.foreach { case (k, j) => assert(got(k) === j, s"vocab=$vocab pair=$k") }
      }
    }
  }

  test("applyChangeLog equals a naive latest-wins fold for random logs") {
    (1 to 3).foreach { _ =>
      val log = (1 to 80).map { i =>
        val k = rnd.nextInt(12).toLong
        val ts = new java.sql.Timestamp(1700000000000L + rnd.nextInt(100000) * 1000L + i)
        val op = Seq("I", "U", "D")(rnd.nextInt(3))
        (k, ts, op, rnd.nextInt(1000).toDouble)
      }
      val df = log.toDF("k", "vts", "op", "price")
      val got = graft.operators.Cdc.applyChangeLog(df, $"k", $"vts", $"op")
        .collect().map(r => (r.getLong(0), r.getString(2), r.getDouble(3))).toSet
      val want = log.groupBy(_._1).flatMap { case (_, vs) =>
        val latest = vs.maxBy(_._2.getTime) // ts unique per key (ts carries i)
        if (latest._3 == "D") None else Some((latest._1, latest._3, latest._4))
      }.toSet
      assert(got === want)
    }
  }

  test("hll estimate is invariant to how the input is batched (register merge)") {
    val items = (1 to 3000).map(i => ("g", s"v${rnd.nextInt(2000)}"))
    val df = items.toDF("grp", "it")
    val whole = graft.operators.Sketches.hllDistinct(df, $"grp", $"it")
      .collect()(0).getDouble(2)
    // arbitrary 3-way split, unioned back in a different order
    val parts = items.zipWithIndex.groupBy(_._2 % 3).values.toList
      .map(p => p.map(_._1).toDF("grp", "it"))
    val reunioned = parts(2).unionAll(parts(0)).unionAll(parts(1))
    val split = graft.operators.Sketches.hllDistinct(reunioned, $"grp", $"it")
      .collect()(0).getDouble(2)
    assert(whole === split)
  }

  test("winnow guarantee: any shared >= w+k-1 word run yields a shared fingerprint") {
    (1 to 3).foreach { t =>
      val shared = Seq.fill(6)(s"s$t${rnd.nextInt(50)}").mkString(" ")
      val doc1 = s"${randWords(rnd.nextInt(8), 30)} $shared ${randWords(rnd.nextInt(8), 30)}"
        .trim.replaceAll(" +", " ")
      val doc2 = s"${randWords(rnd.nextInt(8), 99)} $shared ${randWords(rnd.nextInt(8), 99)}"
        .trim.replaceAll(" +", " ")
      val out = graft.operators.TextAnalysis.winnow(
        Seq((1L, doc1), (2L, doc2)).toDF("doc_id", "text"), "doc_id", "text")
        .collect().map(r => (r.getLong(0), r.getLong(2)))
      val f1 = out.filter(_._1 == 1L).map(_._2).toSet
      val f2 = out.filter(_._1 == 2L).map(_._2).toSet
      assert(f1.intersect(f2).nonEmpty, s"docs sharing '$shared' share no fingerprint")
    }
  }

  test("histogramQuantiles error is bounded by one bin width vs the exact quantile") {
    (1 to 3).foreach { _ =>
      val vals = Seq.fill(500)(rnd.nextDouble() * 90000.0)
      val df = vals.toDF("v")
      val ps = Seq(0.5, 0.9, 0.99)
      val out = graft.operators.Sketches.histogramQuantiles(
        df, $"v", 5000.0, ps).collect()
        .map(r => r.getAs[Double]("p") -> r.getAs[Double]("estimate")).toMap
      val sorted = vals.sorted
      ps.foreach { p =>
        // ceil(p*n)-th smallest is the rank the sketch targets
        val exact = sorted(math.ceil(p * vals.size).toInt - 1)
        assert(math.abs(out(p) - exact) <= 5000.0,
          s"p=$p est=${out(p)} exact=$exact off by more than a bin")
      }
    }
  }

  test("snapshotDiff fold: applying the diff to A reconstructs B exactly") {
    (1 to 3).foreach { _ =>
      val a = (1 to 60).map(k => (k.toLong, rnd.nextInt(5).toDouble))
      val b = (1 to 70).flatMap { k =>
        if (rnd.nextBoolean()) Some((k.toLong, rnd.nextInt(5).toDouble)) else None
      }
      val diff = graft.operators.Reconcile.snapshotDiff(
        a.toDF("k", "v"), b.toDF("k", "v"), "k", Seq("v")).collect()
        .map(r => (r.getLong(0), r.getString(1), Option(r.get(3)).map(_.toString.toDouble)))
      val applied = a.toMap ++
        diff.collect { case (k, s, Some(v)) if s == "added" || s == "changed" => k -> v } --
        diff.collect { case (k, "removed", _) => k }
      assert(applied === b.toMap, "diff application did not reconstruct B")
    }
  }

  test("pqCode agrees with a brute-force nearest-codebook scan") {
    val dim = 8; val m = 2; val sub = dim / m
    val vecs = (0L to 20L).map(i => (i, Seq.fill(dim)(rnd.nextFloat() * 2 - 1)))
    val df = vecs.toDF("vec_id", "embedding")
    val got = graft.operators.Similarity.pqCode(df, m, dim, centroidEvery = 4)
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getLong(2))).toMap
    val cents = vecs.filter(_._1 % 4 == 0)
    def l2(x: Seq[Float], c: Seq[Float]): Double = {
      def dot(p: Seq[Float], q: Seq[Float]) =
        p.zip(q).foldLeft(0.0)((acc, t) => acc + t._1.toDouble * t._2.toDouble)
      val d = dot(x, x) + dot(c, c) - 2.0 * dot(x, c)
      math.floor(d * 10000 + 0.5) / 10000
    }
    for ((id, emb) <- vecs; s <- 0 until m) {
      val xs = emb.slice(s * sub, s * sub + sub)
      val want = cents.map { case (cid, ce) =>
        (l2(xs, ce.slice(s * sub, s * sub + sub)), cid)
      }.min._2
      assert(got((id, s.toLong)) === want, s"vec $id sub $s")
    }
  }

  test("ivfPqRerank with full shortlist + all cells probed equals exact L2 top-k") {
    // When nothing is pruned (nprobe = kCoarse, shortlist = n-1) the two-
    // stage search degenerates to exact search: the ADC stage only selects
    // candidates, and the refine stage orders ALL of them by true distance.
    // Random corpus, expected ranking re-derived driver-side with the same
    // sequential-double fold + quantization the engine uses.
    val rnd = new Random(7)
    val n = 24; val dim = 8
    val vecs = (0L until n.toLong).map(i =>
      (i, Seq.fill(dim)((rnd.nextInt(400) - 200) / 100.0f))).toVector
    val emb = vecs.toDF("vec_id", "embedding")
    val queries = emb.filter($"vec_id" < 3)
    val out = operators.Similarity.ivfPqRerank(emb, queries, k = 5,
        shortlist = n - 1, m = 2, dim = dim, kCoarse = 4, coarseIters = 1,
        kPq = 4, pqIters = 1, nprobe = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    def dot(a: Seq[Float], b: Seq[Float]): Double =
      a.zip(b).foldLeft(0.0) { case (s, (x, y)) => s + x.toDouble * y.toDouble }
    val expected = (0L until 3L).flatMap { q =>
      val qv = vecs(q.toInt)._2
      vecs.filter(_._1 != q).map { case (v, xv) =>
        val d = math.floor((dot(qv, qv) + dot(xv, xv) - 2.0 * dot(qv, xv)) * 1e4 + 0.5) / 1e4
        (q, math.floor(d * 1e4 + 0.5).toLong, v)
      }.sortBy(t => (t._2, t._3)).take(5).zipWithIndex
        .map { case ((_, _, v), i) => (q, (i + 1).toLong, v) }
    }
    assert(out.sortBy(t => (t._1, t._2)) === expected)
  }

  test("poissonBootstrap mass: replicate row counts concentrate around n") {
    (1 to 2).foreach { _ =>
      val n = 2000 + rnd.nextInt(2000)
      val df = (1L to n.toLong).toDF("k").withColumn("v", ($"k" % 50).cast("double"))
      val out = graft.operators.Sampling.poissonBootstrap(df, $"k", $"v", b = 6)
        .collect().map(r => r.getLong(1))
      // each replicate's n_eff ~ Poisson(n): sd = sqrt(n); allow 6σ
      val sd = math.sqrt(n.toDouble)
      out.foreach(ne => assert(math.abs(ne - n) < 6 * sd, s"n=$n n_eff=$ne"))
    }
  }

  test("duplicateSpanStats: exact clones are fully duplicated, flags survive permutation") {
    (1 to 2).foreach { _ =>
      val base = (1L to 12L).map(i => (i, randWords(8 + rnd.nextInt(6), 30)))
      val clones = base.take(4).map { case (id, t) => (id + 100L, t) } // 4 exact clones
      val df = rnd.shuffle(base ++ clones).toDF("doc_id", "text")
      val out = graft.operators.Dedup.duplicateSpanStats(df, "doc_id", "text")
        .collect().map(r => r.getLong(0) -> r.getDouble(3)).toMap
      clones.foreach { case (cid, _) =>
        assert(out(cid) === 1.0, s"clone $cid not fully duplicated")
        assert(out(cid - 100L) === 1.0, s"original ${cid - 100} not fully duplicated")
      }
    }
  }

  test("kmeansStep equals a brute-force argmax assignment + quantized means") {
    (1 to 2).foreach { _ =>
      val dim = 6
      val vecs = (0L until 40L).map(i => (i, Array.fill(dim)(rnd.nextFloat() * 2 - 1)))
      val df = vecs.map { case (i, a) => (i, a.toSeq) }.toDF("vec_id", "embedding")
      val out = graft.operators.Similarity.kmeansStep(df, centroidEvery = 5)
        .collect().map(r => ((r.getLong(0), r.getLong(1)), (r.getDouble(2), r.getLong(3)))).toMap
      // brute force in Scala: argmax of round-4 cosine, ties to lower cell
      def dot(a: Array[Float], b: Array[Float]): Double =
        a.zip(b).foldLeft(0.0) { case (acc, (x, y)) => acc + x.toDouble * y.toDouble }
      def r4(x: Double): Double = math.floor(x * 1e4 + 0.5) / 1e4
      val cents = vecs.filter(_._1 % 5 == 0)
      val assign = vecs.map { case (i, v) =>
        val best = cents.map { case (c, cv) =>
          (r4(dot(v, cv) / (math.sqrt(dot(v, v)) * math.sqrt(dot(cv, cv)))), c)
        }.maxBy { case (cos, c) => (cos, -c) }
        i -> best._2
      }.toMap
      val want = assign.groupBy(_._2).flatMap { case (cell, m) =>
        val members = m.keys.toSeq.map(i => vecs(i.toInt)._2)
        (0 until dim).map { p =>
          val s = members.map(v => math.floor(v(p).toDouble * 1e6 + 0.5).toLong).sum
          val mean = math.floor(s / 1e6 / members.size * 1e6 + 0.5) / 1e6
          (cell, p.toLong) -> (mean, members.size.toLong)
        }
      }
      assert(out === want)
    }
  }

  test("pagerank conserves mass on random directed graphs with dangling nodes") {
    (1 to 2).foreach { _ =>
      val n = 12
      val edges = (0 until n).flatMap { s =>
        Seq.fill(rnd.nextInt(3))((s.toLong, rnd.nextInt(n).toLong))
      }.filter { case (a, b) => a != b }.distinct
      if (edges.nonEmpty) {
        val df = edges.toDF("src", "dst")
        val (out, _) = graft.operators.Graph.pagerankRun(df, maxIter = 4)
        val ranks = out.collect().map(r => (r.getLong(0), r.getDouble(1)))
        val nodes = edges.flatMap { case (a, b) => Seq(a, b) }.distinct.sorted
        assert(ranks.map(_._1).sorted.toSeq === nodes, "node universe changed")
        assert(math.abs(ranks.map(_._2).sum - 1.0) < 1e-8,
          s"mass leaked: ${ranks.map(_._2).sum}")
      }
    }
  }

  test("interleave fairness: while all sources have docs, every n-sized block is distinct") {
    (1 to 3).foreach { _ =>
      val sizes = Seq("a" -> (3 + rnd.nextInt(5)), "b" -> (3 + rnd.nextInt(5)),
        "c" -> (3 + rnd.nextInt(5)))
      val docs = sizes.zipWithIndex.flatMap { case ((s, n), si) =>
        (1 to n).map(i => ((si * 100 + i).toLong, s))
      }
      val out = graft.operators.Sampling.interleaveBySource(
        docs.toDF("doc_id", "source"), "doc_id", "source")
        .orderBy("interleave_key").collect().map(_.getString(1))
      val full = sizes.map(_._2).min * sizes.size
      out.take(full).grouped(sizes.size).foreach { block =>
        assert(block.toSet.size === sizes.size, s"unfair block: ${block.toSeq}")
      }
    }
  }
}
