package graft

import graft.functions.StringSim
import graft.operators.Linkage
import org.apache.spark.sql.functions._

/** Jaro–Winkler parity + sorted-neighborhood linkage.
  *
  * The hand values below are DuckDB 1.0 `jaro_similarity` /
  * `jaro_winkler_similarity` outputs captured verbatim (the oracle
  * engine); assertions are EXACT double equality — the whole point of the
  * mirrored implementation is that threshold predicates cannot flip
  * between engines on 1-ulp drift.
  */
class StringSimSpec extends SparkSpec {
  import spark.implicits._

  test("jaro matches DuckDB bit-for-bit on the probe corpus") {
    assert(StringSim.jaro("martha", "marhta") === 0.9444444444444445)
    assert(StringSim.jaro("DIXON", "DICKSONX") === 0.7666666666666666)
    assert(StringSim.jaro("JELLYFISH", "SMELLYFISH") === 0.8962962962962964)
    assert(StringSim.jaro("CRATE", "TRACE") === 0.7333333333333334)
    assert(StringSim.jaro("arnab", "aranb") === 0.9333333333333332)
    // window clamp: length-2 swap has window 0 → no cross-position match
    assert(StringSim.jaro("ab", "ba") === 0.0)
    // 3-cycle transpositions floor-halve (1, not 1.5)
    assert(StringSim.jaro("0abc00", "0bca00") === 0.9444444444444445)
    // empties are 0.0 — including BOTH empty
    assert(StringSim.jaro("", "abc") === 0.0)
    assert(StringSim.jaro("", "") === 0.0)
    assert(StringSim.jaro("a", "a") === 1.0)
  }

  test("jaroWinkler matches DuckDB bit-for-bit, boost gate included") {
    assert(StringSim.jaroWinkler("martha", "marhta") === 0.9611111111111111)
    assert(StringSim.jaroWinkler("DIXON", "DICKSONX") === 0.8133333333333332)
    assert(StringSim.jaroWinkler("arnab", "aranb") === 0.9466666666666665)
    assert(StringSim.jaroWinkler("hello world", "hello wrold") === 0.9818181818181818)
    assert(StringSim.jaroWinkler("DwAyNE", "DuANE") === 0.8400000000000001)
    // prefix cap at 4 even when more matches
    assert(StringSim.jaroWinkler("aaaa", "aaaaaaaaaaaaaaaaaaaa") === 0.8400000000000001)
    // boost applies ONLY above 0.7 — these sit at/below the gate
    assert(StringSim.jaroWinkler("abcdxxxx", "abcdyyyy") === 0.6666666666666666)
    assert(StringSim.jaroWinkler("xa", "xb") === 0.6666666666666666)
    assert(StringSim.jaroWinkler("abcdefgh", "abzzzzzz") === 0.5)
    // and fires above it
    assert(StringSim.jaroWinkler("prefixab", "prefixzz") === 0.9)
  }

  test("the codegen expression evaluates identically to the static call") {
    val pairs = Seq(("martha", "marhta"), ("DIXON", "DICKSONX"),
      ("", ""), ("ab", "ba"), ("prefixab", "prefixzz"),
      ("part lace spring", "part lace sprung"))
    val out = pairs.toDF("a", "b")
      .select(StringSim.jaroWinklerCol(col("a"), col("b")).as("s"))
      .collect().map(_.getDouble(0))
    assert(out.toSeq === pairs.map { case (a, b) => StringSim.jaroWinkler(a, b) })
    // null propagation
    val n = Seq((Some("x"), None: Option[String]), (None, Some("y")))
      .toDF("a", "b")
      .select(StringSim.jaroWinklerCol(col("a"), col("b")).as("s"))
      .collect()
    assert(n.forall(_.isNullAt(0)))
  }

  // ---- sortedNeighborhood -------------------------------------------------

  test("sortedNeighborhood pairs each record with its w rank-successors only") {
    // sorted key order: anna01 anna02 anna03 bob zz — w=2 windows
    val df = Seq((10L, "anna02"), (11L, "bob"), (12L, "anna01"),
      (13L, "zz"), (14L, "anna03")).toDF("id", "name")
    val out = Linkage.sortedNeighborhood(df, "id", "name", w = 2,
      threshold = 0.9)
      .orderBy($"id1", $"id2").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(4)))
    // anna01–anna02, anna01–anna03, anna02–anna03 clear 0.9; bob/zz never
    assert(out.map(p => (p._1, p._2)).toSeq ===
      Seq((10L, 14L), (12L, 10L), (12L, 14L)))
    // id1 is always the LOWER rank (anna01=12 before anna02=10)
    assert(out.forall(_._3 >= 0.9))
  }

  test("sortedNeighborhood: w=1 chain and threshold boundary behave") {
    val df = Seq((1L, "same"), (2L, "same"), (3L, "same"))
      .toDF("id", "name")
    val out = Linkage.sortedNeighborhood(df, "id", "name", w = 1,
      threshold = 0.9).collect()
    // identical keys: each rank pairs with its single successor, sim 1.0
    assert(out.length === 2)
    assert(out.forall(_.getDouble(4) === 1.0))
  }

  // ---- editNearDup (PassJoin pigeonhole) ----------------------------------

  test("editNearDup finds substitution, deletion and insertion pairs") {
    val df = Seq(
      (1L, "golden lace"),   // base
      (2L, "golden lace"),   // exact dup (dist 0)
      (3L, "golden lacf"),   // substitution (1)
      (4L, "goldn lace"),    // deletion (1) — shifted segments
      (5L, "xgolden lace"),  // insertion at front (1) — all shifted
      (6L, "goldex lacf"),   // two substitutions (2)
      (7L, "totally other")) // far away
      .toDF("id", "name")
    val out = Linkage.editNearDup(df, "id", "name", k = 2)
      .orderBy($"id1", $"id2").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(4)))
    val pairs = out.map(p => (p._1, p._2)).toSet
    assert(pairs.contains((1L, 2L)) && pairs.contains((1L, 3L)) &&
      pairs.contains((1L, 4L)) && pairs.contains((1L, 5L)) &&
      pairs.contains((1L, 6L)))
    assert(!pairs.exists(p => p._1 == 7L || p._2 == 7L))
    assert(out.find(p => p._1 == 1L && p._2 == 2L).get._3 === 0L)
    assert(out.find(p => p._1 == 1L && p._2 == 6L).get._3 === 2L)
  }

  test("editNearDup ≡ brute-force all-pairs on random corpora") {
    val rnd = new scala.util.Random(31)
    val al = "abcd"
    def lev(a: String, b: String): Int = {
      val d = Array.tabulate(a.length + 1, b.length + 1) { (i, j) =>
        if (i == 0) j else if (j == 0) i else 0
      }
      for (i <- 1 to a.length; j <- 1 to b.length)
        d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
          d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
      d(a.length)(b.length)
    }
    for (k <- Seq(1, 2, 3)) {
      val docs = (1L to 40L).map { id =>
        id -> Vector.fill(k + 1 + rnd.nextInt(8))(al(rnd.nextInt(4))).mkString
      }
      val exp = (for {
        (i1, n1) <- docs; (i2, n2) <- docs
        if i1 < i2 && lev(n1, n2) <= k
      } yield (i1, i2, lev(n1, n2).toLong)).toSet
      val got = Linkage.editNearDup(docs.toDF("id", "name"), "id", "name", k)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(4))).toSet
      assert(got === exp, s"k=$k")
      assert(exp.nonEmpty, s"degenerate corpus at k=$k")
    }
  }

  test("editNearDup: strings shorter than k+1 are excluded by contract") {
    val df = Seq((1L, "ab"), (2L, "ab"), (3L, "abcd"), (4L, "abcd"))
      .toDF("id", "name")
    val out = Linkage.editNearDup(df, "id", "name", k = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(out.toSet === Set((3L, 4L)))
  }
}
