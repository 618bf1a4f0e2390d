package graft

import org.apache.spark.sql.functions._
import graft.functions.VectorExpressions.{dotFP, sortedJaccard}
import graft.operators.{Dedup, Similarity}

/** The native codegen expressions must be BIT-IDENTICAL to their
  * expression-tree reference forms (Similarity.dot / Dedup.jaccard) — the
  * DuckDB oracle mirrors were validated against those forms.
  */
class VectorExpressionsSpec extends SparkSpec {
  import spark.implicits._

  private val vecs = Seq(
    (1L, Array(1.0f, 2.0f, 3.0f)),
    (2L, Array(-0.5f, 0.25f, 4.0f)),
    (3L, Array(0.1f, 0.1f, 0.1f)),
    (4L, Array(1e10f, 1e-10f, 1.0f))) // magnitudes that expose fold-order differences

  test("dotFP equals the aggregate(zip_with) fold exactly") {
    val df = vecs.toDF("id", "v")
    val a = df.select($"id".as("ia"), $"v".as("va"))
    val b = df.select($"id".as("ib"), $"v".as("vb"))
    val pairs = a.join(b, $"ia" <= $"ib")
    val r = pairs.select(
      dotFP($"va", $"vb").as("fast"),
      Similarity.dot($"va", $"vb").as("ref")).collect()
    r.foreach { row =>
      assert(java.lang.Double.doubleToLongBits(row.getDouble(0)) ===
        java.lang.Double.doubleToLongBits(row.getDouble(1)))
    }
  }

  test("dotFP null semantics: length mismatch and null element") {
    val df = Seq(
      (Array(1.0f, 2.0f), Array(1.0f)), // length mismatch
      (Array(1.0f, 2.0f), Array(1.0f, 2.0f))).toDF("a", "b")
    val r = df.select(dotFP($"a", $"b")).collect()
    assert(r(0).isNullAt(0))
    assert(r(1).getDouble(0) === 5.0)
  }

  test("sortedJaccard equals size(intersect)/size(union) on sorted-distinct arrays") {
    val docs = Seq(
      (1L, "a b c d"), (2L, "b c d e"), (3L, "x y"), (4L, "a b c d"), (5L, "")).toDF("id", "t")
    val prepared = docs.select($"id", sort_array(array_distinct(split($"t", " "))).as("ws"))
    val a = prepared.select($"id".as("ia"), $"ws".as("wa"))
    val b = prepared.select($"id".as("ib"), $"ws".as("wb"))
    val pairs = a.join(b, $"ia" < $"ib")
    val r = pairs.select(
      sortedJaccard($"wa", $"wb").as("fast"),
      Dedup.jaccard($"wa", $"wb").as("ref")).collect()
    r.foreach { row =>
      assert(row.getDouble(0) === row.getDouble(1))
    }
  }

  test("sortedIntersectCount equals size(array_intersect) across element types") {
    import graft.functions.VectorExpressions.sortedIntersectCount
    val docs = Seq(
      (1L, "a b c d"), (2L, "b c d e"), (3L, "x y"), (4L, "a b c d"), (5L, "")).toDF("id", "t")
    val prepared = docs.select($"id", sort_array(array_distinct(split($"t", " "))).as("ws"))
    val a = prepared.select($"id".as("ia"), $"ws".as("wa"))
    val b = prepared.select($"id".as("ib"), $"ws".as("wb"))
    val r = a.join(b, $"ia" < $"ib").select(
      sortedIntersectCount($"wa", $"wb").as("fast"),
      size(array_intersect($"wa", $"wb")).cast("long").as("ref")).collect()
    r.foreach(row => assert(row.getLong(0) === row.getLong(1)))
    // int-typed arrays take the primitive-compare branch
    val ints = Seq((Seq(1, 3, 5), Seq(1, 2, 3, 9)), (Seq(2, 4), Seq(1, 3))).toDF("xa", "xb")
    val ri = ints.select(sortedIntersectCount($"xa", $"xb").as("n")).collect().map(_.getLong(0))
    assert(ri.toSeq === Seq(2L, 0L))
  }

  test("reworked cosineNearDupPairs matches the naive cosine formulation") {
    val df = vecs.toDF("vec_id", "embedding")
    val fast = Similarity.cosineNearDupPairs(df, threshold = -1.0)
      .orderBy($"vec_id_a", $"vec_id_b").collect()
    // naive: per-pair cosine via the expression-tree fold
    val a = df.select($"vec_id".as("vec_id_a"), $"embedding".as("ea"))
    val b = df.select($"vec_id".as("vec_id_b"), $"embedding".as("eb"))
    val naive = a.join(b, $"vec_id_a" < $"vec_id_b")
      .select($"vec_id_a", $"vec_id_b",
        graft.functions.GraftFunctions.detRound(Similarity.cosine($"ea", $"eb"), 4).as("cos"))
      .orderBy($"vec_id_a", $"vec_id_b").collect()
    assert(fast.length === naive.length)
    fast.zip(naive).foreach { case (f, n) =>
      assert(f.getLong(0) === n.getLong(0) && f.getLong(1) === n.getLong(1))
      assert(f.getDouble(2) === n.getDouble(2))
    }
  }

  test("planeCoeff is deterministic and in [-0.5, 0.5)") {
    val c1 = Similarity.planeCoeff(3, 17)
    assert(c1 === Similarity.planeCoeff(3, 17))
    for (p <- 0 until 8; d <- 0 until 64) {
      val c = Similarity.planeCoeff(p, d)
      assert(c >= -0.5 && c < 0.5)
    }
  }
}
