package graft

import org.apache.spark.sql.functions._
import graft.operators.{Olap, Sketches}

/** SQL surface of the custom Catalyst expressions + the batch-6 robust
  * stats built on them. */
class GraftExtensionsSpec extends SparkSpec {
  import spark.implicits._

  test("install registers dot_fp / sorted_jaccard / shingle_set / topk_by_score for spark.sql") {
    val s = spark // temp views are session-scoped, so install on this one
    GraftExtensions.install(s)
    Seq((1L, Seq(1f, 2f, 3f), Seq(4f, 5f, 6f), "the quick brown fox"))
      .toDF("id", "a", "b", "text").createOrReplaceTempView("t")
    val r = s.sql(
      """SELECT dot_fp(a, b) AS d,
        |  sorted_jaccard(shingle_set('a b c', 1), shingle_set('b c d', 1)) AS j,
        |  shingle_set(text, 3) AS sh
        |FROM t""".stripMargin).head()
    assert(r.getDouble(0) === (4.0 + 10.0 + 18.0))
    assert(r.getDouble(1) === 0.5) // {a,b,c} vs {b,c,d}: 2/4
    assert(r.getSeq[String](2) === Seq("quick brown fox", "the quick brown"))
    // aggregate form: top-2 of (score, id) per group
    Seq(("g", 1.0, 10L), ("g", 3.0, 11L), ("g", 2.0, 12L))
      .toDF("g", "score", "id").createOrReplaceTempView("scores")
    val top = s.sql(
      "SELECT topk_by_score(score, id, 2) AS t FROM scores GROUP BY g")
      .select(explode($"t").as("e")).select("e.id").collect().map(_.getLong(0))
    assert(top.toSeq === Seq(11L, 12L))
  }

  test("the extensions class wires the same functions (spark.sql.extensions path)") {
    val names = GraftExtensions.functions.map(_._1.funcName).toSet
    assert(names === Set("dot_fp", "sorted_jaccard", "sorted_intersect_count",
      "shingle_set", "topk_by_score", "py_title", "py_clean_text",
      "py_standardize_name", "py_standardize_region", "rolling_fingerprint"))
    // the class applies without error against a fresh extensions holder
    new GraftExtensions().apply(new org.apache.spark.sql.SparkSessionExtensions)
  }

  test("py_* and rolling_fingerprint reach spark.sql with PyText/UDF-era semantics") {
    val s = spark
    GraftExtensions.install(s)
    val r = s.sql(
      """SELECT py_title("o'neil-x2y") AS t,
        |  py_clean_text('  spaced   out  ') AS c,
        |  py_standardize_name('maria da silva') AS n,
        |  py_standardize_region('são paulo') AS g,
        |  rolling_fingerprint('abcdefghij', 8) AS f""".stripMargin).head()
    assert(r.getString(0) === "O'Neil-X2Y")
    assert(r.getString(1) === "Spaced Out")
    assert(r.getString(2) === "Maria da Silva")
    assert(r.getString(3) === "São Paulo")
    assert(r.getLong(4) ===
      graft.operators.TextAnalysis.rollingFingerprint("abcdefghij", 8))
  }

  test("madOutliers: median/MAD exact on a hand set, outliers counted beyond 3*MAD") {
    // group g: values 1..7 plus the whale 1000: median 4.5, MAD 2.5
    val df = ((1 to 7).map(v => ("g", v.toDouble)) :+ (("g", 1000.0))).toDF("k", "v")
    val r = Olap.madOutliers(df, $"k", $"v").head()
    assert(r.getAs[Double]("median") === 4.5)
    // devs sorted: .5,.5,1.5,1.5,2.5,2.5,3.5,995.5 -> interpolated median 2.0
    assert(r.getAs[Double]("mad") === 2.0)
    assert(r.getAs[Long]("n_outliers") === 1L) // only the whale exceeds 3*MAD
    assert(r.getAs[Long]("n_rows") === 8L)
  }

  test("winsorizedSum clips exactly the tail above the sketch threshold") {
    val df = ((1 to 99).map(_.toDouble) :+ 1e6).toDF("v")
    val r = Sketches.winsorizedSum(df, $"v", 10.0, 0.9).head()
    assert(r.getAs[Long]("n_rows") === 100L)
    assert(r.getAs[Long]("n_clipped") >= 1L) // at least the 1e6 whale
    assert(r.getAs[Double]("sum_winsorized") < r.getAs[Double]("sum_raw"))
  }
}
