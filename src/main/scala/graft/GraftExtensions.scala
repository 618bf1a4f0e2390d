package graft

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}
import org.apache.spark.sql.types.IntegerType
import graft.functions.TopKByScore
import graft.functions.PyTextExpressions.{PyCleanText, PyStandardizeName, PyStandardizeRegion, PyTitle}
import graft.functions.VectorExpressions.{DotProductFP, RollingFingerprint, ShingleSet, SortedIntersectCount, SortedJaccard}

/** SQL surface for the library's custom Catalyst expressions — the
  * `SparkSessionExtensions` hook a deployment enables with
  * `--conf spark.sql.extensions=graft.GraftExtensions`, so `spark.sql`
  * users (and JDBC/Thrift clients) can call the native operators without
  * touching the Scala API:
  *
  *   - `dot_fp(a, b)`           — sequential-fold dot product
  *   - `sorted_jaccard(a, b)`   — Jaccard of sorted-distinct string arrays
  *   - `shingle_set(text, n)`   — sorted distinct word n-shingles
  *   - `sorted_intersect_count(a, b)` — merge-pass |A∩B| of sorted arrays
  *   - `topk_by_score(s, id, k)`— O(k)-state per-group top-k aggregate
  *   - `py_title(s)` / `py_clean_text(s)` / `py_standardize_name(s)` /
  *     `py_standardize_region(s)` — the Python `str.title()` family (F1–F3)
  *   - `rolling_fingerprint(s, k)` — min-of-window Rabin–Karp hash
  *
  * [[GraftExtensions.install]] registers the same functions into an
  * already-running session (the notebook path, where the extensions conf
  * can no longer be set).
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit =
    GraftExtensions.functions.foreach(e.injectFunction)
}

object GraftExtensions {

  private def intArg(e: Expression, fn: String): Int = e match {
    case Literal(v: Int, IntegerType) => v
    case other =>
      throw new IllegalArgumentException(s"$fn expects a literal INT, got $other")
  }

  private def info(name: String): ExpressionInfo =
    new ExpressionInfo(classOf[GraftExtensions].getName, name)

  val functions: Seq[(FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression)] =
    Seq(
      (FunctionIdentifier("dot_fp"), info("dot_fp"),
        args => DotProductFP(args(0), args(1))),
      (FunctionIdentifier("sorted_jaccard"), info("sorted_jaccard"),
        args => SortedJaccard(args(0), args(1))),
      (FunctionIdentifier("sorted_intersect_count"), info("sorted_intersect_count"),
        args => SortedIntersectCount(args(0), args(1))),
      (FunctionIdentifier("shingle_set"), info("shingle_set"),
        args => ShingleSet(args(0), intArg(args(1), "shingle_set"))),
      (FunctionIdentifier("topk_by_score"), info("topk_by_score"),
        args => TopKByScore(args(0), args(1), intArg(args(2), "topk_by_score"))
          .toAggregateExpression()),
      (FunctionIdentifier("py_title"), info("py_title"),
        args => PyTitle(args(0))),
      (FunctionIdentifier("py_clean_text"), info("py_clean_text"),
        args => PyCleanText(args(0))),
      (FunctionIdentifier("py_standardize_name"), info("py_standardize_name"),
        args => PyStandardizeName(args(0))),
      (FunctionIdentifier("py_standardize_region"), info("py_standardize_region"),
        args => PyStandardizeRegion(args(0))),
      (FunctionIdentifier("rolling_fingerprint"), info("rolling_fingerprint"),
        args => RollingFingerprint(args(0), intArg(args(1), "rolling_fingerprint"))))

  /** Register into a live session (when `spark.sql.extensions` was not set
    * at build time). Idempotent — re-registration overwrites. */
  def install(s: SparkSession): Unit =
    functions.foreach { case (id, inf, builder) =>
      s.sessionState.functionRegistry.registerFunction(id, inf, builder)
    }
}
