package graft.functions

import org.apache.spark.sql.{Column, GraftColumnBridge}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, DoubleType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Jaro / Jaro–Winkler string similarity (Winkler 1990, the record-linkage
  * comparator), implemented to BIT-EXACT parity with DuckDB 1.0's
  * `jaro_winkler_similarity` (a RapidFuzz port) so oracle-compared
  * threshold predicates cannot flip on 1-ulp differences. The parity
  * contract, fuzz-verified over 20k random pairs before this was written:
  *
  *  - either side empty → 0.0 (INCLUDING both-empty — not 1.0);
  *  - match window `max(len)/2 − 1`, clamped at 0 (so "ab"/"ba" → 0.0:
  *    no cross-position match at length 2), greedy first-unused matching;
  *  - transpositions = mismatched matched-pairs FLOOR-halved (integer
  *    division — a 3-cycle counts 1, not 1.5);
  *  - jaro = (m/l1 + m/l2 + (m−t)/m) / 3 in exactly that association;
  *  - Winkler boost only when jaro > 0.7 (strict), prefix capped at 4,
  *    composed as `jaro + p * 0.1 * (1 − jaro)` left-associated.
  *
  * Comparison is by UTF-16 code unit (Spark-side) vs byte (DuckDB-side):
  * identical verdicts on ASCII keys, the only kind the gated queries
  * compare. The expression is a native codegen binary (same pattern as
  * [[PyTextExpressions]]): the static call below is emitted directly into
  * WholeStageCodegen, no ScalaUDF indirection, null-propagating via
  * `defineCodeGen`'s null-safe path.
  */
object StringSim {

  /** Jaro similarity; see object doc for the exact semantics mirrored. */
  def jaro(s1: String, s2: String): Double = {
    val l1 = s1.length
    val l2 = s2.length
    if (l1 == 0 || l2 == 0) return 0.0
    val window = math.max(0, math.max(l1, l2) / 2 - 1)
    val used = new Array[Boolean](l2)
    val m1 = new Array[Char](math.min(l1, l2))
    var m = 0
    var i = 0
    while (i < l1) {
      val hi = math.min(l2 - 1, i + window)
      var j = math.max(0, i - window)
      var found = false
      while (j <= hi && !found) {
        if (!used(j) && s1.charAt(i) == s2.charAt(j)) {
          used(j) = true
          m1(m) = s1.charAt(i)
          m += 1
          found = true
        }
        j += 1
      }
      i += 1
    }
    if (m == 0) return 0.0
    var mism = 0
    var k = 0
    var j = 0
    while (j < l2) {
      if (used(j)) {
        if (s2.charAt(j) != m1(k)) mism += 1
        k += 1
      }
      j += 1
    }
    val t = mism / 2
    (m.toDouble / l1 + m.toDouble / l2 + (m - t).toDouble / m) / 3.0
  }

  /** Jaro–Winkler similarity (boost threshold 0.7, prefix cap 4). */
  def jaroWinkler(s1: String, s2: String): Double = {
    val j = jaro(s1, s2)
    if (j <= 0.7) return j
    val cap = math.min(4, math.min(s1.length, s2.length))
    var p = 0
    while (p < cap && s1.charAt(p) == s2.charAt(p)) p += 1
    j + p * 0.1 * (1.0 - j)
  }

  case class JaroWinklerExpr(left: Expression, right: Expression)
      extends BinaryExpression {
    override def prettyName: String = "graft_jaro_winkler"
    override def dataType: DataType = DoubleType
    override def checkInputDataTypes(): TypeCheckResult =
      if (left.dataType == StringType && right.dataType == StringType)
        TypeCheckResult.TypeCheckSuccess
      else TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires two string inputs, got " +
          s"${left.dataType.catalogString}, ${right.dataType.catalogString}")
    override def nullSafeEval(a: Any, b: Any): Any =
      jaroWinkler(a.asInstanceOf[UTF8String].toString,
        b.asInstanceOf[UTF8String].toString)
    override protected def doGenCode(ctx: CodegenContext,
                                     ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, (a, b) =>
        s"graft.functions.StringSim.jaroWinkler($a.toString(), $b.toString())")
    override protected def withNewChildrenInternal(
        l: Expression, r: Expression): Expression = copy(left = l, right = r)
  }

  /** Column entry point. */
  def jaroWinklerCol(a: Column, b: Column): Column =
    GraftColumnBridge.column(JaroWinklerExpr(
      GraftColumnBridge.expression(a), GraftColumnBridge.expression(b)))
}
