package graft.functions

import org.apache.spark.sql.{Column, GraftColumnBridge}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native codegen expressions for the Python-`str.title()` family (F1–F3,
  * SURVEY §2.8's named polish): the per-row work is the SAME [[PyText]]
  * static call the Scala UDFs made, but emitted as a direct invocation
  * inside WholeStageCodegen — no ScalaUDF converter indirection, no
  * per-row closure dispatch — so every q_dim_* build stays one fused
  * codegen stage end-to-end. Null semantics stay at the Column layer
  * ([[GraftFunctions.cleanText]] et al. wrap the null → sentinel branches
  * with `when`), keeping these expressions null-propagating and eligible
  * for `defineCodeGen`'s null-safe fast path.
  */
object PyTextExpressions {

  abstract class PyTextUnary extends UnaryExpression {
    override def dataType: DataType = StringType
    override def checkInputDataTypes(): TypeCheckResult =
      if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
      else TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires a string input, got ${child.dataType.catalogString}")
    /** The PyText static call, as generated-Java source over a String. */
    protected def javaCall(s: String): String
    /** The same call, for interpreted eval. */
    protected def scalaCall(s: String): String
    override def nullSafeEval(input: Any): Any =
      UTF8String.fromString(scalaCall(input.asInstanceOf[UTF8String].toString))
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, c =>
        s"UTF8String.fromString(${javaCall(s"$c.toString()")})")
  }

  /** Python `str.title()` (F1's core; reference etl_completo.py:948). */
  case class PyTitle(child: Expression) extends PyTextUnary {
    override def prettyName: String = "graft_py_title"
    override protected def javaCall(s: String): String =
      s"graft.functions.PyText.title($s)"
    override protected def scalaCall(s: String): String = PyText.title(s)
    override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
  }

  /** F1 `clean_text` body for NON-NULL input (strip, collapse, title;
    * "" → "N/A" is inside [[PyText.cleanText]]). */
  case class PyCleanText(child: Expression) extends PyTextUnary {
    override def prettyName: String = "graft_py_clean_text"
    override protected def javaCall(s: String): String =
      s"graft.functions.PyText.cleanText($s)"
    override protected def scalaCall(s: String): String = PyText.cleanText(s)
    override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
  }

  /** F2 `standardize_name` for non-null input. */
  case class PyStandardizeName(child: Expression) extends PyTextUnary {
    override def prettyName: String = "graft_py_standardize_name"
    override protected def javaCall(s: String): String =
      s"graft.functions.PyText.standardizeName($s)"
    override protected def scalaCall(s: String): String = PyText.standardizeName(s)
    override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
  }

  /** F3 `standardize_region` for non-null input. */
  case class PyStandardizeRegion(child: Expression) extends PyTextUnary {
    override def prettyName: String = "graft_py_standardize_region"
    override protected def javaCall(s: String): String =
      s"graft.functions.PyText.standardizeRegion($s)"
    override protected def scalaCall(s: String): String = PyText.standardizeRegion(s)
    override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
  }

  // ---- Column-level entry points ------------------------------------------

  def pyTitle(c: Column): Column =
    GraftColumnBridge.column(PyTitle(GraftColumnBridge.expression(c)))
  def pyCleanText(c: Column): Column =
    GraftColumnBridge.column(PyCleanText(GraftColumnBridge.expression(c)))
  def pyStandardizeName(c: Column): Column =
    GraftColumnBridge.column(PyStandardizeName(GraftColumnBridge.expression(c)))
  def pyStandardizeRegion(c: Column): Column =
    GraftColumnBridge.column(PyStandardizeRegion(GraftColumnBridge.expression(c)))
}
