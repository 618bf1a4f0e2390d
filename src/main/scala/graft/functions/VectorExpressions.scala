package graft.functions

import org.apache.spark.sql.{Column, GraftColumnBridge}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Native Catalyst expressions for the §7.5 vector/dedup hot paths.
  *
  * Rationale (SURVEY §2.8, "custom Expression beats UDF"): the expression-tree
  * forms (`aggregate(zip_with(...))`, `array_intersect`+`array_union`)
  * allocate intermediate arrays per ROW PAIR inside quadratic joins — the
  * dominant cost in q_cosine_neardup/q_dedup_jaccard. These expressions do
  * the same arithmetic in a tight primitive loop with `doGenCode`, keeping
  * the whole pair pipeline inside WholeStageCodegen with zero allocation.
  *
  * Numeric contract: [[DotProductFP]] is the SAME sequential left-to-right
  * double fold as `aggregate(zip_with(a, b, (x,y) => x.cast(double) *
  * y.cast(double)), 0.0, _+_)` — bit-identical results, so the DuckDB oracle
  * mirrors (`list_sum(list_transform(...))`) keep matching.
  */
object VectorExpressions {

  private def elemType(e: Expression): DataType =
    e.dataType.asInstanceOf[ArrayType].elementType

  private def checkNumericArrays(left: Expression, right: Expression): TypeCheckResult = {
    def ok(dt: DataType): Boolean = dt match {
      case ArrayType(FloatType | DoubleType, _) => true
      case _ => false
    }
    if (ok(left.dataType) && ok(right.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"requires array<float|double> inputs, got ${left.dataType} / ${right.dataType}")
  }

  /** Sequential-fold double dot product of two float/double arrays.
    * Null result on length mismatch or any null element (mirroring the
    * zip_with+aggregate null semantics).
    */
  case class DotProductFP(left: Expression, right: Expression) extends BinaryExpression {
    override def dataType: DataType = DoubleType
    override def nullable: Boolean = true
    override def checkInputDataTypes(): TypeCheckResult = checkNumericArrays(left, right)
    override def prettyName: String = "graft_dot"

    override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
      copy(left = l, right = r)

    private def get(arr: ArrayData, i: Int, dt: DataType): Double = dt match {
      case FloatType => arr.getFloat(i).toDouble
      case _ => arr.getDouble(i)
    }

    override def nullSafeEval(l: Any, r: Any): Any = {
      val a = l.asInstanceOf[ArrayData]
      val b = r.asInstanceOf[ArrayData]
      val n = a.numElements()
      if (b.numElements() != n) return null
      val (lt, rt) = (elemType(left), elemType(right))
      var s = 0.0
      var i = 0
      while (i < n) {
        if (a.isNullAt(i) || b.isNullAt(i)) return null
        s += get(a, i, lt) * get(b, i, rt)
        i += 1
      }
      s
    }

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      def getter(arr: String, i: String, dt: DataType): String = dt match {
        case FloatType => s"(double) $arr.getFloat($i)"
        case _ => s"$arr.getDouble($i)"
      }
      val (lt, rt) = (elemType(left), elemType(right))
      nullSafeCodeGen(ctx, ev, (a, b) => {
        val n = ctx.freshName("n")
        val i = ctx.freshName("i")
        val s = ctx.freshName("s")
        s"""
           |int $n = $a.numElements();
           |if ($b.numElements() != $n) {
           |  ${ev.isNull} = true;
           |} else {
           |  double $s = 0.0;
           |  for (int $i = 0; $i < $n; $i++) {
           |    if ($a.isNullAt($i) || $b.isNullAt($i)) { ${ev.isNull} = true; break; }
           |    $s += (${getter(a, i, lt)}) * (${getter(b, i, rt)});
           |  }
           |  ${ev.value} = $s;
           |}
         """.stripMargin
      })
    }
  }

  /** Jaccard similarity of two SORTED, DISTINCT arrays (string, int, or
    * long elements — both sides the same type) via a single merge pass:
    * |A∩B| / (|A|+|B|-|A∩B|). Null if both arrays are empty or any element
    * is null. Equals
    * `size(array_intersect(a,b)) / size(array_union(a,b))` on sorted-distinct
    * inputs, without building either intermediate array. The int/long forms
    * exist for dictionary-encoded token sets ([[graft.operators.Dedup
    * .jaccardPairs]]): an int compare in the merge loop instead of a UTF8
    * byte-wise compare.
    */
  case class SortedJaccard(left: Expression, right: Expression) extends BinaryExpression {
    override def dataType: DataType = DoubleType
    override def nullable: Boolean = true
    override def checkInputDataTypes(): TypeCheckResult = {
      def elem(dt: DataType): Option[DataType] = dt match {
        case ArrayType(e @ (StringType | IntegerType | LongType), _) => Some(e)
        case _ => None
      }
      (elem(left.dataType), elem(right.dataType)) match {
        case (Some(a), Some(b)) if a == b => TypeCheckResult.TypeCheckSuccess
        case _ => TypeCheckResult.TypeCheckFailure(
          "requires two array<string>, array<int> or array<bigint> inputs of " +
            s"the same element type, got ${left.dataType} / ${right.dataType}")
      }
    }
    override def prettyName: String = "graft_sorted_jaccard"

    private def elemType: DataType =
      left.dataType.asInstanceOf[ArrayType].elementType

    override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
      copy(left = l, right = r)

    override def nullSafeEval(l: Any, r: Any): Any = {
      val a = l.asInstanceOf[ArrayData]
      val b = r.asInstanceOf[ArrayData]
      val na = a.numElements()
      val nb = b.numElements()
      if (na + nb == 0) return null
      val et = elemType
      var i = 0
      var j = 0
      var inter = 0
      while (i < na && j < nb) {
        if (a.isNullAt(i) || b.isNullAt(j)) return null
        val c = et match {
          case StringType => a.getUTF8String(i).compareTo(b.getUTF8String(j))
          case IntegerType => java.lang.Integer.compare(a.getInt(i), b.getInt(j))
          case LongType => java.lang.Long.compare(a.getLong(i), b.getLong(j))
        }
        if (c == 0) { inter += 1; i += 1; j += 1 }
        else if (c < 0) i += 1
        else j += 1
      }
      inter.toDouble / (na + nb - inter)
    }

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, (a, b) => {
        val na = ctx.freshName("na")
        val nb = ctx.freshName("nb")
        val i = ctx.freshName("i")
        val j = ctx.freshName("j")
        val inter = ctx.freshName("inter")
        val c = ctx.freshName("c")
        val cmp = elemType match {
          case StringType => s"$a.getUTF8String($i).compareTo($b.getUTF8String($j))"
          case IntegerType => s"java.lang.Integer.compare($a.getInt($i), $b.getInt($j))"
          case LongType => s"java.lang.Long.compare($a.getLong($i), $b.getLong($j))"
        }
        s"""
           |int $na = $a.numElements();
           |int $nb = $b.numElements();
           |if ($na + $nb == 0) {
           |  ${ev.isNull} = true;
           |} else {
           |  int $i = 0, $j = 0, $inter = 0;
           |  while ($i < $na && $j < $nb) {
           |    if ($a.isNullAt($i) || $b.isNullAt($j)) { ${ev.isNull} = true; break; }
           |    int $c = $cmp;
           |    if ($c == 0) { $inter++; $i++; $j++; }
           |    else if ($c < 0) { $i++; } else { $j++; }
           |  }
           |  if (!${ev.isNull}) {
           |    ${ev.value} = ((double) $inter) / ($na + $nb - $inter);
           |  }
           |}
         """.stripMargin
      })
  }

  /** Sorted distinct word n-shingles of a text, in ONE pass: equivalent to
    * `sort_array(array_distinct(transform(sequence(...), i -> concat_ws(" ",
    * w[i], w[i+1], w[i+2]))))` over `w = split(text, " ")`, but as a single
    * flat expression — the higher-order-function chain evaluates its
    * interpreted lambda per shingle (~1 ms/doc measured; the whole minhash
    * bottleneck). Whole text becomes the only shingle when there are fewer
    * than n words. Sorting compares UTF8String bytes — identical to
    * `sort_array` ordering.
    */
  case class ShingleSet(child: Expression, n: Int)
      extends org.apache.spark.sql.catalyst.expressions.UnaryExpression
      with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback {
    override def dataType: DataType = ArrayType(StringType, containsNull = false)
    override def nullable: Boolean = child.nullable
    override def prettyName: String = "graft_shingle_set"
    override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
      case StringType => TypeCheckResult.TypeCheckSuccess
      case dt => TypeCheckResult.TypeCheckFailure(s"requires string input, got $dt")
    }
    override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)

    override def nullSafeEval(input: Any): Any = {
      val text = input.asInstanceOf[org.apache.spark.unsafe.types.UTF8String]
      // String.split(" ", -1) == Spark split(text, " "): regex split keeping
      // trailing empties. ASCII space never splits inside a UTF-8 char.
      val words = text.toString.split(" ", -1)
      val set = new java.util.TreeSet[org.apache.spark.unsafe.types.UTF8String]()
      if (words.length < n) {
        set.add(text)
      } else {
        val sb = new java.lang.StringBuilder(64)
        var i = 0
        while (i <= words.length - n) {
          sb.setLength(0)
          var j = 0
          while (j < n) {
            if (j > 0) sb.append(' ')
            sb.append(words(i + j))
            j += 1
          }
          set.add(org.apache.spark.unsafe.types.UTF8String.fromString(sb.toString))
          i += 1
        }
      }
      val out = new Array[AnyRef](set.size)
      val it = set.iterator()
      var i = 0
      while (it.hasNext) { out(i) = it.next(); i += 1 }
      new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
    }
  }

  // ---- Column-level entry points ------------------------------------------

  /** Sorted distinct word n-shingle set (native single pass). */
  def shingleSet(text: Column, n: Int): Column =
    GraftColumnBridge.column(ShingleSet(GraftColumnBridge.expression(text), n))

  /** `Σ aᵢ·bᵢ` in sequential double precision (native, codegen'd). */
  def dotFP(a: Column, b: Column): Column =
    GraftColumnBridge.column(DotProductFP(
      GraftColumnBridge.expression(a), GraftColumnBridge.expression(b)))

  /** Jaccard of two sorted-distinct string arrays (native, codegen'd). */
  def sortedJaccard(a: Column, b: Column): Column =
    GraftColumnBridge.column(SortedJaccard(
      GraftColumnBridge.expression(a), GraftColumnBridge.expression(b)))

  /** |A∩B| of two SORTED, DISTINCT arrays (string/int/long elements, both
    * sides the same type) in one merge pass: equals
    * `size(array_intersect(a, b))` without materializing the intermediate
    * array (array_intersect builds a hash set + output array per ROW PAIR —
    * pure overhead inside a quadratic verify join). 0 for empty inputs,
    * null if any element is null.
    */
  case class SortedIntersectCount(left: Expression, right: Expression)
      extends BinaryExpression {
    override def dataType: DataType = LongType
    override def nullable: Boolean = true
    override def checkInputDataTypes(): TypeCheckResult = {
      def elem(dt: DataType): Option[DataType] = dt match {
        case ArrayType(e @ (StringType | IntegerType | LongType), _) => Some(e)
        case _ => None
      }
      (elem(left.dataType), elem(right.dataType)) match {
        case (Some(a), Some(b)) if a == b => TypeCheckResult.TypeCheckSuccess
        case _ => TypeCheckResult.TypeCheckFailure(
          "requires two array<string>, array<int> or array<bigint> inputs of " +
            s"the same element type, got ${left.dataType} / ${right.dataType}")
      }
    }
    override def prettyName: String = "graft_sorted_intersect_count"

    private def elemT: DataType = left.dataType.asInstanceOf[ArrayType].elementType

    override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
      copy(left = l, right = r)

    override def nullSafeEval(l: Any, r: Any): Any = {
      val a = l.asInstanceOf[ArrayData]
      val b = r.asInstanceOf[ArrayData]
      val na = a.numElements()
      val nb = b.numElements()
      val et = elemT
      var i = 0
      var j = 0
      var inter = 0L
      while (i < na && j < nb) {
        if (a.isNullAt(i) || b.isNullAt(j)) return null
        val c = et match {
          case StringType => a.getUTF8String(i).compareTo(b.getUTF8String(j))
          case IntegerType => java.lang.Integer.compare(a.getInt(i), b.getInt(j))
          case LongType => java.lang.Long.compare(a.getLong(i), b.getLong(j))
        }
        if (c == 0) { inter += 1; i += 1; j += 1 }
        else if (c < 0) i += 1
        else j += 1
      }
      inter
    }

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, (a, b) => {
        val na = ctx.freshName("na")
        val nb = ctx.freshName("nb")
        val i = ctx.freshName("i")
        val j = ctx.freshName("j")
        val inter = ctx.freshName("inter")
        val c = ctx.freshName("c")
        val cmp = elemT match {
          case StringType => s"$a.getUTF8String($i).compareTo($b.getUTF8String($j))"
          case IntegerType => s"java.lang.Integer.compare($a.getInt($i), $b.getInt($j))"
          case LongType => s"java.lang.Long.compare($a.getLong($i), $b.getLong($j))"
        }
        s"""
           |int $na = $a.numElements();
           |int $nb = $b.numElements();
           |long $inter = 0L;
           |int $i = 0, $j = 0;
           |while ($i < $na && $j < $nb) {
           |  if ($a.isNullAt($i) || $b.isNullAt($j)) { ${ev.isNull} = true; break; }
           |  int $c = $cmp;
           |  if ($c == 0) { $inter++; $i++; $j++; }
           |  else if ($c < 0) { $i++; } else { $j++; }
           |}
           |if (!${ev.isNull}) {
           |  ${ev.value} = $inter;
           |}
         """.stripMargin
      })
  }

  def sortedIntersectCount(a: Column, b: Column): Column =
    GraftColumnBridge.column(SortedIntersectCount(
      GraftColumnBridge.expression(a), GraftColumnBridge.expression(b)))

  /** Rabin–Karp rolling fingerprint (min of all k-char window polynomial
    * hashes — [[graft.operators.TextAnalysis.rollingFingerprint]]) as a
    * native codegen expression (r7, formerly a Scala UDF): the per-row
    * work is the same sequential fold, emitted as a direct static call
    * inside WholeStageCodegen. Null-propagating; the `null → 0` sentinel
    * stays at the Column layer (TextAnalysis.fingerprints), matching the
    * oracle's CASE.
    */
  case class RollingFingerprint(child: Expression, k: Int)
      extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {
    override def dataType: DataType = LongType
    override def prettyName: String = "graft_rolling_fingerprint"
    override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
      case StringType => TypeCheckResult.TypeCheckSuccess
      case dt => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires a string input, got ${dt.catalogString}")
    }
    override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
    override def nullSafeEval(input: Any): Any =
      graft.operators.TextAnalysis.rollingFingerprint(
        input.asInstanceOf[org.apache.spark.unsafe.types.UTF8String].toString, k)
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, c =>
        s"graft.operators.TextAnalysis.rollingFingerprint($c.toString(), $k)")
  }

  def rollingFingerprint(text: Column, k: Int): Column =
    GraftColumnBridge.column(RollingFingerprint(GraftColumnBridge.expression(text), k))
}
