package graft.functions

import java.nio.ByteBuffer
import org.apache.spark.sql.{Column, GraftColumnBridge}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.BinaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** Bounded top-k aggregation state: the k strongest (score, id) pairs,
  * where strength is (score desc, id asc) — fully deterministic ties.
  * O(k) memory regardless of group size; O(k) linear weakest-scan per
  * insert (k is small — 10s to 100s — so a heap buys nothing).
  */
final class TopKBuffer(val k: Int) {
  val scores = new Array[Double](k)
  val ids = new Array[Long](k)
  var n = 0

  /** NaN is the STRONGEST score — matching Spark's window sort and DuckDB's
    * ORDER BY DESC, which both place NaN above every double, so the
    * aggregate form stays row-identical to the window form even on NaN
    * inputs. Handled explicitly (IEEE `>` is false for ANY NaN comparison,
    * which would otherwise freeze the weakest-slot scan); ties break on the
    * smaller id. */
  @inline private def stronger(s1: Double, id1: Long, s2: Double, id2: Long): Boolean = {
    val n1 = java.lang.Double.isNaN(s1)
    val n2 = java.lang.Double.isNaN(s2)
    if (n1 != n2) n1 // the NaN side sorts first, like the window's desc
    else if (!n1 && s1 != s2) s1 > s2
    else id1 < id2
  }

  def insert(s: Double, id: Long): Unit = {
    if (n < k) { scores(n) = s; ids(n) = id; n += 1 }
    else {
      var w = 0
      var i = 1
      while (i < n) {
        if (stronger(scores(w), ids(w), scores(i), ids(i))) w = i
        i += 1
      }
      if (stronger(s, id, scores(w), ids(w))) { scores(w) = s; ids(w) = id }
    }
  }

  def mergeFrom(other: TopKBuffer): Unit = {
    var i = 0
    while (i < other.n) { insert(other.scores(i), other.ids(i)); i += 1 }
  }

  /** Elements strongest-first. */
  def sorted: Array[(Double, Long)] =
    (0 until n).map(i => (scores(i), ids(i))).toArray
      .sortWith((a, b) => stronger(a._1, a._2, b._1, b._2))
}

/** Per-group bounded top-k as a TypedImperativeAggregate — the scale path
  * for "best k per group" when a group can be arbitrarily large (the
  * power-law mega-domain): a window row_number sorts the WHOLE group in
  * one task; this aggregate carries O(k) state per partition and merges
  * map-side like any other partial aggregate, so the mega-domain costs the
  * same as every other key. Returns array<struct<score, id>> strongest
  * first (score desc, id asc).
  */
case class TopKByScore(left: Expression, right: Expression, k: Int,
                       mutableAggBufferOffset: Int = 0,
                       inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[TopKBuffer]
  with BinaryLike[Expression] {

  require(k > 0, "k must be positive")

  // (AbstractDataType is private[sql], so no ExpectsInputTypes here)
  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == DoubleType && right.dataType == LongType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"topk_by_score expects (DOUBLE score, BIGINT id), got " +
        s"(${left.dataType.simpleString}, ${right.dataType.simpleString})")
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("score", DoubleType, nullable = false),
    StructField("id", LongType, nullable = false))), containsNull = false)

  override def createAggregationBuffer(): TopKBuffer = new TopKBuffer(k)

  override def update(buffer: TopKBuffer, input: InternalRow): TopKBuffer = {
    val s = left.eval(input)
    val i = right.eval(input)
    if (s != null && i != null)
      buffer.insert(s.asInstanceOf[Double], i.asInstanceOf[Long])
    buffer
  }

  override def merge(buffer: TopKBuffer, other: TopKBuffer): TopKBuffer = {
    buffer.mergeFrom(other)
    buffer
  }

  override def eval(buffer: TopKBuffer): Any =
    new GenericArrayData(buffer.sorted.map { case (s, id) =>
      InternalRow(s, id)
    }.asInstanceOf[Array[Any]])

  override def serialize(buffer: TopKBuffer): Array[Byte] = {
    val bb = ByteBuffer.allocate(8 + buffer.n * 16)
    bb.putInt(buffer.k).putInt(buffer.n)
    var i = 0
    while (i < buffer.n) {
      bb.putDouble(buffer.scores(i)).putLong(buffer.ids(i))
      i += 1
    }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): TopKBuffer = {
    val bb = ByteBuffer.wrap(bytes)
    val buf = new TopKBuffer(bb.getInt())
    val n = bb.getInt()
    var i = 0
    while (i < n) { buf.insert(bb.getDouble(), bb.getLong()); i += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(o: Int): TopKByScore =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): TopKByScore =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(l: Expression, r: Expression): TopKByScore =
    copy(left = l, right = r)
  override def prettyName: String = "topk_by_score"
}

object TopKAggregate {
  /** `array<struct<score, id>>` of the group's k strongest rows. */
  def topKByScore(score: Column, id: Column, k: Int): Column =
    GraftColumnBridge.column(
      TopKByScore(GraftColumnBridge.expression(score),
        GraftColumnBridge.expression(id), k).toAggregateExpression())
}
