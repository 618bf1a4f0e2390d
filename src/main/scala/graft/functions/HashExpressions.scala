package graft.functions

import org.apache.spark.sql.{Column, GraftColumnBridge}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Runtime support for Md5Slice60's generated code — a TOP-LEVEL object so
  * scalac emits a `Md5Bits` mirror class with static forwarders that Janino
  * can resolve as plain static calls (`graft.functions.Md5Bits.hi60(...)`).
  * As a nested object its only binary name was
  * `graft.functions.HashExpressions$Md5Bits$`, and the r9 code emitted the
  * *source* path `HashExpressions.Md5Bits$.MODULE$`, which Janino rejected —
  * every projection containing graft_hash60/graft_hash60b silently fell back
  * to interpreted eval (221 fallback warnings per full test run).
  *
  * Both slices of one input share ONE digest via a thread-local
  * single-entry cache: the minhash signature path evaluates hi60 and
  * lo60 on the SAME key per row, and the composed reference forms got
  * that sharing from Spark's common-subexpression elimination over the
  * inner md5(c) — two distinct native expressions don't CSE, so without
  * the cache the digest ran twice per row (measured 2× on the LSH
  * artifact build). The content compare is a ≤key-length memcmp,
  * several times cheaper than an md5 block pass.
  */
object Md5Bits {
  private final class State {
    val md: java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
    var lastInput: Array[Byte] = null
    var lastDigest: Array[Byte] = null
  }
  private val tl: ThreadLocal[State] = ThreadLocal.withInitial(() => new State)
  private def digest(bytes: Array[Byte]): Array[Byte] = {
    val s = tl.get()
    if (s.lastInput == null || !java.util.Arrays.equals(s.lastInput, bytes)) {
      s.md.reset()
      s.lastDigest = s.md.digest(bytes)
      s.lastInput = bytes.clone()
    }
    s.lastDigest
  }
  /** Hex chars 1..15 of md5 as an unsigned 60-bit value. */
  def hi60(bytes: Array[Byte]): Long = {
    val d = digest(bytes)
    var v = 0L
    var i = 0
    while (i < 7) { v = (v << 8) | (d(i) & 0xFFL); i += 1 }
    (v << 4) | ((d(7) & 0xF0L) >>> 4)
  }
  /** Hex chars 16..30 of md5 as an unsigned 60-bit value. */
  def lo60(bytes: Array[Byte]): Long = {
    val d = digest(bytes)
    var v = d(7) & 0x0FL
    var i = 8
    while (i < 15) { v = (v << 8) | (d(i) & 0xFFL); i += 1 }
    v
  }
}

/** Native codegen form of the engine's portable 60-bit md5 hash slices
  * (Dedup.hash60 / hash60b — the deterministic sampler, LSH-band and
  * negative-draw hash used across ~30 gated queries).
  *
  * The composed reference form `conv(substring(md5(c), 1, 15), 16, 10)`
  * allocates a 32-char hex UTF8String, a substring copy, and runs conv's
  * base-16 parse loop PER ROW. This expression reads the same 60 bits
  * straight from the digest bytes: hex chars 1–15 are bytes 0–6 plus the
  * high nibble of byte 7 (md5 hex is big-endian per byte), chars 16–30
  * are the low nibble of byte 7 plus bytes 8–14. Values are < 2^60, so
  * both slices are non-negative longs — BIT-IDENTICAL to the composed
  * form (HashExpressionsSpec pins the equality property; the DuckDB
  * oracle keeps its md5-substring SQL mirror unchanged).
  *
  * The MessageDigest instance is thread-local: `getInstance` per row is
  * the hidden cost of most md5-per-row pipelines.
  */
object HashExpressions {

  case class Md5Slice60(child: Expression, hi: Boolean) extends UnaryExpression {
    override def prettyName: String = if (hi) "graft_hash60" else "graft_hash60b"
    override def dataType: DataType = LongType
    override def checkInputDataTypes(): TypeCheckResult =
      if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
      else TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires a string input, got ${child.dataType.catalogString}")
    private def call(bytes: Array[Byte]): Long =
      if (hi) Md5Bits.hi60(bytes) else Md5Bits.lo60(bytes)
    override def nullSafeEval(input: Any): Any =
      call(input.asInstanceOf[UTF8String].getBytes)
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val fn = if (hi) "hi60" else "lo60"
      defineCodeGen(ctx, ev, c =>
        s"graft.functions.Md5Bits.$fn($c.getBytes())")
    }
    override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
  }

  // ---- Column-level entry points ------------------------------------------

  def hash60Native(c: Column): Column =
    GraftColumnBridge.column(Md5Slice60(GraftColumnBridge.expression(c), hi = true))
  def hash60bNative(c: Column): Column =
    GraftColumnBridge.column(Md5Slice60(GraftColumnBridge.expression(c), hi = false))
}
