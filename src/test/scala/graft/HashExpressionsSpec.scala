package graft

import org.apache.spark.sql.functions._
import graft.operators.Dedup

/** The native md5-slice expressions must be BIT-IDENTICAL to the composed
  * conv(substring(md5)) reference forms — the DuckDB oracle mirrors were
  * validated against those (same discipline as dotFP / Similarity.dot).
  */
class HashExpressionsSpec extends SparkSpec {
  import spark.implicits._

  private val samples = Seq(
    "", "a", "abc", "hello world", "The quick brown fox",
    "héllo wörld ünïcode", "日本語テキスト", "emoji 🎉 mix",
    "1#2#0", "123456789#987654321#1",
    "x" * 500, // long input
    "line\nbreak\ttab", "trailing space ", " leading")

  test("native hash60/hash60b equal the composed md5 reference forms exactly") {
    val df = samples.zipWithIndex.map { case (s, i) => (i.toLong, s) }.toDF("id", "s")
    val r = df.select(
      Dedup.hash60($"s").as("h"), Dedup.hash60Ref($"s").as("hr"),
      Dedup.hash60b($"s").as("b"), Dedup.hash60bRef($"s").as("br")).collect()
    r.foreach { row =>
      assert(row.getLong(0) === row.getLong(1))
      assert(row.getLong(2) === row.getLong(3))
    }
  }

  test("native hash60 parity holds over generated keys (the sampler-shaped input)") {
    // the draw-key shape every sampler builds: concat_ws over ids
    val df = spark.range(0, 5000)
      .select(concat_ws("#", col("id"), col("id") * 7 % 1000, col("id") % 3).as("s"))
    val bad = df.select(
        Dedup.hash60($"s").as("h"), Dedup.hash60Ref($"s").as("hr"),
        Dedup.hash60b($"s").as("b"), Dedup.hash60bRef($"s").as("br"))
      .filter($"h" =!= $"hr" || $"b" =!= $"br").count()
    assert(bad === 0L)
    // and the values are in the documented [0, 2^60) / [0, 1e9+7) ranges
    val ranges = df.select(Dedup.hash60($"s").as("h"), Dedup.hash60b($"s").as("b"))
      .agg(min($"h"), max($"h"), min($"b"), max($"b")).collect()(0)
    assert(ranges.getLong(0) >= 0L && ranges.getLong(1) < (1L << 60))
    assert(ranges.getLong(2) >= 0L && ranges.getLong(3) < 1000000007L)
  }

  test("null propagates and the expression is codegen-eligible (no ScalaUDF in plan)") {
    val df = Seq(Some("x"), None).toDF("s")
    val r = df.select(Dedup.hash60($"s")).collect()
    assert(!r(0).isNullAt(0) && r(1).isNullAt(0))
    val plan = df.select(Dedup.hash60($"s"))
      .queryExecution.executedPlan.toString
    assert(plan.contains("graft_hash60"))
    assert(!plan.contains("ScalaUDF"))
  }
}
