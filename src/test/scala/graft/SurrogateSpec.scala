package graft

import org.apache.spark.sql.functions._
import graft.operators.Surrogate

class SurrogateSpec extends SparkSpec {
  import spark.implicits._

  test("zipWithIndexOrdered equals the global-window row_number (dense 1..N)") {
    val df = spark.range(0, 10000).select(
      (col("id") * 37 % 10007).as("key"), col("id").as("payload"))
      .repartition(8)
    val global = Surrogate.withSurrogateKey(df, "sk", Seq(col("key"), col("payload")))
      .select("key", "payload", "sk").orderBy("sk").collect()
    val scalable = Surrogate.zipWithIndexOrdered(df, "sk", Seq(col("key"), col("payload")))
      .select("key", "payload", "sk").orderBy("sk").collect()
    assert(global.length === scalable.length)
    global.zip(scalable).foreach { case (g, s) => assert(g === s) }
    // dense 1..N
    assert(scalable.map(_.getLong(2)).toSeq === (1L to 10000L))
  }

  test("zipWithIndexOrdered plan has no single-partition global window") {
    val df = spark.range(0, 1000).select(col("id").as("k"))
    val plan = Surrogate.zipWithIndexOrdered(df, "sk", Seq(col("k")))
      .queryExecution.executedPlan.toString
    // the data-bearing window is partitioned by __pid; only the tiny
    // per-partition-count window is unpartitioned
    assert(plan.contains("__pid"))
  }

  test("rankedRunningTotal equals the single-partition global window result") {
    import org.apache.spark.sql.expressions.Window
    val df = spark.range(0, 3000)
      .select((col("id") * 37 % 101).as("k"), (col("id") % 17 + 1).as("v"))
      .repartition(11)
    val got = Surrogate.rankedRunningTotal(df, col("v"), "rnk", "cum", Seq(col("k")))
      .collect().map(r => (r.getLong(0), r.getLong(2), r.getLong(3))).sortBy(_._2)
    val w = Window.orderBy(col("k"))
    val want = df.withColumn("rnk", row_number().over(w).cast("long"))
      .withColumn("cum", sum(col("v")).over(w.rowsBetween(Window.unboundedPreceding, 0)))
      .collect().map(r => (r.getLong(0), r.getLong(2), r.getLong(3))).sortBy(_._2)
    // ties in k make per-row ranks order-dependent; compare the running total
    // at each group boundary (well-defined regardless of tie order)
    def boundaries(a: Array[(Long, Long, Long)]) =
      a.groupBy(_._1).map { case (k, rows) =>
        (k, rows.map(_._2).max, rows.map(_._3).max) }.toSet
    assert(boundaries(got) === boundaries(want))
  }

  test("orderedUniqueKey produces unique keys increasing in sort order") {
    val df = spark.range(0, 5000).select((col("id") * 13 % 5003).as("k"))
    val r = Surrogate.orderedUniqueKey(df, "sk", Seq(col("k")))
      .select("k", "sk").collect()
    assert(r.map(_.getLong(1)).distinct.length === r.length)
    val bySort = r.sortBy(_.getLong(0))
    bySort.sliding(2).foreach {
      case Array(a, b) =>
        if (a.getLong(0) < b.getLong(0)) assert(a.getLong(1) < b.getLong(1))
      case _ =>
    }
  }

  test("firstMatch keeps exactly the lowest tiebreaker per key") {
    val df = Seq((1, 10), (1, 5), (2, 7), (3, 1), (3, 1)).toDF("k", "v")
    val r = Surrogate.firstMatch(df, Seq(col("k")), Seq(col("v")))
      .orderBy("k").collect()
    assert(r.map(x => (x.getInt(0), x.getInt(1))).toSeq === Seq((1, 5), (2, 7), (3, 1)))
  }
}
