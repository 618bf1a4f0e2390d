package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._

/** Bucketed co-located join — the 100 TB strategy for the one big⋈big join
  * in the warehouse (J1, vendas ⋈ item_vendas on id_venda): write both
  * sides `bucketBy` the join key once, and every subsequent join on that
  * key runs with NO shuffle exchange on either side.
  */
class BucketingSpec extends SparkSpec {

  test("bucketed tables join without a shuffle exchange on either side") {
    val wh = Files.createTempDirectory("graft_buckets").toString
    spark.sql(s"CREATE DATABASE IF NOT EXISTS graft_buckets LOCATION '$wh'")
    spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
      .write.bucketBy(8, "o_orderkey").sortBy("o_orderkey")
      .mode("overwrite").saveAsTable("graft_buckets.orders_b")
    spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
      .write.bucketBy(8, "l_orderkey").sortBy("l_orderkey")
      .mode("overwrite").saveAsTable("graft_buckets.lineitem_b")

    // force the sort-merge path: broadcast would hide the property under test
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val j = spark.table("graft_buckets.orders_b")
        .join(spark.table("graft_buckets.lineitem_b"),
          col("o_orderkey") === col("l_orderkey"))
        .groupBy(col("o_orderpriority")).agg(count(lit(1)).as("n"))
      val p = j.queryExecution.executedPlan.toString
      assert(p.contains("SortMergeJoin"), p.take(1500))
      assert(p.contains("SelectedBucketsCount"), "scan is not bucket-aware")
      // the JOIN consumes bucketed output directly: the only shuffle in the
      // whole plan is the one feeding the final aggregation — an unbucketed
      // plan would carry two more (one per join input)
      val nShuffles = "Exchange hashpartitioning".r.findAllIn(p).length
      assert(nShuffles <= 1,
        s"join inputs were re-shuffled despite bucketing ($nShuffles exchanges):\n" + p.take(2000))
      val expected = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet").count()
      assert(j.collect().map(_.getLong(1)).sum === expected)
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }
}
