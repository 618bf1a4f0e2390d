package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Throwaway: dump HLL per-bucket registers + S for one day at a dir. */
object HllDebug {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/tmp/graft_sf1")
    val day = if (args.length > 1) args(1) else "2024-01-23"
    val spark = SparkSession.builder().master("local[16]")
      .config("spark.sql.shuffle.partitions", "16")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.ansi.enabled", "false")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val raw = spark.read.parquet(s"$sfDir/events.parquet")
    val events = graft.operators.Events.coerceEventTs(raw, raw.schema("ts").dataType)
    val uniq = events.filter(col("user_id").isNotNull)
      .select(date_trunc("day", col("ts")).as("d"),
        col("user_id").cast("string").as("it")).distinct()
      .filter(col("d") === to_timestamp(lit(day)))
    val rows = graft.operators.Sketches.withBucketRho(
      uniq.withColumn("h", graft.operators.Dedup.hash60(col("it"))))
    val regs = rows.groupBy(col("bucket")).agg(max(col("rho")).as("m")).orderBy(col("bucket"))
    val s = regs.agg(sum(expr("shiftleft(CAST(1 AS BIGINT), 55 - m)")).as("sp"),
      count(lit(1)).as("npres")).collect()(0)
    println(s"[hll] npres=${s.getLong(1)} sp=${s.getLong(0)} S=${s.getLong(0) + (64 - s.getLong(1)) * (1L << 55)}")
    regs.collect().foreach(r => println(s"[reg] ${r.getLong(0)} ${r.getInt(1)}"))
    val full = graft.operators.Sketches.hllMergedDaily(events, col("ts"),
      col("user_id").cast("string"))
      .filter(col("day") === to_timestamp(lit(day)))
      .select(col("hll_est"))
    full.collect().foreach(r => println(f"[est] ${r.getDouble(0)}%.12f bits=${java.lang.Double.doubleToLongBits(r.getDouble(0))}"))
    spark.stop()
  }
}
