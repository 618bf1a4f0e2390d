package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev-only A/B microbench: native Md5Slice60 vs the composed
  * conv(substring(md5)) builtins, interleaved in one JVM so JIT/host noise
  * hits both (VERDICT r9 #1 done criterion — the native path must pay for
  * itself or be reverted).
  */
object HashProf {
  def main(args: Array[String]): Unit = {
    val rows = if (args.length > 0) args(0).toLong else 20000000L
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.ansi.enabled", "false")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import graft.operators.Dedup
    // the sampler/LSH key shape: short concat_ws string per row
    val df = spark.range(0, rows)
      .select(concat_ws("#", col("id"), col("id") * 31 % 997).as("s"))
    def time(name: String, c: org.apache.spark.sql.Column): Double = {
      val t0 = System.nanoTime()
      df.select((c % 1000003L).as("h")).agg(sum(col("h"))).collect()
      val sec = (System.nanoTime() - t0) / 1e9
      println(f"[hashprof] $name%-28s $sec%6.2fs  (${rows / sec / 1e6}%5.1f M rows/s)")
      sec
    }
    // warm both codepaths once
    time("warm:native", Dedup.hash60(col("s")))
    time("warm:composed", Dedup.hash60Ref(col("s")))
    val pairs = (1 to 5).map { i =>
      val n = time(s"native#$i", Dedup.hash60(col("s")))
      val c = time(s"composed#$i", Dedup.hash60Ref(col("s")))
      val nb = time(s"native_both#$i",
        Dedup.hash60(col("s")) + Dedup.hash60b(col("s")))
      val cb = time(s"composed_both#$i",
        Dedup.hash60Ref(col("s")) + Dedup.hash60bRef(col("s")))
      (n, c, nb, cb)
    }
    def med(xs: Seq[Double]) = xs.sorted.apply(xs.size / 2)
    println(f"[hashprof] MEDIAN single: native ${med(pairs.map(_._1))}%.2fs composed ${med(pairs.map(_._2))}%.2fs")
    println(f"[hashprof] MEDIAN both-slices: native ${med(pairs.map(_._3))}%.2fs composed ${med(pairs.map(_._4))}%.2fs")
    spark.stop()
  }
}
