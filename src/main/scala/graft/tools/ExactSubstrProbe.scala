package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Third-decade probe for the ExactSubstr family: runs spans + clean over
  * a (scaled) documents table with [[graft.operators.IterState]] reliable
  * rotated checkpoints — at sf100 the accumulated local-checkpoint blocks
  * of an 800M-position state exceed this host's free disk; rotated
  * delta-packed parquet rounds fit. Prints one line per phase with wall
  * seconds and a content checksum (sum of dup_tokens / n_removed), and
  * cleans its checkpoint scratch.
  *
  * Usage: ExactSubstrProbe <sfDir> <ckDir>
  */
object ExactSubstrProbe {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val ck = args(1)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_SHUFFLE_PARTITIONS", cpus))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.ansi.enabled", "false")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    def timed(label: String)(body: => (Long, Long)): Unit = {
      val t0 = System.nanoTime
      val (rows, checksum) = body
      println(f"[esprobe] $label wall=${(System.nanoTime - t0) / 1e9}%.1fs " +
        s"rows=$rows checksum=$checksum")
    }
    timed("spans") {
      val out = graft.operators.Dedup.exactSubstrSpans(
        docs, "doc_id", "text", checkpointDir = Some(ck))
        .agg(count(lit(1)), sum(col("dup_tokens"))).collect()(0)
      (out.getLong(0), out.getLong(1))
    }
    timed("clean") {
      val out = graft.operators.Dedup.exactSubstrClean(
        docs, "doc_id", "text", checkpointDir = Some(ck))
        .agg(count(lit(1)), sum(col("n_removed"))).collect()(0)
      (out.getLong(0), out.getLong(1))
    }
    val p = new org.apache.hadoop.fs.Path(ck)
    p.getFileSystem(spark.sparkContext.hadoopConfiguration).delete(p, true)
    spark.stop()
  }
}
