package graft.tools

import org.apache.spark.sql.SparkSession

/** Throwaway repro for the sf1 q_surrogate_scalable dump row-loss. */
object SurrRepro {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/tmp/graft_sf1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.ansi.enabled", "false")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val df = graft.SparkEntry.queries("q_surrogate_scalable")(spark, sfDir)
    val out = java.nio.file.Files.createTempDirectory("surr_repro").toString
    df.coalesce(1).write.mode("overwrite").parquet(s"$out/dump")
    val n = spark.read.parquet(s"$out/dump").count()
    val direct = df.count()
    println(s"[repro] dump_rows=$n direct_count=$direct")
    spark.stop()
  }
}
