package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scale probe for the PERSISTED IVF-PQ index (r12 follow-up to the LSH
  * signature artifact — the same build-once/search-many question for the
  * ANN family): replicate sf0.1 embeddings `copies`× with EXACTLY
  * ScaleGen's decorrelation (shifted vec_id + per-copy left rotation),
  * then time
  *   (a) the one-time `writeIvfPqIndex` build,
  *   (b) a query batch via `ivfPqSearchIndex` (reads ONLY the artifact),
  *   (c) the same batch via `ivfPqTopKTrained` (re-trains + re-assigns —
  *       what every batch pays without the artifact),
  * and assert (b) ≡ (c) rows so the speedup is of the SAME answer. The
  * query set is the q_ann_ivfpq_trained batch (vec_id%50=0, <2000): copy
  * shifts keep all replica ids ≥ 10^8, so the batch is fixed while the
  * corpus scales — exactly how a production query load meets a growing
  * index.
  *
  * With `incr` as the 4th arg it instead measures the nightly ADD
  * (appendToIvfPqIndex) against a fresh index over the replica: the
  * delta is the sf0.1 vectors cloned under new ids (exact twins of the
  * query batch), so every query must surface its appended twin —
  * functional proof the added vectors serve — and the append wall is the
  * nightly cost vs the full rebuild.
  *
  * Usage: runMain graft.tools.AnnIndexProbe [copies] [srcDir] [outDir] [full|incr]
  */
object AnnIndexProbe {
  def main(args: Array[String]): Unit = {
    val copies = args.headOption.map(_.toInt).getOrElse(10)
    val src = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val out = if (args.length > 2) args(2) else s"/tmp/graft_ann_$copies"
    val mode = if (args.length > 3) args(3) else "full"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_SHUFFLE_PARTITIONS", "32"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.ansi.enabled", "false")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val embPath = s"$out/embeddings.parquet"
    if (!new java.io.File(embPath).exists()) {
      val base = spark.read.parquet(s"$src/embeddings.parquet")
      val idType = base.schema("vec_id").dataType
      val c = spark.range(copies).select(col("id").as("__c"))
      base.repartition(cpus.toInt).crossJoin(c)
        .withColumn("__r", expr("cast(__c % size(embedding) AS INT)"))
        .withColumn("vec_id",
          (col("vec_id") + col("__c") * ScaleGen.Offset).cast(idType))
        .withColumn("embedding", expr(
          "concat(slice(embedding, __r + 1, size(embedding) - __r)," +
            " slice(embedding, 1, __r))"))
        .select(base.columns.head, base.columns.tail: _*)
        .repartition(32).write.mode("overwrite").parquet(embPath)
    }

    val emb = spark.read.parquet(embPath)
    val nVecs = emb.count()
    val queries = emb.filter(col("vec_id") % 50 === 0 && col("vec_id") < 2000)

    if (mode == "incr") {
      // fresh index per run so append cost is measured against a known base
      val idxDir = s"$out/ivfpq_index_incr"
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(idxDir))
      val t0 = System.nanoTime()
      graft.operators.Similarity.writeIvfPqIndex(emb, idxDir)
      val tBuild = (System.nanoTime() - t0) / 1e9
      // delta ids sit BELOW every corpus id: ADC distances tie in whole
      // code-sharing classes and rank breaks ties by ascending vec_id, so
      // lowest-id twins make the serving check tie-immune (the first run
      // used ids above the corpus and found 0 twins — all buried by ties)
      val delta = spark.read.parquet(s"$src/embeddings.parquet")
        .withColumn("vec_id", -(col("vec_id") + lit(1L)))
      val t1 = System.nanoTime()
      graft.operators.Similarity.appendToIvfPqIndex(delta, idxDir)
      val tAppend = (System.nanoTime() - t1) / 1e9
      val t2 = System.nanoTime()
      val res = graft.operators.Similarity.ivfPqSearchIndex(idxDir, queries, k = 5)
        .collect().map(r => (r.getLong(0), r.getLong(2)))
      val tSearch = (System.nanoTime() - t2) / 1e9
      // every query's appended exact twin (same vector, new lowest id) must
      // surface — added vectors are first-class results
      val nq = queries.count()
      val twins = res.count { case (q, v) => v == -(q + 1L) }
      println(s"""{"probe":"ann_index_incr","copies":$copies,"vectors":$nVecs,""" +
        s""""wall_build_s":${math.round(tBuild * 10) / 10.0},""" +
        s""""wall_append_s":${math.round(tAppend * 10) / 10.0},""" +
        s""""wall_search_s":${math.round(tSearch * 10) / 10.0},""" +
        s""""queries":$nq,"twins_found":$twins}""")
      spark.stop()
      return
    }

    val idxDir = s"$out/ivfpq_index"
    val t0 = System.nanoTime()
    val built = if (!new java.io.File(s"$idxDir/codes.parquet").exists()) {
      graft.operators.Similarity.writeIvfPqIndex(emb, idxDir)
      true
    } else false
    val tBuild = (System.nanoTime() - t0) / 1e9

    def rows(df: org.apache.spark.sql.DataFrame) =
      df.orderBy(col("query_id"), col("rank")).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
        .toSeq
    val t1 = System.nanoTime()
    val fromIdx = rows(graft.operators.Similarity.ivfPqSearchIndex(
      idxDir, queries, k = 5))
    val tSearch = (System.nanoTime() - t1) / 1e9
    val t2 = System.nanoTime()
    val direct = rows(graft.operators.Similarity.ivfPqTopKTrained(
      emb, queries, k = 5))
    val tDirect = (System.nanoTime() - t2) / 1e9
    val equal = fromIdx == direct

    println(s"""{"probe":"ann_index","copies":$copies,"vectors":$nVecs,""" +
      s""""built_now":$built,"wall_build_s":${math.round(tBuild * 10) / 10.0},""" +
      s""""wall_search_index_s":${math.round(tSearch * 10) / 10.0},""" +
      s""""wall_inmemory_s":${math.round(tDirect * 10) / 10.0},""" +
      s""""rows":${fromIdx.size},"identical":$equal}""")
    spark.stop()
  }
}
