package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column plumbing (SURVEY.md §7.5): treat image/audio/video as
  * opaque `binary` columns with typed metadata, and run decode /
  * feature-extract as per-partition batch functions.
  *
  * The container has no image/audio codecs, so the DECODE STEP IS A STUB —
  * [[stubDecode]] is a deterministic fake clearly marked as such. Everything
  * around it (schema, batching, partitioning, output shape) is the real
  * Spark plumbing a production decode (JNI codec / Pandas UDF in PySpark)
  * would drop into.
  */
object Multimodal {

  /** Synthesize an opaque binary payload column from text (UTF-8 bytes) —
    * stands in for reading real image/audio bytes. */
  def withPayload(docs: DataFrame, text: String): DataFrame =
    docs.withColumn("payload", encode(col(text), "UTF-8"))

  val mediaMetaSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("n_bytes", LongType),
    StructField("format", StringType),
    StructField("width", IntegerType),
    StructField("height", IntegerType),
    StructField("feature", ArrayType(DoubleType))))

  /** ??? REAL DECODE GOES HERE ??? — stub: derives fake width/height and an
    * 8-dim "feature vector" from the bytes deterministically. A real
    * implementation would decode the image and run feature extraction; the
    * signature (bytes in, struct + vector out) is what matters.
    */
  def stubDecode(bytes: Array[Byte]): (String, Int, Int, Array[Double]) = {
    val n = bytes.length
    val fmt = (if (n == 0) 0 else java.lang.Byte.toUnsignedInt(bytes(0))) % 3 match {
      case 0 => "jpeg"; case 1 => "png"; case _ => "webp"
    }
    val width = 64 + (n % 512)
    val height = 64 + ((n * 7) % 512)
    val feature = Array.tabulate(8) { i =>
      var h = 1125899906842597L
      var j = i
      while (j < n) { h = h * 31 + bytes(j); j += 97 }
      (h % 1000L).toDouble / 1000.0
    }
    (fmt, width, height, feature)
  }

  /** Per-partition decode → metadata table. `mapPartitions` is the Scala
    * analogue of `mapInPandas`: one batch of rows per partition flows
    * through the (stubbed) codec without per-row UDF overhead. Partitioning
    * is whatever the upstream source provides — at 100 TB, size input
    * splits so a partition's payloads fit in executor memory.
    */
  def decodeMeta(spark: SparkSession, withPayloads: DataFrame, id: String): DataFrame = {
    val rdd = withPayloads.select(col(id).cast("long"), col("payload")).rdd.mapPartitions { it =>
      it.map { r =>
        val docId = r.getLong(0)
        val bytes = r.getAs[Array[Byte]](1)
        val (fmt, w, h, feat) = stubDecode(bytes)
        Row(docId, bytes.length.toLong, fmt, w, h, feat.toSeq)
      }
    }
    spark.createDataFrame(rdd, mediaMetaSchema)
  }

  /** Resize planning over decoded metadata: target dimensions fitting within
    * `maxSide`, aspect preserved, INTEGER arithmetic only (`div`) so the
    * result is bit-identical on every engine. The actual pixel resample is
    * the decode stub's sibling — this is the dimension computation every
    * image pipeline schedules by, fused as a flat codegen projection.
    */
  def resizeMeta(meta: DataFrame, maxSide: Int = 224): DataFrame =
    meta
      .withColumn("__g", greatest(col("width"), col("height")))
      .withColumn("out_width",
        when(col("__g") <= maxSide, col("width"))
          .otherwise(expr(s"CAST(width AS BIGINT) * $maxSide div __g")).cast("int"))
      .withColumn("out_height",
        when(col("__g") <= maxSide, col("height"))
          .otherwise(expr(s"CAST(height AS BIGINT) * $maxSide div __g")).cast("int"))
      .drop("__g")

  /** Frame/sample selection over a payload: take every `stride`-th byte as
    * a "frame" (stub for video frame-sampling; same slicing plumbing).
    *
    * BINARY has no element accessor in Spark SQL (`get` requires ARRAY), so
    * each sampled byte is sliced with `substring(payload, i, 1)` and decoded
    * via hex → base-10 — all codegen'd built-ins, no UDF. Empty payload
    * yields `[null]` (out-of-range slice), mirroring an out-of-bounds get.
    */
  def sampleFrames(withPayloads: DataFrame, id: String, stride: Int): DataFrame =
    withPayloads.select(col(id).as("doc_id"),
      expr(s"transform(sequence(1, greatest(octet_length(payload), 1), $stride)," +
        s" i -> cast(conv(hex(substring(payload, i, 1)), 16, 10) as int))")
        .as("sampled_bytes"))

  /** Overlapping fixed-window chunk plan — the audio/video segmentation a
    * speech or embedding pipeline feeds its encoder (chunk k covers bytes
    * `[k·hop, k·hop+len)`, 25% overlap at the defaults). PLANNING only:
    * offsets, sizes and a first-byte probe; the actual slice stays inside
    * the opaque payload for the (stubbed) codec stage. Pure per-row
    * expression work — chunk count scales with payload size, never corpus
    * size; an empty payload yields one empty chunk so every doc plans.
    */
  def chunkPlan(withPayloads: DataFrame, id: String,
                chunkLen: Int = 256, hop: Int = 192): DataFrame =
    withPayloads.select(col(id).as("doc_id"), col("payload"),
        coalesce(expr("octet_length(payload)"), lit(0)).cast("long").as("n_bytes"))
      .select(col("doc_id"), col("n_bytes"), col("payload"),
        explode(expr(s"sequence(CAST(0 AS BIGINT), greatest((n_bytes - 1) div $hop, CAST(0 AS BIGINT)))"))
          .as("chunk_idx"))
      .withColumn("offset", col("chunk_idx") * hop)
      .withColumn("chunk_bytes", least(lit(chunkLen.toLong), col("n_bytes") - col("offset")))
      .withColumn("first_byte",
        expr("cast(conv(hex(substring(payload, cast(offset + 1 AS INT), 1)), 16, 10) as int)"))
      .select(col("doc_id"), col("chunk_idx"), col("offset"),
        col("chunk_bytes"), col("first_byte"))
}
