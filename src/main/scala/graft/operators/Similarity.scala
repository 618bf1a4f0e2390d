package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.GraftFunctions.detRound

/** Similarity search over an embedding column (`array<float>`) —
  * SURVEY.md §7.5 extension; no reference counterpart.
  *
  * All math is double-precision sequential left-folds (`aggregate` over
  * `zip_with`) so results are bit-deterministic and reproducible by the
  * oracle engine's list functions.
  */
object Similarity {

  /** Left-fold dot product of two float vectors in double precision. */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, x) => acc + x)

  def norm(a: Column): Column = sqrt(dot(a, a))

  def cosine(a: Column, b: Column): Column = dot(a, b) / (norm(a) * norm(b))

  /** Brute-force cosine top-k: queries × corpus. The corpus side streams;
    * the (small) query set is broadcast, so this is a map-side nested loop —
    * the correctness baseline every ANN variant is measured against. At
    * 100 TB this runs as one scan of the corpus per query batch.
    *
    * Ordering is by the detRound(4)-quantized similarity (cross-engine
    * deterministic) with vec_id as tiebreak.
    */
  def bruteForceTopK(corpus: DataFrame, queries: DataFrame, k: Int): DataFrame = {
    val c = corpus.select(col("vec_id").as("vec_id"), col("embedding").as("emb_c"))
    val q = queries.select(col("vec_id").as("query_id"), col("embedding").as("emb_q"))
    val scored = c.join(broadcast(q), col("query_id") =!= col("vec_id"))
      .withColumn("cos", detRound(cosine(col("emb_q"), col("emb_c")), 4))
    val w = Window.partitionBy(col("query_id")).orderBy(col("cos").desc, col("vec_id"))
    scored.withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("vec_id"), col("cos"))
  }

  /** Deterministic pseudo-random hyperplane: coefficient d of plane p is a
    * hash-derived value in [-0.5, 0.5). No RNG state — reproducible across
    * runs, sessions, and engines.
    */
  private def planeCoeff(p: Int, d: Column): Column =
    (pmod(xxhash64(concat(lit(s"plane$p#"), d.cast("string"))), lit(1000000L))
      .cast("double") / 1000000.0) - 0.5

  /** Sign-random-projection bucket (nBits-bit LSH key) for a vector. */
  def srpBucket(v: Column, dim: Int, nBits: Int): Column = {
    val bits = (0 until nBits).map { p =>
      val proj = aggregate(
        zip_with(v, sequence(lit(0), lit(dim - 1)),
          (x, i) => x.cast("double") * planeCoeff(p, i)),
        lit(0.0), (acc, x) => acc + x)
      when(proj > 0, shiftleft(lit(1L), p)).otherwise(0L)
    }
    bits.reduce((a, b) => a.bitwiseOR(b))
  }

  /** LSH-bucketed ANN (the scale path): corpus is pre-bucketed by the
    * nBits-bit SRP key; a query only scans its own bucket. Multi-probe
    * (flipping one bit) keeps recall reasonable at small nBits. At 100 TB
    * the bucket column becomes the table's partition key, so a query touches
    * (nBits+1)/2^nBits of the data instead of all of it.
    */
  def lshTopK(corpus: DataFrame, queries: DataFrame, dim: Int, k: Int,
              nBits: Int = 8): DataFrame = {
    val c = corpus.select(col("vec_id"), col("embedding").as("emb_c"),
      srpBucket(col("embedding"), dim, nBits).as("bucket"))
    // multi-probe: the query's own bucket plus every 1-bit-flip neighbor
    val probes = explode(array((lit(-1) +: (0 until nBits).map(lit(_))): _*))
    val q = queries.select(col("vec_id").as("query_id"), col("embedding").as("emb_q"),
      srpBucket(col("embedding"), dim, nBits).as("qbucket"))
      .withColumn("flip", probes)
      .withColumn("bucket", when(col("flip") === -1, col("qbucket"))
        .otherwise(col("qbucket").bitwiseXOR(expr("shiftleft(CAST(1 AS BIGINT), flip)"))))
      .select(col("query_id"), col("emb_q"), col("bucket"))
    val scored = c.join(broadcast(q), Seq("bucket"))
      .filter(col("query_id") =!= col("vec_id"))
      .withColumn("cos", detRound(cosine(col("emb_q"), col("emb_c")), 4))
    val w = Window.partitionBy(col("query_id")).orderBy(col("cos").desc, col("vec_id"))
    scored.withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("vec_id"), col("cos"))
  }

  /** Embedding-cosine near-duplicate pairs above a threshold. Brute force
    * within the corpus here (correctness anchor); the LSH bucket join is the
    * scale path (see [[lshTopK]]).
    */
  def cosineNearDupPairs(corpus: DataFrame, threshold: Double): DataFrame = {
    val a = corpus.select(col("vec_id").as("vec_id_a"), col("embedding").as("emb_a"))
    val b = corpus.select(col("vec_id").as("vec_id_b"), col("embedding").as("emb_b"))
    a.join(b, col("vec_id_a") < col("vec_id_b"))
      .withColumn("cos", detRound(cosine(col("emb_a"), col("emb_b")), 4))
      .filter(col("cos") >= threshold)
      .select(col("vec_id_a"), col("vec_id_b"), col("cos"))
  }
}
