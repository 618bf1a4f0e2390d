package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deduplication operators for large-scale training-data pipelines
  * (SURVEY.md §7.5 — beyond-parity extensions; no reference counterpart).
  *
  * Scale design (100 TB): nothing here compares all-pairs globally. Exact
  * dedup is one hash-shuffle on the key; near-dup methods go through
  * candidate generation (LSH bands / blocking) so the quadratic step only
  * happens inside small buckets. All hashes are engine-deterministic
  * (xxhash64 with fixed seed), never `Math.random`-seeded.
  */
object Dedup {

  /** Normalized word array (single-space-tokenized, as-is casing). */
  def words(text: Column): Column = split(text, " ")

  /** Exact dedup by content: keep the smallest id per identical key.
    * One shuffle (hash aggregate); at 100 TB prefer this over
    * `dropDuplicates` when the winner must be deterministic.
    */
  def exactDedup(df: DataFrame, key: Column, id: Column): DataFrame =
    df.groupBy(key.as("text"))
      .agg(min(id).as("doc_id"), count(lit(1)).as("n_copies"))

  /** Word-set Jaccard similarity of two (distinct-element) arrays. */
  def jaccard(a: Column, b: Column): Column =
    size(array_intersect(a, b)).cast("double") / size(array_union(a, b))

  /** Exact n-gram (word-set) Jaccard near-dup pairs within a blocking key.
    *
    * The block join keeps the pair generation linear-ish: only docs sharing
    * `blockKey` are compared. At 100 TB the block must be a real partitioner
    * (e.g. lang × length-bucket × LSH band) — this is the semantics anchor
    * the hashed methods are validated against.
    */
  def jaccardPairs(docs: DataFrame, id: String, text: String, blockKey: String,
                   threshold: Double): DataFrame = {
    val prepared = docs.select(col(id).as("doc_id"), col(blockKey).as("block"),
      array_distinct(words(col(text))).as("ws"))
    val a = prepared.select(col("doc_id").as("doc_id_a"), col("block"), col("ws").as("ws_a"))
    val b = prepared.select(col("doc_id").as("doc_id_b"), col("block"), col("ws").as("ws_b"))
    a.join(b, Seq("block"))
      .filter(col("doc_id_a") < col("doc_id_b"))
      .withColumn("jaccard", jaccard(col("ws_a"), col("ws_b")))
      .filter(col("jaccard") >= threshold)
      .select(col("doc_id_a"), col("doc_id_b"), col("jaccard"))
  }

  // ---- MinHash + LSH --------------------------------------------------------

  /** k minhashes via double hashing h_j = h1 + j·h2 (Kirsch–Mitzenmacher):
    * two xxhash64 evaluations per shingle, k mins — all codegen'd, no UDF.
    */
  def minhashSignature(shingles: Column, k: Int): Column = {
    val mins = (0 until k).map { j =>
      array_min(transform(shingles, s =>
        xxhash64(s) + lit(j.toLong) * xxhash64(concat(s, lit("#")))))
    }
    array(mins: _*)
  }

  /** Word 3-shingles (whole text when shorter than 3 words). */
  def shingles3(text: Column): Column = {
    val w = words(text)
    when(size(w) < 3, array(text)).otherwise(
      transform(sequence(lit(0), size(w) - 3), i =>
        concat_ws(" ", element_at(w, i + 1), element_at(w, i + 2), element_at(w, i + 3))))
  }

  /** MinHash-LSH near-dup pairs: signature → bands → bucket join →
    * exact-Jaccard verification on the candidates only.
    *
    * bands·rows = k. Pr[candidate] = 1-(1-j^rows)^bands — with k=32,
    * bands=8, rows=4 a 0.7-Jaccard pair is caught w.p. ~0.97 while the
    * quadratic work stays inside hash buckets. That is the 100 TB shape:
    * explode is linear, the join is an equi-join on (band, hash).
    */
  def minhashLshPairs(docs: DataFrame, id: String, text: String,
                      k: Int = 32, bands: Int = 8, threshold: Double = 0.6): DataFrame = {
    val rows = k / bands
    val sig = docs.select(col(id).as("doc_id"),
      array_distinct(shingles3(col(text))).as("sh"))
      .withColumn("sig", minhashSignature(col("sh"), k))
    val banded = sig.select(col("doc_id"), col("sh"),
      posexplode(transform(sequence(lit(0), lit(bands - 1)), b =>
        xxhash64(concat_ws(",", slice(col("sig"), b * rows + 1, lit(rows)))))))
      .withColumnRenamed("pos", "band").withColumnRenamed("col", "band_hash")
    val l = banded.select(col("band"), col("band_hash"), col("doc_id").as("doc_id_a"), col("sh").as("sh_a"))
    val r = banded.select(col("band"), col("band_hash"), col("doc_id").as("doc_id_b"), col("sh").as("sh_b"))
    l.join(r, Seq("band", "band_hash"))
      .filter(col("doc_id_a") < col("doc_id_b"))
      .select(col("doc_id_a"), col("doc_id_b"), col("sh_a"), col("sh_b")).distinct()
      .withColumn("jaccard", jaccard(col("sh_a"), col("sh_b")))
      .filter(col("jaccard") >= threshold)
      .select(col("doc_id_a"), col("doc_id_b"), col("jaccard"))
  }

  // ---- SimHash --------------------------------------------------------------

  /** 64-bit SimHash from word frequencies, expression-only: explode words,
    * per-word xxhash64, then 64 per-bit signed sums. The per-doc aggregate is
    * a single hash-shuffle; bit k of the result is 1 iff the weighted vote is
    * positive.
    */
  def simhash64(docs: DataFrame, id: String, text: String): DataFrame = {
    val exploded = docs.select(col(id).as("doc_id"), explode(words(col(text))).as("w"))
      .groupBy("doc_id", "w").agg(count(lit(1)).as("cnt"))
      .withColumn("h", xxhash64(col("w")))
    val bitSums = (0 until 64).map { b =>
      sum(when(shiftright(col("h"), b).bitwiseAND(1) === 1, col("cnt"))
        .otherwise(-col("cnt"))).as(s"b$b")
    }
    val sums = exploded.groupBy("doc_id").agg(bitSums.head, bitSums.tail: _*)
    val sig = (0 until 64).map { b =>
      when(col(s"b$b") > 0, shiftleft(lit(1L), b)).otherwise(0L)
    }.reduce((a, c) => a.bitwiseOR(c))
    sums.select(col("doc_id"), sig.as("simhash"))
  }

  /** SimHash near-dup pairs: band the 64-bit signature into 4×16-bit chunks
    * (any pair within Hamming distance 3 shares ≥1 exact chunk — pigeonhole),
    * join on chunks, verify Hamming ≤ maxHamming.
    */
  def simhashPairs(docs: DataFrame, id: String, text: String, maxHamming: Int = 3): DataFrame = {
    val sig = simhash64(docs, id, text)
    val chunked = sig.select(col("doc_id"), col("simhash"),
      posexplode(array((0 until 4).map(c =>
        shiftright(col("simhash"), c * 16).bitwiseAND(0xFFFFL)): _*)))
      .withColumnRenamed("pos", "chunk").withColumnRenamed("col", "chunk_val")
    val l = chunked.select(col("chunk"), col("chunk_val"), col("doc_id").as("doc_id_a"), col("simhash").as("sig_a"))
    val rr = chunked.select(col("chunk"), col("chunk_val"), col("doc_id").as("doc_id_b"), col("simhash").as("sig_b"))
    l.join(rr, Seq("chunk", "chunk_val"))
      .filter(col("doc_id_a") < col("doc_id_b"))
      .select("doc_id_a", "doc_id_b", "sig_a", "sig_b").distinct()
      .withColumn("hamming", bit_count(col("sig_a").bitwiseXOR(col("sig_b"))))
      .filter(col("hamming") <= maxHamming)
      .select(col("doc_id_a"), col("doc_id_b"), col("hamming").cast("int").as("hamming"))
  }
}
