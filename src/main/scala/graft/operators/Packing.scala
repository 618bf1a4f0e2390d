package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Training-sequence packing — SURVEY.md §7.5 extension; no reference
  * counterpart. LLM pre-training concatenates the tokenized corpus in a
  * fixed document order and slices it into fixed-length training sequences
  * ("concat-and-chunk"); the pipeline question is WHICH sequence each
  * document lands in and whether it straddles a boundary (straddling docs
  * get split across two training examples).
  */
object Packing {

  /** Assign every document its token offset in the concatenated corpus and
    * the training-sequence ids it lands in, for a `budget`-token context.
    *
    * The global token offset is [[Surrogate.rankedRunningTotal]] — the
    * two-pass range-partitioned prefix sum — because at 100 TB the corpus
    * prefix sum is exactly the computation a single global window would
    * funnel through one task. Everything after the offset is stateless
    * per-row integer arithmetic (`div` — no floats anywhere).
    */
  def packPlan(docs: DataFrame, id: String, text: String, budget: Int): DataFrame =
    packFromCounts(docs.select(col(id).as("doc_id"),
      size(TextAnalysis.words(col(text))).cast("long").as("n_tokens")), budget)

  /** The packing math over an ALREADY-COUNTED (doc_id, n_tokens) table —
    * the entry any real tokenizer feeds (q_pack_bpe counts with the
    * trained BPE vocabulary; [[packPlan]] is the whitespace-count form).
    * A zero-token document occupies no positions: crosses_boundary is
    * explicitly false for it (also sidesteps `(cum−1) div b` at cum = 0,
    * where Spark's truncating `div` and DuckDB's flooring `//` disagree
    * on negatives — the guard keeps both engines on defined ground). */
  def packFromCounts(counts: DataFrame, budget: Int): DataFrame =
    Surrogate.rankedRunningTotal(counts, col("n_tokens"), "rank", "cum_tokens",
      Seq(col("doc_id")))
      .withColumn("offset", col("cum_tokens") - col("n_tokens"))
      .withColumn("seq_id", expr(s"offset div $budget"))
      .withColumn("crosses_boundary",
        col("n_tokens") > 0 &&
          expr(s"offset div $budget") =!= expr(s"(cum_tokens - 1) div $budget"))
      .select(col("doc_id"), col("n_tokens"), col("rank"), col("offset"),
        col("seq_id"), col("crosses_boundary"))
}
