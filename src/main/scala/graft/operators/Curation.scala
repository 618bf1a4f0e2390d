package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** End-to-end corpus curation (SURVEY.md §7.5): the composition a
  * training-data pipeline actually runs — language filter → quality gate →
  * exact-dedup canonicalization → deterministic subsample — expressed as one
  * lazy dataflow so Catalyst fuses the per-document scoring projections into
  * a single pass over the corpus.
  *
  * Scale shape: lang/quality scoring are COLUMN expressions fused into one
  * projection over the corpus (a join of separately-scored copies would
  * triple the scan); the dedup keeper set is one hash aggregate joined back
  * LEFT SEMI (bare ids, no text shuffle); the sample predicate is stateless.
  * Net: ONE wide scan, one aggregate shuffle, one semi join.
  */
object Curation {

  def curate(docs: DataFrame, id: String, text: String, lang: String,
             minQuality: Double, sampleFraction: Double): DataFrame = {
    val keepers = Dedup.exactDedup(docs, col(text), col(id))
      .select(col("doc_id").as(id))
    docs.select(col(id),
        TextAnalysis.langPredCol(col(text)).as("lang_pred"),
        TextAnalysis.qualityScoreCol(col(text)).as("quality_score"))
      .join(keepers, Seq(id), "left_semi")
      .filter(col("lang_pred") === lang && col("quality_score") >= minQuality)
      .filter(Sampling.keep(col(id), sampleFraction))
  }
}
