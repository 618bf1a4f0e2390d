package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** End-to-end corpus curation (SURVEY.md §7.5): the composition a
  * training-data pipeline actually runs — language filter → quality gate →
  * exact-dedup canonicalization → deterministic subsample — expressed as one
  * lazy dataflow so Catalyst fuses the per-document scoring projections into
  * a single pass over the corpus.
  *
  * Scale shape: langId/qualityScore are flat codegen projections; the dedup
  * keeper set is one hash aggregate joined back LEFT SEMI (bare ids, no
  * text shuffle); the sample predicate is stateless. Net: one wide scan, one
  * aggregate shuffle, one semi join.
  */
object Curation {

  def curate(docs: DataFrame, id: String, text: String, lang: String,
             minQuality: Double, sampleFraction: Double): DataFrame = {
    val l = TextAnalysis.langId(docs, id, text).select(col(id), col("lang_pred"))
    val q = TextAnalysis.qualityScore(docs, id, text).select(col(id), col("quality_score"))
    val keepers = Dedup.exactDedup(docs, col(text), col(id))
      .select(col("doc_id").as(id))
    docs.select(col(id))
      .join(l, Seq(id)).join(q, Seq(id))
      .join(keepers, Seq(id), "left_semi")
      .filter(col("lang_pred") === lang && col("quality_score") >= minQuality)
      .filter(Sampling.keep(col(id), sampleFraction))
  }
}
