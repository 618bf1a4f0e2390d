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
    // fanned out before the fused scoring projection (guide §2.4; no-op at
    // scale): lang+quality scoring is the pipeline's CPU-heavy pass and
    // otherwise runs inside a single-split source's one scan task
    Parallelism.fanOut(docs.select(col(id), col(text)), Seq(col(id)))
      .select(col(id),
        TextAnalysis.langPredCol(col(text)).as("lang_pred"),
        TextAnalysis.qualityScoreCol(col(text)).as("quality_score"))
      .join(keepers, Seq(id), "left_semi")
      .filter(col("lang_pred") === lang && col("quality_score") >= minQuality)
      .filter(Sampling.keep(col(id), sampleFraction))
  }

  /** Curation FUNNEL audit — the observability twin of [[curate]]: how many
    * documents survive each successive filter stage (language → quality →
    * dedup-keeper → subsample), and how many each stage drops. Production
    * pipelines publish exactly this per run; a stage suddenly eating 40% of
    * the corpus is the first signal a filter regressed. Same fused shape as
    * the pipeline itself: the stage flags are cumulative boolean COLUMNS in
    * one projection (plus the keeper left join), and the whole funnel is
    * ONE conditional aggregate row, unpivoted to a 5-row report.
    */
  /** Deterministic epoch-seeded shuffle-sharding — the pipeline's LAST
    * step: assign every document a shard for each training epoch via a
    * pure hash of (doc id, epoch), so the "global shuffle" every data
    * loader needs is (a) reproducible across reruns/engines/partitionings,
    * (b) different every epoch (decorrelated batch composition — the
    * reason loaders reshuffle at all), and (c) embarrassingly parallel:
    * no global sort, no window — ONE projection per row and one
    * combinable aggregate for the shard manifest. At 100 TB this is the
    * only shuffle-free way to "shuffle": a hash permutation's shard is
    * computable row-locally, and writers just `partitionBy(shard)`.
    *
    * Returns the shard MANIFEST (epoch, shard, n_docs, n_chars, h_xor) —
    * the balance/checksum table a loader validates against; h_xor is the
    * order-free 60-bit content checksum of the member hash set.
    */
  def shuffleShards(docs: DataFrame, id: String, text: String,
                    nShards: Int, epochs: Int): DataFrame =
    docs.select(col(id).cast("string").as("__id"),
        length(col(text)).cast("long").as("__len"))
      .withColumn("epoch", explode(array((0 until epochs).map(e => lit(e.toLong)): _*)))
      .withColumn("__h", Dedup.hash60(concat_ws(":", col("__id"), col("epoch"))))
      .withColumn("shard", pmod(col("__h"), lit(nShards.toLong)))
      .groupBy(col("epoch"), col("shard"))
      .agg(count(lit(1)).as("n_docs"), sum(col("__len")).as("n_chars"),
        expr("bit_xor(__h)").as("h_xor"))

  /** The WHOLE training-data pipeline, composed end-to-end as one lazy
    * dataflow: curate (lang filter → quality gate → exact-dedup keepers →
    * deterministic subsample) → leakage-safe split (near-dup clusters
    * among the SURVIVORS may not straddle train/eval) → epoch-0
    * shuffle-sharding of every surviving doc. Returns the (split, shard)
    * manifest with order-free checksums — the table a downstream loader
    * validates before training.
    *
    * Composition rules at scale: the near-dup pair set is pruned to
    * survivors by two LEFT SEMI joins on bare ids BEFORE the CC fixpoint
    * (clusters over dropped docs are dead work, and a dropped doc must not
    * bridge two surviving clusters — the split contract is defined on the
    * curated corpus); everything downstream of curation carries ids only,
    * never text. One wide corpus scan total, inherited from [[curate]].
    */
  def pipelineManifest(docs: DataFrame, id: String, text: String,
                       lang: String, minQuality: Double,
                       sampleFraction: Double, pairs: DataFrame,
                       aCol: String, bCol: String, trainFraction: Double,
                       nShards: Int): DataFrame = {
    val curated = curate(docs, id, text, lang, minQuality, sampleFraction)
      .select(col(id))
    // MERGE hint: both sides are data-sized (pairs AND the survivor id
    // set), so the spillable strategy is the only always-safe one — an
    // AQE flip to SHUFFLE_HASH would stake correctness on an unspillable
    // per-partition build map (the recorded hash-relation failure mode;
    // at sf100 the SHARED LSH verify join hit exactly that under too few
    // shuffle partitions — SCALE_PROBE_r12_pipeline_sf100.json).
    val survivorPairs = pairs
      .join(curated.select(col(id).as(aCol)).hint("merge"), Seq(aCol), "left_semi")
      .join(curated.select(col(id).as(bCol)).hint("merge"), Seq(bCol), "left_semi")
    val split = Sampling.leakageSafeSplit(
      curated, id, survivorPairs, aCol, bCol, trainFraction)
    split
      .withColumn("__h", Dedup.hash60(
        concat_ws(":", col(id).cast("string"), lit(0L))))
      .withColumn("shard",
        when(col("split") === "train", pmod(col("__h"), lit(nShards.toLong)))
          .otherwise(lit(-1L)))
      .groupBy(col("split"), col("shard"))
      .agg(count(lit(1)).as("n_docs"), expr("bit_xor(__h)").as("h_xor"))
  }

  def curationFunnel(docs: DataFrame, id: String, text: String, lang: String,
                     minQuality: Double, sampleFraction: Double): DataFrame = {
    val keepers = Dedup.exactDedup(docs, col(text), col(id))
      .select(col("doc_id").as(id), lit(true).as("__keeper"))
    val f1 = TextAnalysis.langPredCol(col(text)) === lang
    val f2 = f1 && TextAnalysis.qualityScoreCol(col(text)) >= minQuality
    val f3Base = col("__keeper").isNotNull
    val flags = Parallelism.fanOut(docs.select(col(id), col(text)), Seq(col(id)))
      .join(keepers, Seq(id), "left")
      .select(col(id), f1.as("__f1"), f2.as("__f2"),
        (f2 && f3Base).as("__f3"))
      .withColumn("__f4", col("__f3") && Sampling.keep(col(id), sampleFraction))
    val row = flags.agg(count(lit(1)).as("n0"),
      sum(when(col("__f1"), 1L).otherwise(0L)).as("n1"),
      sum(when(col("__f2"), 1L).otherwise(0L)).as("n2"),
      sum(when(col("__f3"), 1L).otherwise(0L)).as("n3"),
      sum(when(col("__f4"), 1L).otherwise(0L)).as("n4"))
    row.select(expr(
      """stack(5,
        | CAST(0 AS BIGINT), 'total',        n0, CAST(0 AS BIGINT),
        | CAST(1 AS BIGINT), 'lang_filter',  n1, n0 - n1,
        | CAST(2 AS BIGINT), 'quality_gate', n2, n1 - n2,
        | CAST(3 AS BIGINT), 'dedup_keeper', n3, n2 - n3,
        | CAST(4 AS BIGINT), 'subsample',    n4, n3 - n4)
        | AS (stage_idx, stage, n_pass, n_dropped)""".stripMargin))
  }

  /** Token-budget epoch scheduling (the data-constrained regime of
    * Muennighoff et al. 2023: when fresh data runs out, repeating a source
    * up to ~4 epochs still helps): given a training token budget, allocate
    * to each source proportionally to its token mass, capped at
    * `maxEpochs` passes over the source. Emits per source its token count,
    * cap, allocation and implied epoch count — the mixing table a training
    * run consumes. One corpus scan (token counting) into a sources-sized
    * aggregate; the proportional split is one double multiply/divide per
    * source against the broadcast total, floor-then-cast like every
    * fraction in this library.
    */
  def tokenBudget(docs: DataFrame, text: String, source: String,
                  budget: Long, maxEpochs: Int): DataFrame = {
    val counts = docs.select(col(source), col(text))
      .groupBy(col(source).as("source"))
      .agg(sum(size(regexp_extract_all(col(text),
        lit(TextAnalysis.TokenPattern), lit(0))).cast("long")).as("n_tokens"))
    val total = counts.agg(sum(col("n_tokens")).as("total_tokens"))
    counts.crossJoin(broadcast(total))
      .withColumn("cap", col("n_tokens") * maxEpochs)
      .withColumn("alloc", least(col("cap"),
        floor(lit(budget) * col("n_tokens").cast("double") / col("total_tokens"))
          .cast("long")))
      .select(col("source"), col("n_tokens"), col("cap"), col("alloc"),
        // A source whose texts are all empty has n_tokens = 0; the bare
        // division is NaN in Spark but NULL in DuckDB — a cross-engine
        // divergence. Zero epochs is the honest answer (same guard as
        // duplicateSpanStats' n_grams = 0).
        when(col("n_tokens") === 0, lit(0.0)).otherwise(
          graft.functions.GraftFunctions.detRound(
            col("alloc").cast("double") / col("n_tokens"), 4)).as("epochs"))
  }

  /** Per-domain cap — the web-corpus rebalancing step: no single source may
    * contribute more than `cap` documents, and the kept documents are the
    * BEST of that source (quality desc, id tiebreak). Web crawls are
    * power-law distributed across domains; without this one mega-site
    * dominates training. One shuffle on the domain key; the per-domain
    * window sort is bounded by a domain's own doc count, never global.
    */
  /** Unscorable docs (null text → null score) are EXCLUDED before ranking —
    * the explicit contract both cap forms and the oracle share (otherwise
    * window nulls-last ordering and the aggregate's null-skip would
    * silently diverge on them). */
  def capPerDomain(docs: DataFrame, id: String, text: String, domain: String,
                   cap: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val scored = docs.select(col(id), col(domain), col(text))
      .select(col(id).as("doc_id"), col(domain).as("domain"),
        TextAnalysis.qualityScoreCol(col(text)).as("quality_score"))
      .filter(col("quality_score").isNotNull)
    val w = Window.partitionBy(col("domain"))
      .orderBy(col("quality_score").desc, col("doc_id"))
    scored.withColumn("rank_in_domain", row_number().over(w).cast("long"))
      .filter(col("rank_in_domain") <= cap)
  }

  /** Gini concentration of the docs-per-domain distribution — the one-number
    * answer to "is this crawl dominated by a few mega-sites?" that decides
    * whether [[capPerDomain]] is needed at all. Exact across engines: with
    * ascending ranks i over the domain counts x_i,
    * `G = (2·Σ i·x_i − (n+1)·Σ x_i) / (n·Σ x_i)` — every term an exact
    * integer, one final double division. The rank comes from
    * [[Surrogate.zipWithIndexOrdered]] (two-pass offsets), so the ranking
    * survives a vocabulary of millions of domains without a global window.
    */
  def domainConcentration(docs: DataFrame, domain: String): DataFrame = {
    // cached before ranking: zipWithIndexOrdered evaluates its upstream
    // twice (offsets + main pass) — without this the full corpus scans
    // twice; with it the second pass reads the tiny per-domain table
    val counts = docs.groupBy(col(domain).as("domain"))
      .agg(count(lit(1)).as("cnt")).cache()
    val ranked = Surrogate.zipWithIndexOrdered(counts, "rnk",
      Seq(col("cnt"), col("domain")))
    // Σ rnk·cnt is exact in a long up to ~9e18; the FINAL arithmetic runs
    // in double on both engines (2.0·s − (n+1)·tot can exceed long range
    // at web scale — Spark would wrap silently, DuckDB would throw; the
    // double form degrades gracefully and identically instead)
    val result = ranked.agg(count(lit(1)).as("n"), sum(col("cnt")).as("tot"),
        sum(col("rnk") * col("cnt")).as("s"))
      .select(col("n").as("n_domains"), col("tot").as("total_docs"),
        graft.functions.GraftFunctions.detRound(
          expr("(2.0 * CAST(s AS DOUBLE) - (CAST(n AS DOUBLE) + 1.0) * CAST(tot AS DOUBLE))" +
            " / (CAST(n AS DOUBLE) * CAST(tot AS DOUBLE))"), 6)
          .as("gini")).cache()
    result.count() // materialize (one row), then release the counts cache
    counts.unpersist()
    result
  }

  /** Aggregate-form cap — IDENTICAL output to [[capPerDomain]], different
    * physical shape: the per-domain window sorts a whole domain in one
    * task, which on a power-law web crawl means the mega-domain IS the
    * straggler. `TopKByScore` is a TypedImperativeAggregate with O(cap)
    * state that combines map-side, so every partition contributes at most
    * `cap` candidates per domain and the mega-domain costs like any other
    * key. Ties break exactly like the window ((score desc, doc_id asc)).
    */
  def capPerDomainAgg(docs: DataFrame, id: String, text: String, domain: String,
                      cap: Int): DataFrame = {
    val scored = docs.select(col(id), col(domain), col(text))
      .select(col(id).as("doc_id"), col(domain).as("domain"),
        TextAnalysis.qualityScoreCol(col(text)).as("quality_score"))
      .filter(col("quality_score").isNotNull) // same contract as capPerDomain
    scored.groupBy(col("domain"))
      .agg(graft.functions.TopKAggregate.topKByScore(
        col("quality_score"), col("doc_id"), cap).as("top"))
      .select(col("domain"), posexplode(col("top")))
      .select(col("col.id").as("doc_id"), col("domain"),
        col("col.score").as("quality_score"),
        (col("pos") + 1).cast("long").as("rank_in_domain"))
  }
}
