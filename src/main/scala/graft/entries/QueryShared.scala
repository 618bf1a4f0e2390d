package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.sources.{OracleSql => O}

/** Shared plumbing for the per-family query registries under entries/
  * (split out of SparkEntry in r14): session prep, table readers, the
  * build-once artifact memos, and the oracle-SQL helper fragments. All
  * members were `private` in SparkEntry; `private[graft]` on the object
  * keeps them out of the public API surface.
  */
private[graft] object QueryShared {

  /** F13 null-on-parse-failure requires non-ANSI mode (SURVEY §4.3); Spark 4
    * defaults ANSI on, and the driver owns the session, so set it per call.
    * The UTC pin (also session-wide) makes timezone-sensitive semantics
    * uniform from the first query instead of flipping when the first
    * events-based query runs (r8 advice): every oracle comparison assumes a
    * UTC session, so it is part of the query contract, not a per-reader
    * detail.
    */
  def prep(s: SparkSession): Unit = {
    s.conf.set("spark.sql.ansi.enabled", "false")
    s.conf.set("spark.sql.session.timeZone", "UTC")
  }


  def li(s: SparkSession, dir: String) = s.read.parquet(s"$dir/lineitem.parquet")
  def ord(s: SparkSession, dir: String) = s.read.parquet(s"$dir/orders.parquet")
  def cust(s: SparkSession, dir: String) = s.read.parquet(s"$dir/customer.parquet")
  def part(s: SparkSession, dir: String) = s.read.parquet(s"$dir/part.parquet")
  def nat(s: SparkSession, dir: String) = s.read.parquet(s"$dir/nation.parquet")

  /** events.parquet `ts` differs across driver testdata generations:
    * TIMESTAMP(NANOS) (pre-r8) needs the nanos-as-long flag + truncate-to-
    * micros, while TIMESTAMP(MICROS, naive) (current) loads as TIMESTAMP_NTZ
    * and only needs the NTZ→instant cast. Both coercions land on the same
    * UTC-instant micros the oracle engine reads from the same file, so the
    * reader probes the loaded type instead of assuming a generation; the
    * probe-and-coerce rule is shared with the streaming reader via
    * [[operators.Events.coerceEventTs]].
    *
    * SESSION-WIDE side effects (r8 advice): both conf sets outlive this
    * call on the driver-owned session. `nanosAsLong` makes every later
    * TIMESTAMP(NANOS) parquet read load as LongType, and the UTC timezone
    * pin changes any later timezone-sensitive cast if the driver session
    * was not already UTC. Both are intentional — [[prep]] pins UTC on every
    * query entry, so the session is uniformly UTC from the FIRST query
    * rather than flipping after the first events-based one, and the oracle
    * comparison is only defined for UTC sessions.
    */
  def events(s: SparkSession, dir: String) = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val raw = s.read.parquet(s"$dir/events.parquet")
    operators.Events.coerceEventTs(raw, raw.schema("ts").dataType)
  }

  /** Event types present in the driver testdata (pivot needs a static list —
    * see Olap.pivotEventCounts). */
  val EventTypes: Seq[String] = Seq("click", "error", "purchase", "signup", "view")

  /** MinHash-LSH pair artifact, memoized per (session, dir): the signatures/
    * pairs are build-once persisted artifacts by design (Dedup scaladoc), so
    * the near-dup pair query and the clustering query share ONE build instead
    * of re-running the eager LSH job each. Stopped sessions are purged like
    * Warehouse's memo.
    */
  val lshPairsMemo =
    new java.util.concurrent.ConcurrentHashMap[(SparkSession, String), DataFrame]()

  def lshPairs(s: SparkSession, dir: String): DataFrame = {
    lshPairsMemo.keySet.removeIf(k => k._1.sparkContext.isStopped)
    val df = lshPairsMemo.computeIfAbsent((s, dir), _ =>
      operators.Dedup.minhashLshPairs(
        s.read.parquet(s"$dir/documents.parquet"), "doc_id", "text"))
    // minhashLshPairs returns an eagerly-cached artifact, but a family-
    // boundary clearCache (Bench hygiene) still drops that storage — lazily
    // re-persist like memoizedArtifact so no consumer ever silently
    // re-executes the pair build PER ACTION (one rebuild is paid, once).
    if (df.storageLevel == org.apache.spark.storage.StorageLevel.NONE) df.persist()
    df
  }

  /** Pruned co-purchase pair artifact (Basket.copurchasePairs), memoized per
    * (session, dir): all graph-family queries consume the SAME build-once
    * edge table (r7 — in production this is a persisted artifact, and Bench
    * runs the family contiguously in one cache-family window). If a cache
    * clear dropped the data between windows, the storage-level probe
    * re-persists it lazily, so no consumer ever silently re-executes the
    * quadratic pair build per action.
    */
  val copurchaseMemo =
    new java.util.concurrent.ConcurrentHashMap[(SparkSession, String), DataFrame]()

  /** Memoize a build-once CACHED artifact per (session, dir) — the shared
    * lifecycle of the co-purchase and quantizer artifacts: purge stopped
    * sessions, cache on first build, and lazily re-persist if a
    * family-boundary cache clear dropped the storage, so no consumer ever
    * silently re-executes the build per action. (lshPairs stays separate:
    * minhashLshPairs returns an already-cached eager artifact that owns
    * its own lifecycle.) */
  def memoizedArtifact(
      memo: java.util.concurrent.ConcurrentHashMap[(SparkSession, String), DataFrame],
      s: SparkSession, dir: String)(build: => DataFrame): DataFrame = {
    memo.keySet.removeIf(k => k._1.sparkContext.isStopped)
    val df = memo.computeIfAbsent((s, dir), _ => build.cache())
    if (df.storageLevel == org.apache.spark.storage.StorageLevel.NONE) df.persist()
    df
  }

  def copurchasePairsArtifact(s: SparkSession, dir: String): DataFrame =
    memoizedArtifact(copurchaseMemo, s, dir)(
      operators.Basket.copurchasePairs(li(s, dir)))

  /** The trained fixed-K coarse quantizer (kmeansFixedK, 32 cells, 2 Lloyd
    * rounds) shared by the fixed-K ANN paths — the "train once, persist
    * the codebook" production artifact. 32 rows; the memo exists so both
    * consumers search against the SAME trained table instead of each
    * re-running Lloyd. */
  val fixedKMemo =
    new java.util.concurrent.ConcurrentHashMap[(SparkSession, String), DataFrame]()

  def fixedKCentroidsArtifact(s: SparkSession, dir: String): DataFrame =
    memoizedArtifact(fixedKMemo, s, dir)(
      operators.Similarity.kmeansFixedK(
        s.read.parquet(s"$dir/embeddings.parquet"), k = 32, maxIter = 2))

  /** Persisted ON-DISK artifacts, path-memoized per (session, dir) with an
    * input-fingerprint manifest (VERDICT r12 #5): the trained BPE vocab and
    * the IVF-PQ index used to be retrained INSIDE their gated queries —
    * ~24 s of every bench run measuring provenance instead of serving. Now
    * the build runs once (timed by Bench as its own `artifact:*` entry at
    * the first consuming family's window) and every consumer proves
    * derivation through [[operators.ArtifactManifest.check]] — the corpus
    * it serves must fingerprint-match the corpus the artifact was trained
    * on, or the query throws. Disk paths (not cached frames): a
    * family-boundary cache clear cannot drop them, and a fresh session
    * rebuilds. */
  val bpeVocabMemo =
    new java.util.concurrent.ConcurrentHashMap[(String, String), String]()

  /** Recursively delete a memoized temp artifact dir at JVM exit (ADVICE
    * r13: long-lived JVMs — test suites, repeated sessions — used to leak
    * one temp dir per (session, dir) forever; the memo keys also pinned
    * SparkSession objects on the heap. Keys are now (applicationId, dir)
    * — value strings hold no session reference — and every temp dir is
    * registered here once.) */
  def deleteAtExit(dir: String): String = {
    Runtime.getRuntime.addShutdownHook(new Thread(() => {
      def rm(f: java.io.File): Unit = {
        Option(f.listFiles).getOrElse(Array.empty).foreach(rm); f.delete(): Unit
      }
      rm(new java.io.File(dir))
    }))
    dir
  }

  def bpeVocabArtifact(s: SparkSession, dir: String): String =
    bpeVocabMemo.computeIfAbsent((s.sparkContext.applicationId, dir), _ => {
      val docs = s.read.parquet(s"$dir/documents.parquet")
      val art = deleteAtExit(
        java.nio.file.Files.createTempDirectory("bpe_vocab").toString)
      operators.TextAnalysis.writeBpeVocab(docs, "doc_id", "text", rounds = 5, art)
      operators.ArtifactManifest.write(art, docs, Seq(col("doc_id"), col("text")))
      art
    })

  val ivfPqIndexMemo =
    new java.util.concurrent.ConcurrentHashMap[(String, String), String]()

  def ivfPqIndexArtifact(s: SparkSession, dir: String): String =
    ivfPqIndexMemo.computeIfAbsent((s.sparkContext.applicationId, dir), _ => {
      val emb = s.read.parquet(s"$dir/embeddings.parquet")
      val idx = deleteAtExit(
        java.nio.file.Files.createTempDirectory("ivfpq_index").toString)
      operators.Similarity.writeIvfPqIndex(emb, idx)
      operators.ArtifactManifest.write(idx, emb,
        Seq(col("vec_id"), col("embedding")))
      idx
    })

  /** One entry per implemented operator from SURVEY.md §2. */

  /** Shared by q_drift and q_stream_drift (the streaming run's bounded
    * complete-mode counts equal the batch counts, so one mirror serves both). */
  def driftOracleSql: String =
    s"""WITH ca AS (SELECT n_chars // 200 AS bucket, CAST(count(*) AS BIGINT) AS c_a
      |      FROM documents WHERE doc_id % 2 = 0 GROUP BY 1),
      |cb AS (SELECT n_chars // 200 AS bucket, CAST(count(*) AS BIGINT) AS c_b
      |      FROM documents WHERE doc_id % 2 = 1 GROUP BY 1),
      |t AS (SELECT COALESCE(ca.bucket, cb.bucket) AS bucket,
      |        COALESCE(c_a, 0) AS c_a, COALESCE(c_b, 0) AS c_b
      |      FROM ca FULL OUTER JOIN cb ON ca.bucket = cb.bucket),
      |q AS (SELECT c_a, c_b,
      |        CAST(floor(CAST(c_a - c_b AS DOUBLE) * CAST(c_a - c_b AS DOUBLE)
      |          / (c_a + c_b) * 1000000.0 + 0.5) AS BIGINT) AS qc
      |      FROM t)
      |SELECT CAST(count(*) AS BIGINT) AS n_buckets,
      |  CAST(sum(c_a) AS BIGINT) AS n_a, CAST(sum(c_b) AS BIGINT) AS n_b,
      |  ${O.detRoundSql("CAST(sum(qc) AS BIGINT) / 1000000.0", 4)} AS chi2
      |FROM q""".stripMargin

  /** lang-id scoring select (no ORDER BY) — shared by the q_lang_id oracle
    * and the curation pipeline oracle. */
  def langIdSelect: String = {
    def hits(set: Seq[String]) =
      s"CAST(len(list_filter(string_split(lower(text), ' '), x -> lower(x) IN ${O.inListSql(set)})) AS BIGINT)"
    s"""SELECT doc_id, score_en, score_pt, score_es,
      | CASE WHEN score_en = 0 AND score_pt = 0 AND score_es = 0 THEN 'unknown'
      |      WHEN score_en >= score_pt AND score_en >= score_es THEN 'en'
      |      WHEN score_pt >= score_es THEN 'pt'
      |      ELSE 'es' END AS lang_pred
      |FROM (SELECT doc_id,
      |        ${hits(operators.TextAnalysis.StopwordsEn)} AS score_en,
      |        ${hits(operators.TextAnalysis.StopwordsPt)} AS score_pt,
      |        ${hits(operators.TextAnalysis.StopwordsEs)} AS score_es
      |      FROM documents)""".stripMargin
  }

  /** text-quality scoring select (no ORDER BY) — shared like [[langIdSelect]]. */
  def textQualitySelect: String = {
    val nw = "len(ws)::DOUBLE"
    val dr = s"len(list_distinct(ws))::DOUBLE / $nw"
    val sr = s"len(list_filter(ws, x -> lower(x) IN ${O.inListSql(operators.TextAnalysis.StopwordsEn)}))::DOUBLE / $nw"
    val mwl = s"(CAST(length(t) AS DOUBLE) - ($nw - 1)) / $nw"
    val ls = s"least($nw / 100.0, 1.0)"
    s"""SELECT doc_id,
      | CAST(len(ws) AS BIGINT) AS n_words,
      | ${O.detRoundSql(dr, 4)} AS distinct_ratio,
      | ${O.detRoundSql(sr, 4)} AS stopword_ratio,
      | ${O.detRoundSql(mwl, 4)} AS mean_word_len,
      | ${O.detRoundSql(s"$ls * 0.3 + ($dr) * 0.4 + ($sr) * 0.3", 4)} AS quality_score
      |FROM (SELECT doc_id, text AS t, string_split(text, ' ') AS ws FROM documents)""".stripMargin
  }

  /** DuckDB mirror of Sampling.keep: first 60 md5 bits under the cut. */
  def sampleKeepSql(keyExpr: String, fraction: Double): String =
    s"CAST('0x' || substr(md5(CAST($keyExpr AS VARCHAR)), 1, 15) AS BIGINT) < ${operators.Sampling.cut(fraction)}"

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  /** Shared by q_domain_cap and q_domain_cap_agg — both query forms have
    * the identical contract (unscorable null-score docs excluded), so one
    * oracle text serves both and cannot desynchronize. */
  lazy val domainCapOracle: String = {
    val nw = "len(ws)::DOUBLE"
    val dr = s"len(list_distinct(ws))::DOUBLE / $nw"
    val sr = s"len(list_filter(ws, x -> lower(x) IN ${O.inListSql(operators.TextAnalysis.StopwordsEn)}))::DOUBLE / $nw"
    val ls = s"least($nw / 100.0, 1.0)"
    s"""WITH sc AS (SELECT doc_id, domain,
      |              ${O.detRoundSql(s"$ls * 0.3 + ($dr) * 0.4 + ($sr) * 0.3", 4)} AS quality_score
      |            FROM (SELECT doc_id, source AS domain,
      |                    string_split(text, ' ') AS ws FROM documents)),
      |r AS (SELECT doc_id, domain, quality_score,
      |        CAST(row_number() OVER (PARTITION BY domain
      |               ORDER BY quality_score DESC, doc_id) AS BIGINT) AS rank_in_domain
      |      FROM sc WHERE quality_score IS NOT NULL)
      |SELECT doc_id, domain, quality_score, rank_in_domain FROM r
      |WHERE rank_in_domain <= 50 ORDER BY domain, rank_in_domain""".stripMargin
  }

  /** Gap-session CTE chain over events — shared by q_session_batch (whole
    * result) and q_stream_session_window (watermark-filtered). */
  val sessionWindowCtes: String =
    """e AS (SELECT user_id, ts,
      |        lag(ts) OVER (PARTITION BY user_id ORDER BY ts) AS prev_ts
      |      FROM events),
      |f AS (SELECT user_id, ts,
      |        CASE WHEN prev_ts IS NULL OR ts > prev_ts + INTERVAL 30 MINUTE
      |             THEN 1 ELSE 0 END AS new_session FROM e),
      |g AS (SELECT user_id, ts,
      |        sum(new_session) OVER (PARTITION BY user_id ORDER BY ts
      |                               ROWS UNBOUNDED PRECEDING) AS seq FROM f),
      |s AS (SELECT user_id, min(ts) AS session_start,
      |        max(ts) + INTERVAL 30 MINUTE AS session_end,
      |        CAST(count(*) AS BIGINT) AS n_events FROM g GROUP BY user_id, seq)""".stripMargin

  /** Shared DuckDB CTE chain recomputing the [[operators.Multimodal.dHash]]
    * from the synthetic-PNG generating formula: 9×8 point-sampled integer
    * luma grid (sample (gx,gy) reads pixel (((2gx+1)·w)//18,
    * ((2gy+1)·h)//16)), bit gy·8+gx = right-neighbor luma greater —
    * all-integer fixed point (luma ×1000), so the packed halves are
    * bit-exact across engines. Exposes CTEs `p` (doc dims) and `hsh`
    * (doc_id, phash_hi, phash_lo) for the q_multimodal_phash* oracles.
    */
  val phashCtesSql: String =
    """p AS (SELECT doc_id, CAST(8 + doc_id % 9 AS BIGINT) AS w,
      |                  CAST(8 + (doc_id * 3) % 9 AS BIGINT) AS h
      |           FROM documents),
      |g AS (SELECT doc_id, w, h, gy, gx,
      |        ((2 * gx + 1) * w) // 18 AS x, ((2 * gy + 1) * h) // 16 AS y
      |      FROM p, range(0, 8) t1(gy), range(0, 9) t2(gx)),
      |l AS (SELECT doc_id, gy, gx,
      |        299 * ((31 * x + 17 * y + doc_id) % 256)
      |        + 587 * ((7 * x + 13 * y + 2 * doc_id) % 256)
      |        + 114 * ((3 * x + 29 * y + 5 * doc_id) % 256) AS lum
      |      FROM g),
      |b AS (SELECT a.doc_id, (a.gy * 8 + a.gx) AS i,
      |        CASE WHEN r.lum > a.lum THEN 1::BIGINT ELSE 0::BIGINT END AS bit
      |      FROM l a JOIN l r ON a.doc_id = r.doc_id AND a.gy = r.gy
      |                       AND r.gx = a.gx + 1
      |      WHERE a.gx < 8),
      |hsh AS (SELECT doc_id,
      |        CAST(sum(CASE WHEN i >= 32 THEN bit << (i - 32) ELSE 0 END) AS BIGINT) AS phash_hi,
      |        CAST(sum(CASE WHEN i < 32 THEN bit << i ELSE 0 END) AS BIGINT) AS phash_lo
      |      FROM b GROUP BY 1)""".stripMargin

  /** Shared by q_audio_energy and its streaming twin q_stream_audio (the
    * identical dataflow through a stateless typed flatMap): recompute every
    * window's energy/zero-cross/peak from syntheticWav's closed-form
    * channel-0 sample formula — all-integer, exact compare. vp (the
    * previous in-window sample) is the formula at i-1, null at window
    * starts, mirroring the engine's in-window-neighbors contract. */
  val audioEnergyOracle: String =
    s"""WITH d AS (SELECT doc_id FROM documents WHERE doc_id % 7 = 3),
      |g AS (SELECT doc_id, CAST(64 + doc_id % 64 AS BIGINT) AS n FROM d),
      |s AS (SELECT doc_id, i, i // 32 AS win_idx,
      |        CAST((doc_id * 31 + i * 7) % 65536 - 32768 AS BIGINT) AS v,
      |        CASE WHEN i % 32 <> 0
      |             THEN CAST((doc_id * 31 + (i - 1) * 7) % 65536 - 32768 AS BIGINT)
      |        END AS vp
      |      FROM g, unnest(range(0, n)) u(i)),
      |a AS (SELECT doc_id, win_idx, count(*) AS n_samples,
      |        sum(v * v) AS ss,
      |        sum(CASE WHEN vp IS NOT NULL AND (v < 0) <> (vp < 0)
      |                 THEN 1 ELSE 0 END) AS zc,
      |        max(CASE WHEN v < 0 THEN -v ELSE v END) AS pk
      |      FROM s GROUP BY 1, 2)
      |SELECT doc_id, CAST(win_idx AS INTEGER) AS win_idx,
      |  CAST(n_samples AS INTEGER) AS n_samples, CAST(ss AS BIGINT) AS sum_sq,
      |  CAST(zc AS INTEGER) AS n_zero_cross, CAST(pk AS INTEGER) AS peak
      |FROM a ORDER BY doc_id, win_idx""".stripMargin

}
