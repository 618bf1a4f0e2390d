package graft.sources

import graft.functions.PyText

/** DuckDB oracle SQL — the byte-for-byte semantic mirror of [[Crm]] (input
  * derivations) and of graft.operators.Dims/Fact (DW builds), for the
  * driver's differential correctness gate (SURVEY.md §5.2).
  *
  * Everything here is GENERATED from the same Scala literals the engine uses
  * ([[PyText.RegionMap]], [[PyText.Capitals]], connectives...), so the two
  * sides cannot drift silently.
  *
  * Python `str.title()` is replicated per space-token as
  * `upper(first)||lower(rest)` — exact on this data domain (tokens never
  * contain a letter that follows a non-letter; see PyText.title for the
  * general rule).
  */
object OracleSql {

  // ---- scalar expression builders -----------------------------------------

  /** Python str.title() on the [[Crm]] data domain. */
  def titleSql(e: String): String =
    s"array_to_string(list_transform(string_split($e, ' '), x -> upper(x[1]) || lower(x[2:])), ' ')"

  /** F1 clean_text core (falsy guard handled at call sites). */
  def cleanSql(e: String): String =
    titleSql(s"trim(regexp_replace($e, '\\s+', ' ', 'g'))")

  def falsySql(e: String): String = s"($e IS NULL OR $e = '')"

  /** falsy → default, else clean_text. */
  def cleanOrSql(e: String, default: String): String =
    s"CASE WHEN ${falsySql(e)} THEN '$default' ELSE ${cleanSql(e)} END"

  /** F2 standardize_name applied to an ALREADY-cleaned (titled) name:
    * re-titling is idempotent, so only the connective lowering remains.
    * Word-wise (split → lower-if-connective-and-not-first → join), exactly
    * mirroring PyText.standardizeName — handles consecutive and trailing
    * connectives that a sequential space-delimited replace() would miss.
    */
  def stdNameSql(e: String): String = {
    val conn = PyText.Conectores.toSeq.sorted.map(c => s"'$c'").mkString("(", ", ", ")")
    s"""CASE WHEN len(string_split($e, ' ')) <= 1 THEN $e
       | ELSE (string_split($e, ' '))[1] || ' ' ||
       |   array_to_string(list_transform((string_split($e, ' '))[2:],
       |     x -> CASE WHEN lower(x) IN $conn THEN lower(x) ELSE x END), ' ')
       | END""".stripMargin.replace("\n", "")
  }

  /** Value of byte `i` (1-based) of a blob's hex dump — the DuckDB mirror of
    * Spark `conv(hex(substring(payload, i, 1)), 16, 10)`. NULL out of range.
    */
  def byteAtSql(hexExpr: String, iExpr: String): String = {
    def nib(pos: String) = s"(instr('0123456789ABCDEF', upper(substring($hexExpr, $pos, 1))) - 1)"
    s"""(CASE WHEN 2 * ($iExpr) > length($hexExpr) THEN NULL
       | ELSE ${nib(s"2 * ($iExpr) - 1")} * 16 + ${nib(s"2 * ($iExpr)")} END)""".stripMargin
      .replace("\n", "")
  }

  /** F3 standardize_region (falsy → 'N/A' handled by dim_localidade). */
  def regionSql(e: String): String = {
    val whens = PyText.RegionMap.toSeq.sortBy(_._1)
      .map { case (k, v) => s"WHEN '$k' THEN '$v'" }.mkString(" ")
    s"CASE lower(trim($e)) $whens ELSE ${titleSql(e)} END"
  }

  /** F4 is_capital as the 27-pair disjunction. */
  def capitalSql(city: String, state: String): String = {
    val pairs = PyText.Capitals.toSeq.sortBy(_._1)
      .map { case (ct, uf) => s"($city = '$ct' AND $state = '$uf')" }.mkString(" OR ")
    s"($pairs)"
  }

  /** F5 standardize_customer_category. */
  def custCatSql(e: String): String =
    s"""CASE WHEN ${falsySql(e)} THEN 'Não Definido'
       | WHEN lower($e) LIKE '%vip%' OR lower($e) LIKE '%premium%' THEN 'Premium'
       | WHEN lower($e) LIKE '%gold%' OR lower($e) LIKE '%ouro%' THEN 'Gold'
       | WHEN lower($e) LIKE '%silver%' OR lower($e) LIKE '%prata%' THEN 'Silver'
       | ELSE 'Padrão' END""".stripMargin.replace("\n", "")

  /** F6 standardize_product_category. */
  def prodCatSql(e: String): String =
    s"CASE WHEN ${falsySql(e)} THEN 'Não Definido' ELSE ${titleSql(e)} END"

  /** F7 classify_store_type. */
  def storeTypeSql(e: String): String =
    s"""CASE WHEN ${falsySql(e)} THEN 'Loja Padrão'
       | WHEN lower($e) LIKE '%shopping%' OR lower($e) LIKE '%mall%' THEN 'Shopping'
       | WHEN lower($e) LIKE '%centro%' THEN 'Centro'
       | WHEN lower($e) LIKE '%outlet%' THEN 'Outlet'
       | ELSE 'Loja Padrão' END""".stripMargin.replace("\n", "")

  /** F8 classify_promotion_type. */
  def promoTypeSql(e: String): String =
    s"""CASE WHEN ${falsySql(e)} THEN 'Desconto Geral'
       | WHEN lower($e) LIKE '%black%' THEN 'Black Friday'
       | WHEN lower($e) LIKE '%natal%' THEN 'Natal'
       | WHEN lower($e) LIKE '%liquidação%' THEN 'Liquidação'
       | ELSE 'Desconto Geral' END""".stripMargin.replace("\n", "")

  /** F9 percent extraction. */
  def pctSql(e: String): String =
    s"COALESCE(TRY_CAST(regexp_extract($e, '(\\d+(?:\\.\\d+)?)', 1) AS DOUBLE), 0.0)"

  /** Mirror of GraftFunctions.detRound — deterministic cross-engine round. */
  def detRoundSql(e: String, scale: Int): String = {
    val f = math.pow(10, scale).toLong
    s"floor(($e) * $f.0 + 0.5) / $f.0"
  }

  /** Mirror of GraftFunctions.stableSumScaled. */
  def stableSumScaledSql(e: String, scale: Int): String = {
    val f = math.pow(10, scale).toLong
    // HUGEINT sum mirrors the engine's DECIMAL(38,0) sum: per-row floor is
    // the same IEEE double both engines produce; the 128-bit accumulation
    // is exact where a float (or int64) running sum is not (r12 — the sf1
    // second-moment wrap).
    s"CAST(sum(CAST(floor(($e) * $f.0 + 0.5) AS HUGEINT)) AS DOUBLE) / $f.0"
  }

  /** Python-truthy FK key (0/NULL ⇒ no lookup). */
  def pyKeySql(e: String): String = s"(CASE WHEN $e IS NULL OR $e = 0 THEN NULL ELSE $e END)"

  val sentinelsSql = "('Data Inválida','N/A','NULL','')"
  def isSentinelSql(e: String) = s"($e IS NULL OR $e IN $sentinelsSql)"
  def dashShapeSql(e: String) =
    s"(length($e) = 10 AND length($e) - length(replace($e, '-', '')) = 2)"
  def slashShapeSql(e: String) =
    s"(length($e) = 10 AND length($e) - length(replace($e, '/', '')) = 2)"
  def isoParseSql(e: String) = s"CAST(try_strptime($e, '%Y-%m-%d') AS DATE)"
  def brParseSql(e: String) = s"CAST(try_strptime($e, '%d/%m/%Y') AS DATE)"

  /** F13 parse (null on sentinel / failure). */
  def multiDateSql(e: String): String =
    s"""CASE WHEN ${isSentinelSql(e)} THEN NULL
       | WHEN ${dashShapeSql(e)} THEN ${isoParseSql(e)}
       | WHEN ${slashShapeSql(e)} THEN ${brParseSql(e)}
       | ELSE NULL END""".stripMargin.replace("\n", "")

  /** F13 keep-row predicate. */
  def keepRowSql(e: String): String =
    s"""(${isSentinelSql(e)}
       | OR (${dashShapeSql(e)} AND ${isoParseSql(e)} IS NOT NULL)
       | OR (${slashShapeSql(e)} AND ${brParseSql(e)} IS NOT NULL))""".stripMargin.replace("\n", "")

  /** P8 sentinel→null date (both formats attempted). */
  def sentinelToNullDateSql(e: String): String =
    s"""CASE WHEN ${isSentinelSql(e)} THEN NULL
       | ELSE COALESCE(${isoParseSql(e)}, ${brParseSql(e)}) END""".stripMargin.replace("\n", "")

  // ---- §7.5 extension mirrors ----------------------------------------------

  /** Sequential-fold cosine over float[] lists in double precision —
    * verified bit-identical to Spark's aggregate(zip_with(...)) fold. */
  /** Sequential-fold dot product mirror of VectorExpressions.dotFP. */
  def dotSql(x: String, y: String): String =
    s"list_sum(list_transform(range(1, len($x)+1), i -> $x[i]::DOUBLE * $y[i]::DOUBLE))"

  def cosineSql(a: String, b: String): String =
    s"(${dotSql(a, b)} / (sqrt(${dotSql(a, a)}) * sqrt(${dotSql(b, b)})))"

  def inListSql(set: Seq[String]): String = set.map(s => s"'$s'").mkString("(", ", ", ")")

  /** Shared CTE chain for the pruned, skew-capped co-purchase graph —
    * mirror of [[graft.operators.Basket.copurchasePairs]]: distinct
    * (order, part) items, baskets above `maxBasketSize` distinct items
    * dropped before pair generation, pairs kept at co-occurrence count
    * ≥ `minSupport`. Exposes CTEs `items` (capped, BIGINT pk) and
    * `und` (pk_a < pk_b, c_ab) for the graph-family oracles.
    */
  def copurchaseCtesSql(minSupport: Int = 3, maxBasketSize: Int = 1024): String =
    s"""items AS MATERIALIZED (SELECT ok, pk FROM (
       |    SELECT l_orderkey AS ok, CAST(l_partkey AS BIGINT) AS pk,
       |      count(*) OVER (PARTITION BY l_orderkey) AS bsz
       |    FROM (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem))
       |  WHERE bsz <= $maxBasketSize),
       |und AS MATERIALIZED (SELECT a.pk AS pk_a, b.pk AS pk_b, count(*) AS c_ab
       |        FROM items a JOIN items b ON a.ok = b.ok AND a.pk < b.pk
       |        GROUP BY 1, 2 HAVING count(*) >= $minSupport)""".stripMargin

  /** `iters` unrolled PageRank rounds over the pruned co-purchase graph —
    * mirror of [[graft.operators.Graph.pagerank]] in its deterministic
    * (tol = 0) mode: each round quantizes contributions to 1e-12 integers
    * before summing and rounds the new rank to 1e-10, so every round's
    * ranks are bit-identical cross-engine and the chain composes exactly.
    */
  /** q_bpe_train mirror: K unrolled BPE merge rounds over the word-level
    * vocabulary. Per round: adjacent-pair counts weighted by word frequency,
    * argmax (count DESC, pair ASC), then ONE non-overlapping left-to-right
    * string-replace applies the merge to a DOUBLE-space-delimited
    * segmentation (`␣␣a␣␣b␣␣…`): every token boundary carries two spaces
    * and the pattern `␣a␣␣b␣` consumes exactly one space from each side,
    * so adjacent matches never compete for a shared delimiter and the
    * single pass is exactly the engine's greedy left-to-right symbol fold —
    * INCLUDING self-pair merges (a,a) over runs of any length, where the
    * previous single-space two-pass scheme diverged (pass one's consumed
    * shared space skipped every other pair of a run ≥ 5). BpeTrainSpec pins
    * the equivalence property-style with explicit run cases. */
  /** The shared v/s0/b1..bK/s1..sK CTE chain both BPE mirrors build on. */
  private def bpeChainCtes(rounds: Int): String = {
    def merged(b: String) = s"' ' || (SELECT replace(pair, ' ', '') FROM $b) || ' '"
    def patt(b: String) = s"' ' || (SELECT replace(pair, ' ', '  ') FROM $b) || ' '"
    val steps = (1 to rounds).map { i =>
      val prev = s"s${i - 1}"
      s"""b$i AS (SELECT pair, CAST(sum(freq) AS BIGINT) AS total_count FROM (
         |        SELECT freq, unnest(list_transform(range(1, len(s)),
         |          j -> s[j] || ' ' || s[j+1])) AS pair
         |        FROM (SELECT freq, string_split(trim(seg), '  ') AS s FROM $prev)
         |        WHERE len(s) >= 2)
         |      GROUP BY pair ORDER BY total_count DESC, pair LIMIT 1),
         |s$i AS (SELECT freq, replace(seg,
         |        ${patt(s"b$i")}, ${merged(s"b$i")}) AS seg FROM $prev)""".stripMargin
    }.mkString(",\n")
    s"""v AS (SELECT word, CAST(count(*) AS BIGINT) AS freq
       |      FROM (SELECT unnest(string_split(text, ' ')) AS word FROM documents)
       |      WHERE length(word) >= 1 GROUP BY 1),
       |s0 AS (SELECT freq,
       |        '  ' || array_to_string(string_split(word, ''), '  ') || '  ' AS seg
       |      FROM v),
       |$steps""".stripMargin
  }

  def bpeTrainChainSql(rounds: Int): String = {
    val out = (1 to rounds)
      .map(i => s"SELECT CAST($i AS BIGINT) AS round, pair, total_count FROM b$i")
      .mkString("\nUNION ALL ")
    s"""WITH ${bpeChainCtes(rounds)}
       |SELECT round, pair, total_count FROM ($out) ORDER BY round""".stripMargin
  }

  /** q_tokenize_bpe mirror: the final round's segmentation applied back to
    * the corpus. The segmentation string is its own vocabulary map — the
    * word is the seg with all delimiters removed, the symbols are the
    * double-space-split tokens — so no extra state leaves the chain.
    * word_idx numbers ALL single-space-split positions (1-based, empties
    * included) before empty words are dropped, mirroring the engine's
    * posexplode-then-filter. */
  def bpeTokenizeChainSql(rounds: Int): String =
    s"""WITH ${bpeChainCtes(rounds)},
       |vm AS (SELECT replace(seg, ' ', '') AS word,
       |              string_split(trim(seg), '  ') AS sym FROM s$rounds),
       |toks AS (SELECT doc_id, CAST(j AS BIGINT) AS word_idx, ws[j] AS word
       |         FROM (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
       |              unnest(range(1, len(ws) + 1)) u(j)
       |         WHERE length(ws[j]) >= 1)
       |SELECT t.doc_id, t.word_idx, CAST(j AS BIGINT) AS token_idx, sym[j] AS token
       |FROM toks t JOIN vm ON t.word = vm.word,
       |     unnest(range(1, len(sym) + 1)) u(j)
       |ORDER BY doc_id, word_idx, token_idx""".stripMargin

  /** Shared f/lab/w1..wR CTE chain for the batch-perceptron mirrors
    * (q_quality_train / q_quality_filter): hashed unigram features over
    * the BPE-ish token stream (the q_logreg_score feature mirror,
    * parameterized on `dim`), ±1 weak labels from the lang-id heuristic
    * (en → +1), then `rounds` unrolled full-batch perceptron updates from
    * w = 0. Round 1 is special-cased — zero weights make every labeled
    * doc misclassified, so w1 = Σ_docs y·f directly. All arithmetic is
    * BIGINT-exact, so the chain reproduces the engine loop bit-for-bit.
    * MATERIALIZED on the multiply-referenced CTEs (DuckDB inlines
    * otherwise — the pagerank-chain ENOSPC lesson). */
  private def perceptronChainCtes(dim: Int, rounds: Int): String = {
    import graft.operators.TextAnalysis.{TokenPattern, StopwordsEn, StopwordsEs, StopwordsPt}
    require(rounds >= 1, "perceptron chain needs at least one round")
    def hits(set: Seq[String]) =
      s"CAST(len(list_filter(string_split(lower(text), ' '), x -> lower(x) IN ${inListSql(set)})) AS BIGINT)"
    val steps = (2 to rounds).map { i =>
      s"""m$i AS MATERIALIZED (SELECT doc_id, CAST(sum(f * COALESCE(w, 0)) AS BIGINT) AS m
         |      FROM f LEFT JOIN w${i - 1} USING (bucket) GROUP BY doc_id),
         |x$i AS (SELECT l.doc_id, l.y FROM lab l LEFT JOIN m$i USING (doc_id)
         |      WHERE l.y * COALESCE(m, 0) <= 0),
         |d$i AS (SELECT bucket, CAST(sum(y * f) AS BIGINT) AS d
         |      FROM f JOIN x$i USING (doc_id) GROUP BY bucket),
         |w$i AS MATERIALIZED (SELECT COALESCE(a.bucket, b.bucket) AS bucket,
         |        COALESCE(a.w, 0) + COALESCE(b.d, 0) AS w
         |      FROM w${i - 1} a FULL OUTER JOIN d$i b ON a.bucket = b.bucket)""".stripMargin
    }.mkString(",\n")
    val base =
      s"""t AS (SELECT doc_id, regexp_extract_all(text, '$TokenPattern') AS l FROM documents),
         |tok AS (SELECT doc_id, lower(l[i]) AS w FROM t, unnest(range(1, len(l) + 1)) u(i)),
         |f AS MATERIALIZED (SELECT doc_id, ${hash60Sql("w")} % $dim AS bucket,
         |      CAST(count(*) AS BIGINT) AS f FROM tok GROUP BY 1, 2),
         |lab AS MATERIALIZED (SELECT doc_id,
         |        CASE WHEN en > 0 AND en >= pt AND en >= es
         |             THEN CAST(1 AS BIGINT) ELSE CAST(-1 AS BIGINT) END AS y
         |      FROM (SELECT doc_id, ${hits(StopwordsEn)} AS en,
         |              ${hits(StopwordsPt)} AS pt, ${hits(StopwordsEs)} AS es
         |            FROM documents)),
         |w1 AS MATERIALIZED (SELECT bucket, CAST(sum(y * f) AS BIGINT) AS w
         |      FROM f JOIN lab USING (doc_id) GROUP BY bucket)""".stripMargin
    if (steps.isEmpty) base else s"$base,\n$steps"
  }

  /** q_quality_train mirror: the full dim-row learned weight table. */
  def perceptronTrainChainSql(dim: Int, rounds: Int): String =
    s"""WITH ${perceptronChainCtes(dim, rounds)}
       |SELECT CAST(r.b AS BIGINT) AS bucket, CAST(COALESCE(w, 0) AS BIGINT) AS w
       |FROM (SELECT unnest(range(0, $dim)) AS b) r
       |LEFT JOIN w$rounds ON r.b = w$rounds.bucket
       |ORDER BY 1""".stripMargin

  /** q_quality_filter mirror: every document scored with the trained
    * weights; zero-token docs score 0 and drop (strict `margin > 0`). */
  def perceptronScoreChainSql(dim: Int, rounds: Int): String =
    s"""WITH ${perceptronChainCtes(dim, rounds)},
       |sc AS (SELECT doc_id, CAST(sum(f * COALESCE(w, 0)) AS BIGINT) AS margin,
       |         CAST(sum(f) AS BIGINT) AS n_tokens
       |       FROM f LEFT JOIN w$rounds USING (bucket) GROUP BY doc_id)
       |SELECT d.doc_id, COALESCE(n_tokens, CAST(0 AS BIGINT)) AS n_tokens,
       |  COALESCE(margin, CAST(0 AS BIGINT)) AS margin,
       |  (COALESCE(margin, CAST(0 AS BIGINT)) > 0) AS keep
       |FROM documents d LEFT JOIN sc USING (doc_id) ORDER BY d.doc_id""".stripMargin

  def pagerankChainSql(iters: Int): String = {
    val steps = (1 to iters).map { i =>
      s"""c$i AS MATERIALIZED (SELECT e.dst AS node, floor((r.r / d.deg) * 1000000000000.0 + 0.5) AS q
         |      FROM e JOIN deg d ON e.src = d.src JOIN r${i - 1} r ON e.src = r.node),
         |s$i AS MATERIALIZED (SELECT node, sum(q) AS sq FROM c$i GROUP BY 1),
         |r$i AS MATERIALIZED (SELECT node, ${detRoundSql(
               "CAST(0.15 AS DOUBLE) / n_nodes + CAST(0.85 AS DOUBLE) * (sq / 1000000000000.0)", 10)} AS r
         |       FROM s$i, nn)""".stripMargin
    }.mkString(",\n")
    s"""WITH ${copurchaseCtesSql()},
       |e AS MATERIALIZED (SELECT pk_a AS src, pk_b AS dst FROM und
       |      UNION ALL SELECT pk_b AS src, pk_a AS dst FROM und),
       |nodes AS MATERIALIZED (SELECT DISTINCT src AS node FROM e),
       |nn AS MATERIALIZED (SELECT count(*) AS n_nodes FROM nodes),
       |deg AS MATERIALIZED (SELECT src, count(*) AS deg FROM e GROUP BY 1),
       |r0 AS MATERIALIZED (SELECT node, CAST(1.0 AS DOUBLE) / n_nodes AS r FROM nodes, nn),
       |$steps
       |SELECT node, r FROM r$iters ORDER BY node""".stripMargin
  }

  /** q_pagerank_dangling mirror: [[pagerankChainSql]]'s quantized rounds
    * over a DIRECTED customer→order edge list (order nodes carry no
    * out-edges, customers no in-edges) with the engine's dangling-mass
    * redistribution: per round, dq = Σ_dangling floor(r·1e12 + 0.5) (a
    * BIGINT, so engine/partitioning-exact), and every node of the FULL
    * universe gets r' = 0.15/N + 0.85·(sq/1e12) + 0.85·((dq/1e12)/N) —
    * the same left-assoc IEEE sum `Graph.pagerankRun` emits. `dstOffset`
    * keeps the order-node id space disjoint from the customer keys. */
  /** The customer→order edge/nodes/deg prologue both directed-PageRank
    * mirrors share. `dstOffset` keeps the order-node id space disjoint
    * from the customer keys — callers pass 2^40, above any o_custkey the
    * testdata generator (or TPC-H up to ~sf7e6) emits and comfortably
    * inside BIGINT for every o_orderkey. */
  private def directedOrdersPrologueSql(dstOffset: Long): String =
    s"""e AS (SELECT CAST(o_custkey AS BIGINT) AS src,
       |             CAST(o_orderkey AS BIGINT) + $dstOffset AS dst FROM orders),
       |nodes AS (SELECT DISTINCT src AS node FROM e
       |          UNION SELECT DISTINCT dst FROM e),
       |deg AS (SELECT src, count(*) AS deg FROM e GROUP BY 1)""".stripMargin

  /** One unrolled directed round's shared CTE triplet — quantized
    * contributions `c$i`, their BIGINT sum `s$i`, and the BIGINT dangling
    * -mass scalar `d$i` (`Graph.rankLoop`'s per-round machinery) — followed
    * by the caller's `r$i` select, which owns the teleport arithmetic. */
  private def directedRoundSql(i: Int, rankSelect: String): String =
    s"""c$i AS MATERIALIZED (SELECT e.dst AS node, floor((r.r / d.deg) * 1000000000000.0 + 0.5) AS q
       |      FROM e JOIN deg d ON e.src = d.src JOIN r${i - 1} r ON e.src = r.node),
       |s$i AS (SELECT node, CAST(sum(q) AS BIGINT) AS sq FROM c$i GROUP BY 1),
       |d$i AS (SELECT COALESCE(CAST(sum(floor(r.r * 1000000000000.0 + 0.5)) AS BIGINT), 0) AS dq
       |      FROM r${i - 1} r LEFT JOIN deg g ON r.node = g.src WHERE g.src IS NULL),
       |r$i AS ($rankSelect)""".stripMargin

  def pagerankDanglingChainSql(iters: Int, dstOffset: Long): String = {
    val steps = (1 to iters).map { i =>
      directedRoundSql(i,
        s"""SELECT n.node, ${detRoundSql(
               "CAST(0.15 AS DOUBLE) / n_nodes + CAST(0.85 AS DOUBLE) * (COALESCE(s.sq, 0) / 1000000000000.0)" +
                 " + CAST(0.85 AS DOUBLE) * ((d.dq / 1000000000000.0) / n_nodes)", 10)} AS r
           |       FROM nodes n LEFT JOIN s$i s ON n.node = s.node, d$i d, nn""".stripMargin)
    }.mkString(",\n")
    s"""WITH ${directedOrdersPrologueSql(dstOffset)},
       |nn AS (SELECT count(*) AS n_nodes FROM nodes),
       |r0 AS (SELECT node, CAST(1.0 AS DOUBLE) / n_nodes AS r FROM nodes, nn),
       |$steps
       |SELECT node, r FROM r$iters ORDER BY node""".stripMargin
  }

  /** q_pagerank_personalized mirror: [[pagerankDanglingChainSql]]'s graph
    * with `Graph.personalizedPagerankRun`'s teleport arithmetic — seeds are
    * the customer nodes with `node % seedMod = 0`, each node's static share
    * is `s = 1/|seeds|` (seeds) or 0, r0 = the share vector itself, and
    * every round emits r' = 0.15·s + 0.85·(sq/1e12) + 0.85·((dq/1e12)·s) in
    * the engine's left-assoc IEEE order. The share division
    * `CAST(1.0 AS DOUBLE) / n_seeds` is the same single IEEE op the engine
    * performs driver-side, so the vectors agree bit-wise from round 0. */
  def pagerankPersonalizedChainSql(iters: Int, dstOffset: Long,
                                   seedMod: Long): String = {
    val steps = (1 to iters).map { i =>
      directedRoundSql(i,
        s"""SELECT sh.node, ${detRoundSql(
               "CAST(0.15 AS DOUBLE) * sh.s + CAST(0.85 AS DOUBLE) * (COALESCE(s.sq, 0) / 1000000000000.0)" +
                 " + CAST(0.85 AS DOUBLE) * ((d.dq / 1000000000000.0) * sh.s)", 10)} AS r
           |       FROM share sh LEFT JOIN s$i s ON sh.node = s.node, d$i d""".stripMargin)
    }.mkString(",\n")
    s"""WITH ${directedOrdersPrologueSql(dstOffset)},
       |seeds AS (SELECT DISTINCT src AS node FROM e WHERE src % $seedMod = 0),
       |ns AS (SELECT count(*) AS n_seeds FROM seeds),
       |share AS (SELECT n.node, CASE WHEN s.node IS NULL THEN CAST(0.0 AS DOUBLE)
       |            ELSE CAST(1.0 AS DOUBLE) / ns.n_seeds END AS s
       |          FROM nodes n LEFT JOIN seeds s ON n.node = s.node, ns),
       |r0 AS (SELECT node, s AS r FROM share),
       |$steps
       |SELECT node, r FROM r$iters ORDER BY node""".stripMargin
  }

  // ---- md5-derived 60-bit hash mirrors (graft.operators.Dedup) -------------

  /** Mirror of Dedup.hash60: first 15 md5 hex chars as a BIGINT. */
  def hash60Sql(e: String): String = s"CAST('0x' || substr(md5($e), 1, 15) AS BIGINT)"

  /** Mirror of Dedup.hash60b. */
  def hash60bSql(e: String): String =
    s"(CAST('0x' || substr(md5($e), 16, 15) AS BIGINT) % 1000000007)"

  /** Mirror of Dedup.shingles3 (word 3-shingles, whole text when short). */
  def shingles3Sql(text: String): String = shinglesKSql(text, 3)

  /** Word k-shingle list with the ShingleSet whole-text fallback for docs
    * shorter than k words (mirror of functions.VectorExpressions.ShingleSet
    * minus the sort/distinct — wrap in list_distinct when set semantics are
    * needed). */
  def shinglesKSql(text: String, k: Int): String = {
    val ws = s"string_split($text, ' ')"
    val joined = (1 to k).map(j => s"$ws[i + $j]").mkString(" || ' ' || ")
    s"""CASE WHEN len($ws) < $k THEN [$text]
       | ELSE list_transform(range(0, len($ws) - ${k - 1}),
       |        i -> $joined) END""".stripMargin
      .replace("\n", "")
  }

  /** Jaccard of two distinct-element lists (mirror of Dedup.jaccard /
    * the native SortedJaccard — same integer sizes, same division). */
  def listJaccardSql(a: String, b: String): String =
    s"(len(list_intersect($a, $b))::DOUBLE / len(list_distinct(list_concat($a, $b))))"

  /** Full q_dedup_minhash mirror: shingles → (h1,h2m) per shingle →
    * k=32 Kirsch–Mitzenmacher minhashes → 8 bands of 4 → band-hash bucket
    * join → exact-Jaccard verification. Every hash is md5-derived, so this
    * reproduces the engine's pipeline bit-for-bit.
    */
  def minhashLshSql(k: Int, bands: Int, threshold: Double): String = {
    val rows = k / bands
    s"""WITH d AS (SELECT doc_id, list_distinct(${shingles3Sql("text")}) AS sh FROM documents),
       |hs AS (SELECT doc_id, sh,
       |        list_transform(sh, s -> ${hash60Sql("s")}) AS h1,
       |        list_transform(sh, s -> ${hash60bSql("s")}) AS h2 FROM d),
       |sigs AS (SELECT doc_id, list_transform(range(0, $k),
       |          j -> list_min(list_transform(range(1, len(h1) + 1),
       |                 t -> h1[t] + j * h2[t]))) AS sig FROM hs),
       |banded AS (SELECT doc_id, b,
       |        ${hash60Sql(s"array_to_string(sig[b * $rows + 1 : b * $rows + $rows], ',')")} AS band_hash
       |      FROM sigs, range(0, $bands) tb(b)),
       |cand AS (SELECT DISTINCT l.doc_id AS doc_id_a, r.doc_id AS doc_id_b
       |      FROM banded l JOIN banded r
       |        ON l.b = r.b AND l.band_hash = r.band_hash AND l.doc_id < r.doc_id),
       |pairs AS (SELECT doc_id_a, doc_id_b, ${listJaccardSql("da.sh", "db.sh")} AS jaccard
       |      FROM cand JOIN d da ON doc_id_a = da.doc_id JOIN d db ON doc_id_b = db.doc_id)
       |SELECT doc_id_a, doc_id_b, jaccard FROM pairs
       |WHERE jaccard >= $threshold ORDER BY doc_id_a, doc_id_b""".stripMargin
  }

  /** q_dedup_incr mirror: the full-pair pipeline restricted to pairs with
    * ≥1 delta member — the spec-pinned equivalence of the incremental
    * probe-side-only band join. `deltaSel` is a predicate template over a
    * qualified doc_id column (e.g. `c => s"$c % 4 = 0"`). */
  def minhashLshIncrSql(k: Int, bands: Int, threshold: Double,
                        deltaSel: String => String): String = {
    val rows = k / bands
    s"""WITH d AS (SELECT doc_id, list_distinct(${shingles3Sql("text")}) AS sh FROM documents),
       |hs AS (SELECT doc_id, sh,
       |        list_transform(sh, s -> ${hash60Sql("s")}) AS h1,
       |        list_transform(sh, s -> ${hash60bSql("s")}) AS h2 FROM d),
       |sigs AS (SELECT doc_id, list_transform(range(0, $k),
       |          j -> list_min(list_transform(range(1, len(h1) + 1),
       |                 t -> h1[t] + j * h2[t]))) AS sig FROM hs),
       |banded AS (SELECT doc_id, b,
       |        ${hash60Sql(s"array_to_string(sig[b * $rows + 1 : b * $rows + $rows], ',')")} AS band_hash
       |      FROM sigs, range(0, $bands) tb(b)),
       |cand AS (SELECT DISTINCT l.doc_id AS doc_id_a, r.doc_id AS doc_id_b
       |      FROM banded l JOIN banded r
       |        ON l.b = r.b AND l.band_hash = r.band_hash AND l.doc_id < r.doc_id
       |        AND (${deltaSel("l.doc_id")} OR ${deltaSel("r.doc_id")})),
       |pairs AS (SELECT doc_id_a, doc_id_b, ${listJaccardSql("da.sh", "db.sh")} AS jaccard
       |      FROM cand JOIN d da ON doc_id_a = da.doc_id JOIN d db ON doc_id_b = db.doc_id)
       |SELECT doc_id_a, doc_id_b, jaccard FROM pairs
       |WHERE jaccard >= $threshold ORDER BY doc_id_a, doc_id_b""".stripMargin
  }

  /** Full q_dedup_simhash mirror: word counts → 60-bit md5 word hashes →
    * per-bit signed votes → signature → 4×15-bit chunk bucket join →
    * Hamming verification.
    */
  def simhashSql(maxHamming: Int): String =
    s"""WITH wc AS (SELECT doc_id, w, count(*) AS cnt
       |      FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS w FROM documents)
       |      GROUP BY doc_id, w),
       |wh AS (SELECT doc_id, ${hash60Sql("w")} AS h, cnt FROM wc),
       |bits AS (SELECT doc_id, b,
       |        sum(CASE WHEN (h >> b) & 1 = 1 THEN cnt ELSE -cnt END) AS v
       |      FROM wh, range(0, 60) tb(b) GROUP BY doc_id, b),
       |sigs AS (SELECT doc_id,
       |        CAST(sum(CASE WHEN v > 0 THEN (1::BIGINT << b) ELSE 0 END) AS BIGINT) AS sig
       |      FROM bits GROUP BY doc_id),
       |chunked AS (SELECT doc_id, sig, c, (sig >> (c * 15)) & 32767 AS cv
       |      FROM sigs, range(0, 4) tc(c)),
       |cand AS (SELECT DISTINCT l.doc_id AS doc_id_a, r.doc_id AS doc_id_b,
       |        l.sig AS sig_a, r.sig AS sig_b
       |      FROM chunked l JOIN chunked r
       |        ON l.c = r.c AND l.cv = r.cv AND l.doc_id < r.doc_id)
       |SELECT doc_id_a, doc_id_b, CAST(bit_count(xor(sig_a, sig_b)) AS INTEGER) AS hamming
       |FROM cand WHERE bit_count(xor(sig_a, sig_b)) <= $maxHamming
       |ORDER BY doc_id_a, doc_id_b""".stripMargin

  /** Mirror of TextAnalysis.rollingFingerprint: min over all k-codepoint
    * windows of the Horner poly hash mod 1e9+7 (the rolling recurrence and
    * the direct per-window Horner are the same value in [0, M)).
    */
  def fingerprintSql(text: String, k: Int): String = {
    def poly(s: String) =
      s"""list_reduce(list_transform(string_split($s, ''),
         |  c -> CAST(unicode(c) AS BIGINT)),
         |  (a, b) -> (a * ${graft.operators.TextAnalysis.FingerprintBase}
         |             + b) % ${graft.operators.TextAnalysis.FingerprintMod})""".stripMargin
        .replace("\n", "")
    s"""CAST(CASE WHEN $text IS NULL OR $text = '' THEN 0
       | WHEN length($text) <= $k THEN ${poly(text)}
       | ELSE list_min(list_transform(range(1, length($text) - $k + 2),
       |        j -> ${poly(s"substring($text, j, $k)")})) END AS BIGINT)""".stripMargin
      .replace("\n", "")
  }

  /** Mirror of Similarity.planeCoeff as a SQL scalar in terms of a 1-based
    * element index expression `i` (Spark's dim index d = i - 1). */
  private def planeCoeffSql(p: Int): String =
    s"""((CAST('0x' || substr(md5('plane$p#' || CAST(i - 1 AS VARCHAR)), 1, 15) AS BIGINT)
       | % 1000000) / 1000000.0 - 0.5)""".stripMargin.replace("\n", "")

  /** Mirror of Similarity.srpBucket: nBits sign-of-projection bits. */
  def srpBucketSql(e: String, nBits: Int): String = {
    val bits = (0 until nBits).map { p =>
      val proj = s"list_sum(list_transform($e, (x, i) -> x::DOUBLE * ${planeCoeffSql(p)}))"
      s"(CASE WHEN $proj > 0 THEN ${1L << p} ELSE 0 END)"
    }
    s"CAST(${bits.mkString(" + ")} AS BIGINT)"
  }

  /** q_ann_lsh mirror: SRP buckets + 1-bit-flip multi-probe + per-bucket
    * cosine top-k. */
  def annLshSql(k: Int, querySel: String, nBits: Int): String =
    s"""WITH cb AS (SELECT vec_id, embedding, ${srpBucketSql("embedding", nBits)} AS bucket
       |      FROM embeddings),
       |qb AS (SELECT vec_id AS query_id, embedding AS emb_q,
       |        ${srpBucketSql("embedding", nBits)} AS qbucket
       |      FROM embeddings WHERE $querySel),
       |probes AS (SELECT query_id, emb_q,
       |        CASE WHEN f = -1 THEN qbucket
       |             ELSE xor(qbucket, (1::BIGINT << f)) END AS bucket
       |      FROM qb, range(-1, $nBits) tf(f)),
       |scored AS (SELECT p.query_id, c.vec_id,
       |        ${detRoundSql(cosineSql("p.emb_q", "c.embedding"), 4)} AS cos
       |      FROM cb c JOIN probes p ON c.bucket = p.bucket AND p.query_id <> c.vec_id),
       |r AS (SELECT query_id, vec_id, cos,
       |        row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, vec_id) AS rank
       |      FROM scored)
       |SELECT query_id, rank, vec_id, cos FROM r WHERE rank <= $k
       |ORDER BY query_id, rank""".stripMargin

  /** q_cosine_neardup_lsh mirror: same-bucket pairs with exact cosine. */
  def lshNearDupSql(threshold: Double, nBits: Int): String =
    s"""WITH b AS (SELECT vec_id, embedding, ${srpBucketSql("embedding", nBits)} AS bucket
       |      FROM embeddings)
       |SELECT vec_id_a, vec_id_b, cos FROM (
       |  SELECT a.vec_id AS vec_id_a, b2.vec_id AS vec_id_b,
       |    ${detRoundSql(cosineSql("a.embedding", "b2.embedding"), 4)} AS cos
       |  FROM b a JOIN b b2 ON a.bucket = b2.bucket AND a.vec_id < b2.vec_id)
       |WHERE cos >= $threshold ORDER BY vec_id_a, vec_id_b""".stripMargin

  /** q_ann_ivf mirror: deterministic centroid sample → nearest-centroid cell
    * assignment → nprobe nearest cells per query → in-cell cosine top-k. */
  def annIvfSql(k: Int, querySel: String, centroidEvery: Int, nprobe: Int): String =
    s"""WITH c0 AS (SELECT vec_id AS cent_id, embedding AS emb_cent
       |      FROM embeddings WHERE vec_id % $centroidEvery = 0),
       |assign AS (SELECT vec_id, emb_c, cell FROM (
       |      SELECT e.vec_id, e.embedding AS emb_c, c0.cent_id AS cell,
       |        row_number() OVER (PARTITION BY e.vec_id
       |          ORDER BY ${detRoundSql(cosineSql("e.embedding", "c0.emb_cent"), 4)} DESC,
       |                   c0.cent_id) AS rn
       |      FROM embeddings e, c0) WHERE rn = 1),
       |probes AS (SELECT query_id, emb_q, cell FROM (
       |      SELECT q.vec_id AS query_id, q.embedding AS emb_q, c0.cent_id AS cell,
       |        row_number() OVER (PARTITION BY q.vec_id
       |          ORDER BY ${detRoundSql(cosineSql("q.embedding", "c0.emb_cent"), 4)} DESC,
       |                   c0.cent_id) AS rn
       |      FROM (SELECT * FROM embeddings WHERE $querySel) q, c0) WHERE rn <= $nprobe),
       |scored AS (SELECT p.query_id, a.vec_id,
       |        ${detRoundSql(cosineSql("p.emb_q", "a.emb_c"), 4)} AS cos
       |      FROM assign a JOIN probes p ON a.cell = p.cell AND p.query_id <> a.vec_id),
       |r AS (SELECT query_id, vec_id, cos,
       |        row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, vec_id) AS rank
       |      FROM scored)
       |SELECT query_id, rank, vec_id, cos FROM r WHERE rank <= $k
       |ORDER BY query_id, rank""".stripMargin

  /** q_kmeans_step mirror: nearest-centroid assignment (annIvfSql's assign
    * CTE) + the quantize-before-sum per-cell mean (q_embed_centroid's
    * recipe; embedding dim fixed at 64 per TESTDATA.md). */
  def kmeansStepSql(centroidEvery: Int): String =
    s"""WITH c0 AS (SELECT vec_id AS cent_id, embedding AS emb_cent
       |      FROM embeddings WHERE vec_id % $centroidEvery = 0),
       |assign AS (SELECT vec_id, emb_c, cell FROM (
       |      SELECT e.vec_id, e.embedding AS emb_c, c0.cent_id AS cell,
       |        row_number() OVER (PARTITION BY e.vec_id
       |          ORDER BY ${detRoundSql(cosineSql("e.embedding", "c0.emb_cent"), 4)} DESC,
       |                   c0.cent_id) AS rn
       |      FROM embeddings e, c0) WHERE rn = 1),
       |x AS (SELECT cell, i AS pos,
       |        CAST(floor(emb_c[i]::DOUBLE * 1000000.0 + 0.5) AS BIGINT) AS q
       |      FROM assign, range(1, 65) t(i)),
       |p AS (SELECT cell, pos, CAST(sum(q) AS BIGINT) AS s, count(*) AS n
       |      FROM x GROUP BY 1, 2)
       |SELECT cell, CAST(pos - 1 AS BIGINT) AS pos,
       | ${detRoundSql("s / 1000000.0 / n", 6)} AS value, n AS n_vectors
       |FROM p ORDER BY cell, pos""".stripMargin

  /** q_kmeans mirror: [[kmeansStepSql]]'s assignment + quantized-mean round
    * unrolled `iters` times (the q_pagerank recipe — Similarity.kmeans in
    * tol=0 mode runs exactly `maxIter` deterministic rounds). Round ≥ 2
    * centroids are 1e-6-rounded DOUBLE lists rebuilt with
    * `list(... ORDER BY pos)`, bit-matching the engine's detRound double
    * arrays, so every later assignment cosine agrees cross-engine. */
  /** The Lloyd round CTE chain shared by [[kmeansChainSql]],
    * [[annIvfTrainedSql]] and [[ivfPqTrainedSql]]: `c0` is the seed sample
    * (rows matching `seedWhere`), round `i` produces `a_i` (assignment),
    * `p_i` (per-(cell,pos) quantized sums), `c_i` (centroid lists). */
  private def kmeansRoundsCtesSeeded(seedWhere: String, iters: Int,
                                     src: String = "embeddings"): String = {
    val mean6 = detRoundSql("s / 1000000.0 / n", 6)
    val rounds = (1 to iters).map { i =>
      val cents = s"c${i - 1}"
      s"""a$i AS (SELECT vec_id, emb_v, cell FROM (
         |      SELECT e.vec_id, e.embedding AS emb_v, c.cell,
         |        row_number() OVER (PARTITION BY e.vec_id
         |          ORDER BY ${detRoundSql(cosineSql("e.embedding", "c.emb_cent"), 4)} DESC,
         |                   c.cell) AS rn
         |      FROM $src e, $cents c) WHERE rn = 1),
         |x$i AS (SELECT cell, i AS pos,
         |        CAST(floor(emb_v[i]::DOUBLE * 1000000.0 + 0.5) AS BIGINT) AS q
         |      FROM a$i, range(1, 65) t(i)),
         |p$i AS (SELECT cell, pos, CAST(sum(q) AS BIGINT) AS s, count(*) AS n
         |      FROM x$i GROUP BY 1, 2),
         |c$i AS (SELECT cell, list($mean6 ORDER BY pos) AS emb_cent, max(n) AS n
         |      FROM p$i GROUP BY cell)""".stripMargin
    }.mkString(",\n")
    s"""c0 AS (SELECT vec_id AS cell, embedding AS emb_cent
       |      FROM $src WHERE $seedWhere),
       |$rounds""".stripMargin
  }

  private def kmeansRoundsCtes(centroidEvery: Int, iters: Int): String =
    kmeansRoundsCtesSeeded(s"vec_id % $centroidEvery = 0", iters)

  def kmeansChainSql(centroidEvery: Int, iters: Int): String = {
    val mean6 = detRoundSql("s / 1000000.0 / n", 6)
    s"""WITH ${kmeansRoundsCtes(centroidEvery, iters)}
       |SELECT cell, CAST(pos - 1 AS BIGINT) AS pos,
       | $mean6 AS value, n AS n_vectors
       |FROM p$iters ORDER BY cell, pos""".stripMargin
  }

  /** q_ann_ivf_trained mirror: [[annIvfSql]]'s assign/probe/search against
    * the round-`iters` TRAINED centroids from [[kmeansRoundsCtes]] instead
    * of the seed sample. */
  def annIvfTrainedSql(k: Int, querySel: String, centroidEvery: Int,
                       iters: Int, nprobe: Int): String =
    annIvfSeededSql(k, querySel, s"vec_id % $centroidEvery = 0", iters, nprobe)

  /** q_ann_ivf_fixedk mirror: the same trained-IVF search but seeded
    * `vec_id < kCoarse` — Similarity.kmeansFixedK's seed predicate — so K
    * stays CONSTANT as the corpus grows (the linear production
    * parameterization, vs annIvfTrainedSql's K = N/centroidEvery). */
  def annIvfFixedKSql(k: Int, querySel: String, kCoarse: Int,
                      iters: Int, nprobe: Int): String =
    annIvfSeededSql(k, querySel, s"vec_id < $kCoarse", iters, nprobe)

  private def annIvfSeededSql(k: Int, querySel: String, seedWhere: String,
                              iters: Int, nprobe: Int): String =
    s"""WITH ${kmeansRoundsCtesSeeded(seedWhere, iters)},
       |cents AS (SELECT cell AS cent_id, emb_cent FROM c$iters),
       |assign AS (SELECT vec_id, emb_c, cell FROM (
       |      SELECT e.vec_id, e.embedding AS emb_c, c.cent_id AS cell,
       |        row_number() OVER (PARTITION BY e.vec_id
       |          ORDER BY ${detRoundSql(cosineSql("e.embedding", "c.emb_cent"), 4)} DESC,
       |                   c.cent_id) AS rn
       |      FROM embeddings e, cents c) WHERE rn = 1),
       |probes AS (SELECT query_id, emb_q, cell FROM (
       |      SELECT q.vec_id AS query_id, q.embedding AS emb_q, c.cent_id AS cell,
       |        row_number() OVER (PARTITION BY q.vec_id
       |          ORDER BY ${detRoundSql(cosineSql("q.embedding", "c.emb_cent"), 4)} DESC,
       |                   c.cent_id) AS rn
       |      FROM (SELECT * FROM embeddings WHERE $querySel) q, cents c) WHERE rn <= $nprobe),
       |scored AS (SELECT p.query_id, a.vec_id,
       |        ${detRoundSql(cosineSql("p.emb_q", "a.emb_c"), 4)} AS cos
       |      FROM assign a JOIN probes p ON a.cell = p.cell AND p.query_id <> a.vec_id),
       |r AS (SELECT query_id, vec_id, cos,
       |        row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, vec_id) AS rank
       |      FROM scored)
       |SELECT query_id, rank, vec_id, cos FROM r WHERE rank <= $k
       |ORDER BY query_id, rank""".stripMargin

  /** q_hits mirror: Graph.hits unrolled `iters` rounds over the directed
    * orders bipartite graph (src = custkey, dst = orderkey + 2^40 — the
    * q_pagerank_dangling offset). Each half-step: quantized contribution
    * sum, max-scaled quantized L2 norm, detRound(10) — expression shapes
    * byte-matched to the engine's so every round composes exactly. */
  def hitsChainSql(iters: Int): String = {
    val q = "1000000000000.0"   // contribution quantScale 1e12
    val nq = "1000000000.0"     // norm quantScale 1e9
    def half(prev: String, outPfx: String, joinKey: String, outKey: String,
             vIn: String, vOut: String, r: Int): String =
      s"""${outPfx}r$r AS MATERIALIZED (SELECT e.$outKey AS node,
         |        CAST(sum(CAST(floor($vIn * $q + 0.5) AS BIGINT)) AS BIGINT) AS sq
         |      FROM e JOIN $prev p ON e.$joinKey = p.node GROUP BY 1),
         |${outPfx}v$r AS MATERIALIZED (SELECT node, sq / $q AS $vOut FROM ${outPfx}r$r),
         |${outPfx}m$r AS MATERIALIZED (SELECT max(abs($vOut)) AS m FROM ${outPfx}v$r),
         |${outPfx}n$r AS MATERIALIZED (SELECT CAST(sum(CAST(floor(($vOut / m) * ($vOut / m) * $nq
         |          + 0.5) AS BIGINT)) AS BIGINT) AS ssq, max(m) AS m
         |      FROM ${outPfx}v$r, ${outPfx}m$r),
         |$outPfx$r AS MATERIALIZED (SELECT node,
         |        ${detRoundSql(s"$vOut / (m * sqrt(ssq / $nq))", 10)} AS $vOut
         |      FROM ${outPfx}v$r, ${outPfx}n$r)""".stripMargin
    val rounds = (1 to iters).map { r =>
      half(s"h${r - 1}", "a", "src", "dst", "h", "a", r) + ",\n" +
        half(s"a$r", "h", "dst", "src", "a", "h", r)
    }.mkString(",\n")
    s"""WITH e AS MATERIALIZED (SELECT DISTINCT CAST(o_custkey AS BIGINT) AS src,
       |        CAST(o_orderkey AS BIGINT) + 1099511627776 AS dst FROM orders),
       |h0 AS MATERIALIZED (SELECT DISTINCT src AS node, 1.0 AS h FROM e),
       |$rounds
       |SELECT node, 'hub' AS kind, h AS score FROM h$iters
       |UNION ALL SELECT node, 'auth' AS kind, a AS score FROM a$iters
       |ORDER BY kind, node""".stripMargin
  }

  /** q_semantic_dedup mirror: the IVF/k-means cell assignment (annIvfSql's
    * assign CTE) + intra-cell lower-id-wins near-dup marking. */
  def semanticDedupSql(centroidEvery: Int, threshold: Double): String =
    s"""WITH c0 AS (SELECT vec_id AS cent_id, embedding AS emb_cent
       |      FROM embeddings WHERE vec_id % $centroidEvery = 0),
       |assign AS (SELECT vec_id, emb_c, cell FROM (
       |      SELECT e.vec_id, e.embedding AS emb_c, c0.cent_id AS cell,
       |        row_number() OVER (PARTITION BY e.vec_id
       |          ORDER BY ${detRoundSql(cosineSql("e.embedding", "c0.emb_cent"), 4)} DESC,
       |                   c0.cent_id) AS rn
       |      FROM embeddings e, c0) WHERE rn = 1),
       |dups AS (SELECT DISTINCT b.vec_id
       |      FROM assign a JOIN assign b ON a.cell = b.cell AND a.vec_id < b.vec_id
       |      WHERE ${detRoundSql(cosineSql("a.emb_c", "b.emb_c"), 4)} >= $threshold)
       |SELECT s.vec_id, s.cell, (d.vec_id IS NULL) AS keep
       |FROM assign s LEFT JOIN dups d ON s.vec_id = d.vec_id
       |ORDER BY s.vec_id""".stripMargin

  /** q_pq_code mirror: per-subvector nearest-codebook-entry under squared
    * L2 (x·x + c·c − 2·x·c, the same three sequential-fold dots). */
  def pqCodeSql(m: Int, dim: Int, centroidEvery: Int): String = {
    val subDim = dim / m
    val subVals = (0 until m).map(s => s"($s)").mkString(", ")
    def sl(e: String) = s"$e[(sub * $subDim + 1):(sub * $subDim + $subDim)]"
    val dist = s"${dotSql("xs", "xs")} + ${dotSql("cs", "cs")} - 2.0 * ${dotSql("xs", "cs")}"
    s"""WITH subs AS (SELECT CAST(sub AS BIGINT) AS sub FROM (VALUES $subVals) t(sub)),
       |xs AS (SELECT vec_id, sub, ${sl("embedding")} AS xs FROM embeddings, subs),
       |cb AS (SELECT vec_id AS cent_id, sub, ${sl("embedding")} AS cs
       |       FROM embeddings, subs WHERE vec_id % $centroidEvery = 0),
       |d AS (SELECT vec_id, x.sub AS sub, cent_id,
       |        ${detRoundSql(dist, 4)} AS dist
       |      FROM xs x JOIN cb c ON x.sub = c.sub),
       |r AS (SELECT vec_id, sub, cent_id, dist,
       |        row_number() OVER (PARTITION BY vec_id, sub
       |                           ORDER BY dist, cent_id) AS rn FROM d)
       |SELECT vec_id, sub, cent_id AS code, dist FROM r WHERE rn = 1
       |ORDER BY vec_id, sub""".stripMargin
  }

  /** q_pca_power mirror: v' = Σ (x·v)·x with the plane-0 md5 direction and
    * quantize-before-sum accumulation (labelCentroids' recipe). */
  def powerStepSql(quantScale: String = "1000000.0"): String = {
    val proj = s"list_sum(list_transform(embedding, (x, i) -> x::DOUBLE * ${planeCoeffSql(0)}))"
    s"""WITH s AS (SELECT vec_id, embedding, $proj AS s FROM embeddings),
       |x AS (SELECT i - 1 AS pos,
       |        CAST(floor(s * (embedding[i]::DOUBLE) * $quantScale + 0.5) AS BIGINT) AS q
       |      FROM s, range(1, 65) t(i))
       |SELECT CAST(pos AS BIGINT) AS pos,
       | ${detRoundSql(s"CAST(sum(q) AS BIGINT) / $quantScale", 6)} AS value,
       | count(*) AS n_vectors
       |FROM x GROUP BY pos ORDER BY pos""".stripMargin
  }

  /** CTE chain `<p>_u … <p>_est` computing the HLL estimate of the distinct
    * items produced by `itemsSql` (one column). Mirror of
    * Sketches.hllDistinct's register/estimate arithmetic. */
  def hllEstChainSql(p: String, itemsSql: String): String =
    s"""${p}_u AS (SELECT DISTINCT it FROM ($itemsSql) ${p}_t(it) WHERE it IS NOT NULL),
       |${p}_r AS (SELECT h % 64 AS bucket,
       |    CASE WHEN h // 64 = 0 THEN 55 ELSE 55 - length(bin(h // 64)) END AS rho
       |  FROM (SELECT ${hash60Sql("it")} AS h FROM ${p}_u)),
       |${p}_regs AS (SELECT bucket, max(rho) AS m FROM ${p}_r GROUP BY 1),
       |${p}_sm AS (SELECT count(*) AS npres,
       |    CAST(sum(1::BIGINT << (55 - m)) AS BIGINT) AS sp FROM ${p}_regs),
       |${p}_sv AS (SELECT sp + (64 - npres) * (1::BIGINT << 55) AS s FROM ${p}_sm),
       |${p}_est AS (SELECT ${detRoundSql(
         "0.7213 / (1.0 + 1.079 / 64.0) * 4096.0 * 36028797018963968.0 / CAST(s AS DOUBLE)", 2)} AS est
       |  FROM ${p}_sv)""".stripMargin

  /** q_ann_topk mirror (brute-force cosine top-k). */
  def annTopKSql(k: Int, querySel: String): String =
    s"""WITH q AS (SELECT vec_id AS query_id, embedding AS emb_q FROM embeddings WHERE $querySel),
       |scored AS (SELECT q.query_id, e.vec_id,
       |    ${detRoundSql(cosineSql("q.emb_q", "e.embedding"), 4)} AS cos
       |  FROM embeddings e JOIN q ON q.query_id <> e.vec_id),
       |r AS (SELECT query_id, vec_id, cos,
       |    row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, vec_id) AS rank
       |  FROM scored)
       |SELECT query_id, rank, vec_id, cos FROM r WHERE rank <= $k
       |ORDER BY query_id, rank""".stripMargin

  /** q_ann_ivfpq mirror: IVF cell pruning (annIvfSql's assign/probes) + PQ
    * asymmetric-distance scoring (pqCodeSql's code assignment + a per-query
    * ADC table), 1e-4-integer distance sums, rank by ascending approx L2². */
  def ivfPqSql(k: Int, querySel: String, m: Int, dim: Int,
               centroidEvery: Int, nprobe: Int): String = {
    val subDim = dim / m
    val subVals = (0 until m).map(s => s"($s)").mkString(", ")
    def sl(e: String) = s"$e[(sub * $subDim + 1):(sub * $subDim + $subDim)]"
    val dist = s"${dotSql("xs", "xs")} + ${dotSql("cs", "cs")} - 2.0 * ${dotSql("xs", "cs")}"
    val adcDist =
      s"${dotSql("qs2.qs", "qs2.qs")} + ${dotSql("c.cs", "c.cs")} - 2.0 * ${dotSql("qs2.qs", "c.cs")}"
    s"""WITH subs AS (SELECT CAST(sub AS BIGINT) AS sub FROM (VALUES $subVals) t(sub)),
       |c0 AS (SELECT vec_id AS cent_id, embedding AS emb_cent
       |      FROM embeddings WHERE vec_id % $centroidEvery = 0),
       |assign AS (SELECT vec_id, cell FROM (
       |      SELECT e.vec_id, c0.cent_id AS cell,
       |        row_number() OVER (PARTITION BY e.vec_id
       |          ORDER BY ${detRoundSql(cosineSql("e.embedding", "c0.emb_cent"), 4)} DESC,
       |                   c0.cent_id) AS rn
       |      FROM embeddings e, c0) WHERE rn = 1),
       |xs AS (SELECT vec_id, sub, ${sl("embedding")} AS xs FROM embeddings, subs),
       |cb AS (SELECT vec_id AS cent_id, sub, ${sl("embedding")} AS cs
       |       FROM embeddings, subs WHERE vec_id % $centroidEvery = 0),
       |codes AS (SELECT vec_id, sub, cent_id AS code FROM (
       |      SELECT x.vec_id, x.sub, c.cent_id,
       |        row_number() OVER (PARTITION BY x.vec_id, x.sub
       |          ORDER BY ${detRoundSql(dist, 4)}, c.cent_id) AS rn
       |      FROM xs x JOIN cb c ON x.sub = c.sub) WHERE rn = 1),
       |q AS (SELECT vec_id AS query_id, embedding AS emb_q
       |      FROM embeddings WHERE $querySel),
       |probes AS (SELECT query_id, cell FROM (
       |      SELECT q.query_id, c0.cent_id AS cell,
       |        row_number() OVER (PARTITION BY q.query_id
       |          ORDER BY ${detRoundSql(cosineSql("q.emb_q", "c0.emb_cent"), 4)} DESC,
       |                   c0.cent_id) AS rn
       |      FROM q, c0) WHERE rn <= $nprobe),
       |qsub AS (SELECT query_id, sub, ${sl("emb_q")} AS qs FROM q, subs),
       |adc AS (SELECT query_id, qs2.sub, cent_id AS code,
       |        ${detRoundSql(adcDist, 4)} AS d
       |      FROM qsub qs2 JOIN cb c ON qs2.sub = c.sub),
       |cand AS (SELECT p.query_id, a.vec_id FROM assign a
       |      JOIN probes p ON a.cell = p.cell AND p.query_id <> a.vec_id),
       |sc AS (SELECT cand.query_id, cand.vec_id,
       |        CAST(sum(CAST(floor(d * 10000.0 + 0.5) AS BIGINT)) AS BIGINT) AS ds
       |      FROM cand JOIN codes ON cand.vec_id = codes.vec_id
       |      JOIN adc ON adc.query_id = cand.query_id
       |        AND adc.sub = codes.sub AND adc.code = codes.code
       |      GROUP BY 1, 2),
       |r AS (SELECT query_id, vec_id, ds,
       |        row_number() OVER (PARTITION BY query_id ORDER BY ds, vec_id) AS rank
       |      FROM sc)
       |SELECT query_id, rank, vec_id, CAST(ds AS DOUBLE) / 10000.0 AS approx_l2
       |FROM r WHERE rank <= $k ORDER BY query_id, rank""".stripMargin
  }

  /** q_ann_ivfpq_trained mirror (VERDICT r9 #5): the coarse quantizer is
    * the fixed-K Lloyd chain ([[kmeansRoundsCtesSeeded]] with `vec_id <
    * kCoarse` seeds) and the PQ codebook is a per-subspace Lloyd chain with
    * `vec_id < kPq` seeds — both constant-size, mirroring
    * Similarity.ivfPqTopKTrained's linear index build. Search is ivfPqSql's
    * ADC shape against the trained tables. */
  def ivfPqTrainedSql(k: Int, querySel: String, m: Int, dim: Int,
                      kCoarse: Int, coarseIters: Int,
                      kPq: Int, pqIters: Int, nprobe: Int): String =
    s"""${ivfPqTrainedChainSql(querySel, m, dim, kCoarse, coarseIters, kPq, pqIters, nprobe)}
       |SELECT query_id, rank, vec_id, CAST(ds AS DOUBLE) / 10000.0 AS approx_l2
       |FROM r WHERE rank <= $k ORDER BY query_id, rank""".stripMargin

  /** q_stream_ann_refresh mirror: the [[ivfPqTrainedSql]] chain with the
    * quantizers trained on the `trainSel` base only, while cells, codes
    * and search cover EVERY vector — exactly what
    * `writeIvfPqIndex(base) + appendToIvfPqIndex(delta)` materializes
    * (delta vectors are assigned by the STORED quantizers, which is the
    * same function the one-shot assign applies). */
  def ivfPqRefreshSql(k: Int, querySel: String, trainSel: String,
                      m: Int, dim: Int, kCoarse: Int, coarseIters: Int,
                      kPq: Int, pqIters: Int, nprobe: Int): String =
    s"""${ivfPqTrainedChainSql(querySel, m, dim, kCoarse, coarseIters, kPq, pqIters, nprobe, trainSel)}
       |SELECT query_id, rank, vec_id, CAST(ds AS DOUBLE) / 10000.0 AS approx_l2
       |FROM r WHERE rank <= $k ORDER BY query_id, rank""".stripMargin

  /** q_ann_ivfpq_rerank mirror (IVFADC+R): [[ivfPqTrainedChainSql]]'s ADC
    * ranking truncated to the `shortlist`, full vectors re-fetched for the
    * shortlist only, exact L2² with the engine's IEEE op order
    * (q·q + v·v − 2·q·v, detRound 4, 1e-4-integer ordering). */
  def ivfPqRerankSql(k: Int, shortlist: Int, querySel: String, m: Int, dim: Int,
                     kCoarse: Int, coarseIters: Int,
                     kPq: Int, pqIters: Int, nprobe: Int): String = {
    val exDist =
      s"${dotSql("q.emb_q", "q.emb_q")} + ${dotSql("e.embedding", "e.embedding")}" +
        s" - 2.0 * ${dotSql("q.emb_q", "e.embedding")}"
    s"""${ivfPqTrainedChainSql(querySel, m, dim, kCoarse, coarseIters, kPq, pqIters, nprobe)},
       |short AS (SELECT query_id, vec_id FROM r WHERE rank <= $shortlist),
       |ex AS (SELECT s.query_id, s.vec_id,
       |        CAST(floor(${detRoundSql(exDist, 4)} * 10000.0 + 0.5) AS BIGINT) AS ds
       |      FROM short s JOIN embeddings e ON e.vec_id = s.vec_id
       |      JOIN q ON q.query_id = s.query_id),
       |rr AS (SELECT query_id, vec_id, ds,
       |        row_number() OVER (PARTITION BY query_id ORDER BY ds, vec_id) AS rank
       |      FROM ex)
       |SELECT query_id, rank, vec_id, CAST(ds AS DOUBLE) / 10000.0 AS exact_l2
       |FROM rr WHERE rank <= $k ORDER BY query_id, rank""".stripMargin
  }

  /** The shared trained-IVF-PQ chain: WITH-clauses through `r` (every ADC
    * candidate ranked per query by ascending quantized approximate L2²).
    * `trainSel` (default: whole table) restricts the TRAINING corpus —
    * coarse Lloyd rounds, PQ Lloyd rounds and both seed samples — while
    * cell assignment, code assignment and search still cover every vector:
    * the build-on-base / add-deltas-by-stored-quantizers lifecycle of
    * [[graft.operators.Similarity.appendToIvfPqIndex]]. With the default
    * the emitted SQL is byte-identical to the pre-`trainSel` form. */
  private def ivfPqTrainedChainSql(querySel: String, m: Int, dim: Int,
                                   kCoarse: Int, coarseIters: Int,
                                   kPq: Int, pqIters: Int, nprobe: Int,
                                   trainSel: String = ""): String = {
    val subDim = dim / m
    val subVals = (0 until m).map(s => s"($s)").mkString(", ")
    def sl(e: String) = s"$e[(sub * $subDim + 1):(sub * $subDim + $subDim)]"
    val mean6 = detRoundSql("s / 1000000.0 / n", 6)
    val dist = s"${dotSql("x.xs", "x.xs")} + ${dotSql("c.cs", "c.cs")} - 2.0 * ${dotSql("x.xs", "c.cs")}"
    val adcDist =
      s"${dotSql("qs2.qs", "qs2.qs")} + ${dotSql("c.cs", "c.cs")} - 2.0 * ${dotSql("qs2.qs", "c.cs")}"
    val split = trainSel.nonEmpty
    val trainTbl = if (split) "etrain" else "embeddings"
    val xsTrain = if (split) "xst" else "xs"
    val pqRounds = (1 to pqIters).map { i =>
      val prev = s"cb${i - 1}"
      s"""pa$i AS (SELECT vec_id, sub, xs, cell FROM (
         |      SELECT x.vec_id, x.sub, x.xs, c.cent_id AS cell,
         |        row_number() OVER (PARTITION BY x.vec_id, x.sub
         |          ORDER BY ${detRoundSql(dist, 4)}, c.cent_id) AS rn
         |      FROM $xsTrain x JOIN $prev c ON x.sub = c.sub) WHERE rn = 1),
         |px$i AS (SELECT cell, sub, i AS pos,
         |        CAST(floor(xs[i]::DOUBLE * 1000000.0 + 0.5) AS BIGINT) AS q
         |      FROM pa$i, range(1, ${subDim + 1}) t(i)),
         |pp$i AS (SELECT cell, sub, pos, CAST(sum(q) AS BIGINT) AS s, count(*) AS n
         |      FROM px$i GROUP BY 1, 2, 3),
         |cb$i AS (SELECT cell AS cent_id, sub, list($mean6 ORDER BY pos) AS cs
         |      FROM pp$i GROUP BY cell, sub)""".stripMargin
    }.mkString(",\n")
    val cbFinal = s"cb$pqIters"
    val etrainCte =
      if (split) s"etrain AS (SELECT * FROM embeddings WHERE $trainSel),\n" else ""
    val xstCte =
      if (split) s",\nxst AS (SELECT vec_id, sub, ${sl("embedding")} AS xs FROM etrain, subs)"
      else ""
    s"""WITH $etrainCte${kmeansRoundsCtesSeeded(s"vec_id < $kCoarse", coarseIters, trainTbl)},
       |cents AS (SELECT cell AS cent_id, emb_cent FROM c$coarseIters),
       |assign AS (SELECT vec_id, cell FROM (
       |      SELECT e.vec_id, c.cent_id AS cell,
       |        row_number() OVER (PARTITION BY e.vec_id
       |          ORDER BY ${detRoundSql(cosineSql("e.embedding", "c.emb_cent"), 4)} DESC,
       |                   c.cent_id) AS rn
       |      FROM embeddings e, cents c) WHERE rn = 1),
       |subs AS (SELECT CAST(sub AS BIGINT) AS sub FROM (VALUES $subVals) t(sub)),
       |xs AS (SELECT vec_id, sub, ${sl("embedding")} AS xs FROM embeddings, subs)$xstCte,
       |cb0 AS (SELECT vec_id AS cent_id, sub, ${sl("embedding")} AS cs
       |       FROM $trainTbl, subs WHERE vec_id < $kPq),
       |$pqRounds,
       |codes AS (SELECT vec_id, sub, cent_id AS code FROM (
       |      SELECT x.vec_id, x.sub, c.cent_id,
       |        row_number() OVER (PARTITION BY x.vec_id, x.sub
       |          ORDER BY ${detRoundSql(dist, 4)}, c.cent_id) AS rn
       |      FROM xs x JOIN $cbFinal c ON x.sub = c.sub) WHERE rn = 1),
       |q AS (SELECT vec_id AS query_id, embedding AS emb_q
       |      FROM embeddings WHERE $querySel),
       |probes AS (SELECT query_id, cell FROM (
       |      SELECT q.query_id, c.cent_id AS cell,
       |        row_number() OVER (PARTITION BY q.query_id
       |          ORDER BY ${detRoundSql(cosineSql("q.emb_q", "c.emb_cent"), 4)} DESC,
       |                   c.cent_id) AS rn
       |      FROM q, cents c) WHERE rn <= $nprobe),
       |qsub AS (SELECT query_id, sub, ${sl("emb_q")} AS qs FROM q, subs),
       |adc AS (SELECT query_id, qs2.sub, cent_id AS code,
       |        ${detRoundSql(adcDist, 4)} AS d
       |      FROM qsub qs2 JOIN $cbFinal c ON qs2.sub = c.sub),
       |cand AS (SELECT p.query_id, a.vec_id FROM assign a
       |      JOIN probes p ON a.cell = p.cell AND p.query_id <> a.vec_id),
       |sc AS (SELECT cand.query_id, cand.vec_id,
       |        CAST(sum(CAST(floor(d * 10000.0 + 0.5) AS BIGINT)) AS BIGINT) AS ds
       |      FROM cand JOIN codes ON cand.vec_id = codes.vec_id
       |      JOIN adc ON adc.query_id = cand.query_id
       |        AND adc.sub = codes.sub AND adc.code = codes.code
       |      GROUP BY 1, 2),
       |r AS (SELECT query_id, vec_id, ds,
       |        row_number() OVER (PARTITION BY query_id ORDER BY ds, vec_id) AS rank
       |      FROM sc)""".stripMargin
  }

  /** q_ann_ndcg mirror: graded relevance from the exact ranking, DCG over
    * the IVF list with the SAME quantized discount literals the engine
    * embeds (Similarity.ndcgDiscounts — no cross-engine log). */
  def annNdcgSql(k: Int, querySel: String, centroidEvery: Int, nprobe: Int): String = {
    val disc = graft.operators.Similarity.ndcgDiscounts(k)
    val idcg = (1 to k).map(i => (k + 1 - i).toLong * disc(i - 1)).sum
    val discVals = disc.zipWithIndex.map { case (d, i) => s"(${i + 1}, $d)" }.mkString(", ")
    s"""WITH q AS (SELECT vec_id AS query_id, embedding AS emb_q
       |      FROM embeddings WHERE $querySel),
       |x_scored AS (SELECT q.query_id, e.vec_id,
       |    ${detRoundSql(cosineSql("q.emb_q", "e.embedding"), 4)} AS cos
       |  FROM embeddings e JOIN q ON q.query_id <> e.vec_id),
       |x AS (SELECT query_id, vec_id, CAST(${k + 1} - rank AS BIGINT) AS rel FROM (
       |    SELECT query_id, vec_id,
       |      row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, vec_id) AS rank
       |    FROM x_scored) WHERE rank <= $k),
       |c0 AS (SELECT vec_id AS cent_id, embedding AS emb_cent
       |      FROM embeddings WHERE vec_id % $centroidEvery = 0),
       |assign AS (SELECT vec_id, emb_c, cell FROM (
       |      SELECT e.vec_id, e.embedding AS emb_c, c0.cent_id AS cell,
       |        row_number() OVER (PARTITION BY e.vec_id
       |          ORDER BY ${detRoundSql(cosineSql("e.embedding", "c0.emb_cent"), 4)} DESC,
       |                   c0.cent_id) AS rn
       |      FROM embeddings e, c0) WHERE rn = 1),
       |probes AS (SELECT query_id, emb_q, cell FROM (
       |      SELECT q.query_id, q.emb_q, c0.cent_id AS cell,
       |        row_number() OVER (PARTITION BY q.query_id
       |          ORDER BY ${detRoundSql(cosineSql("q.emb_q", "c0.emb_cent"), 4)} DESC,
       |                   c0.cent_id) AS rn
       |      FROM q, c0) WHERE rn <= $nprobe),
       |a_scored AS (SELECT p.query_id, a.vec_id,
       |        ${detRoundSql(cosineSql("p.emb_q", "a.emb_c"), 4)} AS cos
       |      FROM assign a JOIN probes p ON a.cell = p.cell AND p.query_id <> a.vec_id),
       |a AS (SELECT query_id, vec_id, rank FROM (
       |    SELECT query_id, vec_id,
       |      row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, vec_id) AS rank
       |    FROM a_scored) WHERE rank <= $k),
       |disc AS (SELECT CAST(rank AS BIGINT) AS rank, CAST(d AS BIGINT) AS d
       |      FROM (VALUES $discVals) t(rank, d)),
       |dcg AS (SELECT a.query_id,
       |        CAST(sum(COALESCE(x.rel, 0) * disc.d) AS BIGINT) AS qdcg
       |      FROM a JOIN disc ON a.rank = disc.rank
       |      LEFT JOIN x ON a.query_id = x.query_id AND a.vec_id = x.vec_id
       |      GROUP BY 1)
       |SELECT q.query_id,
       |  ${detRoundSql("COALESCE(dcg.qdcg, 0)::DOUBLE / 1000000000.0", 6)} AS dcg,
       |  ${detRoundSql(s"COALESCE(dcg.qdcg, 0)::DOUBLE / $idcg", 6)} AS ndcg
       |FROM q LEFT JOIN dcg ON q.query_id = dcg.query_id
       |ORDER BY q.query_id""".stripMargin
  }

  /** q_ann_mrr mirror: rank of the exact nearest neighbor (brute-force
    * rank 1) within the IVF top-k list; rr = 1/rank (one IEEE division —
    * engine-exact), 0 on a miss. Shares annRecallSql's CTE pipeline. */
  def annMrrSql(k: Int, querySel: String, centroidEvery: Int, nprobe: Int): String =
    s"""WITH q AS (SELECT vec_id AS query_id, embedding AS emb_q
       |      FROM embeddings WHERE $querySel),
       |x_scored AS (SELECT q.query_id, e.vec_id,
       |    ${detRoundSql(cosineSql("q.emb_q", "e.embedding"), 4)} AS cos
       |  FROM embeddings e JOIN q ON q.query_id <> e.vec_id),
       |x_r AS (SELECT query_id, vec_id,
       |    row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, vec_id) AS rank
       |  FROM x_scored),
       |truth AS (SELECT query_id, vec_id FROM x_r WHERE rank = 1),
       |c0 AS (SELECT vec_id AS cent_id, embedding AS emb_cent
       |      FROM embeddings WHERE vec_id % $centroidEvery = 0),
       |assign AS (SELECT vec_id, emb_c, cell FROM (
       |      SELECT e.vec_id, e.embedding AS emb_c, c0.cent_id AS cell,
       |        row_number() OVER (PARTITION BY e.vec_id
       |          ORDER BY ${detRoundSql(cosineSql("e.embedding", "c0.emb_cent"), 4)} DESC,
       |                   c0.cent_id) AS rn
       |      FROM embeddings e, c0) WHERE rn = 1),
       |probes AS (SELECT query_id, emb_q, cell FROM (
       |      SELECT q.query_id, q.emb_q, c0.cent_id AS cell,
       |        row_number() OVER (PARTITION BY q.query_id
       |          ORDER BY ${detRoundSql(cosineSql("q.emb_q", "c0.emb_cent"), 4)} DESC,
       |                   c0.cent_id) AS rn
       |      FROM q, c0) WHERE rn <= $nprobe),
       |a_scored AS (SELECT p.query_id, a.vec_id,
       |        ${detRoundSql(cosineSql("p.emb_q", "a.emb_c"), 4)} AS cos
       |      FROM assign a JOIN probes p ON a.cell = p.cell AND p.query_id <> a.vec_id),
       |a_r AS (SELECT query_id, vec_id,
       |        row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, vec_id) AS rank
       |      FROM a_scored),
       |a AS (SELECT query_id, vec_id, rank FROM a_r WHERE rank <= $k),
       |f AS (SELECT a.query_id, CAST(a.rank AS BIGINT) AS rank
       |      FROM a JOIN truth ON a.query_id = truth.query_id
       |        AND a.vec_id = truth.vec_id)
       |SELECT q.query_id,
       |  CAST(COALESCE(f.rank, 0) AS BIGINT) AS rank_of_true,
       |  CASE WHEN f.rank IS NULL THEN CAST(0 AS DOUBLE)
       |       ELSE ${detRoundSql("CAST(1 AS DOUBLE) / f.rank", 6)} END AS rr
       |FROM q LEFT JOIN f ON q.query_id = f.query_id
       |ORDER BY q.query_id""".stripMargin

  /** q_ann_recall mirror: exact top-k (annTopKSql's pipeline) ∩ IVF top-k
    * (annIvfSql's pipeline), recall@k with the constant-k denominator. */
  def annRecallSql(k: Int, querySel: String, centroidEvery: Int, nprobe: Int): String =
    s"""WITH q AS (SELECT vec_id AS query_id, embedding AS emb_q
       |      FROM embeddings WHERE $querySel),
       |x_scored AS (SELECT q.query_id, e.vec_id,
       |    ${detRoundSql(cosineSql("q.emb_q", "e.embedding"), 4)} AS cos
       |  FROM embeddings e JOIN q ON q.query_id <> e.vec_id),
       |x_r AS (SELECT query_id, vec_id,
       |    row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, vec_id) AS rank
       |  FROM x_scored),
       |x AS (SELECT query_id, vec_id FROM x_r WHERE rank <= $k),
       |c0 AS (SELECT vec_id AS cent_id, embedding AS emb_cent
       |      FROM embeddings WHERE vec_id % $centroidEvery = 0),
       |assign AS (SELECT vec_id, emb_c, cell FROM (
       |      SELECT e.vec_id, e.embedding AS emb_c, c0.cent_id AS cell,
       |        row_number() OVER (PARTITION BY e.vec_id
       |          ORDER BY ${detRoundSql(cosineSql("e.embedding", "c0.emb_cent"), 4)} DESC,
       |                   c0.cent_id) AS rn
       |      FROM embeddings e, c0) WHERE rn = 1),
       |probes AS (SELECT query_id, emb_q, cell FROM (
       |      SELECT q.query_id, q.emb_q, c0.cent_id AS cell,
       |        row_number() OVER (PARTITION BY q.query_id
       |          ORDER BY ${detRoundSql(cosineSql("q.emb_q", "c0.emb_cent"), 4)} DESC,
       |                   c0.cent_id) AS rn
       |      FROM q, c0) WHERE rn <= $nprobe),
       |a_scored AS (SELECT p.query_id, a.vec_id,
       |        ${detRoundSql(cosineSql("p.emb_q", "a.emb_c"), 4)} AS cos
       |      FROM assign a JOIN probes p ON a.cell = p.cell AND p.query_id <> a.vec_id),
       |a_r AS (SELECT query_id, vec_id,
       |        row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, vec_id) AS rank
       |      FROM a_scored),
       |a AS (SELECT query_id, vec_id FROM a_r WHERE rank <= $k),
       |na AS (SELECT query_id, CAST(count(*) AS BIGINT) AS n_approx FROM a GROUP BY 1),
       |nh AS (SELECT a.query_id, CAST(count(*) AS BIGINT) AS n_hits
       |       FROM a JOIN x ON a.query_id = x.query_id AND a.vec_id = x.vec_id
       |       GROUP BY 1)
       |SELECT q.query_id,
       |  CAST(COALESCE(na.n_approx, 0) AS BIGINT) AS n_approx,
       |  CAST(COALESCE(nh.n_hits, 0) AS BIGINT) AS n_hits,
       |  ${detRoundSql(s"COALESCE(nh.n_hits, 0)::DOUBLE / $k", 4)} AS recall
       |FROM q LEFT JOIN na ON q.query_id = na.query_id
       |       LEFT JOIN nh ON q.query_id = nh.query_id
       |ORDER BY q.query_id""".stripMargin

  // ---- CRM input CTEs (mirror graft.sources.Crm) ---------------------------

  val localidadeCte: (String, String) = "localidade" ->
    """SELECT n_nationkey AS id_localidade,
      | CASE WHEN n_nationkey = 2 THEN 'São Paulo'
      |      WHEN n_nationkey = 14 THEN '  brasília  '
      |      WHEN n_nationkey % 4 = 0 THEN '  ' || n_name
      |      WHEN n_nationkey % 4 = 1 THEN lower(n_name)
      |      WHEN n_nationkey % 4 = 3 THEN n_name || '  '
      |      ELSE n_name END AS cidade,
      | CASE WHEN n_nationkey = 2 THEN 'SP'
      |      WHEN n_nationkey = 14 THEN 'df'
      |      ELSE upper(substr(n_name, 1, 2)) END AS estado,
      | CASE WHEN n_nationkey = 2 THEN 'são paulo'
      |      WHEN n_nationkey = 24 THEN ' RIO GRANDE DO SUL '
      |      WHEN n_nationkey = 7 THEN NULL
      |      WHEN n_nationkey % 3 = 0 THEN lower(r_name)
      |      WHEN n_nationkey % 3 = 1 THEN r_name || ' '
      |      ELSE r_name END AS regiao
      |FROM nation JOIN region ON n_regionkey = r_regionkey""".stripMargin

  val categoriaClienteCte: (String, String) = "categoria_cliente" ->
    """SELECT CAST(row_number() OVER (ORDER BY c_mktsegment) AS BIGINT) AS id_categoria_cliente,
      | CASE WHEN c_mktsegment = 'BUILDING' THEN 'Clientes VIP building'
      |      WHEN c_mktsegment = 'AUTOMOBILE' THEN 'categoria  gold'
      |      WHEN c_mktsegment = 'MACHINERY' THEN ' Prata maquinas '
      |      WHEN c_mktsegment = 'HOUSEHOLD' THEN NULL
      |      ELSE c_mktsegment END AS nome_categoria_cliente,
      | c_mktsegment AS _seg
      |FROM (SELECT DISTINCT c_mktsegment FROM customer)""".stripMargin

  val clienteCte: (String, String) = "cliente" ->
    """SELECT c_custkey AS id_cliente,
      | CASE WHEN c_custkey % 5 = 0 THEN lower(c_name)
      |      WHEN c_custkey % 5 = 1 THEN '  ' || c_name || ' '
      |      WHEN c_custkey % 5 = 2 THEN 'cliente da silva ' || CAST(c_custkey AS VARCHAR)
      |      WHEN c_custkey % 5 = 3 THEN NULL
      |      ELSE c_name END AS nome_cliente,
      | CASE WHEN c_custkey % 11 = 0 THEN NULL
      |      ELSE CAST(c_custkey % 60 + 18 AS BIGINT) END AS idade,
      | CASE WHEN c_custkey % 3 = 0 THEN 'F'
      |      WHEN c_custkey % 3 = 1 THEN 'M' ELSE NULL END AS genero,
      | CASE WHEN c_custkey % 50 = 0 THEN NULL ELSE cc.id_categoria_cliente END AS id_categoria_cliente,
      | CASE WHEN c_custkey % 37 = 0 THEN NULL ELSE CAST(c_nationkey AS BIGINT) END AS id_localidade
      |FROM customer JOIN categoria_cliente cc ON c_mktsegment = cc._seg""".stripMargin

  val categoriaProdutoCte: (String, String) = "categoria_produto" ->
    """SELECT CAST(row_number() OVER (ORDER BY p_brand) AS BIGINT) AS id_categoria_produto,
      | CASE WHEN p_brand = 'Brand#11' THEN NULL
      |      WHEN p_brand LIKE 'Brand#2%' THEN lower(p_brand)
      |      WHEN p_brand LIKE 'Brand#3%' THEN '  ' || p_brand
      |      ELSE p_brand END AS nome_categoria_produto,
      | p_brand AS _brand
      |FROM (SELECT DISTINCT p_brand FROM part)""".stripMargin

  val produtoCte: (String, String) = "produto" ->
    """SELECT p_partkey AS id_produto,
      | CASE WHEN p_partkey % 7 = 0 THEN NULL
      |      WHEN p_partkey % 7 = 3 THEN upper(p_name)
      |      ELSE p_name END AS nome_produto,
      | CASE WHEN p_partkey % 41 = 0 THEN NULL ELSE cp.id_categoria_produto END AS id_categoria_produto
      |FROM part JOIN categoria_produto cp ON p_brand = cp._brand""".stripMargin

  val fornecedoresCte: (String, String) = "fornecedores" ->
    """SELECT s_suppkey AS id_fornecedor,
      | CASE WHEN s_suppkey % 6 = 0 THEN NULL
      |      WHEN s_suppkey % 6 = 1 THEN lower(s_name) || '  ltda'
      |      WHEN s_suppkey % 6 = 2 THEN ' ' || s_name || ' de  comercio'
      |      ELSE s_name END AS nome_fornecedor,
      | n_name AS pais_origem
      |FROM supplier JOIN nation ON s_nationkey = n_nationkey""".stripMargin

  val vendedorCte: (String, String) = "vendedor" ->
    """SELECT s_suppkey AS id_vendedor,
      | CASE WHEN s_suppkey % 4 = 0 THEN 'vendedor da  casa ' || CAST(s_suppkey AS VARCHAR)
      |      WHEN s_suppkey % 4 = 1 THEN NULL
      |      ELSE lower(s_name) END AS nome_vendedor
      |FROM supplier""".stripMargin

  val lojasCte: (String, String) = "lojas" ->
    """SELECT l.id_localidade AS id_loja,
      | CASE WHEN n.n_nationkey % 5 = 0 THEN 'Shopping ' || n.n_name
      |      WHEN n.n_nationkey % 5 = 1 THEN n.n_name || ' centro'
      |      WHEN n.n_nationkey % 5 = 2 THEN 'OUTLET ' || n.n_name
      |      WHEN n.n_nationkey % 5 = 3 THEN NULL
      |      ELSE 'Loja ' || n.n_name END AS nome_loja,
      | 'Gerente ' || n.n_name AS gerente_loja,
      | l.cidade, l.estado
      |FROM localidade l JOIN nation n ON l.id_localidade = n.n_nationkey""".stripMargin

  val promocoesCte: (String, String) = "promocoes" ->
    """SELECT CAST(n_nationkey + 1 AS BIGINT) AS id_promocao,
      | CASE WHEN n_nationkey = 13 THEN NULL
      |      WHEN n_nationkey % 4 = 0 THEN 'black friday ' || n_name
      |      WHEN n_nationkey % 4 = 1 THEN 'Promoção de  Natal'
      |      WHEN n_nationkey % 4 = 2 THEN 'LIQUIDAÇÃO total ' || n_name
      |      ELSE 'Oferta ' || n_name END AS nome_promocao,
      | CASE WHEN n_nationkey % 5 = 0 THEN '10%'
      |      WHEN n_nationkey % 5 = 1 THEN 'desconto de 12.5 por cento'
      |      WHEN n_nationkey % 5 = 2 THEN 'sem desconto'
      |      WHEN n_nationkey % 5 = 3 THEN NULL
      |      ELSE '25.0%' END AS tipo_desconto,
      | CASE WHEN n_nationkey % 4 = 0 THEN '2024-01-15'
      |      WHEN n_nationkey % 4 = 1 THEN '15/03/2024'
      |      WHEN n_nationkey % 4 = 2 THEN 'Data Inválida'
      |      ELSE NULL END AS data_inicio,
      | CASE WHEN n_nationkey % 3 = 0 THEN '2024-12-31'
      |      WHEN n_nationkey % 3 = 1 THEN 'N/A'
      |      ELSE '' END AS data_fim
      |FROM nation""".stripMargin

  val vendasCte: (String, String) = "vendas" ->
    """SELECT o_orderkey AS id_venda,
      | CASE WHEN o_orderkey % 10 = 5 THEN NULL
      |      WHEN o_orderkey % 10 = 8 THEN 'Data Inválida'
      |      WHEN o_orderkey % 10 = 9 THEN '2024-13-45'
      |      WHEN o_orderkey % 10 IN (6, 7) THEN strftime(o_orderdate, '%d/%m/%Y')
      |      ELSE strftime(o_orderdate, '%Y-%m-%d') END AS data_venda,
      | CASE WHEN o_orderkey % 31 = 0 THEN NULL ELSE o_custkey END AS id_cliente,
      | o_orderkey % 7 + 1 AS id_vendedor,
      | o_orderkey % 25 AS id_loja,
      | o_totalprice AS valor_total
      |FROM orders""".stripMargin

  val itemVendasCte: (String, String) = "item_vendas" ->
    """SELECT l_orderkey AS id_venda,
      | l_partkey AS id_produto,
      | CASE WHEN l_linenumber = 6 THEN 0
      |      WHEN l_linenumber = 7 THEN -2
      |      ELSE CAST(l_quantity AS INTEGER) END AS qtd_vendida,
      | CASE WHEN l_partkey % 101 = 0 THEN -l_extendedprice ELSE l_extendedprice END AS preco_venda,
      | CASE WHEN (l_orderkey + l_partkey) % 5 = 0 THEN CAST(l_partkey % 25 + 1 AS BIGINT) ELSE NULL END AS id_promocao_aplicada
      |FROM lineitem""".stripMargin

  /** All CRM CTEs in dependency order. */
  val crmCtes: Seq[(String, String)] = Seq(
    localidadeCte, categoriaClienteCte, clienteCte, categoriaProdutoCte, produtoCte,
    fornecedoresCte, vendedorCte, lojasCte, promocoesCte, vendasCte, itemVendasCte)

  // ---- DW dimension CTEs (mirror graft.operators.Dims) ---------------------

  val dimLocalidadeCte: (String, String) = "dim_localidade" -> {
    val cleaned =
      s"""SELECT id_localidade,
         | CASE WHEN ${falsySql("cidade")} THEN 'N/A' ELSE ${cleanSql("cidade")} END AS cidade,
         | CASE WHEN ${falsySql("estado")} THEN 'N/A' ELSE ${cleanSql("estado")} END AS estado,
         | regiao,
         | CASE WHEN ${falsySql("regiao")} THEN 'N/A' ELSE ${regionSql("regiao")} END AS regiao_padronizada
         |FROM (SELECT DISTINCT id_localidade, cidade, estado, regiao FROM localidade)""".stripMargin
    s"""SELECT CAST(row_number() OVER (ORDER BY id_localidade) AS BIGINT) AS sk_localidade,
       | id_localidade, cidade, estado, regiao, regiao_padronizada,
       | ${capitalSql("cidade", "estado")} AS eh_capital
       |FROM ($cleaned)""".stripMargin
  }

  val dimCategoriaClienteCte: (String, String) = "dim_categoria_cliente" ->
    s"""SELECT CAST(row_number() OVER (ORDER BY id_categoria_cliente) AS BIGINT) AS sk_categoria_cliente,
       | id_categoria_cliente, nome_categoria_cliente,
       | ${custCatSql("nome_categoria_cliente")} AS categoria_padronizada
       |FROM (SELECT id_categoria_cliente,
       |        ${cleanOrSql("nome_categoria_cliente", "Não Definido")} AS nome_categoria_cliente
       |      FROM categoria_cliente)""".stripMargin

  val dimCategoriaProdutoCte: (String, String) = "dim_categoria_produto" ->
    s"""SELECT CAST(row_number() OVER (ORDER BY id_categoria_produto) AS BIGINT) AS sk_categoria_produto,
       | id_categoria_produto, nome_categoria_produto,
       | ${prodCatSql("nome_categoria_produto")} AS categoria_padronizada
       |FROM (SELECT id_categoria_produto,
       |        ${cleanOrSql("nome_categoria_produto", "Não Definido")} AS nome_categoria_produto
       |      FROM categoria_produto)""".stripMargin

  val dimFornecedorCte: (String, String) = "dim_fornecedor" ->
    s"""SELECT CAST(row_number() OVER (ORDER BY id_fornecedor) AS BIGINT) AS sk_fornecedor,
       | id_fornecedor, nome_fornecedor,
       | ${stdNameSql("nome_fornecedor")} AS nome_padronizado,
       | CAST(NULL AS BIGINT) AS sk_localidade,
       | 'ATIVO' AS status_fornecedor
       |FROM (SELECT id_fornecedor,
       |        ${cleanOrSql("nome_fornecedor", "Fornecedor N/A")} AS nome_fornecedor
       |      FROM fornecedores)""".stripMargin

  val dimClienteCte: (String, String) = "dim_cliente" ->
    s"""SELECT CAST(row_number() OVER (ORDER BY id_cliente) AS BIGINT) AS sk_cliente,
       | id_cliente, nome_cliente,
       | ${stdNameSql("nome_cliente")} AS nome_padronizado,
       | sk_categoria_cliente, sk_localidade,
       | 'ATIVO' AS status_cliente
       |FROM (SELECT c.id_cliente,
       |        ${cleanOrSql("c.nome_cliente", "Cliente N/A")} AS nome_cliente,
       |        cc.sk_categoria_cliente, dl.sk_localidade
       |      FROM cliente c
       |      LEFT JOIN dim_categoria_cliente cc
       |        ON ${pyKeySql("c.id_categoria_cliente")} = cc.id_categoria_cliente
       |      LEFT JOIN dim_localidade dl
       |        ON ${pyKeySql("c.id_localidade")} = dl.id_localidade)""".stripMargin

  /** A1 mirror: decimal-exact sum / count (see GraftFunctions.stableAvg2). */
  val avgPriceCte: (String, String) = "avg_price" ->
    """SELECT id_produto,
      | CAST(sum(CAST(preco_venda AS DECIMAL(18,2))) AS DOUBLE) / count(preco_venda) AS preco_medio
      |FROM item_vendas GROUP BY id_produto""".stripMargin

  val dimProdutoCte: (String, String) = "dim_produto" ->
    s"""SELECT CAST(row_number() OVER (ORDER BY id_produto) AS BIGINT) AS sk_produto,
       | id_produto, nome_produto,
       | ${stdNameSql("nome_produto")} AS nome_padronizado,
       | sk_categoria_produto, preco_unitario,
       | CASE WHEN preco_unitario > 0 THEN preco_unitario * 0.7 ELSE 0.0 END AS custo_unitario,
       | CASE WHEN preco_unitario > 0
       |      THEN (preco_unitario - CASE WHEN preco_unitario > 0 THEN preco_unitario * 0.7 ELSE 0.0 END) / preco_unitario * 100
       |      ELSE 0.0 END AS margem_lucro,
       | 'ATIVO' AS status_produto
       |FROM (SELECT p.id_produto,
       |        ${cleanOrSql("p.nome_produto", "Produto N/A")} AS nome_produto,
       |        cp.sk_categoria_produto,
       |        COALESCE(a.preco_medio, 0.0) AS preco_unitario
       |      FROM produto p
       |      LEFT JOIN dim_categoria_produto cp
       |        ON ${pyKeySql("p.id_categoria_produto")} = cp.id_categoria_produto
       |      LEFT JOIN avg_price a ON p.id_produto = a.id_produto)""".stripMargin

  val dimVendedorCte: (String, String) = "dim_vendedor" ->
    s"""SELECT CAST(row_number() OVER (ORDER BY id_vendedor) AS BIGINT) AS sk_vendedor,
       | id_vendedor, nome_vendedor,
       | ${stdNameSql("nome_vendedor")} AS nome_padronizado,
       | CAST(NULL AS BIGINT) AS sk_localidade,
       | 'ATIVO' AS status_vendedor
       |FROM (SELECT id_vendedor,
       |        ${cleanOrSql("nome_vendedor", "Vendedor N/A")} AS nome_vendedor
       |      FROM vendedor)""".stripMargin

  val dimLojaCte: (String, String) = "dim_loja" -> {
    val locFirst =
      """SELECT lc, le, sk_localidade FROM (
        | SELECT lower(cidade) AS lc, lower(estado) AS le, sk_localidade,
        |   row_number() OVER (PARTITION BY lower(cidade), lower(estado) ORDER BY sk_localidade) AS rn
        | FROM dim_localidade) WHERE rn = 1""".stripMargin
    s"""SELECT CAST(row_number() OVER (ORDER BY id_loja) AS BIGINT) AS sk_loja,
       | id_loja, nome_loja,
       | ${stdNameSql("nome_loja")} AS nome_padronizado,
       | sk_localidade,
       | ${storeTypeSql("nome_loja")} AS tipo_loja,
       | 'ATIVA' AS status_loja
       |FROM (SELECT l.id_loja,
       |        ${cleanOrSql("l.nome_loja", "Loja N/A")} AS nome_loja,
       |        lf.sk_localidade
       |      FROM lojas l
       |      LEFT JOIN ($locFirst) lf
       |        ON (CASE WHEN ${falsySql("l.cidade")} OR ${falsySql("l.estado")} THEN NULL
       |             ELSE lower(trim(l.cidade)) END) = lf.lc
       |        AND lower(trim(l.estado)) = lf.le)""".stripMargin
  }

  val dimPromocaoCte: (String, String) = "dim_promocao" ->
    s"""SELECT CAST(row_number() OVER (ORDER BY id_promocao) AS BIGINT) AS sk_promocao,
       | id_promocao, nome_promocao,
       | ${promoTypeSql("nome_promocao")} AS tipo_promocao,
       | ${pctSql("tipo_desconto")} AS percentual_desconto,
       | ${sentinelToNullDateSql("data_inicio")} AS data_inicio,
       | ${sentinelToNullDateSql("data_fim")} AS data_fim,
       | 'ATIVA' AS status_promocao
       |FROM (SELECT id_promocao,
       |        ${cleanOrSql("nome_promocao", "Promoção N/A")} AS nome_promocao,
       |        tipo_desconto, data_inicio, data_fim
       |      FROM promocoes)""".stripMargin

  val dimTempoCte: (String, String) = "dim_tempo" -> {
    val dayNames = graft.functions.GraftFunctions.NomesDiaSemana.zipWithIndex
      .map { case (n, i) => s"WHEN ${i + 1} THEN '$n'" }.mkString(" ")
    val monthNames = graft.functions.GraftFunctions.NomesMes.zipWithIndex
      .map { case (n, i) => s"WHEN ${i + 1} THEN '$n'" }.mkString(" ")
    s"""SELECT CAST(row_number() OVER (ORDER BY data_completa) AS BIGINT) AS sk_tempo,
       | data_completa,
       | CAST(year(data_completa) AS BIGINT) AS ano,
       | CAST(month(data_completa) AS BIGINT) AS mes,
       | CAST(day(data_completa) AS BIGINT) AS dia,
       | CAST(quarter(data_completa) AS BIGINT) AS trimestre,
       | CAST(CASE WHEN month(data_completa) <= 6 THEN 1 ELSE 2 END AS BIGINT) AS semestre,
       | CAST(isodow(data_completa) AS BIGINT) AS dia_semana,
       | CASE isodow(data_completa) $dayNames END AS nome_dia_semana,
       | CASE month(data_completa) $monthNames END AS nome_mes,
       | isodow(data_completa) IN (6, 7) AS eh_fim_semana
       |FROM (SELECT CAST(d AS DATE) AS data_completa
       |      FROM generate_series(DATE '2020-01-01', DATE '2025-12-31', INTERVAL 1 DAY) AS t(d))""".stripMargin
  }

  /** DW CTEs in dependency order (each may reference earlier ones). */
  val dwCtes: Seq[(String, String)] = Seq(
    dimLocalidadeCte, dimCategoriaClienteCte, dimCategoriaProdutoCte, dimFornecedorCte,
    dimClienteCte, avgPriceCte, dimProdutoCte, dimVendedorCte, dimLojaCte, dimPromocaoCte,
    dimTempoCte)

  // ---- fato_vendas (mirror graft.operators.Fact.fatoVendas) ----------------

  /** The v1 fact as a bare SELECT (usable as a CTE body or a query body —
    * without the final ORDER BY). */
  val fatoVendasBody: String = {
    val qtd = "CASE WHEN iv.qtd_vendida IS NOT NULL AND iv.qtd_vendida > 0 THEN CAST(iv.qtd_vendida AS DOUBLE) ELSE 0.0 END"
    val preco = "CASE WHEN iv.preco_venda IS NOT NULL AND iv.preco_venda > 0 THEN CAST(iv.preco_venda AS DOUBLE) ELSE 0.0 END"
    s"""SELECT b.id_venda, b.id_produto, t.sk_tempo, dc.sk_cliente, dp.sk_produto,
       |  dv.sk_vendedor, dl.sk_loja,
       |  b.qtd AS quantidade_vendida,
       |  b.preco AS preco_unitario_venda,
       |  b.qtd * b.preco AS valor_total_item,
       |  CAST(0.0 AS DOUBLE) AS percentual_desconto,
       |  CAST(0.0 AS DOUBLE) AS valor_desconto,
       |  b.qtd * b.preco AS valor_final,
       |  COALESCE(dp.custo_unitario, 0.0) AS custo_unitario,
       |  b.qtd * COALESCE(dp.custo_unitario, 0.0) AS custo_total_item,
       |  b.qtd * b.preco - b.qtd * COALESCE(dp.custo_unitario, 0.0) AS lucro_bruto
       |FROM (
       |  SELECT v.id_venda, iv.id_produto, v.id_cliente, v.id_vendedor, v.id_loja,
       |    $qtd AS qtd, $preco AS preco,
       |    ${multiDateSql("v.data_venda")} AS data_obj
       |  FROM vendas v JOIN item_vendas iv ON v.id_venda = iv.id_venda
       |  WHERE ${keepRowSql("v.data_venda")}
       |) b
       |LEFT JOIN dim_tempo t ON b.data_obj = t.data_completa
       |LEFT JOIN dim_cliente dc ON ${pyKeySql("b.id_cliente")} = dc.id_cliente
       |LEFT JOIN dim_produto dp ON ${pyKeySql("b.id_produto")} = dp.id_produto
       |LEFT JOIN dim_vendedor dv ON ${pyKeySql("b.id_vendedor")} = dv.id_vendedor
       |LEFT JOIN dim_loja dl ON ${pyKeySql("b.id_loja")} = dl.id_loja""".stripMargin
  }

  /** fato_vendas v2 (mirror of Fact.fatoVendasV2 — the reference's dead-code
    * richer variant, SURVEY §3.3): no date-based row drops, qtd guard
    * defaults to 1, promo lookup (J7) + discount math (J9/F9). */
  val fatoVendasV2Body: String = {
    val qtd = "CASE WHEN iv.qtd_vendida IS NOT NULL AND iv.qtd_vendida > 0 THEN CAST(iv.qtd_vendida AS DOUBLE) ELSE 1.0 END"
    val preco = "CASE WHEN iv.preco_venda IS NOT NULL AND iv.preco_venda > 0 THEN CAST(iv.preco_venda AS DOUBLE) ELSE 0.0 END"
    s"""SELECT b.id_venda, b.id_produto, t.sk_tempo, dc.sk_cliente, dv.sk_vendedor,
       |  dl.sk_loja, dp.sk_produto, pr.sk_promocao,
       |  b.qtd AS quantidade_vendida,
       |  b.preco AS preco_unitario_venda,
       |  b.qtd * b.preco AS valor_total_item,
       |  COALESCE(dp.custo_unitario, 0.0) AS custo_unitario,
       |  b.qtd * COALESCE(dp.custo_unitario, 0.0) AS custo_total_item,
       |  b.qtd * b.preco - b.qtd * COALESCE(dp.custo_unitario, 0.0) AS lucro_bruto,
       |  b.pct AS percentual_desconto,
       |  CASE WHEN b.pct <> 0.0 THEN b.qtd * b.preco * (b.pct / 100) ELSE 0.0 END AS valor_desconto,
       |  b.qtd * b.preco
       |    - CASE WHEN b.pct <> 0.0 THEN b.qtd * b.preco * (b.pct / 100) ELSE 0.0 END AS valor_final
       |FROM (
       |  SELECT v.id_venda, iv.id_produto, v.id_cliente, v.id_vendedor, v.id_loja,
       |    iv.id_promocao_aplicada,
       |    $qtd AS qtd, $preco AS preco,
       |    ${multiDateSql("v.data_venda")} AS data_obj,
       |    COALESCE((SELECT CASE WHEN pr2.sk_promocao IS NOT NULL
       |                            AND COALESCE(pr2.percentual_desconto, 0.0) <> 0.0
       |                          THEN pr2.percentual_desconto ELSE 0.0 END
       |              FROM dim_promocao pr2
       |              WHERE ${pyKeySql("iv.id_promocao_aplicada")} = pr2.id_promocao), 0.0) AS pct
       |  FROM vendas v JOIN item_vendas iv ON v.id_venda = iv.id_venda
       |) b
       |LEFT JOIN dim_tempo t ON b.data_obj = t.data_completa
       |LEFT JOIN dim_cliente dc ON ${pyKeySql("b.id_cliente")} = dc.id_cliente
       |LEFT JOIN dim_produto dp ON ${pyKeySql("b.id_produto")} = dp.id_produto
       |LEFT JOIN dim_vendedor dv ON ${pyKeySql("b.id_vendedor")} = dv.id_vendedor
       |LEFT JOIN dim_loja dl ON ${pyKeySql("b.id_loja")} = dl.id_loja
       |LEFT JOIN dim_promocao pr ON ${pyKeySql("b.id_promocao_aplicada")} = pr.id_promocao""".stripMargin
  }

  val fatoVendasV2Select: String =
    s"""SELECT id_venda, id_produto, sk_tempo, sk_cliente, sk_vendedor, sk_loja,
       | sk_produto, sk_promocao,
       | quantidade_vendida, preco_unitario_venda, valor_total_item,
       | ${detRoundSql("custo_unitario", 4)} AS custo_unitario,
       | ${detRoundSql("custo_total_item", 4)} AS custo_total_item,
       | ${detRoundSql("lucro_bruto", 4)} AS lucro_bruto,
       | percentual_desconto,
       | ${detRoundSql("valor_desconto", 4)} AS valor_desconto,
       | ${detRoundSql("valor_final", 4)} AS valor_final
       |FROM ($fatoVendasV2Body)
       |ORDER BY id_venda, id_produto""".stripMargin

  /** q_fato_vendas body: cost-derived measures rounded (they flow from an
    * engine-ordering-dependent AVG), natural-key ordered. */
  val fatoVendasSelect: String =
    s"""SELECT id_venda, id_produto, sk_tempo, sk_cliente, sk_produto, sk_vendedor, sk_loja,
       | quantidade_vendida, preco_unitario_venda, valor_total_item,
       | percentual_desconto, valor_desconto, valor_final,
       | ${detRoundSql("custo_unitario", 4)} AS custo_unitario,
       | ${detRoundSql("custo_total_item", 4)} AS custo_total_item,
       | ${detRoundSql("lucro_bruto", 4)} AS lucro_bruto
       |FROM ($fatoVendasBody)
       |ORDER BY id_venda, id_produto""".stripMargin

  /** q_report_summary (A2/A3): per-table counts + grand total. Needs the
    * `counts` extra CTE (see [[withDw]]'s `extra` parameter). */
  val reportSummaryCtes: Seq[(String, String)] = {
    val dwNames = Seq("dim_localidade", "dim_categoria_cliente", "dim_categoria_produto",
      "dim_fornecedor", "dim_cliente", "dim_produto", "dim_vendedor", "dim_loja",
      "dim_promocao", "dim_tempo", "fato_vendas")
    val unions = dwNames.map(n => s"SELECT '$n' AS tabela, count(*) AS registros FROM $n")
      .mkString("\nUNION ALL ")
    Seq("fato_vendas" -> fatoVendasBody, "counts" -> unions)
  }

  val reportSummarySelect: String =
    """SELECT tabela, registros FROM (
      | SELECT tabela, registros FROM counts
      | UNION ALL
      | SELECT 'TOTAL' AS tabela, CAST((SELECT sum(registros) FROM counts) AS BIGINT) AS registros
      |) ORDER BY tabela""".stripMargin

  /** Compose `WITH crm..., dw..., extra... body`. */
  def withCrm(body: String, extra: Seq[(String, String)] = Nil): String = {
    val ctes = (crmCtes ++ extra).map { case (n, q) => s"$n AS ($q)" }.mkString(",\n")
    s"WITH $ctes\n$body"
  }

  def withDw(body: String, extra: Seq[(String, String)] = Nil): String = {
    val ctes = (crmCtes ++ dwCtes ++ extra).map { case (n, q) => s"$n AS ($q)" }.mkString(",\n")
    s"WITH $ctes\n$body"
  }
}
