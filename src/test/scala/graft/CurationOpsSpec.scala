package graft

import org.apache.spark.sql.functions.col
import graft.operators.{Curation, Privacy, Sampling, TextAnalysis}

/** Round-4 corpus-curation operators: PII redaction, contamination check,
  * repetition score, stratified sampling.
  */
class CurationOpsSpec extends SparkSpec {
  import spark.implicits._

  test("redactPii masks emails before numbers and counts both") {
    val df = Seq(
      (1L, "reach me at jane.doe+x@mail.example.org or 5551234"),
      (2L, "no pii here, just 123 pennies"),
      (3L, "a@b.io and 0000 and 99999")
    ).toDF("id", "t")
    val out = Privacy.redactPii(df, col("id"), col("t"))
      .orderBy(col("id")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
    assert(out(0) === ((1L, 1L, 1L, "reach me at <EMAIL> or <NUM>")))
    // 3-digit run stays; email digits are not double-counted
    assert(out(1) === ((2L, 0L, 0L, "no pii here, just 123 pennies")))
    assert(out(2) === ((3L, 1L, 2L, "<EMAIL> and <NUM> and <NUM>")))
  }

  test("shuffleShards: exhaustive per epoch, epochs reshuffle, partition-invariant") {
    val docs = (1L to 400L).map(i => (i, "x" * (i % 7 + 1).toInt)).toDF("doc_id", "text")
    def manifest(df: org.apache.spark.sql.DataFrame) =
      Curation.shuffleShards(df, "doc_id", "text", nShards = 8, epochs = 2)
        .collect()
        .map(r => ((r.getLong(0), r.getLong(1)), (r.getLong(2), r.getLong(3), r.getLong(4))))
        .toMap
    val m = manifest(docs)
    // exhaustive: each epoch's shard doc counts sum to the corpus
    Seq(0L, 1L).foreach { e =>
      assert((0L until 8L).map(s => m.get((e, s)).map(_._1).getOrElse(0L)).sum === 400L)
    }
    // reshuffle: the epochs' manifests differ (decorrelated batches)
    assert((0L until 8L).exists(s => m.get((0L, s)) !== m.get((1L, s))))
    // pure function of (id, epoch): invariant to input partitioning
    assert(manifest(docs.repartition(13)) === m)
  }

  test("pipeline contract: a curation-dropped bridge doc separates surviving clusters") {
    // pipelineManifest prunes the near-dup pair set to SURVIVORS before CC
    // (the split contract is defined on the curated corpus): with bridge
    // doc 2 dropped, 1 and 3 are singletons — their clusters, and so
    // potentially their splits, are independent.
    val survivors = Seq(1L, 3L).toDF("doc_id")
    val pairs = Seq((1L, 2L), (2L, 3L)).toDF("a", "b")
    val pruned = pairs
      .join(survivors.withColumnRenamed("doc_id", "a"), Seq("a"), "left_semi")
      .join(survivors.withColumnRenamed("doc_id", "b"), Seq("b"), "left_semi")
    assert(pruned.count() === 0)
    val out = Sampling.leakageSafeSplit(survivors, "doc_id", pruned, "a", "b", 0.8)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(out === Set((1L, 1L), (3L, 3L)), "dropped bridge must not merge 1 and 3")
  }

  test("contamination flags docs whose shingles overlap the benchmark") {
    val corpus = Seq(
      (1L, "a b c d e"),      // shares shingles with benchmark doc
      (2L, "x y z w q")       // disjoint
    ).toDF("doc_id", "text")
    val bench = Seq((100L, "a b c d")).toDF("doc_id", "text")
    val out = TextAnalysis.contamination(corpus, bench, "doc_id", "text", 0.5)
      .orderBy(col("doc_id")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getBoolean(4)))
    // doc 1: shingles {abc, bcd, cde}; bench has {abc, bcd} → 2/3 ≥ 0.5
    assert(out(0) === ((1L, 3L, 2L, true)))
    assert(out(1) === ((2L, 3L, 0L, false)))
  }

  test("contamination on a <3-word doc: whole text is the single shingle, never NaN") {
    // ShingleSet falls back to the whole text when words < n, so n_shingles
    // is ≥1 for any non-null text — the ratio denominator can't be 0 here.
    // The when(n_shingles===0, 0.0) guard covers the defensive remainder.
    val corpus = Seq((1L, "too short")).toDF("doc_id", "text")
    val bench = Seq((100L, "a b c d")).toDF("doc_id", "text")
    val r = TextAnalysis.contamination(corpus, bench, "doc_id", "text", 0.5).collect()(0)
    assert((r.getLong(1), r.getLong(2), r.getDouble(3), r.getBoolean(4))
      === ((1L, 0L, 0.0, false)))
  }

  test("kAnonymity flags quasi-identifier groups smaller than k") {
    import graft.operators.Quality
    val rows = Seq(
      ("en", "web", 1L), ("en", "web", 2L), ("en", "web", 3L), // group of 3
      ("en", "book", 4L),                                      // singleton
      ("de", "web", 5L), ("de", "web", 6L))                    // group of 2
      .toDF("lang", "source", "id")
    val r = Quality.kAnonymity(rows, Seq(col("lang"), col("source")), k = 3)
      .orderBy(col("lang"), col("source")).collect()
    val byKey = r.map(x => (x.getString(0), x.getString(1)) ->
      (x.getLong(2), x.getBoolean(4))).toMap
    assert(byKey(("en", "web")) === (3L, false))
    assert(byKey(("en", "book")) === (1L, true))
    assert(byKey(("de", "web")) === (2L, true))
    // the suppression step: rows surviving the audit keep k-anonymity
    val safe = rows.join(
      Quality.kAnonymity(rows, Seq(col("lang"), col("source")), k = 3)
        .filter(!col("at_risk")).select("lang", "source"), Seq("lang", "source"))
    assert(safe.count() === 3L)
  }

  test("lDiversity flags groups whose sensitive values collapse") {
    import graft.operators.Quality
    val rows = Seq(
      ("web", "en"), ("web", "de"), ("web", "fr"), // diverse group
      ("book", "en"), ("book", "en"), ("book", "en")) // large but uniform
      .toDF("source", "lang")
    val r = Quality.lDiversity(rows, Seq(col("source")), col("lang"), l = 2)
      .collect().map(x => x.getString(0) -> (x.getLong(2), x.getBoolean(4))).toMap
    assert(r("web") === (3L, false))
    assert(r("book") === (1L, true)) // k-anonymous at k=3 yet fully leaking
  }

  test("tCloseness: hand-computed TV distance, skewed group flagged") {
    import graft.operators.Quality
    // global: 6 en + 6 de = (1/2, 1/2).
    // 'web'/'blog' (3 en, 1 de each): p_g = (3/4, 1/4) → TV = ½(¼+¼) = 0.25
    // 'book' (4 de): p_g = (0, 1) → TV = ½(½+½) = 0.5
    val rows = Seq(
      ("web", "en"), ("web", "en"), ("web", "en"), ("web", "de"),
      ("blog", "en"), ("blog", "en"), ("blog", "en"), ("blog", "de"),
      ("book", "de"), ("book", "de"), ("book", "de"), ("book", "de"))
      .toDF("source", "lang")
    val r = Quality.tCloseness(rows, Seq(col("source")), col("lang"), t = 0.3)
      .collect().map(x => x.getString(0) -> (x.getDouble(2), x.getBoolean(4))).toMap
    assert(r("web") === (0.25, false))
    assert(r("blog") === (0.25, false))
    assert(r("book") === (0.5, true)) // uniform single-lang group leaks
  }

  test("repetitionScore measures duplicate-bigram fraction") {
    val df = Seq(
      (1L, "a b a b a b"), // bigrams: ab ba ab ba ab → 5 total, 2 distinct
      (2L, "a b c d"),     // all distinct
      (3L, "single")       // no bigrams
    ).toDF("doc_id", "text")
    val out = TextAnalysis.repetitionScore(df, "doc_id", "text")
      .orderBy(col("doc_id")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(out(0) === ((1L, 5L, 2L, 0.6)))
    assert(out(1) === ((2L, 3L, 3L, 0.0)))
    assert(out(2) === ((3L, 0L, 0L, 0.0)))
  }

  test("curationFunnel: monotone survivors, drops reconcile, final stage == curate output") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val funnel = Curation.curationFunnel(docs, "doc_id", "text", "en", 0.45, 0.5)
      .orderBy(col("stage_idx")).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
    assert(funnel.map(_._2).toSeq ===
      Seq("total", "lang_filter", "quality_gate", "dedup_keeper", "subsample"))
    // survivors never increase; each stage's drop is the adjacent difference
    funnel.sliding(2).foreach { case Array(prev, cur) =>
      assert(cur._3 <= prev._3, s"stage ${cur._2} gained rows")
      assert(cur._4 === prev._3 - cur._3, s"stage ${cur._2} drop mismatch")
    }
    assert(funnel.head._3 === docs.count())
    val curated = Curation.curate(docs, "doc_id", "text", "en", 0.45, 0.5).count()
    assert(funnel.last._3 === curated, "funnel tail must equal the pipeline output")
  }

  test("tokenBudget: allocations respect the epoch cap and track token mass") {
    // source a: ~100 tokens, source b: ~1000 tokens, budget lets a cap out
    val docs = ((1 to 10).map(i => (i.toLong, Seq.fill(10)("tok").mkString(" "), "a")) ++
      (11 to 110).map(i => (i.toLong, Seq.fill(10)("tok").mkString(" "), "b")))
      .toDF("doc_id", "text", "source")
    val out = Curation.tokenBudget(docs, "text", "source", budget = 2000L, maxEpochs = 4)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4))).toMap
    val (na, capA, allocA, epochsA) = out("a")
    val (nb, capB, allocB, epochsB) = out("b")
    assert(na === 100L && nb === 1000L)
    assert(capA === 400L && allocA <= capA && allocB <= capB)
    // proportional split: b gets 2000*1000/1100 ≈ 1818 (under its 4000 cap);
    // a's share 181 is under its 400 cap too — both uncapped here
    assert(allocB === 1818L && allocA === 181L)
    assert(epochsA === 1.81 && epochsB === 1.818)
    // shrink the budget ↑ epochs stay ≤ maxEpochs even when one source caps
    val capped = Curation.tokenBudget(docs, "text", "source", budget = 20000L, maxEpochs = 4)
      .collect().map(r => r.getString(0) -> r.getDouble(4)).toMap
    assert(capped.values.forall(_ <= 4.0))
    assert(capped("a") === 4.0, "source a should cap at maxEpochs under a huge budget")
  }

  test("stratifiedSample applies per-stratum fractions and drops unlisted strata") {
    val df = (0L until 400L).map(i => (i, if (i % 2 == 0) "en" else "zz"))
      .toDF("id", "lang")
    val out = Sampling.stratifiedSample(df, col("id"), col("lang"),
      Map("en" -> 0.5)).collect().map(r => (r.getLong(0), r.getString(1)))
    assert(out.forall(_._2 == "en"), "unlisted stratum must be dropped")
    // deterministic: exact same set on a re-run
    val again = Sampling.stratifiedSample(df, col("id"), col("lang"),
      Map("en" -> 0.5)).collect().map(r => (r.getLong(0), r.getString(1)))
    assert(out.toSet === again.toSet)
    // roughly half of the 200 en rows survive (md5 is uniform)
    assert(out.length > 60 && out.length < 140, s"got ${out.length}")
  }

  test("columnProfile: empty table still reports every column with zero counts") {
    import graft.operators.Quality
    val empty = Seq.empty[(Long, String)].toDF("id", "name")
    val out = Quality.columnProfile(empty, Seq("id", "name"))
      .orderBy(col("column_name")).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(out.toSeq === Seq(("id", 0L, 0L, 0L), ("name", 0L, 0L, 0L)))
  }

  test("columnProfile: -0.0 and 0.0 group as one distinct value; binary profiles by bytes") {
    import graft.operators.Quality
    val df = Seq(
      (1L, 0.0, Array[Byte](0x41)),
      (2L, -0.0, Array[Byte](0xC3.toByte)), // invalid UTF-8 alone
      (3L, 1.5, Array[Byte](0xC3.toByte, 0x28))) // also invalid, distinct bytes
      .toDF("id", "d", "b")
    val out = Quality.columnProfile(df, Seq("d", "b"))
      .orderBy(col("column_name")).collect()
      .map(r => (r.getString(0), r.getLong(3))).toMap
    // countDistinct semantics: signed zeros normalize together (2 distinct
    // doubles), and distinct binary payloads stay distinct even when a
    // UTF-8 string cast would mangle both to the replacement character
    assert(out("d") === 2L)
    assert(out("b") === 3L)
  }

  test("columnProfile: non-atomic columns fail fast instead of undercounting distincts") {
    import graft.operators.Quality
    // array('a, b') and array('a','b') render identically as strings, so a
    // silent profile would merge them; the API must refuse (ADVICE r9)
    val df = Seq((1L, Seq("a, b")), (2L, Seq("a", "b"))).toDF("id", "arr")
    val e = intercept[IllegalArgumentException] {
      Quality.columnProfile(df, Seq("id", "arr"))
    }
    assert(e.getMessage.contains("arr") && e.getMessage.contains("non-atomic"))
    // atomic columns on the same frame still profile fine
    val ok = Quality.columnProfile(df, Seq("id")).collect()(0)
    assert(ok.getLong(1) === 2L && ok.getLong(3) === 2L)
  }

  test("columnProfile matches the pre-reshape conditional-aggregate semantics on nulls") {
    import graft.operators.Quality
    val df = Seq(
      (1L, Option("x")), (2L, Option("x")), (3L, None), (4L, Option("y")))
      .toDF("id", "s")
    val r = Quality.columnProfile(df, Seq("s")).collect()(0)
    assert((r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4))
      === ((4L, 1L, 2L, 0.25)))
  }
}
