package graft

import org.apache.spark.sql.functions._
import graft.operators.TextAnalysis

/** Pins q_quality_train / q_quality_filter (distributed batch perceptron):
  *  1. the DataFrame training loop equals a driver-side reference fold over
  *     the collected feature table — same misclassified sets, same integer
  *     updates, same final weights;
  *  2. a zero-token document is inert for training (no feature rows → no
  *     update contribution) but present in the filter output with margin 0
  *     and keep = false;
  *  3. the consumer's margins are exactly Σ_b f_db·w_b under the trained
  *     weights, and keep ⇔ margin > 0;
  *  4. on a separable corpus the loop reaches its fixpoint (zero
  *     misclassified → weights frozen), so extra rounds change nothing.
  */
class PerceptronSpec extends SparkSpec {
  import spark.implicits._

  private val Dim = 64

  private def corpus = Seq(
    (1L, "the cat and the dog sat on a mat with a hat"),
    (2L, "de que não os um uma para com no em"),
    (3L, "el perro la casa los gatos de que y en un"),
    (4L, "the of and to in is on for with as at by"),
    (5L, ""),
    (6L, "12345 !!! ??? 678"),
    (7L, "the de el the de el the"),
    (8L, "quick brown fox jumps over lazy moon")
  ).toDF("doc_id", "text")

  /** Driver-side reference batch perceptron over collected features. */
  private def refTrain(feats: Map[Long, Seq[(Long, Long)]],
                       labels: Map[Long, Long], rounds: Int): Map[Long, Long] = {
    var w = Map.empty[Long, Long]
    for (_ <- 1 to rounds) {
      val miss = labels.filter { case (d, y) =>
        val m = feats.getOrElse(d, Seq.empty)
          .map { case (b, f) => f * w.getOrElse(b, 0L) }.sum
        y * m <= 0L
      }
      val upd = scala.collection.mutable.Map.empty[Long, Long]
      for ((d, y) <- miss; (b, f) <- feats.getOrElse(d, Seq.empty))
        upd(b) = upd.getOrElse(b, 0L) + y * f
      for ((b, dlt) <- upd) w = w.updated(b, w.getOrElse(b, 0L) + dlt)
    }
    w
  }

  private def collectedFeats(df: org.apache.spark.sql.DataFrame) =
    TextAnalysis.hashFeatures(df, "doc_id", "text", Dim).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .groupBy(_._1).map { case (d, rs) => d -> rs.map(r => (r._2, r._3)).toSeq }

  private def collectedLabels(df: org.apache.spark.sql.DataFrame) =
    TextAnalysis.qualityLabel(df, "doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("training loop == driver-side reference fold (weights exact)") {
    for (rounds <- Seq(1, 3, 5)) {
      val got = TextAnalysis.perceptronTrain(corpus, "doc_id", "text", Dim, rounds)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(got.size == Dim, "output must carry all dim buckets")
      val want = refTrain(collectedFeats(corpus), collectedLabels(corpus), rounds)
      assert(got.filter(_._2 != 0L) == want.filter(_._2 != 0L),
        s"weights diverge from reference at rounds=$rounds")
    }
  }

  test("labels: +1 iff lang-id says en, -1 otherwise (incl. unknown)") {
    val y = collectedLabels(corpus)
    assert(y(1L) == 1L && y(4L) == 1L, "stopword-heavy en docs label +1")
    assert(y(2L) == -1L && y(3L) == -1L, "pt/es docs label -1")
    assert(y(5L) == -1L && y(6L) == -1L, "empty/unknown docs label -1")
  }

  test("zero-token doc is inert for training, present in filter output") {
    val without = corpus.filter(col("doc_id") =!= 5L)
    val a = TextAnalysis.perceptronTrain(corpus, "doc_id", "text", Dim, 3).collect()
    val b = TextAnalysis.perceptronTrain(without, "doc_id", "text", Dim, 3).collect()
    assert(a.map(r => (r.getLong(0), r.getLong(1))).toSet ==
      b.map(r => (r.getLong(0), r.getLong(1))).toSet,
      "a doc with no feature rows must not move any weight")
    val scored = TextAnalysis.perceptronScore(corpus, "doc_id", "text", Dim, 3)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getBoolean(3)))).toMap
    assert(scored(5L) == ((0L, 0L, false)), "empty doc: 0 tokens, margin 0, dropped")
  }

  test("consumer margins == f·w under the trained weights; keep == margin > 0") {
    val w = TextAnalysis.perceptronTrain(corpus, "doc_id", "text", Dim, 5)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val feats = collectedFeats(corpus)
    val scored = TextAnalysis.perceptronScore(corpus, "doc_id", "text", Dim, 5)
      .collect()
    assert(scored.length == 8, "every doc is scored")
    scored.foreach { r =>
      val (d, nt, m, keep) = (r.getLong(0), r.getLong(1), r.getLong(2), r.getBoolean(3))
      val fs = feats.getOrElse(d, Seq.empty)
      assert(nt == fs.map(_._2).sum, s"token count for doc $d")
      assert(m == fs.map { case (b, f) => f * w.getOrElse(b, 0L) }.sum,
        s"margin for doc $d")
      assert(keep == (m > 0L), s"keep rule for doc $d")
    }
  }

  test("literal-array stream scorer == join-based batch scorer") {
    val w = TextAnalysis.perceptronTrainedWeights(corpus, "doc_id", "text", Dim, 5)
    def rows(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getBoolean(3))).toSet
    val viaExpr = rows(graft.streaming.EventsStream.qualityScoreStream(corpus, w, Dim))
    val viaJoin = rows(TextAnalysis.perceptronScore(corpus, "doc_id", "text", Dim, 5))
    assert(viaExpr == viaJoin,
      "per-row embedded-model margin must equal the broadcast-join margin")
  }

  test("separable corpus reaches the fixpoint: extra rounds change nothing") {
    val sep = Seq((1L, "the the the"), (2L, "de de de")).toDF("doc_id", "text")
    val atFix = TextAnalysis.perceptronTrain(sep, "doc_id", "text", Dim, 2)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val later = TextAnalysis.perceptronTrain(sep, "doc_id", "text", Dim, 10)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(atFix == later, "zero misclassified must freeze the weights")
    assert(atFix.exists(_._2 > 0L) && atFix.exists(_._2 < 0L),
      "the separator has a positive (en) and a negative (pt) weight")
  }

  test("persisted model artifact: inference-only scoring == train+score") {
    val dir = java.nio.file.Files.createTempDirectory("quality_model").toString
    TextAnalysis.writeQualityModel(corpus, "doc_id", "text", dir,
      dim = Dim, rounds = 3)
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.orderBy($"doc_id").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getBoolean(3)))
        .toSeq
    val direct = rows(TextAnalysis.perceptronScore(
      corpus, "doc_id", "text", dim = Dim, rounds = 3))
    val fromArt = rows(TextAnalysis.perceptronScoreWithModel(
      corpus, "doc_id", "text", dir, dim = Dim))
    assert(fromArt === direct && direct.nonEmpty)
    // the artifact is exactly the dim-row integer weight table
    val w = spark.read.parquet(s"$dir/weights.parquet")
    assert(w.count() === Dim.toLong)
    assert(w.columns.toSet === Set("bucket", "w"))
    // the streaming loader round-trips the trained map (modulo explicit
    // zeros — both scorers read absent buckets as 0), so a streaming job
    // can serve the offline-trained model with no training on its path
    val loaded = TextAnalysis.loadQualityModel(spark, dir)
    val trained = TextAnalysis.perceptronTrainedWeights(
      corpus, "doc_id", "text", dim = Dim, rounds = 3)
    assert(loaded.filter(_._2 != 0L) === trained.filter(_._2 != 0L))
    assert(loaded.size === Dim)
  }
}
