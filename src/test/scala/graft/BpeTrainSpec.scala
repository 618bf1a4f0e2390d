package graft

import org.apache.spark.sql.functions._
import graft.operators.TextAnalysis

/** Pins q_bpe_train's two load-bearing equivalences:
  *  1. the engine's greedy left-to-right merge fold equals a reference
  *     single-pass greedy merge on randomized symbol sequences;
  *  2. the DuckDB oracle's SINGLE non-overlapping string-replace over the
  *     DOUBLE-space-delimited segmentation equals that same greedy merge
  *     (every boundary carries two spaces; the pattern `␣a␣␣b␣` consumes
  *     one from each side, so adjacent matches never compete for a shared
  *     delimiter — which the old single-space two-pass scheme did, breaking
  *     self-pair merges over runs ≥ 5; those runs are explicit cases here).
  * Plus an end-to-end merge-list check against a driver-side reference
  * trainer on a small corpus.
  */
class BpeTrainSpec extends SparkSpec {
  import spark.implicits._

  /** Reference greedy BPE merge application (Sennrich et al. 2016). */
  private def refMerge(sym: List[String], a: String, b: String): List[String] = {
    val out = scala.collection.mutable.ListBuffer.empty[String]
    var i = 0
    while (i < sym.length) {
      if (i + 1 < sym.length && sym(i) == a && sym(i + 1) == b) {
        out += (a + b); i += 2
      } else { out += sym(i); i += 1 }
    }
    out.toList
  }

  /** The oracle's merge: ONE non-overlapping left-to-right replace on the
    * double-space-delimited form (pattern takes one space from each
    * boundary, so no two matches share a delimiter). */
  private def replMerge(sym: List[String], a: String, b: String): List[String] = {
    val seg = "  " + sym.mkString("  ") + "  "
    val once = seg.replace(s" $a  $b ", s" ${a + b} ")
    once.trim.split("  ").filter(_.nonEmpty).toList
  }

  test("greedy fold == reference merge == oracle double-replace, randomized") {
    val rnd = new scala.util.Random(11)
    val alphabet = Vector("a", "b", "ab", "c")
    val cases = (1 to 200).map { _ =>
      List.fill(1 + rnd.nextInt(10))(alphabet(rnd.nextInt(alphabet.size)))
    } :+ List("a", "b", "a", "b", "a", "b") :+ List("a", "a", "a") :+
      List("a", "a", "a", "a") :+ List("ab", "a", "b", "ab") :+
      List.fill(5)("a") :+ List.fill(6)("a") :+ List.fill(7)("a") :+
      List.fill(9)("a") :+ ("b" :: List.fill(6)("a")) :+
      (List.fill(5)("a") :+ "b")
    val (a, b) = ("a", "b")
    // engine fold over the same sequences
    val df = cases.zipWithIndex.map { case (c, i) => (i, c) }.toDF("id", "sym")
    val folded = df.select(col("id"),
        aggregate(col("sym"), array().cast("array<string>"), (acc, s) =>
          when(size(acc) > 0 && element_at(acc, -1) === lit(a) && s === lit(b),
            concat(slice(acc, lit(1), size(acc) - 1),
              array(concat(element_at(acc, -1), s))))
          .otherwise(concat(acc, array(s)))))
      .orderBy(col("id")).collect().map(_.getSeq[String](1).toList)
    cases.zipWithIndex.foreach { case (c, i) =>
      val want = refMerge(c, a, b)
      assert(folded(i) === want, s"fold != reference on $c")
      assert(replMerge(c, a, b) === want, s"double-replace != reference on $c")
    }
    // the (a,a) self-pair family too
    cases.foreach { c =>
      assert(replMerge(c, "a", "a") === refMerge(c, "a", "a"), s"(a,a) on $c")
    }
  }

  test("bpeTrain: merge list matches a driver-side reference trainer") {
    val docs = Seq(
      (1L, "low low low lower lowest"),
      (2L, "new newer newest low"),
      (3L, "wider wide new")).toDF("doc_id", "text")
    val got = TextAnalysis.bpeTrain(docs, "doc_id", "text", rounds = 4)
      .orderBy(col("round"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))

    // reference trainer on the same word-frequency table
    var vocab: Map[List[String], Long] = Seq(
        (1L, "low low low lower lowest"), (2L, "new newer newest low"),
        (3L, "wider wide new"))
      .flatMap(_._2.split(" ")).filter(_.nonEmpty)
      .groupBy(identity).map { case (w, ws) => (w.split("").toList, ws.size.toLong) }
    val expect = (1 to 4).map { r =>
      val counts = vocab.toSeq.flatMap { case (sym, f) =>
        sym.zip(sym.tail).map(p => (s"${p._1} ${p._2}", f))
      }.groupBy(_._1).map { case (p, xs) => (p, xs.map(_._2).sum) }
      val (pair, cnt) = counts.toSeq.sortBy { case (p, c) => (-c, p) }.head
      val Array(a, b) = pair.split(" ")
      vocab = vocab.toSeq.map { case (sym, f) => (refMerge(sym, a, b), f) }
        .groupBy(_._1).map { case (s, xs) => (s, xs.map(_._2).sum) }
      (r.toLong, pair, cnt)
    }
    assert(got.toSeq === expect)
  }

  test("persisted vocab artifact: tokenize == train+tokenize; OOV replays stored merges") {
    val docs = Seq((1L, "ab ab ab cd"), (2L, "ab cd cd")).toDF("doc_id", "text")
    val dir = java.nio.file.Files.createTempDirectory("bpe_vocab").toString
    TextAnalysis.writeBpeVocab(docs, "doc_id", "text", rounds = 2, dir)
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.orderBy($"doc_id", $"word_idx", $"token_idx").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3))).toSeq
    val direct = rows(TextAnalysis.bpeTokenize(docs, "doc_id", "text", rounds = 2))
    val fromArt = rows(TextAnalysis.bpeTokenizeWithVocab(docs, "doc_id", "text", dir))
    assert(fromArt === direct && direct.nonEmpty)
    // the stored merge list is exactly the expected training order:
    // round 1 "a b" (freq 4 beats "c d"'s 3), round 2 "c d"
    val merges = spark.read.parquet(s"$dir/merges.parquet")
      .orderBy($"round").collect().map(r => (r.getLong(0), r.getString(1))).toSeq
    assert(merges === Seq((1L, "a b"), (2L, "c d")))
    // OOV inference: "abcd" is in NO training word, so it replays the two
    // stored merges over its character split → [ab, cd]; "zz" has no
    // applicable merge → [z, z]; "ab" resolves through the stored vocab
    val novel = Seq((9L, "abcd ab zz")).toDF("doc_id", "text")
    val oov = rows(TextAnalysis.bpeTokenizeWithVocab(novel, "doc_id", "text", dir))
    assert(oov === Seq(
      (9L, 1L, 1L, "ab"), (9L, 1L, 2L, "cd"),
      (9L, 2L, 1L, "ab"),
      (9L, 3L, 1L, "z"), (9L, 3L, 2L, "z")))
  }
}
