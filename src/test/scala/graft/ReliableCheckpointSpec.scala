package graft

import org.apache.spark.sql.functions._

/** Opt-in failure-durable mode of the iterative loops (pagerank, labelProp,
  * connectedComponents, kmeans): with a `checkpointDir`, per-round state is
  * written as PARQUET under `dir/loop-<uuid>/r<round>` and read back —
  * files on a (distributed) filesystem that survive executor loss (and are
  * re-openable from any session), unlike `localCheckpoint()`'s
  * executor-memory blocks; the session checkpoint dir is never touched.
  * These specs pin (a) results are identical to the default mode, (b) the
  * round state really landed in the given dir with only the final round
  * surviving, and (c) loops sharing a dir cannot disturb each other.
  */
class ReliableCheckpointSpec extends SparkSpec {
  import spark.implicits._

  private def freshDir(tag: String): java.io.File = {
    val d = java.nio.file.Files.createTempDirectory(s"graft-ck-$tag").toFile
    d.deleteOnExit()
    d
  }

  private def filesUnder(f: java.io.File): Long =
    if (f.isDirectory) Option(f.listFiles()).map(_.map(filesUnder).sum).getOrElse(0L)
    else 1L

  /** Round subdirs (r0, r1, …) inside the loop's uuid root under `dir`. */
  private def roundDirs(dir: java.io.File): Seq[String] = {
    val loops = Option(dir.listFiles()).getOrElse(Array.empty)
      .filter(f => f.isDirectory && f.getName.startsWith("loop-"))
    loops.flatMap(l => Option(l.listFiles()).getOrElse(Array.empty))
      .filter(f => f.isDirectory && f.getName.startsWith("r"))
      .map(_.getName).sorted.toSeq
  }

  test("pagerank: reliable-checkpoint mode matches default and writes round state to the dir") {
    val edges = Seq((1L, 2L), (2L, 1L), (2L, 3L), (3L, 2L)).toDF("src", "dst")
    val dir = freshDir("pr")
    val default = graft.operators.Graph.pagerank(edges, maxIter = 5)
      .orderBy("node").collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    val before = spark.sparkContext.getCheckpointDir
    val reliableDf = graft.operators.Graph.pagerank(edges, maxIter = 5,
      checkpointDir = Some(dir.toString))
    val reliable = reliableDf
      .orderBy("node").collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(reliable === default)
    assert(filesUnder(dir) > 0, "no checkpoint files written — state is not durable")
    // disk lifecycle: prior rounds' subdirs are deleted as the loop
    // advances — only the final round's state survives the loop
    assert(roundDirs(dir) === Seq("r5"), s"stale round dirs: ${roundDirs(dir)}")
    // state goes through plain parquet writes — the session-global
    // checkpoint dir is never touched
    assert(spark.sparkContext.getCheckpointDir === before,
      s"loop mutated the session checkpoint dir: ${spark.sparkContext.getCheckpointDir}")
    // two loops may share a dir without colliding (per-invocation uuid
    // roots): rerunning against the same dir must not disturb the first
    // run's surviving state
    graft.operators.Graph.pagerank(edges, maxIter = 3,
        checkpointDir = Some(dir.toString))
      .orderBy("node").collect()
    assert(roundDirs(dir).sorted === Seq("r3", "r5"),
      s"loop roots collided: ${roundDirs(dir)}")
    // the FIRST run's frame still reads its own files intact after the
    // second run (re-collect goes back to the r5 parquet on disk)
    val reRead = reliableDf
      .orderBy("node").collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(reRead === reliable, "second loop disturbed the first loop's state")
  }

  test("labelProp: reliable mode matches default; isolated seed keeps its label") {
    // triangle {1,2,3} plus isolated labeled node 99 (no edges): the vote
    // join yields nothing for it, so only the full-outer state union's
    // prior-label side keeps it
    val pairs = Seq((1L, 2L), (2L, 3L), (1L, 3L)).toDF("a", "b")
    val labels = Seq((1L, 10L), (2L, 20L), (3L, 30L), (99L, 7L)).toDF("node", "label")
    val dir = freshDir("lp")
    val default = graft.operators.Graph.labelProp(pairs, "a", "b", labels, maxIter = 5)
      .orderBy("node").collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    val reliable = graft.operators.Graph.labelProp(pairs, "a", "b", labels,
        maxIter = 5, checkpointDir = Some(dir.toString))
      .orderBy("node").collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(reliable === default)
    assert(default.toMap.get(99L) === Some(7L),
      "isolated labeled node must keep its prior label, not vanish")
    assert(filesUnder(dir) > 0)
  }

  test("connectedComponents: reliable mode matches default on a multi-hop chain") {
    val nodes = (1L to 6L).toDF("doc_id")
    val pairs = Seq((1L, 2L), (2L, 3L), (5L, 6L)).toDF("doc_id_a", "doc_id_b")
    val dir = freshDir("cc")
    val default = graft.operators.Dedup.connectedComponents(
        nodes, "doc_id", pairs, "doc_id_a", "doc_id_b")
      .orderBy("doc_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    val reliable = graft.operators.Dedup.connectedComponents(
        nodes, "doc_id", pairs, "doc_id_a", "doc_id_b",
        checkpointDir = Some(dir.toString))
      .orderBy("doc_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(reliable === default)
    assert(default === Seq((1L, 1L), (2L, 1L), (3L, 1L), (4L, 4L), (5L, 5L), (6L, 5L)))
    assert(filesUnder(dir) > 0)
  }

  test("labelProp: spread labels semi-supervised — unlabeled nodes acquire labels") {
    // chain 1-2-3 with only node 1 seeded: the spread must reach 2, then 3
    val pairs = Seq((1L, 2L), (2L, 3L)).toDF("a", "b")
    val labels = Seq((1L, 10L)).toDF("node", "label")
    val out = graft.operators.Graph.labelProp(pairs, "a", "b", labels, maxIter = 5)
      .orderBy("node").collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(out === Seq((1L, 10L), (2L, 10L), (3L, 10L)),
      s"seed did not spread: $out")
  }

  test("labelProp: string labels are accepted (no numeric-negation narrowing)") {
    val pairs = Seq((1L, 2L), (2L, 3L), (1L, 3L)).toDF("a", "b")
    val labels = Seq((1L, "red"), (2L, "blue"), (3L, "blue")).toDF("node", "label")
    val out = graft.operators.Graph.labelProp(pairs, "a", "b", labels, maxIter = 5)
      .collect().map(r => (r.getLong(0), r.getString(1))).toMap
    // triangle converges on the majority label
    assert(out.values.toSet === Set("blue"), s"unexpected labels: $out")
  }

  test("kmeans: reliable mode matches default centroids") {
    val emb = Seq(
      (0L, Seq(1.0f, 0.0f)), (1L, Seq(2.0f, 0.0f)),
      (2L, Seq(0.0f, 1.0f)), (3L, Seq(0.0f, 3.0f))
    ).toDF("vec_id", "embedding")
    val dir = freshDir("km")
    def run(ck: Option[String]) =
      graft.operators.Similarity.kmeans(emb, centroidEvery = 2, maxIter = 3,
          checkpointDir = ck)
        .orderBy("cell").collect()
        .map(r => (r.getLong(0), r.getSeq[Double](1), r.getLong(2))).toSeq
    assert(run(Some(dir.toString)) === run(None))
    assert(filesUnder(dir) > 0)
  }
}
