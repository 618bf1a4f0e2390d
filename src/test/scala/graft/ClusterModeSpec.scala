package graft

import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.Files

/** Pins the stale-jar guard (VERDICT r13 "what's wrong" #3): local-cluster
  * executors load application classes from `spark.jars` only, so a jar
  * older than the newest compiled class means the multi-JVM gate would
  * silently certify OLD code. The guard's comparison is a pure function of
  * file mtimes — pinned here without launching a cluster.
  */
class ClusterModeSpec extends AnyFunSuite {

  private def tmpTree(): (java.io.File, java.io.File) = {
    val root = Files.createTempDirectory("cmspec").toFile
    val classes = new java.io.File(root, "classes/sub")
    assert(classes.mkdirs())
    (root, classes)
  }

  test("missing jar → None (configure would fail fast)") {
    val (root, _) = tmpTree()
    assert(ClusterMode.jarStalenessMs(
      new java.io.File(root, "absent.jar").toString,
      new java.io.File(root, "classes").toString).isEmpty)
  }

  test("jar newer than newest class → non-positive lag (fresh)") {
    val (root, classes) = tmpTree()
    val cls = new java.io.File(classes, "A.class")
    Files.write(cls.toPath, Array[Byte](1))
    val jar = new java.io.File(root, "app.jar")
    Files.write(jar.toPath, Array[Byte](1))
    assert(cls.setLastModified(jar.lastModified - 60000))
    val lag = ClusterMode.jarStalenessMs(jar.toString,
      new java.io.File(root, "classes").toString)
    assert(lag.exists(_ <= 0), s"expected fresh, got $lag")
  }

  test("class recompiled after packaging → positive lag (stale)") {
    val (root, classes) = tmpTree()
    val jar = new java.io.File(root, "app.jar")
    Files.write(jar.toPath, Array[Byte](1))
    val cls = new java.io.File(classes, "A.class")
    Files.write(cls.toPath, Array[Byte](1))
    assert(cls.setLastModified(jar.lastModified + 60000))
    val lag = ClusterMode.jarStalenessMs(jar.toString,
      new java.io.File(root, "classes").toString)
    assert(lag.exists(_ > 0), s"expected stale, got $lag")
  }
}
