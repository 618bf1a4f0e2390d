package graft
import org.apache.spark.sql.SparkSession

/** `SPARK_GRAFT_MASTER` override for the driver-contract mains (VERDICT
  * r12 #1): every gate artifact through r12 ran in ONE JVM (`local[N]`),
  * where serialization bugs, executor-classpath splits, non-serializable
  * closure captures and driver-memoized state are structurally invisible.
  * Setting `SPARK_GRAFT_MASTER=local-cluster[2,16,4096]` runs the SAME
  * mains against real separate executor JVMs on this box — the cheapest
  * available approximation of the failure modes a 1000-executor cluster
  * exercises. The driver never sets it, so recorded rounds keep the
  * contract's `local[N]` shape.
  */
object ClusterMode {
  /** JDK 17 module opens every Spark JVM needs (build.sbt injects them
    * into the forked DRIVER; executor JVMs launched by a local-cluster
    * worker get their java options from this conf instead — spark-submit
    * would inject them, an sbt-launched worker does not). */
  private val jdk17AddOpens: String = Seq(
    "java.base/java.lang", "java.base/java.lang.invoke",
    "java.base/java.lang.reflect", "java.base/java.io",
    "java.base/java.net", "java.base/java.nio",
    "java.base/java.util", "java.base/java.util.concurrent",
    "java.base/java.util.concurrent.atomic",
    "java.base/sun.nio.ch", "java.base/sun.nio.cs",
    "java.base/sun.security.action", "java.base/sun.util.calendar",
  ).map(p => s"--add-opens=$p=ALL-UNNAMED").mkString(" ")

  /** Resolved master: the env override, or the main's `local[N]` default. */
  def master(defaultMaster: String): String =
    sys.env.getOrElse("SPARK_GRAFT_MASTER", defaultMaster)

  /** Stale-jar guard (VERDICT r13 "what's wrong" #3 / ADVICE): executors
    * in local-cluster mode see ONLY `spark.jars` — if `sbt package` was
    * not re-run after a code change, they silently execute OLD code and
    * the multi-JVM gate certifies the wrong build. Fail fast when the
    * jar is missing or older than the newest compiled class file.
    * `SPARK_GRAFT_ALLOW_STALE_JAR=1` downgrades to a loud warning (for
    * deliberate old-jar A/B probes). Returns the jar mtime lag in ms
    * (<=0 means fresh) so specs can pin the comparison itself. */
  def jarStalenessMs(jarPath: String, classesDir: String): Option[Long] = {
    val jar = new java.io.File(jarPath)
    if (!jar.isFile) return None
    def newestClassMtime(f: java.io.File): Long =
      if (f.isDirectory) {
        val kids = Option(f.listFiles).getOrElse(Array.empty)
        if (kids.isEmpty) 0L else kids.map(newestClassMtime).max
      } else if (f.getName.endsWith(".class")) f.lastModified else 0L
    val newest = newestClassMtime(new java.io.File(classesDir))
    Some(newest - jar.lastModified)
  }

  private def guardJar(jar: String): Unit = {
    val classesDir = java.nio.file.Paths
      .get(sys.props("user.dir"), "target/scala-2.13/classes").toString
    jarStalenessMs(jar, classesDir) match {
      case None =>
        sys.error(s"[ClusterMode] spark.jars '$jar' does not exist — run `sbt package` " +
          "before a local-cluster gate (executors load classes from this jar ONLY)")
      case Some(lag) if lag > 0 =>
        val msg = s"[ClusterMode] spark.jars '$jar' is ${lag / 1000.0}s OLDER than the newest " +
          "compiled class — executors would run STALE code. Run `sbt package` first."
        if (sys.env.contains("SPARK_GRAFT_ALLOW_STALE_JAR")) System.err.println(s"WARN $msg")
        else sys.error(msg)
      case _ => ()
    }
  }

  /** Apply the master (+ executor-JVM confs when it is a local-cluster):
    * the application classes reach executors via `spark.jars` — the sbt
    * classpath directory the driver runs from is NOT on their classpath,
    * which is exactly the split this mode exists to exercise. */
  def configure(b: SparkSession.Builder, defaultMaster: String): SparkSession.Builder = {
    val m = master(defaultMaster)
    val withMaster = b.master(m)
    if (!m.startsWith("local-cluster")) withMaster
    else {
      val jar = sys.env.getOrElse("SPARK_GRAFT_JARS",
        java.nio.file.Paths.get(sys.props("user.dir"),
          "target/scala-2.13/etlglobalretailspark_2.13-0.1.0.jar").toString)
      guardJar(jar)
      withMaster
        .config("spark.jars", jar)
        // the worker's executor-launch command builder resolves the jars
        // dir via getScalaVersion(), which without this env var probes
        // source-build directories that a binary dist lacks ("Cannot find
        // any build directories"); spark.executorEnv.* feeds the launcher's
        // child environment
        .config("spark.executorEnv.SPARK_SCALA_VERSION", "2.13")
        .config("spark.executor.extraJavaOptions", jdk17AddOpens)
        // must fit under the worker-memory field of local-cluster[n,c,MB]
        .config("spark.executor.memory",
          sys.env.getOrElse("SPARK_GRAFT_EXECUTOR_MEM", "3g"))
    }
  }
}
