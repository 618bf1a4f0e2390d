package graft.tools

import scala.collection.mutable

import org.apache.spark.scheduler._
import org.apache.spark.sql.SparkSession

/** Per-stage wall/task attribution for one SparkEntry query (dev-only):
  * prints every stage's submission→completion wall, summed task time, task
  * count and name callsite, plus the gaps BETWEEN stages (driver-side time:
  * analysis, codegen compile, broadcast builds, action overhead). Usage:
  *   runMain graft.tools.StageProf <query> [sfDir] [reps]
  */
object StageProf {
  final case class StageRow(id: Int, name: String, wallMs: Long, taskMs: Long,
                            nTasks: Int, submitted: Long, completed: Long)

  def main(args: Array[String]): Unit = {
    val name = args(0)
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val reps = if (args.length > 2) args(2).toInt else 1
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.ansi.enabled", "false")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val stages = mutable.ArrayBuffer.empty[StageRow]
    val taskMs = new java.util.concurrent.ConcurrentHashMap[Int, java.util.concurrent.atomic.AtomicLong]()
    val nTasks = new java.util.concurrent.ConcurrentHashMap[Int, java.util.concurrent.atomic.AtomicInteger]()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onTaskEnd(te: SparkListenerTaskEnd): Unit = {
        if (te.taskMetrics != null) {
          taskMs.computeIfAbsent(te.stageId, _ => new java.util.concurrent.atomic.AtomicLong)
            .addAndGet(te.taskMetrics.executorRunTime)
          nTasks.computeIfAbsent(te.stageId, _ => new java.util.concurrent.atomic.AtomicInteger)
            .incrementAndGet()
        }
      }
      override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = {
        val si = sc.stageInfo
        val sub = si.submissionTime.getOrElse(0L)
        val com = si.completionTime.getOrElse(0L)
        stages.synchronized {
          stages += StageRow(si.stageId, si.name.take(90), com - sub,
            Option(taskMs.get(si.stageId)).map(_.get).getOrElse(0L),
            Option(nTasks.get(si.stageId)).map(_.get).getOrElse(0),
            sub, com)
        }
      }
    })
    spark.range(1000000).selectExpr("sum(id)").collect() // warm generic
    val fn = graft.SparkEntry.queries(name)
    (1 to reps).foreach { rep =>
      stages.synchronized(stages.clear())
      val t0 = System.nanoTime()
      val df = fn(spark, sfDir)
      val t1 = System.nanoTime()
      val n = df.count()
      val t2 = System.nanoTime()
      // drain listener bus
      org.apache.spark.graftbench.BusAccess.drain(spark.sparkContext)
      println(f"[stageprof] $name rep$rep: build=${(t1 - t0) / 1e9}%.2fs exec=${(t2 - t1) / 1e9}%.2fs rows=$n")
      val rows = stages.synchronized(stages.sortBy(_.submitted).toVector)
      var prevEnd = t1 / 1000000L // approx epoch-free; use first stage sub as anchor instead
      if (rows.nonEmpty) {
        prevEnd = rows.head.submitted
        val execStartGap = "n/a"
        println(f"[stageprof]   (gap before first stage: from action start unknown; first sub anchor) $execStartGap")
      }
      rows.foreach { r =>
        val gap = r.submitted - prevEnd
        println(f"[stageprof]   stage ${r.id}%4d wall=${r.wallMs}%6dms task=${r.taskMs}%7dms n=${r.nTasks}%4d gapBefore=${gap}%6dms  ${r.name}")
        prevEnd = math.max(prevEnd, r.completed)
      }
      val sumWall = rows.map(_.wallMs).sum
      val sumTask = rows.map(_.taskMs).sum
      println(f"[stageprof]   TOTALS: stageWall=${sumWall}ms taskSum=${sumTask}ms stages=${rows.size}")
    }
    spark.stop()
  }
}
