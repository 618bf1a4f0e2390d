package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** SQL-script replay (S5) with the reference's dialect cleanup (S6):
  * etl_completo.py:90-143. The reference executes a script file against
  * PostgreSQL, falling back to statement-by-statement execution —
  * `;`-split, trimmed, skipping empty fragments, fragments that START with
  * a `--` comment, and fragments of ≤5 characters; per-statement failures
  * are logged and skipped, not fatal. Here each surviving statement runs
  * through `spark.sql`, so DDL (temp views), SET commands and queries all
  * replay against the session catalog.
  *
  * Scale note: script replay is driver-side control flow — each statement
  * is itself a distributed Spark job; the runner adds no data movement.
  */
object SqlScript {

  /** MySQL→ANSI cleanup (S6, etl_completo.py:138-143): drop
    * FOREIGN_KEY_CHECKS toggles, normalize the single-row `VALUE` spelling.
    */
  def cleanDialect(sql: String): String = sql
    .replace("SET FOREIGN_KEY_CHECKS=0;", "")
    .replace("SET FOREIGN_KEY_CHECKS=1;", "")
    .replace(" VALUE ", " VALUES ")

  /** The reference's fallback split (etl_completo.py:113-117): `;`-split,
    * trim, keep only real statements (non-empty, not a leading `--` comment
    * fragment, longer than 5 chars).
    */
  def statements(script: String): Seq[String] =
    cleanDialect(script).split(';').iterator.map(_.trim)
      .filter(c => c.nonEmpty && !c.startsWith("--") && c.length > 5)
      .toSeq

  /** Run every statement; failures are collected (reference: log, rollback,
    * continue — etl_completo.py:118-128), successes return their result.
    */
  def run(spark: SparkSession, script: String): (Seq[DataFrame], Seq[(String, Throwable)]) = {
    val ok = Seq.newBuilder[DataFrame]
    val failed = Seq.newBuilder[(String, Throwable)]
    statements(script).foreach { st =>
      try ok += spark.sql(st)
      catch { case e: Throwable => failed += ((st, e)) }
    }
    (ok.result(), failed.result())
  }

  def runFile(spark: SparkSession, path: String): (Seq[DataFrame], Seq[(String, Throwable)]) =
    run(spark, new String(java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(path)),
      java.nio.charset.StandardCharsets.UTF_8))
}
