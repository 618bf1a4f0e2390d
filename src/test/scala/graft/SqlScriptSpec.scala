package graft

import java.nio.file.Files
import graft.sources.SqlScript

/** S5 script replay + S6 dialect cleanup (reference etl_completo.py:90-143). */
class SqlScriptSpec extends SparkSpec {

  test("statement split mirrors the reference fallback semantics") {
    val script =
      """CREATE TEMPORARY VIEW sqlscript_t AS SELECT 1 AS a;
        |SET FOREIGN_KEY_CHECKS=0;
        |-- a fragment whose first line is a comment is skipped WHOLESALE,
        |-- statement included (reference: command.startswith('--'))
        |DROP VIEW sqlscript_t;
        |ab;
        |   ;
        |SELECT * FROM sqlscript_t""".stripMargin
    val sts = SqlScript.statements(script)
    // FK toggle removed by dialect cleanup, 'ab' ≤5 chars, blank empty,
    // the comment-led fragment (comment + DROP) dropped entirely
    assert(sts === Seq("CREATE TEMPORARY VIEW sqlscript_t AS SELECT 1 AS a",
      "SELECT * FROM sqlscript_t"))
    assert(SqlScript.cleanDialect("INSERT INTO t VALUE (1)") === "INSERT INTO t VALUES (1)")
  }

  test("script file replays against the session catalog; failures don't abort") {
    val path = Files.createTempFile("graft_script", ".sql")
    Files.write(path,
      """CREATE OR REPLACE TEMPORARY VIEW sqlscript_nation AS
        |  SELECT * FROM parquet.`/root/testdata/sf0.001/nation.parquet`;
        |SELECT COUNT(*) AS n FROM sqlscript_nation;
        |SELECT * FROM table_that_does_not_exist;
        |SELECT MAX(n_nationkey) AS mx FROM sqlscript_nation""".stripMargin.getBytes)
    val (ok, failed) = SqlScript.runFile(spark, path.toString)
    assert(ok.length === 3) // view + 2 queries succeeded
    assert(failed.length === 1 && failed.head._1.contains("table_that_does_not_exist"))
    assert(ok(1).collect().head.getLong(0) === 25L)
    assert(ok(2).collect().head.getAs[Number](0).longValue === 24L)
  }
}
