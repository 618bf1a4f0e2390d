package graft

import org.apache.spark.sql.functions._
import graft.functions.GraftFunctions._

/** Column-level F-functions (SURVEY §2.6) against hand-computed fixtures —
  * especially the F13 tri-state date truth table (etl_completo.py:615-635).
  */
class GraftFunctionsSpec extends SparkSpec {
  import spark.implicits._

  private def oneString(c: org.apache.spark.sql.Column, input: String): Any = {
    val df = Seq(Option(input)).toDF("v")
    df.select(c.as("r")).collect()(0).get(0)
  }

  test("F13 parseMultiFormatDate: iso, br, sentinel, malformed") {
    assert(oneString(parseMultiFormatDate($"v"), "2024-01-15").toString === "2024-01-15")
    assert(oneString(parseMultiFormatDate($"v"), "15/03/2024").toString === "2024-03-15")
    assert(oneString(parseMultiFormatDate($"v"), "Data Inválida") === null)
    assert(oneString(parseMultiFormatDate($"v"), "N/A") === null)
    assert(oneString(parseMultiFormatDate($"v"), null) === null)
    assert(oneString(parseMultiFormatDate($"v"), "2024-13-45") === null) // bad parse
    assert(oneString(parseMultiFormatDate($"v"), "2024-1-5") === null) // wrong shape
  }

  test("F13 keepRowForDate: sentinels keep, parseable keep, malformed drop") {
    assert(oneString(keepRowForDate($"v"), "2024-01-15") === true)
    assert(oneString(keepRowForDate($"v"), "15/03/2024") === true)
    assert(oneString(keepRowForDate($"v"), "NULL") === true) // sentinel keeps
    assert(oneString(keepRowForDate($"v"), null) === true)
    assert(oneString(keepRowForDate($"v"), "2024-13-45") === false) // shape ok, parse fails
    assert(oneString(keepRowForDate($"v"), "20240115") === false) // wrong shape
  }

  test("F9 extractPercent: first decimal number, else 0.0") {
    assert(oneString(extractPercent($"v"), "10%") === 10.0)
    assert(oneString(extractPercent($"v"), "desconto de 12.5 por cento") === 12.5)
    assert(oneString(extractPercent($"v"), "sem desconto") === 0.0)
    assert(oneString(extractPercent($"v"), null) === 0.0)
  }

  test("F12 positive guards") {
    val df = Seq((5, -2.0), (0, 0.0)).toDF("q", "p")
    val r = df.select(positiveOrZero($"q").as("q2"), positiveOrZero($"p").as("p2")).collect()
    assert(r(0).getDouble(0) === 5.0 && r(0).getDouble(1) === 0.0)
    assert(r(1).getDouble(0) === 0.0)
  }

  test("F15 calendar: ISO weekday, Portuguese names, semestre") {
    val df = Seq("2024-01-01", "2024-06-30", "2024-07-01").toDF("d")
      .select(to_date($"d").as("d"))
    val r = df.select(diaSemana($"d"), nomeDiaSemana($"d"), nomeMes($"d"), semestre($"d"))
      .collect()
    assert(r(0).getInt(0) === 1 && r(0).getString(1) === "Segunda" && r(0).getString(2) === "Janeiro")
    assert(r(1).getInt(0) === 7 && r(1).getString(1) === "Domingo" && r(1).getInt(3) === 1)
    assert(r(2).getInt(3) === 2)
  }

  test("detRound quantizes deterministically") {
    val df = Seq(1.23455, 2.5, -0.0001).toDF("v")
    val r = df.select(detRound($"v", 4).as("r")).collect().map(_.getDouble(0))
    assert(r(0) === 1.2346 && r(1) === 2.5)
  }
}
