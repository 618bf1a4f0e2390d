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

  // r16 sf100 sweep defect: Spark floor(DOUBLE) returns LONG, so per-row
  // quantized values saturated at Long.Max before the Decimal(38,0) sum.
  // Above 2^53 a double is integral, so the fixed path skips floor there.
  private val two53 = 9007199254740992.0 // 2^53

  test("stableSumScaled straddles 2^53 and 2^63 without saturating") {
    // Below 2^53: floor path, exact LONG — identical to the old behavior.
    val below = Seq(two53 / 2, 123456.789)
    val rBelow = below.toDF("v")
      .agg(stableSumScaled($"v", 0).as("s")).collect()(0).getDouble(0)
    assert(rBelow === math.floor(two53 / 2 + 0.5) + math.floor(123456.789 + 0.5))

    // Straddling 2^53: one row each side of the guard; both rows are exact.
    val straddle = Seq(two53 - 2.0, two53 * 2)
    val rStraddle = straddle.toDF("v")
      .agg(stableSumScaled($"v", 0).as("s")).collect()(0).getDouble(0)
    assert(rStraddle === (two53 - 2.0) + two53 * 2)

    // Above 2^63 (the q_autocorr sf100 shape: x·x ≈ 8.8e19 per row). The
    // old path returned n·Long.Max here; the true sum is exact in
    // Decimal(38,0) because each double is integral at this magnitude.
    val huge = 8.8e19
    val rHuge = Seq(huge, huge).toDF("v")
      .agg(stableSumScaled($"v", 0).as("s")).collect()(0).getDouble(0)
    val exact = new java.math.BigDecimal(huge)
      .multiply(new java.math.BigDecimal(2)).doubleValue
    assert(rHuge === exact)
    assert(rHuge > 1.7e20) // far beyond 2·Long.Max ≈ 1.84e19
    // Negative branch of the guard (abs).
    val rNeg = Seq(-huge, huge, huge).toDF("v")
      .agg(stableSumScaled($"v", 0).as("s")).collect()(0).getDouble(0)
    assert(rNeg === huge)
  }

  test("detRound stays exact above 2^53 (floor wrap guard)") {
    // w = 1e20·100 + 0.5 ≈ 1e22 > 2^63: old floor→LONG gave ~9.2e16.
    val r = Seq(1e20, -1e20, 1.23455).toDF("v")
      .select(detRound($"v", 2).as("r")).collect().map(_.getDouble(0))
    assert(r(0) === 1e20 && r(1) === -1e20 && r(2) === 1.23)
    // DuckDB-mirror parity at the guard: floor is a no-op above 2^53, so
    // the result is (v·f + 0.5)/f computed in DOUBLE — check bit equality
    // with that exact IEEE sequence.
    val v = two53 * 16
    val rr = Seq(v).toDF("v")
      .select(detRound($"v", 4).as("r")).collect()(0).getDouble(0)
    assert(rr === (v * 1e4 + 0.5) / 1e4)
  }
}
