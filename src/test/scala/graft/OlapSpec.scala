package graft

import java.sql.Timestamp
import org.apache.spark.sql.functions._
import graft.operators.Olap

class OlapSpec extends SparkSpec {
  import spark.implicits._

  test("rollupQuantities contains group, subtotal and grand-total rows") {
    val li = Seq(("A", "F", 1.0), ("A", "O", 2.0), ("B", "F", 3.0))
      .toDF("l_returnflag", "l_linestatus", "l_quantity")
    val r = Olap.rollupQuantities(li).collect()
      .map(x => (Option(x.getString(0)), Option(x.getString(1)), x.getDouble(2))).toSet
    assert(r.contains((Some("A"), Some("F"), 1.0)))
    assert(r.contains((Some("A"), None, 3.0))) // subtotal
    assert(r.contains((None, None, 6.0))) // grand total
  }

  test("pivotEventCounts: one column per type, zeros for missing") {
    val ev = Seq(
      (1L, Timestamp.valueOf("2024-01-01 10:15:00"), 1L, "view", 1.0),
      (2L, Timestamp.valueOf("2024-01-01 10:45:00"), 1L, "view", 1.0),
      (3L, Timestamp.valueOf("2024-01-01 11:05:00"), 2L, "click", 1.0))
      .toDF("event_id", "ts", "user_id", "event_type", "value")
    val r = Olap.pivotEventCounts(ev, Seq("click", "view"))
      .orderBy("hora").collect()
    assert(r.length === 2)
    assert(r(0).getLong(1) === 0L && r(0).getLong(2) === 2L) // 10h: 0 clicks 2 views
    assert(r(1).getLong(1) === 1L && r(1).getLong(2) === 0L)
  }

  test("runningTotals accumulates in (date, orderkey) order") {
    val ord = Seq(
      (1L, 101L, Timestamp.valueOf("2024-01-01 00:00:00"), 10.0),
      (1L, 102L, Timestamp.valueOf("2024-01-02 00:00:00"), 5.0),
      (2L, 103L, Timestamp.valueOf("2024-01-01 00:00:00"), 7.0))
      .toDF("o_custkey", "o_orderkey", "o_orderdate", "o_totalprice")
    val r = Olap.runningTotals(ord).orderBy("o_custkey", "order_seq").collect()
    assert(r(0).getDouble(2) === 10.0 && r(0).isNullAt(4))
    assert(r(1).getDouble(2) === 15.0 && r(1).getDouble(4) === 10.0)
    assert(r(2).getDouble(2) === 7.0)
  }

  test("customerYearSetOps tags both/only partitions disjointly") {
    val ord = Seq(
      (1L, Timestamp.valueOf("1996-05-01 00:00:00")),
      (1L, Timestamp.valueOf("1997-05-01 00:00:00")),
      (2L, Timestamp.valueOf("1996-06-01 00:00:00")),
      (3L, Timestamp.valueOf("1997-07-01 00:00:00")))
      .toDF("o_custkey", "o_orderdate")
    val r = Olap.customerYearSetOps(ord, 1996, 1997).collect()
      .map(x => (x.getString(0), x.getLong(1))).toSet
    assert(r === Set(("both", 1L), ("only_1996", 2L), ("only_1997", 3L)))
  }

  test("asofPriorEvent picks latest prior-type event at or before target ts") {
    val ev = Seq(
      (1L, Timestamp.valueOf("2024-01-01 10:00:00"), 7L, "view", 1.0),
      (2L, Timestamp.valueOf("2024-01-01 10:30:00"), 7L, "view", 1.0),
      (3L, Timestamp.valueOf("2024-01-01 10:45:00"), 7L, "click", 1.0),
      (4L, Timestamp.valueOf("2024-01-01 09:00:00"), 8L, "click", 1.0), // no prior view
      (5L, Timestamp.valueOf("2024-01-01 11:00:00"), 9L, "view", 1.0),
      (6L, Timestamp.valueOf("2024-01-01 11:00:00"), 9L, "click", 1.0)) // same-instant
      .toDF("event_id", "ts", "user_id", "event_type", "value")
    val r = Olap.asofPriorEvent(ev, "view", "click").orderBy("event_id").collect()
    assert(r.length === 3)
    assert(r(0).getLong(0) === 3L &&
      r(0).getTimestamp(3) === Timestamp.valueOf("2024-01-01 10:30:00"))
    assert(r(1).getLong(0) === 4L && r(1).isNullAt(3))
    assert(r(2).getLong(0) === 6L &&
      r(2).getTimestamp(3) === Timestamp.valueOf("2024-01-01 11:00:00"))
  }

  test("revenueAutocorr: a perfectly weekly series has lag-7 correlation 1") {
    val days = (0 until 28).map { i =>
      (java.sql.Date.valueOf(java.time.LocalDate.of(2020, 1, 1).plusDays(i).toString),
        100.0 + (i % 7) * 10.0)
    }
    val orders = days.toDF("o_orderdate", "o_totalprice")
    val r = Olap.revenueAutocorr(orders, lagDays = 7).head()
    assert(r.getAs[Long]("lag") === 7L)
    assert(r.getAs[Long]("n") === 21L) // 28 days, 7 lost to the shift
    assert(r.getAs[Double]("corr_r") === 1.0)
  }
}
