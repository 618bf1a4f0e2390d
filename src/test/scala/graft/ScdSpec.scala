package graft

import java.sql.Timestamp
import org.apache.spark.sql.functions.col
import graft.operators.Scd

/** SCD Type-2 versioning + point-in-time lookup (operators.Scd). */
class ScdSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String): Timestamp = Timestamp.valueOf(s + " 00:00:00")

  private lazy val log = Seq(
    // key 1: A → A (no new version) → B → A again (new version)
    (1L, ts("2020-01-01"), "A"),
    (1L, ts("2020-02-01"), "A"),
    (1L, ts("2020-03-01"), "B"),
    (1L, ts("2020-04-01"), "A"),
    // key 2: single state, two same-day records collapse to min
    (2L, ts("2020-01-15"), "Z"),
    (2L, ts("2020-01-15"), "Q")
  ).toDF("k", "t", "v")

  test("scd2 collapses runs into half-open versions with is_current on the last") {
    val out = Scd.scd2(log, col("k"), col("t"), col("v"))
      .orderBy(col("key"), col("version"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2),
        r.getTimestamp(3), Option(r.getTimestamp(4)), r.getBoolean(5)))

    assert(out.toSeq === Seq(
      (1L, 1L, "A", ts("2020-01-01"), Some(ts("2020-03-01")), false),
      (1L, 2L, "B", ts("2020-03-01"), Some(ts("2020-04-01")), false),
      (1L, 3L, "A", ts("2020-04-01"), None, true),
      // same-ts duplicate collapsed deterministically to min("Z","Q") = "Q"
      (2L, 1L, "Q", ts("2020-01-15"), None, true)))
  }

  test("asOfLookup resolves each probe to the version covering its timestamp") {
    val versions = Scd.scd2(log, col("k"), col("t"), col("v"))
    val probes = Seq(
      (10L, 1L, ts("2020-01-20")), // inside v1
      (11L, 1L, ts("2020-03-01")), // exactly at v2 start (half-open: v2)
      (12L, 1L, ts("2021-01-01")), // after last start → current v3
      (13L, 1L, ts("2019-12-31")), // before any version → NULL
      (14L, 2L, ts("2020-06-01"))  // key 2 current
    ).toDF("probe_id", "k", "t")

    val out = Scd.asOfLookup(probes, col("k"), col("t"), versions)
      .select(col("probe_id"), col("version"), col("attr"))
      .orderBy(col("probe_id"))
      .collect()
      .map(r => (r.getLong(0), if (r.isNullAt(1)) -1L else r.getLong(1),
        Option(r.getString(2))))

    assert(out.toSeq === Seq(
      (10L, 1L, Some("A")),
      (11L, 2L, Some("B")),
      (12L, 3L, Some("A")),
      (13L, -1L, None),
      (14L, 1L, Some("Q"))))
  }
}
