package graft

import org.apache.spark.sql.functions._
import graft.operators.Sketches

class SketchesSpec extends SparkSpec {
  import spark.implicits._

  test("hll estimate lands near the exact count and is partitioning-invariant") {
    val items = (1 to 20000).map(i => ("g", s"item$i")) ++
      (1 to 300).map(i => ("h", s"thing${i % 150}"))
    val df = items.toDF("grp", "it")
    val out = Sketches.hllDistinct(df, $"grp", $"it")
      .orderBy($"grp").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2), r.getLong(3)))
    val (gGrp, gExact, gEst, _) = out(0)
    assert(gGrp === "g" && gExact === 20000L)
    // m=64 → standard error 1.04/√64 = 13%; allow ~2.5σ
    assert(math.abs(gEst - gExact) / gExact.toDouble < 0.33, s"est $gEst vs $gExact")
    val (hGrp, hExact, hEst, hEmpty) = out(1)
    assert(hGrp === "h" && hExact === 150L)
    assert(hEst > 0.0 && hEmpty >= 0L)
    // determinism: registers are md5-derived → estimate survives repartition
    val out13 = Sketches.hllDistinct(df.repartition(13), $"grp", $"it")
      .orderBy($"grp").collect().map(r => (r.getString(0), r.getDouble(2)))
    assert(out13.toSeq === out.map(t => (t._1, t._3)).toSeq)
  }

  test("hll register merge: hourly registers roll up to the direct daily estimate") {
    val base = java.sql.Timestamp.valueOf("2024-03-01 00:00:00")
    val evs = (0 until 8000).map { i =>
      val day = i % 2
      val hour = i % 24
      (new java.sql.Timestamp(base.getTime + day * 86400000L + hour * 3600000L),
        (i % 1500).toLong)
    }
    val df = evs.toDF("ts", "user_id")
    val merged = Sketches.hllMergedDaily(df, $"ts", $"user_id".cast("string"))
      .orderBy($"day").collect()
      .map(r => (r.getLong(1), r.getDouble(2)))
    // direct per-day estimate over the same items — must be IDENTICAL
    // (register merge by max is lossless)
    val direct = Sketches.hllDistinct(
      df.select(date_trunc("day", $"ts").as("d"), $"user_id".cast("string").as("u")),
      $"d", $"u").orderBy($"grp").collect()
      .map(r => (r.getLong(1), r.getDouble(2)))
    assert(merged.toSeq === direct.toSeq)
    merged.foreach { case (exact, est) =>
      assert(math.abs(est - exact) / exact.toDouble < 0.4, s"est $est vs $exact")
    }
  }

  test("cms heavy hitters: exact counts right, estimates never under-count") {
    val multiset = Seq.fill(100)("alpha") ++ Seq.fill(50)("beta") ++
      (1 to 500).map(i => s"rare$i")
    val df = multiset.toDF("term")
    val out = Sketches.cmsHeavyHitters(df, $"term", 5).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(out.length === 5)
    assert(out(0)._1 === "alpha" && out(0)._2 === 100L)
    assert(out(1)._1 === "beta" && out(1)._2 === 50L)
    // the CMS invariant: min over d rows only ever over-counts
    out.foreach { case (t, exact, est, over) =>
      assert(est >= exact, s"$t under-counted: $est < $exact")
      assert(over === est - exact)
    }
  }
}
