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
