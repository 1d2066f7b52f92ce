package graft.checks

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.model.DocsGen
import graft.stats.StatMath

/** W1 (earth mover's) + Jensen–Shannon drift distances: hand values, golden
  * ladder behavior, and parallelism invariance of the exact-grid path. */
class DriftDistanceSpec extends AnyFunSuite {
  lazy val spark = graft.SparkTestBase.spark
  import spark.implicits._

  test("jsd hand values: identical 0, disjoint 1, half-overlap known value") {
    assert(StatMath.jsd(Array(10L, 20L, 30L), Array(10L, 20L, 30L)) == 0.0)
    assert(math.abs(StatMath.jsd(Array(10L, 0L), Array(0L, 7L)) - 1.0) < 1e-12)
    // p = (1, 0), q = (0.5, 0.5): JSD = 1 - 0.5*h(0.25)... hand-computed:
    // m = (.75, .25); 0.5*[1*log2(1/.75)] + 0.5*[.5*log2(.5/.75) + .5*log2(.5/.25)]
    val expected = 0.5 * (math.log(1 / 0.75) / math.log(2)) +
      0.5 * (0.5 * math.log(0.5 / 0.75) / math.log(2) + 0.5 * math.log(2.0) / math.log(2))
    assert(math.abs(StatMath.jsd(Array(8L, 0L), Array(4L, 4L)) - expected) < 1e-12)
    // empty sides: both empty -> 0, one empty -> 1
    assert(StatMath.jsd(Array(0L, 0L), Array(0L, 0L)) == 0.0)
    assert(StatMath.jsd(Array(5L, 5L), Array(0L, 0L)) == 1.0)
  }

  test("emdFromCdfs hand values: unit shift of a point mass moves one unit of earth") {
    // point mass at 0 vs point mass at 1, edges {0, 1}: |1-0|*(1-0) = 1
    assert(StatMath.emdFromCdfs(Array(0.0, 1.0), Array(1.0, 1.0), Array(0.0, 1.0)) == 1.0)
    // identical CDFs -> 0
    assert(StatMath.emdFromCdfs(Array(0.0, 5.0, 9.0),
      Array(0.3, 0.8, 1.0), Array(0.3, 0.8, 1.0)) == 0.0)
    // uniform vs shifted-uniform on a 3-edge grid
    val d = StatMath.emdFromCdfs(Array(0.0, 1.0, 2.0),
      Array(0.5, 1.0, 1.0), Array(0.0, 0.5, 1.0))
    assert(math.abs(d - 1.0) < 1e-12)
  }

  test("golden ladder: control exactly clean; EMD rises on the gap ladder, JSD on the tilt ladder") {
    val docs = DocsGen.docs(spark, 4400, DocsGen.goldenScenario.take(11)).cache()
    val ref = Fit.fit(docs.filter($"part" === 0), snapshotId = 1L, maxSample = 200)
    val (summaries, _) = PartStats.computeFused(docs, 200, edges = ref.offsetEdges.toSeq)
    val emd = DriftChecks.emd("t", 0.01, ref, summaries).map(v => v.part -> v).toMap
    val jsd = DriftChecks.jsd("t", 0.01, ref, summaries).map(v => v.part -> v).toMap
    // control part 0 IS the reference window: both distances exactly zero
    assert(emd(0).distance == 0.0)
    assert(jsd(0).distance == 0.0)
    assert(emd(0).metrics("exact_cdf") == 1.0)
    // gap-noise ladder (parts 1..5, sigma 1->16): strong rungs move more
    // earth than weak ones and all move more than control
    assert(emd(5).distance > emd(1).distance)
    assert(emd(4).distance > emd(1).distance)
    assert((1 to 5).forall(p => emd(p).distance > 0.0))
    // kind-tilt ladder (parts 6..10, tilt .1->1.6): JSD strictly orders the
    // strong rungs and the strongest is drift-worthy on the index gate
    assert(jsd(10).distance > jsd(7).distance)
    assert(jsd(9).distance > jsd(6).distance)
    assert((6 to 10).forall(p => jsd(p).distance > jsd(0).distance))
    // tilt does not move offsets: EMD stays near control on the tilt ladder
    assert((6 to 10).forall(p => emd(p).distance < emd(5).distance))
    docs.unpersist()
  }

  test("exact-grid EMD/JSD verdicts are parallelism-invariant (bit-identical 2 vs 8 partitions)") {
    val docs = DocsGen.docs(spark, 2200, DocsGen.goldenScenario.take(6))
    val ref = Fit.fit(docs.filter($"part" === 0), snapshotId = 1L, maxSample = 200)
    def at(n: Int) = {
      val (sm, _) = PartStats.computeFused(docs.repartition(n), 200,
        edges = ref.offsetEdges.toSeq)
      (DriftChecks.emd("t", 0.01, ref, sm).map(v => (v.part, v.distance, v.p_value)),
        DriftChecks.jsd("t", 0.01, ref, sm).map(v => (v.part, v.distance, v.p_value)))
    }
    val (e2, j2) = at(2)
    val (e8, j8) = at(8)
    assert(e2 == e8)
    assert(j2 == j8)
  }

  test("corrShift: rotated joint flags while an identical window doesn't; guards loud") {
    // window 0 (ref): y = x (r = 1); window 1: y = -x (r = -1, delta 2);
    // window 2: y = x again (delta 0). Marginals of 1 match 0 exactly —
    // only the joint statistic separates them.
    val rows = (1 to 50).flatMap { i =>
      Seq((0, i.toDouble, i.toDouble), (1, i.toDouble, -i.toDouble),
        (2, i.toDouble, i.toDouble))
    }
    val df = rows.toDF("w", "x", "y")
    val r = DriftChecks.corrShift(df, "x", "y", "w", refWindow = 0, threshold = 0.5)
      .collect().map(x => x.getInt(0) -> (x.getDouble(3), x.getBoolean(4))).toMap
    assert(r(1) == ((2.0, true)) && r(2) == ((0.0, false)))
    val reparted = DriftChecks.corrShift(df.repartition(9), "x", "y", "w",
        refWindow = 0, threshold = 0.5)
      .collect().map(x => x.getInt(0) -> (x.getDouble(3), x.getBoolean(4))).toMap
    assert(reparted == r)
    assert(intercept[IllegalArgumentException](DriftChecks.corrShift(
      df, "x", "y", "w", refWindow = 99)).getMessage.contains("reference window"))
    // zero-variance reference (corr undefined) fails loud, not null-silent
    val flat = Seq((0, 1.0, 5.0), (0, 2.0, 5.0), (1, 1.0, 2.0), (1, 2.0, 3.0))
      .toDF("w", "x", "y")
    assert(intercept[IllegalArgumentException](DriftChecks.corrShift(
      flat, "x", "y", "w", refWindow = 0)).getMessage.contains("zero variance"))
    assert(intercept[IllegalArgumentException](DriftChecks.corrShift(
      df, "x", "y", "w", refWindow = 0, threshold = 0.0))
      .getMessage.contains("threshold"))
  }
}
