package graft.checks

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.stats.StatMath

/** Sliced chi² drift (E37): the fully-relational (window × slice) two-sample
  * homogeneity statistic must equal the driver-side StatMath arithmetic the
  * flagship chi2 check uses, drop the same degenerate grains, isolate
  * per-slice shifts, and read exactly 0 on the reference's self-comparison. */
class SlicedChi2Spec extends AnyFunSuite {
  lazy val spark = graft.SparkTestBase.spark
  import spark.implicits._

  // counts → replicated rows: (window, slice, category) grain
  private def rowsOf(counts: (Int, String, String, Int)*) =
    counts.flatMap { case (w, s, k, n) => Seq.fill(n)((w, s, k)) }
      .toDF("w", "s", "k")

  private val df = rowsOf(
    // slice A, ref window 0: 60/40 x/y; window 1 SHIFTED to 20/80
    (0, "A", "x", 60), (0, "A", "y", 40),
    (1, "A", "x", 20), (1, "A", "y", 80),
    // slice B: identical mix in both windows (no drift)
    (0, "B", "x", 50), (0, "B", "y", 50),
    (1, "B", "x", 48), (1, "B", "y", 52))

  test("relational stat equals StatMath.chi2TwoSample per (window, slice)") {
    val (rel, release) = DriftChecks.chi2Sliced(df, "w", "s", "k", 0)
    val got = try rel.collect().map(r => (r.getInt(0), r.getString(1)) -> r).toMap
      finally release()
    def expect(ref: Seq[Long], prod: Seq[Long]) =
      StatMath.chi2TwoSample(ref.toArray, prod.toArray)._1
    assert(math.abs(got((1, "A")).getAs[Double]("stat") -
      expect(Seq(60, 40), Seq(20, 80))) < 1e-9)
    assert(math.abs(got((1, "B")).getAs[Double]("stat") -
      expect(Seq(50, 50), Seq(48, 52))) < 1e-9)
    // the drifted slice carries the signal, the stable slice does not
    assert(got((1, "A")).getAs[Double]("stat") > 30.0)
    assert(got((1, "B")).getAs[Double]("stat") < 1.0)
    // self-comparison control: the reference window reads EXACTLY 0
    assert(got((0, "A")).getAs[Double]("stat") == 0.0)
    assert(got((0, "B")).getAs[Double]("stat") == 0.0)
    // bookkeeping: totals and dof
    assert(got((1, "A")).getAs[Long]("n_ref") == 100L &&
      got((1, "A")).getAs[Long]("n_prod") == 100L &&
      got((1, "A")).getAs[Int]("dof") == 1)
  }

  test("degenerate grains drop: slice absent from the reference emits no row") {
    val extra = df.union(rowsOf((1, "C", "x", 30), (1, "C", "y", 10)))
    val (rel, release) = DriftChecks.chi2Sliced(extra, "w", "s", "k", 0)
    val got = try rel.select("w", "s").as[(Int, String)].collect().toSet
      finally release()
    assert(!got.exists(_._2 == "C"), "no reference side -> no test")
    assert(got == Set((0, "A"), (0, "B"), (1, "A"), (1, "B")))
  }

  test("stat is partitioning-invariant at the rounding grain") {
    def run(d: org.apache.spark.sql.DataFrame) = {
      val (rel, release) = DriftChecks.chi2Sliced(d, "w", "s", "k", 0)
      try rel.select($"w", $"s", round($"stat", 6).as("st"))
        .as[(Int, String, Double)].collect().sorted.toSeq
      finally release()
    }
    assert(run(df) == run(df.repartition(13)))
  }

  test("sliced KS: exact empirical-CDF D per (window, slice), self-comparison 0, slice isolation") {
    // numeric fixture at the value grain: slice A shifts up in window 1
    val ndf = Seq(
      (0, "A", 1, 50), (0, "A", 2, 30), (0, "A", 3, 20),
      (1, "A", 1, 10), (1, "A", 2, 30), (1, "A", 3, 60),
      (0, "B", 1, 40), (0, "B", 2, 60),
      (1, "B", 1, 42), (1, "B", 2, 58)
    ).flatMap { case (w, s, v, n) => Seq.fill(n)((w, s, v)) }.toDF("w", "s", "v")
    val (rel, release) = DriftChecks.ksSliced(ndf, "w", "s", "v", 0)
    val got = try rel.collect().map(r => (r.getInt(0), r.getString(1)) -> r).toMap
      finally release()
    // hand D for (1,A): ref cum props (.5,.8,1), prod (.1,.4,1) -> max .4
    assert(math.abs(got((1, "A")).getAs[Double]("ks_d") - 0.4) < 1e-12)
    // (1,B): cum (.4,1) vs (.42,1) -> .02
    assert(math.abs(got((1, "B")).getAs[Double]("ks_d") - 0.02) < 1e-12)
    assert(got((0, "A")).getAs[Double]("ks_d") == 0.0 &&
      got((0, "B")).getAs[Double]("ks_d") == 0.0)
    assert(got((1, "A")).getAs[Long]("n_ref") == 100L &&
      got((1, "A")).getAs[Long]("n_prod") == 100L)
    // verdict tier agrees with StatMath's Kolmogorov asymptotics
    val v = DriftChecks.ksSlicedVerdicts(ndf, "w", "s", "v", 0)
      .collect().map(r => (r.getInt(0), r.getString(1)) -> r).toMap
    val a = v((1, "A"))
    assert(a.getAs[Double]("p_value") ==
      graft.stats.StatMath.ksPValue(a.getAs[Double]("ks_d"), 100L, 100L))
    assert(a.getAs[Boolean]("is_drift") && !v((1, "B")).getAs[Boolean]("is_drift"))
  }

  test("sliced PSI: per-slice deciles from the slice's own reference, StatMath parity, overflow absorption") {
    // slice A: ref uniform over 1..10 (10 crisp deciles); window 1 shifts
    // mass up AND adds values beyond the ref max (overflow -> last bucket).
    // slice B: identical windows -> psi ~ 0 (eps-floor exact zero).
    val ndf = (
      (1 to 10).flatMap(v => Seq.fill(10)((0, "A", v))) ++
        (1 to 5).flatMap(v => Seq.fill(4)((1, "A", v))) ++
        (6 to 12).flatMap(v => Seq.fill(10)((1, "A", v))) ++
        Seq.fill(50)((0, "B", 1)) ++ Seq.fill(50)((0, "B", 2)) ++
        Seq.fill(50)((1, "B", 1)) ++ Seq.fill(50)((1, "B", 2))
      ).toDF("w", "s", "v")
    val (rel, release) = DriftChecks.psiSliced(ndf, "w", "s", "v", 0)
    val got = try rel.collect().map(r => (r.getInt(0), r.getString(1)) -> r).toMap
      finally release()
    // parity with the driver-side StatMath.psi over hand-built proportions:
    // ref deciles of slice A are exactly v=1..10; window-1 mass per bucket
    // is count(v)=b for b<=10 plus overflow (11, 12) absorbed into b=10
    val refProps = Array.fill(10)(0.1)
    val prodCounts = Array.tabulate(10)(i =>
      (if (i < 5) 4 else 10) + (if (i == 9) 20 else 0)).map(_.toDouble)
    val nProd = prodCounts.sum
    val expected = graft.stats.StatMath.psi(refProps, prodCounts.map(_ / nProd))
    assert(math.abs(got((1, "A")).getAs[Double]("psi") - expected) < 1e-12)
    assert(got((1, "A")).getAs[Long]("n_prod") == nProd.toLong)
    // identical windows read (numerically) zero; self-comparison exactly so
    assert(math.abs(got((1, "B")).getAs[Double]("psi")) < 1e-12)
    assert(got((0, "A")).getAs[Double]("psi") == 0.0)
    // partitioning invariance at the rounding grain
    val (rel2, release2) = DriftChecks.psiSliced(ndf.repartition(11), "w", "s", "v", 0)
    val again = try rel2.collect().map(r =>
      (r.getInt(0), r.getString(1)) -> BigDecimal(r.getAs[Double]("psi"))
        .setScale(9, BigDecimal.RoundingMode.HALF_UP)).toMap
      finally release2()
    assert(again == got.view.mapValues(r => BigDecimal(r.getAs[Double]("psi"))
      .setScale(9, BigDecimal.RoundingMode.HALF_UP)).toMap)
  }

  test("verdict tier: p from the incomplete gamma, is_drift at alpha") {
    val v = DriftChecks.chi2SlicedVerdicts(df, "w", "s", "k", 0, alpha = 0.01)
      .collect().map(r => (r.getInt(0), r.getString(1)) -> r).toMap
    val a = v((1, "A"))
    assert(a.getAs[Double]("p_value") ==
      StatMath.chi2Sf(a.getAs[Double]("stat"), a.getAs[Int]("dof")))
    assert(a.getAs[Boolean]("is_drift"))
    assert(!v((1, "B")).getAs[Boolean]("is_drift"))
    assert(!v((0, "A")).getAs[Boolean]("is_drift"))
  }
}
