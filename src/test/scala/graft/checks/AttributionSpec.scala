package graft.checks

import org.scalatest.funsuite.AnyFunSuite
import graft.model.DocsGen
import graft.stats.StatMath

/** Drift root-cause attribution (E30): per-category chi² and per-bucket PSI
  * contribution decompositions. The load-bearing law: contributions SUM to
  * the verdict's distance bit for bit — attribution that disagrees with the
  * verdict it explains is worse than none. */
class AttributionSpec extends AnyFunSuite {
  lazy val spark = graft.SparkTestBase.spark
  import spark.implicits._

  private lazy val (ref, summaries) = {
    val docs = DocsGen.docs(spark, 18000, DocsGen.goldenScenario)
    val r = Fit.fit(docs.filter($"part" === 0), snapshotId = 1L, maxSample = 200)
    val (sm, _) = PartStats.computeFused(docs, maxSample = 8,
      mode = graft.sketch.DocStatsAgg.ModeStats, edges = r.offsetEdges.toSeq)
    (r, sm)
  }

  test("chi2 law: per-part contribution sums equal the chi2_kind distance bit for bit") {
    val verdicts = DriftChecks.chi2("r", 0.01, ref, summaries)
      .map(v => v.part -> v.distance).toMap
    val attrib = DriftChecks.chi2Attribution(ref, summaries)
    assert(attrib.nonEmpty)
    val byPart = attrib.groupBy(_.part)
    assert(byPart.keySet == summaries.keySet) // golden: no degenerate part
    byPart.foreach { case (p, rows) =>
      // ascending-kind order IS ascending-index order (cats sorted)
      val sum = rows.sortBy(_.kind).map(_.contribution).foldLeft(0.0)(_ + _)
      assert(sum == verdicts(p), s"part $p")
      val shares = rows.map(_.share).sum
      if (verdicts(p) > 0) assert(math.abs(shares - 1.0) < 1e-9, s"part $p")
    }
  }

  test("chi2 attribution: the tilted kind dominates on the kind-tilt ladder") {
    val attrib = DriftChecks.chi2Attribution(ref, summaries)
    // parts 6-10 tilt the kind mix progressively (DocsGen golden ladder) —
    // the strongest rung's top contributor must carry more share than any
    // single category does on the control part
    val top10 = attrib.filter(_.part == 10).maxBy(_.contribution)
    val top0 = attrib.filter(_.part == 0).map(_.contribution).max
    assert(top10.contribution > top0 * 100)
    assert(top10.share > 0.2)
  }

  test("psi law: per-part bucket contributions equal the psi_offset distance bit for bit") {
    val verdicts = DriftChecks.psi("r", 0.01, ref, summaries)
      .map(v => v.part -> v.distance).toMap
    val attrib = DriftChecks.psiAttribution(ref, summaries)
    val byPart = attrib.groupBy(_.part)
    assert(byPart.keySet == summaries.keySet)
    byPart.foreach { case (p, rows) =>
      val sum = rows.sortBy(_.bucket).map(_.contribution).foldLeft(0.0)(_ + _)
      assert(sum == verdicts(p), s"part $p")
      // bucket bounds tile the line: -inf first, +inf last, contiguous
      val sorted = rows.sortBy(_.bucket)
      assert(sorted.head.lo.isNegInfinity && sorted.last.hi.isPosInfinity)
      sorted.sliding(2).foreach { case Seq(a, b) => assert(a.hi == b.lo) }
      // proportions are distributions (ref exactly; prod ≤ 1, < 1 iff the
      // part pushed mass outside every bucket, impossible here)
      assert(math.abs(sorted.map(_.ref_prop).sum - 1.0) < 1e-9)
      assert(math.abs(sorted.map(_.prod_prop).sum - 1.0) < 1e-9)
    }
  }

  test("psi attribution: gap-noise rung moves tail buckets, control is flat") {
    val attrib = DriftChecks.psiAttribution(ref, summaries)
    val p5 = attrib.filter(_.part == 5) // strongest gap-noise rung
    val p0 = attrib.filter(_.part == 0)
    assert(p5.map(_.contribution).max > p0.map(_.contribution).max * 10)
  }

  test("degenerate chi2 inputs emit no attribution rows (matching the (0,1) verdict)") {
    assert(StatMath.chi2Contributions(Array(0L), Array(0L)).isEmpty)
    assert(StatMath.chi2Contributions(Array(5L, 5L), Array(0L, 0L)).isEmpty)
    // single shared category: degenerate (df would be 0)
    assert(StatMath.chi2Contributions(Array(5L), Array(7L)).isEmpty)
    // NaN marks dropped categories, defined elsewhere
    val cs = StatMath.chi2Contributions(
      Array(5L, 0L, 3L), Array(4L, 0L, 6L)).get
    assert(cs(1).isNaN && !cs(0).isNaN && !cs(2).isNaN)
  }

  test("refactored chi2TwoSample is bit-identical on hand values") {
    // pre-refactor hand case from StatMathSpec territory: 2x2
    val (stat, p) = StatMath.chi2TwoSample(Array(10L, 20L), Array(20L, 10L))
    // pooled = .5/.5; eRef = 15,15; eProd = 15,15; stat = 4*(25/15) = 6.666...
    assert(math.abs(stat - 20.0 / 3.0) < 1e-12)
    assert(p > 0 && p < 0.05)
  }
}
