package graft.checks

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.model.DocsGen

/** The exact fixed-edge CDF grid behind the deterministic KS/PSI verdicts
  * (round-4 determinism contract: ks/psi are bit-identical at any
  * parallelism, like every other check). Verifies the grid against
  * brute-force quantiles, the exact KS/PSI statistics against direct
  * recomputation from the raw offsets, the KLL fallback when the fit lacks
  * the grid, and the persisted-state roundtrip. */
class ExactCdfSpec extends AnyFunSuite {
  lazy val spark = graft.SparkTestBase.spark
  import spark.implicits._

  lazy val docs = DocsGen.docs(spark, 3000, DocsGen.goldenScenario.take(5)).cache()
  lazy val refWindow = docs.filter($"part" === 0)
  lazy val ref = Fit.fit(refWindow, snapshotId = 7L, maxSample = 200)

  private def rawOffsets(df: org.apache.spark.sql.DataFrame): Array[Int] =
    df.select(explode(col("spans.offset")).as("o")).as[Int].collect().sorted

  test("binLutOf: O(1) bin lookup agrees with binary search over the whole domain; " +
    "degenerate grids fall back to null") {
    import graft.sketch.DocStatsBuffer
    // a realistic uneven integer grid
    val edges = Array(0.0, 3.0, 4.0, 10.0, 11.0, 12.0, 250.0)
    val lut = DocStatsBuffer.binLutOf(edges)
    assert(lut != null && lut.length == 251)
    (0 to 250).foreach { o =>
      val idx = java.util.Arrays.binarySearch(edges, o.toDouble)
      val want = if (idx >= 0) idx else -idx - 1
      assert(lut(o) == want, s"offset $o")
    }
    // non-integral, negative, and oversized grids refuse the table
    assert(DocStatsBuffer.binLutOf(Array(1.5, 2.0)) == null)
    assert(DocStatsBuffer.binLutOf(Array(-1.0, 2.0)) == null)
    assert(DocStatsBuffer.binLutOf(Array(1.0, 70000.0)) == null)
    assert(DocStatsBuffer.binLutOf(Array.empty[Double]) == null)
    // the fused scan's histogram equals one computed through the fallback
    // (no-LUT) path: compare against a direct SQL bin count on real docs
    val (sm, _) = PartStats.computeFused(refWindow, 10,
      edges = ref.offsetEdges.toSeq)
    val hist = sm(0).offsetEdgeCounts
    val offs = rawOffsets(refWindow)
    val want = Array.tabulate(ref.offsetEdges.length + 1) { j =>
      if (j < ref.offsetEdges.length)
        offs.count(o => o <= ref.offsetEdges(j) &&
          (j == 0 || o > ref.offsetEdges(j - 1))).toLong
      else offs.count(_ > ref.offsetEdges.last).toLong
    }
    assert(hist.toSeq == want.toSeq)
  }

  test("exactOffsetEdges matches brute-force CDF quantiles") {
    val (edges, cum) = Fit.exactOffsetEdges(refWindow, gridSize = 201)
    assert(edges.nonEmpty && edges.length == cum.length)
    assert(edges.sameElements(edges.sorted) && edges.distinct.length == edges.length)
    val all = rawOffsets(refWindow)
    val n = all.length.toLong
    // exact cumulative count at each reported edge
    edges.zip(cum).foreach { case (e, c) =>
      assert(all.count(_ <= e).toLong == c, s"cum at edge $e")
    }
    // last edge is the reference max (q = 1.0 ⇒ F_ref = 1 exactly)
    assert(edges.last == all.last.toDouble && cum.last == n)
    // each grid quantile is hit: for q_i = i/200 the smallest value with
    // cum ≥ q_i·n must be among the edges
    (1 to 200).foreach { i =>
      val v = all(math.min(((i.toLong * n + 199) / 200).toInt - 1, all.length - 1))
      assert(edges.contains(v.toDouble), s"grid quantile $i/200 value $v missing")
    }
  }

  test("exact KS statistic equals direct recomputation; verdict flags exact_cdf") {
    val (summaries, _) = PartStats.computeFused(docs, maxSample = 50,
      mode = graft.sketch.DocStatsAgg.ModeStats, edges = ref.offsetEdges.toSeq)
    val verdicts = DriftChecks.ks("t", 0.01, ref, summaries)
    val refOffs = rawOffsets(refWindow)
    val nRef = refOffs.length.toLong
    verdicts.foreach { v =>
      assert(v.metrics.get("exact_cdf").contains(1.0), s"part ${v.part} ran fallback")
      val prod = rawOffsets(docs.filter($"part" === v.part))
      val nProd = prod.length.toLong
      val d = ref.offsetEdges.map { e =>
        math.abs(refOffs.count(_ <= e).toDouble / nRef -
          prod.count(_ <= e).toDouble / nProd)
      }.max
      assert(v.distance == d, s"part ${v.part}: ${v.distance} vs $d")
    }
  }

  test("exact PSI equals direct recomputation from decile buckets") {
    val (summaries, _) = PartStats.computeFused(docs, maxSample = 50,
      mode = graft.sketch.DocStatsAgg.ModeStats, edges = ref.offsetEdges.toSeq)
    val verdicts = DriftChecks.psi("t", 0.01, ref, summaries)
    val refOffs = rawOffsets(refWindow)
    val nRef = refOffs.length.toLong
    // decile boundary selection replayed exactly as DriftChecks.psi does
    val cumAll = ref.refEdgeCum
    val idx = {
      val b = Array.newBuilder[Int]
      var last = -1
      for (i <- 1 to 9) {
        val j = cumAll.indexWhere(c => c * 10 >= i.toLong * nRef)
        if (j >= 0 && j != last) { b += j; last = j }
      }
      b.result()
    }
    val bounds = idx.map(ref.offsetEdges)
    def props(offs: Array[Int]): Array[Double] = {
      val n = offs.length.toDouble
      val cum = bounds.map(e => offs.count(_ <= e).toDouble) :+ offs.length.toDouble
      cum.zip(0.0 +: cum.dropRight(1)).map { case (hi, lo) => (hi - lo) / n }
    }
    val rp = props(refOffs)
    verdicts.foreach { v =>
      assert(v.metrics.get("exact_cdf").contains(1.0))
      val prod = rawOffsets(docs.filter($"part" === v.part))
      val expected = graft.stats.StatMath.psi(rp, props(prod))
      assert(math.abs(v.distance - expected) < 1e-12,
        s"part ${v.part}: ${v.distance} vs $expected")
    }
  }

  test("KLL fallback still fires when the fit lacks the exact grid") {
    val legacy = ref.copy(offsetEdges = Array.empty, refEdgeCum = Array.empty)
    val (summaries, _) = PartStats.computeFused(docs, maxSample = 50,
      mode = graft.sketch.DocStatsAgg.ModeStats)
    val ks = DriftChecks.ks("t", 0.01, legacy, summaries)
    val psi = DriftChecks.psi("t", 0.01, legacy, summaries)
    (ks ++ psi).foreach { v =>
      assert(!v.metrics.contains("exact_cdf"), s"${v.check_id} part ${v.part}")
      assert(v.distance >= 0.0)
    }
    // mixed case: grid present on the ref but scan ran WITHOUT edges — the
    // width test must reject the mismatch and fall back, not misread bins
    val ksMixed = DriftChecks.ks("t", 0.01, ref, summaries)
    ksMixed.foreach(v => assert(!v.metrics.contains("exact_cdf")))
  }

  test("save/load roundtrip preserves the exact grid") {
    val tmp = java.nio.file.Files.createTempDirectory("refstate").toString
    Fit.save(spark, ref, s"$tmp/state")
    val loaded = Fit.load(spark, s"$tmp/state")
    assert(loaded.offsetEdges.sameElements(ref.offsetEdges))
    assert(loaded.refEdgeCum.sameElements(ref.refEdgeCum))
  }
}
