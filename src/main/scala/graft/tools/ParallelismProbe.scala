package graft.tools

import org.apache.spark.sql.SparkSession
import graft.engine.{RunConfig, ValidationRun}
import graft.checks.Fit
import graft.model.DocsGen

/** Parallelism-invariance probe: runs the FULL validation pass over the
  * identical golden-scenario input at two parallelism levels (sequential
  * SparkSessions — one JVM holds one context at a time) and compares every
  * verdict field. The SURVEY determinism contract: verdicts must not depend
  * on task placement — the generator is hash-deterministic, sample
  * selection is full-order deterministic, permutation seeds derive from
  * (randomState, part, permId), and — since round 4 — the KS/PSI verdicts
  * compare EXACT integer-sum CDFs at the fitted reference's fixed quantile
  * grid (RefState.offsetEdges) instead of merge-order-dependent KLL sketch
  * ranks. Every verdict must therefore be bit-identical; the banded
  * comparison survives only for runs whose fit lacked the exact grid
  * (verdict detail `exact_cdf` absent — the documented KLL fallback).
  *
  * `runMain graft.tools.ParallelismProbe [nDocs]` (default 18000).
  */
object ParallelismProbe {
  private def runAt(cores: Int, nDocs: Long): Map[(Int, String), graft.checks.Verdict] = {
    val spark = SparkSession.builder()
      .master(s"local[$cores]")
      .appName(s"graft-par-probe-$cores")
      .config("spark.sql.shuffle.partitions", cores.toString)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    val docs = DocsGen.docs(spark, nDocs, DocsGen.goldenScenario)
    val media = DocsGen.media(spark)
    val ref = Fit.fit(docs.filter($"part" === 0), snapshotId = 1L, maxSample = 400)
    val res = ValidationRun.run(docs, media, ref,
      RunConfig(runId = s"par$cores", alpha = 0.01, maxSample = 400))
    val out = res.verdicts.collect().map(v => (v.part, v.check_id) -> v).toMap
    spark.stop()
    out
  }

  def main(args: Array[String]): Unit = {
    val nDocs = args.headOption.map(_.toLong).getOrElse(18000L)
    val a = runAt(2, nDocs)
    val b = runAt(8, nDocs)
    require(a.keySet == b.keySet, s"verdict key sets differ: ${a.size} vs ${b.size}")
    val sketchBased = Set("ks_offset", "psi_offset", "emd_offset")
    var exact = 0
    var banded = 0
    a.keys.toSeq.sorted.foreach { k =>
      val (va, vb) = (a(k), b(k))
      require(va.passed == vb.passed && va.is_drift == vb.is_drift, s"$k flags differ")
      val kllFallback = sketchBased(k._2) && !va.metrics.contains("exact_cdf")
      if (kllFallback) {
        val tol = math.max(0.05, 0.25 * math.max(va.distance, vb.distance))
        require(math.abs(va.distance - vb.distance) < tol,
          s"$k distance ${va.distance} vs ${vb.distance}")
        banded += 1
      } else {
        require(va.distance == vb.distance && va.p_value == vb.p_value,
          s"$k: ${va.distance}/${va.p_value} vs ${vb.distance}/${vb.p_value}")
        exact += 1
      }
    }
    require(banded == 0,
      s"$banded ks/psi verdicts ran the KLL fallback - the exact-CDF grid " +
        "should be active on this fixture (fit produced no offsetEdges?)")
    println(s"parallelism-invariance local[2] vs local[8] over ${a.size} verdicts: " +
      s"$exact bit-identical (ALL checks incl. exact-CDF ks/psi) — PASS")
  }
}
