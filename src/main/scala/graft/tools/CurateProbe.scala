package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Curation-at-volume probe: the composed near-dup curation pipeline
  * (exact dedup → MinHash+LSH verified pairs → drop → quality/language
  * gates) measured at ≥10M docs with injected near-dup mass — wall, shuffle
  * bytes, pair/drop/survivor counts. The pipeline is DuckDB-oracled at
  * sf0.01 (`curation_near_dup`, `curation_cc`); this probe is the VOLUME
  * evidence that its banded-join shape holds at corpus scale. Results
  * recorded in BASELINE.md.
  *
  * Corpus: deterministic ~30-token docs from a 4k vocabulary (SplitMix64
  * per id — band collisions between unrelated docs are vanishingly rare, so
  * candidate mass is dominated by the INJECTED near-dups: every 20th doc
  * gains a one-word-perturbed copy, plus stopword/letter mix sized to pass
  * the gates).
  *
  * `runMain graft.tools.CurateProbe [nDocs] [cc]` (default 10,000,000;
  * pass `cc` to ALSO run the connected-components canonicalization).
  */
object CurateProbe {
  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toLong).getOrElse(10000000L)
    val runCc = args.contains("cc")
    val cores = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cores]")
      .appName("graft-curate-probe")
      .config("spark.sql.shuffle.partitions", cores)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    val meter = new ProbeUtil.ShuffleMeter
    spark.sparkContext.addSparkListener(meter)

    val dir = java.nio.file.Files.createTempDirectory("curate-probe").toString
    val (base, tGen) = ProbeUtil.time(ProbeCorpus.writeBase(spark, n, dir))
    // near-dup mass: every 20th doc gains a one-word-perturbed copy
    val corpus = ProbeCorpus.withNearDups(base, n)
    val total = n + n / 20
    println(f"generated $n base docs in $tGen%.1f s (corpus $total with injected near-dups)")

    val s0 = meter.snapshot
    val (pairRows, tPairs) = ProbeUtil.time {
      graft.ops.Dedup.minhashLshPairs(corpus, "doc_id", "text", threshold = 0.5).count()
    }
    val s1 = meter.snapshot
    println(f"minhashLshPairs: $tPairs%8.1f s, $pairRows verified pairs, " +
      f"shuffle r/w ${(s1._1 - s0._1) / 1e9}%.2f/${(s1._2 - s0._2) / 1e9}%.2f GB")

    val (survivors, tCur) = ProbeUtil.time {
      graft.ops.Curate.curateWithNearDup(corpus).count()
    }
    val s2 = meter.snapshot
    println(f"curateWithNearDup: $tCur%8.1f s, $survivors survivors of $total " +
      f"(${total / tCur}%.0f docs/s), shuffle r/w ${(s2._1 - s1._1) / 1e9}%.2f/" +
      f"${(s2._2 - s1._2) / 1e9}%.2f GB")

    val (stagedSurvivors, tStaged) = ProbeUtil.time {
      graft.ops.Curate.curateWithNearDupStaged(corpus, s"$dir/staged").count()
    }
    val sS = meter.snapshot
    println(f"curateWithNearDupStaged: $tStaged%8.1f s, $stagedSurvivors survivors " +
      f"(${total / tStaged}%.0f docs/s), shuffle r/w ${(sS._1 - s2._1) / 1e9}%.2f/" +
      f"${(sS._2 - s2._2) / 1e9}%.2f GB")
    if (stagedSurvivors != survivors)
      println(s"MISMATCH: staged $stagedSurvivors != one-plan $survivors")

    if (runCc) {
      val (ccSurvivors, tCc) = ProbeUtil.time {
        graft.ops.Curate.curateWithNearDupCC(corpus).count()
      }
      val s3 = meter.snapshot
      println(f"curateWithNearDupCC: $tCc%8.1f s, $ccSurvivors survivors " +
        f"(${total / tCc}%.0f docs/s), shuffle r/w ${(s3._1 - sS._1) / 1e9}%.2f/" +
        f"${(s3._2 - sS._2) / 1e9}%.2f GB")
      // quality policy: same components, survivor = best gate quality —
      // survivor COUNT must equal the min-id policy's (one per component)
      val (qSurvivors, tQ) = ProbeUtil.time {
        graft.ops.Curate.curateWithNearDupQualityCC(corpus).count()
      }
      val s4 = meter.snapshot
      println(f"curateWithNearDupQualityCC: $tQ%8.1f s, $qSurvivors survivors " +
        f"(${total / tQ}%.0f docs/s), shuffle r/w ${(s4._1 - s3._1) / 1e9}%.2f/" +
        f"${(s4._2 - s3._2) / 1e9}%.2f GB")
      if (qSurvivors != ccSurvivors)
        println(s"NOTE: quality policy kept $qSurvivors vs min-id $ccSurvivors " +
          "— differing counts mean a gate disagreement, not a component one " +
          "(a best-quality survivor can pass a gate its min-id twin fails)")
    }

    try { import scala.sys.process._; Seq("rm", "-rf", dir).! }
    catch { case _: Throwable => }
    spark.stop()
  }
}
