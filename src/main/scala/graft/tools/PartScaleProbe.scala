package graft.tools

import org.apache.spark.sql.SparkSession
import graft.checks.{DriftChecks, Fit, PartStats}
import graft.model.DocsGen

/** High-partition-count probe: evidence that the two round-3 scale paths —
  * the two-level tree merge for the fused digest collect and the fully-
  * distributed MMD — actually run at 10⁴ partitions in one call, and what
  * they cost vs the direct paths at that grain.
  *
  * `runMain graft.tools.PartScaleProbe [parts] [docsPerPart]`
  * (defaults 10000 × 200 = 2M docs). Results recorded in BASELINE.md.
  */
object PartScaleProbe {
  def main(args: Array[String]): Unit = {
    val parts = args.headOption.map(_.toInt).getOrElse(10000)
    val docsPerPart = args.drop(1).headOption.map(_.toInt).getOrElse(200)
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "16")}]")
      .appName("graft-part-scale-probe")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_CPUS", "16"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    val nDocs = parts.toLong * docsPerPart
    println(s"parts=$parts docsPerPart=$docsPerPart nDocs=$nDocs")
    // materialize once so generation cost stays out of every measurement
    val dir = java.nio.file.Files.createTempDirectory("part-scale").toString
    graft.model.DocsGenFast.docs(spark, nDocs, DocsGen.cleanScenario(parts))
      .write.mode("overwrite").parquet(dir)
    val docs = spark.read.parquet(dir)
    val maxSample = 50 // small per-part samples: 10^4 parts of 200 docs each

    // warm-up (JIT + page cache)
    PartStats.computeFusedTree(docs, maxSample, fanIn = 64)

    val (treeRes, tTree) = ProbeUtil.time(PartStats.computeFusedTree(docs, maxSample, fanIn = 64))
    println(f"computeFusedTree  : $tTree%8.2f s  (${treeRes._1.size} summaries, " +
      s"fanIn=64 -> ${(parts + 63) / 64} range rows via toLocalIterator)")
    val (directRes, tDirect) = ProbeUtil.time(PartStats.computeFused(docs, maxSample))
    println(f"computeFused      : $tDirect%8.2f s  (${directRes._1.size} summaries, " +
      "single collect)")

    val ref = Fit.fit(docs.filter($"part" === 0), snapshotId = 1L, maxSample = maxSample)
    val (dv, tDist) = ProbeUtil.time(DriftChecks.mmdDistributed(spark, docs, ref, "probe", 0.01,
      maxSample = maxSample))
    println(f"mmdDistributed    : $tDist%8.2f s  (${dv.size} verdicts, zero driver sample transit)")
    val (mv, tDrv) = ProbeUtil.time {
      val sp = PartStats.computeFused(docs, maxSample,
        graft.sketch.DocStatsAgg.ModeSample)._2
      DriftChecks.mmd(spark, "probe2", 0.01, ref, sp)
    }
    println(f"collect+bcast mmd : $tDrv%8.2f s  (${mv.size} verdicts, samples via driver)")
    val agree = dv.map(v => (v.part, v.distance, v.p_value)).toSet ==
      mv.map(v => (v.part, v.distance, v.p_value)).toSet
    println(s"verdict equality  : $agree")
    try { import scala.sys.process._; Seq("rm", "-rf", dir).! }
    catch { case _: Throwable => }
    spark.stop()
  }
}
