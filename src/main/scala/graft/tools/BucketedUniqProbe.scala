package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Bucketed-vs-plain uniqueness A/B at volume (P20 wired into E5): generates
  * the golden docs once, writes them (a) as plain parquet and (b) as a
  * doc_id-bucketed catalog table, then interleaves timed uniqueness passes
  * over both layouts — `uniquenessAuto` must pick the zero-exchange path on
  * (b) and the hash-pair single-shuffle path on (a), with identical stats.
  * Interleaved min-of-N reporting (the r3 bench lesson: VM noise bursts can
  * counterfeit a regression in back-to-back layouts).
  *
  * Usage: BucketedUniqProbe [nDocs] [cores] [passes]  (default 5.4M, 32, 3)
  */
object BucketedUniqProbe {
  def main(args: Array[String]): Unit = {
    val nDocs = args.headOption.map(_.toLong).getOrElse(5400000L)
    val cores = if (args.length > 1) args(1).toInt else 32
    val passes = if (args.length > 2) args(2).toInt else 3
    val spark = SparkSession.builder()
      .master(s"local[$cores]")
      .appName("graft-bucketed-uniq-probe")
      .config("spark.sql.shuffle.partitions", cores.toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val base = java.nio.file.Files.createTempDirectory("bucketed_uniq_probe")
    val plainPath = s"$base/plain"
    val docs = graft.model.DocsGen.docs(spark, nDocs,
      graft.model.DocsGen.goldenScenario.take(16)) // part 15 injects dup ids
    docs.write.mode("overwrite").parquet(plainPath)
    val plain = spark.read.parquet(plainPath)
    println(s"writing bucketed layout (the pay-once ingest shuffle)...")
    val tW0 = System.nanoTime()
    graft.engine.BucketedTables.commit(spark, "bucketed_uniq_probe",
      plain, "doc_id", cores * 4)
    println(f"bucketed ingest write: ${(System.nanoTime() - tW0) / 1e9}%.2f s")
    val bucketed = graft.engine.BucketedTables.read(spark, "bucketed_uniq_probe")
    require(graft.checks.ConstraintChecks.docIdGroupingIsShuffleFree(bucketed))
    require(!graft.checks.ConstraintChecks.docIdGroupingIsShuffleFree(plain))

    def pass(name: String, df: org.apache.spark.sql.DataFrame): (Double, Long, Long) = {
      val (u0, s0) = ProcStat.cpuTimes()
      val t0 = System.nanoTime()
      val (_, stats) = graft.checks.ConstraintChecks.uniquenessAuto(df, name)
      val wall = (System.nanoTime() - t0) / 1e9
      val (u1, s1) = ProcStat.cpuTimes()
      println(f"$name%-9s wall=$wall%.2f cpu=${u1 - u0 + s1 - s0}%.1f " +
        f"dups=${stats.values.map(_.dupKeys).sum} " +
        f"distinct=${stats.values.map(_.distinctKeys).sum}")
      (wall, stats.values.map(_.dupKeys).sum, stats.values.map(_.distinctKeys).sum)
    }
    val results = (1 to passes).flatMap { i =>
      Seq("plain" -> pass(s"plain", plain), "bucketed" -> pass(s"bucketed", bucketed))
    }
    val g = results.groupBy(_._1).view.mapValues(_.map(_._2)).toMap
    val (pw, bw) = (g("plain").map(_._1).min, g("bucketed").map(_._1).min)
    require(g.values.flatten.map(r => (r._2, r._3)).toSet.size == 1,
      "stats diverged between layouts")
    println(f"min-of-$passes: plain=$pw%.2f s bucketed=$bw%.2f s speedup=${pw / bw}%.2fx " +
      s"(nDocs=$nDocs cores=$cores)")
    spark.stop()
    org.apache.commons.io.FileUtils.deleteDirectory(base.toFile)
  }
}
