package graft.tools

import org.apache.spark.sql.SparkSession

import graft.checks.MediaIntegrity

/** Volume evidence for the media-integrity probe (E42): generate `n`
  * payload-bearing media rows (PNG/WAV/GVID cycling, every 97th truncated),
  * persist them once, then time the decode-verify `report` scan — the
  * measurement of what payload decode-verify costs per row at corpus
  * scale, on the same narrow no-shuffle shape the 100 TB run would use.
  * Planted-truth exactness is asserted (n_bad must equal the id-rule
  * count), so the throughput number is for a CORRECT probe.
  *
  * `runMain graft.tools.MediaIntegrityProbe [nRows]` (default 1,000,000).
  */
object MediaIntegrityProbe {
  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toLong).getOrElse(1000000L)
    val cores = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cores]")
      .appName("graft-media-integrity-probe")
      .config("spark.sql.shuffle.partitions", cores)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val media = MediaIntegrity.syntheticPayloadMedia(spark, n, corruptEvery = 97)
      .repartition(cores.toInt * 4)
      .persist(org.apache.spark.storage.StorageLevel.DISK_ONLY)
    val t0 = System.nanoTime()
    val rows = media.count() // materialize generation separately from the probe
    val genSec = (System.nanoTime() - t0) / 1e9

    val t1 = System.nanoTime()
    val rep = MediaIntegrity.report(media).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    val probeSec = (System.nanoTime() - t1) / 1e9
    val bad = rep.values.map(_._2).sum
    val expectBad = (0L until n).count(_ % 97 == 0)
    require(bad == expectBad, s"planted-truth mismatch: $bad vs $expectBad")
    require(rep.values.map(_._1).sum == rows)

    println(f"[media-integrity-probe] n=$n%d gen=${genSec}%.1fs " +
      f"probe=${probeSec}%.2fs (${n / probeSec / 1e6}%.2fM payloads/s) " +
      f"bad=$bad per-kind=${rep.toSeq.sortBy(_._1).mkString(", ")}")
    media.unpersist()
    spark.stop()
  }
}
