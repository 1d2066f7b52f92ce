package graft.tools

import org.apache.spark.sql.SparkSession
import graft.checks.PartStats

/** Scan-phase scaling probe: runs ONLY the fused DocStatsAgg scan over a
  * pre-written parquet docs table, N passes, printing wall-clock plus the
  * process's user/sys CPU seconds per pass (from /proc/self/stat). Separates
  * "tasks are CPU-starved" (wall >> cpu/cores) from "kernel time dominates"
  * (stime ≈ utime) — the two failure modes that cap local[32] scaling on a
  * syscall-expensive sandbox kernel.
  *
  * Usage: ScanProbe <cores> <passes> <dataDir>
  */
object ScanProbe {
  def main(args: Array[String]): Unit = {
    val cores = args(0).toInt
    val passes = args(1).toInt
    val dir = args(2)
    val spark = SparkSession.builder()
      .master(s"local[$cores]")
      .config("spark.sql.shuffle.partitions", cores.toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val docs = spark.read.parquet(dir)
    (1 to passes).foreach { i =>
      val (u0, s0) = ProcStat.cpuTimes()
      val t0 = System.nanoTime()
      val (sm, _) = PartStats.computeFused(docs, 1000, graft.sketch.DocStatsAgg.ModeBoth)
      val wall = (System.nanoTime() - t0) / 1e9
      val (u1, s1) = ProcStat.cpuTimes()
      val nd = sm.values.map(_.nDocs).sum
      println(f"pass $i cores=$cores wall=$wall%.2f user=${u1 - u0}%.1f sys=${s1 - s0}%.1f cpuUtil=${(u1 - u0 + s1 - s0) / wall / cores}%.2f docs=$nd")
    }
    spark.stop()
  }
}
