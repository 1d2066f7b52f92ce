package graft.tools

import org.apache.spark.sql.SparkSession

/** Uniqueness-phase scaling probe: runs ONLY ConstraintChecks.uniqueness
  * over a pre-written docs table, reporting wall + process user/sys CPU per
  * pass (cf. ScanProbe). Isolates where the full pass's 8→32-core CPU
  * inflation comes from. Usage: UniqProbe <cores> <passes> <dataDir> [salts]
  */
object UniqProbe {
  def main(args: Array[String]): Unit = {
    val cores = args(0).toInt
    val passes = args(1).toInt
    val dir = args(2)
    val salts = if (args.length > 3) args(3).toInt else 16
    val spark = SparkSession.builder()
      .master(s"local[$cores]")
      .config("spark.sql.shuffle.partitions", cores.toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val docs = spark.read.parquet(dir)
    (1 to passes).foreach { i =>
      val (u0, s0) = ProcStat.cpuTimes()
      val t0 = System.nanoTime()
      val (_, stats) = graft.checks.ConstraintChecks.uniqueness(docs, s"probe$i", salts)
      val wall = (System.nanoTime() - t0) / 1e9
      val (u1, s1) = ProcStat.cpuTimes()
      println(f"pass $i cores=$cores salts=$salts wall=$wall%.2f user=${u1 - u0}%.1f sys=${s1 - s0}%.1f cpuUtil=${(u1 - u0 + s1 - s0) / wall / cores}%.2f dups=${stats.values.map(_.dupKeys).sum}")
    }
    spark.stop()
  }
}
