package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Span-integrity violation-write probe: isolates the
  * ConstraintChecks.spanIntegrityRows scan+write (the full pass's
  * non-scaling phase) for profiling. Usage: ViolProbe <cores> <passes> <dataDir> */
object ViolProbe {
  def main(args: Array[String]): Unit = {
    val cores = args(0).toInt
    val passes = args(1).toInt
    val dir = args(2)
    val spark = SparkSession.builder()
      .master(s"local[$cores]")
      .config("spark.sql.shuffle.partitions", cores.toString)
      .config("spark.sql.files.openCostInBytes", (64 * 1024).toString)
      .config("spark.sql.files.maxPartitionBytes", (4 * 1024 * 1024).toString)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    val docs = spark.read.parquet(dir)
    val out = java.nio.file.Files.createTempDirectory("violprobe").toString
    (1 to passes).foreach { i =>
      val (u0, s0) = ProcStat.cpuTimes()
      val t0 = System.nanoTime()
      graft.checks.ConstraintChecks
        .spanIntegrityRows(docs.filter($"part".between(11, 17)), s"probe$i")
        .write.mode("overwrite").parquet(s"$out/v$i")
      val wall = (System.nanoTime() - t0) / 1e9
      val (u1, s1) = ProcStat.cpuTimes()
      println(f"pass $i cores=$cores wall=$wall%.2f user=${u1 - u0}%.1f sys=${s1 - s0}%.1f cpuUtil=${(u1 - u0 + s1 - s0) / wall / cores}%.2f")
    }
    spark.stop()
  }
}
