package graft.tools

import org.apache.spark.sql.SparkSession
import graft.checks.{DriftChecks, RefState}

/** Isolates the compute-bound MMD permutation fan-out at two parallelism
  * levels, interleaved A/B/A/B, to separate sandbox-VM noise from systematic
  * scaling behavior. Prints per-run seconds at each level. */
object MmdProbe {
  private def session(cores: Int): SparkSession = {
    val s = SparkSession.builder()
      .master(s"local[$cores]")
      .appName(s"mmd-probe-$cores")
      .config("spark.sql.shuffle.partitions", cores.toString)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    s
  }

  def main(args: Array[String]): Unit = {
    val perms = if (args.length > 0) args(0).toInt else 6000
    val n = 400
    val dim = 8
    val rng = new java.util.Random(31)
    val sample = Array.fill(n)(Array.fill(dim)(rng.nextGaussian()))
    val ref = RefState(1.0, sample, Array.emptyByteArray, Map("text" -> 1L),
      n.toLong, n.toLong, 1L)
    val samples = (0 until 18).map(p => p -> sample).toMap

    def run(cores: Int): Double = {
      val s = session(cores)
      val t0 = System.nanoTime()
      DriftChecks.mmd(s, "probe", 0.01, ref, samples, numPermutations = perms,
        permsPerTask = 100)
      val dt = (System.nanoTime() - t0) / 1e9
      s.stop()
      dt
    }

    // warm-up
    run(32)
    for (i <- 1 to 3) {
      val hi = run(32)
      val lo = run(8)
      println(f"round $i: hi(32)=$hi%.2f s  lo(8)=$lo%.2f s  ratio=${lo / hi}%.2f  eff=${lo / hi / 4}%.2f")
    }
  }
}
