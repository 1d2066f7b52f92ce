package graft.tools

import graft.stats.{Mmd, StatMath}

/** Single-threaded microbenchmark: per-permutation vs batched-bitmask MMD
  * permutation evaluation on one kernel matrix. No Spark — isolates the
  * algorithm from scheduler/VM noise. */
object MmdMicro {
  def main(args: Array[String]): Unit = {
    val n = if (args.length > 0) args(0).toInt else 2000 // pool size
    val m = n / 2
    val perms = if (args.length > 1) args(1).toInt else 256
    val dim = 8
    val rng = new java.util.Random(31)
    val pool = Array.fill(n)(Array.fill(dim)(rng.nextGaussian()))
    val t0 = System.nanoTime()
    val k = Mmd.kernelMatrix(pool, 1.0)
    println(f"kernelMatrix n=$n: ${(System.nanoTime() - t0) / 1e9}%.3f s (${n * n * 4 / 1e6}%.1f MB)")
    val sTotal = Mmd.upperTriangleSum(k, n)
    val permArrs = Array.tabulate(perms)(p => StatMath.permutation(n, p.toLong))

    def time(label: String)(f: => Double): Unit = {
      f // warm
      val ts = (1 to 3).map { _ =>
        val t = System.nanoTime(); val r = f; ((System.nanoTime() - t) / 1e9, r)
      }
      val best = ts.minBy(_._1)
      println(f"$label%-12s ${best._1}%.3f s  (checksum ${best._2}%.6f)")
    }

    time("single") {
      var s = 0.0
      var i = 0
      while (i < perms) { s += Mmd.statFromMatrix(k, n, m, permArrs(i)); i += 1 }
      s
    }
    time("batch64") {
      var s = 0.0
      permArrs.grouped(64).foreach { g =>
        val r = Mmd.statsBatchFromMatrix(k, n, m, sTotal, g.toArray)
        var i = 0
        while (i < r.length) { s += r(i); i += 1 }
      }
      s
    }
  }
}
