package graft.tools

import graft.stats.{Mmd, StatMath}

/** Raw-thread (no Spark) scaling probe of the batched MMD permutation
  * kernel: fixed total work split over T threads, shared read-only matrix.
  * Separates hardware scaling (LLC/turbo) from Spark scheduling effects. */
object MmdThreads {
  def main(args: Array[String]): Unit = {
    val n = 800
    val m = 400
    val batches = 1692 // matches the Bench probe's total work
    val rng = new java.util.Random(31)
    val pool = Array.fill(n)(Array.fill(8)(rng.nextGaussian()))
    val k = Mmd.kernelMatrix(pool, 1.0)
    val sTotal = Mmd.upperTriangleSum(k, n)
    val perms = Array.tabulate(64)(b => StatMath.permutation(n, b.toLong))

    def run(threads: Int): Double = {
      val per = batches / threads
      val t0 = System.nanoTime()
      val ts = Array.tabulate(threads) { _ =>
        new Thread(() => {
          var i = 0
          while (i < per) { Mmd.statsBatchFromMatrix(k, n, m, sTotal, perms); i += 1 }
        })
      }
      ts.foreach(_.start()); ts.foreach(_.join())
      (System.nanoTime() - t0) / 1e9
    }

    run(32) // warm
    for (r <- 1 to 3) {
      val hi = run(32)
      val lo = run(8)
      // lo does 1692/8*8 = same total work as hi's 1692/32*32 (divisible)
      println(f"round $r: 32t=$hi%.2f s  8t=$lo%.2f s  ratio=${lo / hi}%.2f  eff=${lo / hi / 4}%.2f")
    }
  }
}
