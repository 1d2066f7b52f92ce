package graft.tools

/** Sequential-read memory-bandwidth probe: fixed total bytes streamed by T
  * threads over private arrays (one 64B line touched per step). Reports
  * aggregate GB/s. Used by graft.Bench to record the box's DRAM ceiling next
  * to the scaling numbers: on this sandbox VM total bandwidth stops growing
  * (and often shrinks) past ~8 threads, which caps ANY bandwidth-bound
  * phase's 8→32 scaling regardless of software — evidence that the full-pass
  * scaling ceiling is the box, not the engine's task parallelism. A real
  * multi-executor cluster adds DRAM with every node.
  */
object MemBw {

  /** Aggregate GB/s streaming `totalBytes` across `threads` threads.
    * Arrays are WRITTEN before timing: reading never-touched anonymous
    * memory measures the kernel's shared zero page (an L1-resident 4 KB),
    * not DRAM — the classic bandwidth-probe trap. The timed region starts
    * at a barrier after every thread has materialized its pages. */
  def gbps(threads: Int, totalBytes: Long = 8L << 30): Double = {
    val perThread = totalBytes / threads
    val arrLen = (32 << 20) / 8 // 32 MB per-thread working array (>> LLC/threads)
    val sinks = new Array[Long](threads)
    val ready = new java.util.concurrent.CyclicBarrier(threads + 1)
    val go = new java.util.concurrent.CyclicBarrier(threads + 1)
    val ts = Array.tabulate(threads) { id =>
      new Thread(() => {
        val arr = new Array[Long](arrLen)
        var j = 0
        while (j < arrLen) { arr(j) = j.toLong; j += 1 } // real pages
        ready.await()
        go.await()
        var s = 0L
        var done = 0L
        val n = perThread / 8
        while (done < n) {
          j = 0
          while (j < arrLen) { s += arr(j); j += 8 } // one read per 64B line
          done += arrLen
        }
        sinks(id) = s
      })
    }
    ts.foreach(_.start())
    ready.await()
    val t0 = System.nanoTime()
    go.await()
    ts.foreach(_.join())
    val sec = (System.nanoTime() - t0) / 1e9
    totalBytes / sec / (1L << 30)
  }

  def main(args: Array[String]): Unit = {
    Seq(8, 32, 8, 32).foreach { t =>
      println(f"threads=$t  ${gbps(t)}%.1f GB/s")
    }
  }
}
