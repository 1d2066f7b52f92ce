package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}

/** Shared probe instrumentation — ONE copy of the wall timer and shuffle
  * meter, so an accounting fix (e.g. listener-drain lag between an action
  * returning and its stage events landing) applies to every probe at
  * once. */
object ProbeUtil {
  def time[T](f: => T): (T, Double) = {
    val t0 = System.nanoTime()
    val r = f
    (r, (System.nanoTime() - t0) / 1e9)
  }

  /** Totals shuffle bytes across completed stages; snapshot deltas bracket
    * a phase. Listener delivery is async — a snapshot taken immediately
    * after an action can lag its final stages, so keep phases coarse. */
  final class ShuffleMeter extends SparkListener {
    val read = new java.util.concurrent.atomic.AtomicLong
    val write = new java.util.concurrent.atomic.AtomicLong
    override def onStageCompleted(s: SparkListenerStageCompleted): Unit = {
      val m = s.stageInfo.taskMetrics
      if (m != null) {
        read.addAndGet(m.shuffleReadMetrics.totalBytesRead)
        write.addAndGet(m.shuffleWriteMetrics.bytesWritten)
      }
    }
    def snapshot: (Long, Long) = (read.get, write.get)
  }
}
