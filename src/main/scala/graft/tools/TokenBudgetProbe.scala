package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Volume evidence for the token-budget selector: the two-pass
  * distributed prefix sum (`Sample.selectByTokenBudget`) vs the global
  * window-cumsum twin on the same corpus — identical selected set
  * (asserted via count + order-free id fingerprint), measured wall +
  * shuffle. The twin drags every row into a SINGLE partition (Spark
  * plans Exchange SinglePartition for an unpartitioned window) — the
  * shape the two-pass form exists to avoid; at 10M slim rows the sort
  * still finishes, which is what makes the comparison runnable on one
  * box at all. At 10^12 rows only the two-pass form exists.
  *
  * `runMain graft.tools.TokenBudgetProbe [nDocs] [budgetPct]`
  * (default 10M, 25). */
object TokenBudgetProbe {
  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toLong).getOrElse(10000000L)
    val pct = args.lift(1).map(_.toLong).getOrElse(25L)
    val cores = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cores]")
      .appName("graft-token-budget-probe")
      .config("spark.sql.shuffle.partitions", cores)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    val meter = new ProbeUtil.ShuffleMeter
    spark.sparkContext.addSparkListener(meter)

    val dir = java.nio.file.Files.createTempDirectory("tokbudget-probe").toString
    val (_, tGen) = ProbeUtil.time {
      spark.range(n).select($"id".as("doc_id"),
          pmod(xxhash64($"id", lit("q")), lit(1000000L)).as("q"),
          (pmod(xxhash64($"id", lit("t")), lit(1024L)) + 1L).as("tok"))
        .write.mode("overwrite").parquet(s"$dir/docs")
    }
    val docs = spark.read.parquet(s"$dir/docs")
    val total = docs.agg(sum($"tok")).as[Long].head()
    val budget = total / 100L * pct
    println(f"generated $n docs ($total tokens) in $tGen%.1f s; budget = " +
      f"$budget ($pct%% of tokens)")

    def fingerprint(d: org.apache.spark.sql.DataFrame): (Long, Long) = {
      val r = d.agg(count(lit(1)), expr("bit_xor(xxhash64(doc_id))")).head()
      (r.getLong(0), if (r.isNullAt(1)) 0L else r.getLong(1))
    }

    val s0 = meter.snapshot
    val (fpTwo, tTwo) = ProbeUtil.time {
      val (sel, release) = graft.ops.Sample.selectByTokenBudgetManaged(
        docs, "doc_id", "q", "tok", budget)
      val fp = fingerprint(sel)
      release(); fp
    }
    val s1 = meter.snapshot
    println(f"two-pass prefix sum:  $tTwo%6.1f s, ${fpTwo._1} kept, " +
      f"shuffle r/w ${(s1._1 - s0._1) / 1e6}%.1f/${(s1._2 - s0._2) / 1e6}%.1f MB")

    val (fpWin, tWin) = ProbeUtil.time {
      val w = Window.orderBy((-$"q".cast("double")).asc, $"doc_id".asc)
        .rowsBetween(Window.unboundedPreceding, 0)
      fingerprint(docs.withColumn("cum", sum($"tok").over(w))
        .filter($"cum" <= budget).select($"doc_id"))
    }
    val s2 = meter.snapshot
    println(f"global window twin:   $tWin%6.1f s, ${fpWin._1} kept, " +
      f"shuffle r/w ${(s2._1 - s1._1) / 1e6}%.1f/${(s2._2 - s1._2) / 1e6}%.1f MB")
    println(if (fpTwo == fpWin) "outputs IDENTICAL"
            else s"MISMATCH: two-pass $fpTwo vs window $fpWin")

    try { import scala.sys.process._; Seq("rm", "-rf", dir).! }
    catch { case _: Throwable => }
    spark.stop()
  }
}
