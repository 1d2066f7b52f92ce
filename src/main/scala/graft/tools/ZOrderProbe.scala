package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Z-order layout at volume: write `n` rows of a two-column synthetic
  * domain as `files` z-ordered parquet files vs the same data sorted on
  * one column, and measure (a) ingest wall + shuffle, (b) the pruning
  * power a min-max skipper gets from each layout — files touched by a
  * band predicate on EACH column. The layout is spec-proven at 16k rows
  * (ZOrderSpec); this is the volume evidence.
  *
  * `runMain graft.tools.ZOrderProbe [nRows] [files]` (defaults 20,000,000
  * and 64).
  */
object ZOrderProbe {
  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toLong).getOrElse(20000000L)
    val files = args.drop(1).headOption.map(_.toInt).getOrElse(64)
    val cores = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cores]")
      .appName("graft-zorder-probe")
      .config("spark.sql.shuffle.partitions", cores)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    val meter = new ProbeUtil.ShuffleMeter
    spark.sparkContext.addSparkListener(meter)

    val bits = 16
    val dom = 1L << bits
    val data = spark.range(n).select(
      pmod(xxhash64($"id", lit("a")), lit(dom)).as("a"),
      pmod(xxhash64($"id", lit("b")), lit(dom)).as("b"))

    val dirZ = java.nio.file.Files.createTempDirectory("graft-zorder-probe").toString
    val dirL = java.nio.file.Files.createTempDirectory("graft-linear-probe").toString
    val s0 = meter.snapshot
    val (_, tz) = ProbeUtil.time {
      graft.engine.ZOrder.writeZOrdered(data, dirZ, "a", "b", bits, files) }
    val s1 = meter.snapshot
    val (_, tl) = ProbeUtil.time {
      data.repartitionByRange(files, $"a").sortWithinPartitions($"a")
        .write.mode("overwrite").parquet(dirL) }
    val s2 = meter.snapshot
    println(f"zorder write: $tz%7.1f s, shuffle w ${(s1._2 - s0._2) / 1e9}%.2f GB; " +
      f"linear write: $tl%7.1f s, shuffle w ${(s2._2 - s1._2) / 1e9}%.2f GB " +
      s"($n rows, $files files, $bits-bit domain)")

    def boxes(d: String) = graft.engine.ZOrder.boundingBoxes(spark, d, "a", "b")
      .select($"a_min", $"a_max", $"b_min", $"b_max")
      .as[(Long, Long, Long, Long)].collect().toSeq
    val z = boxes(dirZ); val l = boxes(dirL)
    // pruning power: files touched by a 1%-wide band on each column
    val band = dom / 100
    def touched(bs: Seq[(Long, Long, Long, Long)], onA: Boolean): Int = {
      val lo = dom / 2; val hi = lo + band
      bs.count { case (aMin, aMax, bMin, bMax) =>
        if (onA) aMin <= hi && lo <= aMax else bMin <= hi && lo <= bMax }
    }
    println(s"files touched by a 1% band: zorder a=${touched(z, true)}/$files " +
      s"b=${touched(z, false)}/$files; linear a=${touched(l, true)}/$files " +
      s"b=${touched(l, false)}/$files")
    require(touched(l, false) == files, "linear must be useless on b")
    require(touched(z, false) < files / 2 && touched(z, true) < files / 2,
      "zorder must prune on both columns")
    Seq(dirZ, dirL).foreach { d =>
      try { import scala.sys.process._; Seq("rm", "-rf", d).! }
      catch { case _: Throwable => } }
    spark.stop()
  }
}
