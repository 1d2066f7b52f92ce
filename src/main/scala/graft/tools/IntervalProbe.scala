package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Volume evidence for the interval join (E40): bucketized equi-join vs
  * the naive key-equi-join-then-range-filter at the same size. The naive
  * shape materializes |points_k|·|intervals_k| candidate pairs per key
  * BEFORE the filter; the bucketized shape only pairs rows sharing a time
  * bucket. Usage: IntervalProbe [points] [intervalsPerKey] [keys] [cores].
  */
object IntervalProbe {
  def main(args: Array[String]): Unit = {
    val nPts = args.headOption.map(_.toLong).getOrElse(20000000L)
    val ivPerKey = args.drop(1).headOption.map(_.toInt).getOrElse(10)
    val nKeys = args.drop(2).headOption.map(_.toLong).getOrElse(100000L)
    val cores = args.drop(3).headOption.map(_.toInt).getOrElse(32)
    val spark = SparkSession.builder().master(s"local[$cores]")
      .appName("graft-interval-probe")
      .config("spark.sql.shuffle.partitions", cores.toString)
      .config("spark.driver.memory", "24g")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    // 30 days of event time; intervals are disjoint per key (contiguous
    // day-slices shuffled by hash), points uniform
    val horizon = 30L * 86400
    val pts = spark.range(nPts)
      .withColumn("user_id", pmod(xxhash64(col("id"), lit(1)), lit(nKeys)))
      .withColumn("pts", timestamp_seconds(
        lit(1700000000L) + pmod(xxhash64(col("id"), lit(2)), lit(horizon))))
      .select(col("id").as("pid"), col("user_id"), col("pts"))
    val span = horizon / ivPerKey
    val ivs = spark.range(nKeys * ivPerKey)
      .withColumn("user_id", col("id") % nKeys)
      .withColumn("slot", (col("id") / nKeys).cast("long"))
      .withColumn("ivs", timestamp_seconds(lit(1700000000L) + col("slot") * span))
      .withColumn("ive", timestamp_seconds(
        lit(1700000000L) + (col("slot") + 1) * span - 1))
      .select(col("id").as("iid"), col("user_id"), col("ivs"), col("ive"))

    def time[T](f: => T): (T, Double) = {
      val t0 = System.nanoTime(); val r = f; (r, (System.nanoTime() - t0) / 1e9)
    }
    // bucketized equi-join (the operator under test)
    val (nBucketed, wBucketed) = time {
      graft.ops.Temporal.intervalJoin(pts, "pts", ivs, "ivs", "ive",
        keyCol = Some("user_id"), bucketSeconds = span,
        maxBucketsPerInterval = 4).count()
    }
    // naive: key equi-join then range filter (pairs all slots per key)
    val (nNaive, wNaive) = time {
      pts.join(ivs, "user_id")
        .filter(col("pts") >= col("ivs") && col("pts") <= col("ive")).count()
    }
    require(nBucketed == nNaive,
      s"shapes must agree: bucketized $nBucketed vs naive $nNaive")
    println(f"""{"points":$nPts,"intervals":${nKeys * ivPerKey},"keys":$nKeys,""" +
      f""""cores":$cores,"matches":$nBucketed,"bucketized_wall_s":$wBucketed%.1f,""" +
      f""""naive_join_filter_wall_s":$wNaive%.1f,""" +
      f""""candidate_ratio":${ivPerKey}}""")
    spark.stop()
  }
}
