package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Event-time ops at volume: `Temporal.sessionStats` and
  * `Temporal.asofJoin` at ≥50M synthetic events — wall, shuffle bytes,
  * and the conservation invariants checked where they could actually
  * break (hot window sorts, carry-forward across task boundaries). The
  * operators are DuckDB-oracled at sf0.01 (`events_sessionize`,
  * `events_asof_view`); this probe is the VOLUME evidence for their
  * shared scale shape: ONE hash exchange of slim rows on the key + one
  * in-partition sort, nothing proportional to candidates or sessions on
  * the driver.
  *
  * Synthetic corpus (deterministic, no wall clock): `nUsers` users with
  * xxhash64-spread event times over 30 days; a quarter of events are
  * "purchases", the rest "views", so the as-of side split is 1:3.
  *
  * `runMain graft.tools.TemporalProbe [nEvents] [nUsers]` (defaults
  * 50,000,000 and 1,000,000 — ~50 events/user, matching the testdata's
  * events-per-user order).
  */
object TemporalProbe {
  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toLong).getOrElse(50000000L)
    val users = args.drop(1).headOption.map(_.toLong).getOrElse(1000000L)
    val cores = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cores]")
      .appName("graft-temporal-probe")
      .config("spark.sql.shuffle.partitions", cores)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val meter = new ProbeUtil.ShuffleMeter
    spark.sparkContext.addSparkListener(meter)

    val baseUs = 1704067200000000L // 2024-01-01T00:00:00Z
    val spanUs = 30L * 86400L * 1000000L
    val ev = spark.range(n).select(
      col("id").as("event_id"),
      timestamp_micros(lit(baseUs) +
        pmod(xxhash64(col("id"), lit("ts")), lit(spanUs))).as("ts"),
      pmod(xxhash64(col("id"), lit("u")), lit(users)).as("user_id"),
      (pmod(xxhash64(col("id"), lit("k")), lit(4L)) === 0L).as("is_purchase"))

    // --- sessionize + session-grain rollup -------------------------------
    val s0 = meter.snapshot
    val (sess, t1) = ProbeUtil.time {
      graft.ops.Temporal.sessionStats(ev, "user_id", "ts", "event_id",
          gapSeconds = 3600L)
        .agg(count(lit(1)).as("sessions"), sum(col("n_events")).as("events"),
          max(col("duration_us")).as("max_dur_us"),
          max(col("n_events")).as("max_n")).collect()(0)
    }
    val s1 = meter.snapshot
    println(f"sessionStats: $t1%8.1f s for $n events, " +
      f"shuffle r/w ${(s1._1 - s0._1) / 1e9}%.2f/${(s1._2 - s0._2) / 1e9}%.2f GB")
    println(s"  sessions=${sess.getAs[Long]("sessions")} " +
      s"maxSessionEvents=${sess.getAs[Long]("max_n")} " +
      f"maxDur=${sess.getAs[Long]("max_dur_us") / 3.6e9}%.1f h")
    require(sess.getAs[Long]("events") == n,
      s"conservation: ${sess.getAs[Long]("events")} of $n events in sessions")

    // --- as-of join (purchase -> latest at-or-before view) ---------------
    val left = ev.filter(col("is_purchase")).select("event_id", "ts", "user_id")
    val right = ev.filter(!col("is_purchase")).select("event_id", "ts", "user_id")
    val s2 = meter.snapshot
    val (asof, t2) = ProbeUtil.time {
      graft.ops.Temporal.asofJoin(left, right, "user_id", "ts", "event_id")
        .agg(count(lit(1)).as("matched"), avg(col("gap_us")).as("avg_gap_us"),
          max(col("gap_us")).as("max_gap_us")).collect()(0)
    }
    val s3 = meter.snapshot
    val purchases = n / 4 // expectation; exact count printed below
    val nL = left.count(); val nR = right.count()
    println(f"asofJoin:     $t2%8.1f s for $nL purchases vs $nR views, " +
      f"shuffle r/w ${(s3._1 - s2._1) / 1e9}%.2f/${(s3._2 - s2._2) / 1e9}%.2f GB")
    println(f"  matched=${asof.getAs[Long]("matched")} " +
      f"(${asof.getAs[Long]("matched") * 100.0 / nL}%.2f%% of purchases; " +
      f"unmatched = no prior view), avg gap ${asof.getAs[Double]("avg_gap_us") / 6e7}%.1f min")
    require(asof.getAs[Long]("matched") <= nL, "matched exceeds left side")
    require(nL + nR == n, s"side split lost rows: $nL + $nR != $n")
    println(f"total: ${t1 + t2}%.1f s, ${n / (t1 + t2) / 1e6}%.2f M events/s " +
      s"(cores=$cores, expected purchases ~$purchases)")
    spark.stop()
  }
}
