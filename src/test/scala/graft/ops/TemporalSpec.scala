package graft.ops

import java.sql.Timestamp

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Event-time operators: the gap-rule session index must match hand
  * values and survive repartitioning; the as-of join must equal the
  * brute-force latest-at-or-before lookup (including equal-timestamp and
  * duplicate-right-ts tie rules) while shuffling exactly once. */
class TemporalSpec extends AnyFunSuite {
  lazy val spark = graft.SparkTestBase.spark
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  lazy val events = spark.read.parquet("/root/testdata/sf0.001/events.parquet")

  test("sessionize: hand fixture — 6h gap splits, ties broken by id, " +
    "null key/ts dropped") {
    val d = Seq(
      (1L, ts("2024-01-01 00:00:00"), 10L),
      (2L, ts("2024-01-01 00:10:00"), 10L),
      (3L, ts("2024-01-01 07:00:00"), 10L), // 6h50m after e2 -> new session
      (4L, ts("2024-01-01 07:30:00"), 10L),
      (5L, ts("2024-01-01 01:00:00"), 20L),
      (6L, null.asInstanceOf[Timestamp], 10L),
      (7L, ts("2024-01-01 02:00:00"), 0L) // user nulled below
    ).toDF("event_id", "ts", "user_id")
      .withColumn("user_id", when($"event_id" === 7L, lit(null)).otherwise($"user_id"))
    val got = Temporal.sessionize(d, "user_id", "ts", "event_id", 21600L)
      .select($"event_id", $"session_idx").as[(Long, Long)].collect().toMap
    assert(got == Map(1L -> 1L, 2L -> 1L, 3L -> 2L, 4L -> 2L, 5L -> 1L))
  }

  test("sessionStats: counts/duration exact; invariant to partitioning") {
    val a = Temporal.sessionStats(events, "user_id", "ts", "event_id", 21600L)
    val b = Temporal.sessionStats(events.repartition(13), "user_id", "ts",
      "event_id", 21600L)
    val ra = a.orderBy($"user_id", $"session_idx").collect().toSeq
    val rb = b.orderBy($"user_id", $"session_idx").collect().toSeq
    assert(ra == rb)
    // every event lands in exactly one session
    assert(ra.map(_.getAs[Long]("n_events")).sum == events.count())
    // singleton sessions have zero duration; all durations are within the
    // session bound only ACROSS gaps (duration can exceed the gap; each
    // consecutive step cannot — spot-check via the sessionized frame)
    val steps = Temporal.sessionize(events, "user_id", "ts", "event_id", 21600L)
      .groupBy($"user_id", $"session_idx")
      .agg(timestamp_diff("MICROSECOND", min($"ts"), max($"ts")).as("dur"),
        count(lit(1)).as("n"))
      .filter($"n" === 1 && $"dur" =!= 0)
    assert(steps.count() == 0)
  }

  test("asofJoin equals brute force on real events (purchase -> latest " +
    "at-or-before view, per user)") {
    val left = events.filter($"event_type" === "purchase")
      .select($"event_id", $"ts", $"user_id", $"value")
    val right = events.filter($"event_type" === "view")
      .select($"event_id", $"ts", $"user_id")
    val got = Temporal.asofJoin(left, right, "user_id", "ts", "event_id")
      .select($"event_id", $"r_event_id", $"gap_us")
      .as[(Long, Long, Long)].collect().sorted.toSeq

    val epochUs = timestamp_diff("MICROSECOND",
      to_timestamp_ntz(lit("1970-01-01 00:00:00")), $"ts")
    val l = left.select($"event_id", epochUs, $"user_id")
      .as[(Long, Long, Long)].collect()
    val r = right.select($"event_id", epochUs, $"user_id")
      .as[(Long, Long, Long)].collect()
    val byUser = r.groupBy(_._3)
    val want = (for {
      (lid, lus, u) <- l.toSeq
      cands = byUser.getOrElse(u, Array.empty).filter(_._2 <= lus)
      if cands.nonEmpty
    } yield {
      val best = cands.maxBy(c => (c._2, c._1)) // latest ts, then max id
      (lid, best._1, lus - best._2)
    }).sorted
    assert(got.nonEmpty && got == want)
  }

  test("asofJoin tie rules: equal-ts right row matches (at-or-before); " +
    "duplicate right ts -> max right id wins; tolerance bounds the gap") {
    val t0 = ts("2024-01-01 00:00:00")
    val left = Seq((100L, t0, 1L), (101L, ts("2024-01-01 09:00:00"), 1L),
      (102L, ts("2024-01-01 00:30:00"), 2L))
      .toDF("event_id", "ts", "user_id")
    val right = Seq(
      (50L, t0, 1L),                           // equal ts as left 100
      (51L, t0, 1L),                           // duplicate right ts: 51 wins
      (52L, ts("2024-01-01 01:00:00"), 1L))    // latest before left 101
      .toDF("event_id", "ts", "user_id")
    val full = Temporal.asofJoin(left, right, "user_id", "ts", "event_id")
      .select($"event_id", $"r_event_id").as[(Long, Long)].collect().toMap
    assert(full == Map(100L -> 51L, 101L -> 52L)) // 102: user 2 has no views
    // tolerance 4h: left 101 is 8h after right 52 -> dropped
    val tol = Temporal.asofJoin(left, right, "user_id", "ts", "event_id",
      toleranceSeconds = Some(14400L))
      .select($"event_id", $"r_event_id").as[(Long, Long)].collect().toMap
    assert(tol == Map(100L -> 51L))
  }

  test("asofJoin shuffles ONCE (union-and-carry, no join explosion); " +
    "sessionize shuffles once") {
    val left = events.filter($"event_type" === "purchase")
      .select($"event_id", $"ts", $"user_id", $"value")
    val right = events.filter($"event_type" === "view")
      .select($"event_id", $"ts", $"user_id")
    val asofPlan = Temporal.asofJoin(left, right, "user_id", "ts", "event_id")
      .queryExecution.executedPlan.toString
    assert("Exchange hashpartitioning".r.findAllIn(asofPlan).size == 1, asofPlan)
    assert(!asofPlan.contains("Join"), "no join operator expected\n" + asofPlan)
    val sessPlan = Temporal.sessionize(events, "user_id", "ts", "event_id", 21600L)
      .queryExecution.executedPlan.toString
    assert("Exchange hashpartitioning".r.findAllIn(sessPlan).size == 1, sessPlan)
    // the session-grain rollup rides the SAME exchange: hash(user_id)
    // satisfies the (user_id, session_idx) clustered distribution, so the
    // whole pipeline is one shuffle
    val statsPlan = Temporal.sessionStats(events, "user_id", "ts", "event_id",
      21600L).queryExecution.executedPlan.toString
    assert("Exchange".r.findAllIn(statsPlan).size == 1, statsPlan)
  }

  test("guards: non-timestamp ts and bad gap/tolerance fail loud") {
    val d = Seq((1L, 5L, 1L)).toDF("event_id", "ts", "user_id")
    assert(intercept[IllegalArgumentException](
      Temporal.sessionize(d, "user_id", "ts", "event_id", 10L))
      .getMessage.contains("timestamp"))
    assert(intercept[IllegalArgumentException](
      Temporal.sessionize(events, "user_id", "ts", "event_id", 0L))
      .getMessage.contains("gapSeconds"))
    assert(intercept[IllegalArgumentException](
      Temporal.asofJoin(events, events, "user_id", "ts", "event_id",
        toleranceSeconds = Some(0L)))
      .getMessage.contains("tolerance"))
  }

  test("intervalJoin: equals the naive cross filter; boundaries inclusive; no nested-loop plan") {
    val pts = Seq(
      (1L, ts("2024-01-01 00:00:00"), 10L),
      (2L, ts("2024-01-01 05:00:00"), 10L),
      (3L, ts("2024-01-01 10:00:00"), 10L),
      (4L, ts("2024-01-01 05:00:00"), 20L),
      (5L, ts("2024-01-03 00:00:00"), 10L)
    ).toDF("pid", "pts", "user_id")
    val ivs = Seq(
      (100L, ts("2024-01-01 00:00:00"), ts("2024-01-01 05:00:00"), 10L),
      (101L, ts("2024-01-01 09:30:00"), ts("2024-01-01 23:00:00"), 10L),
      (102L, ts("2024-01-01 00:00:00"), ts("2024-01-01 23:00:00"), 20L),
      (103L, ts("2024-01-02 10:00:00"), ts("2024-01-02 01:00:00"), 10L) // inverted
    ).toDF("iid", "ivs", "ive", "user_id")
    val got = Temporal.intervalJoin(pts, "pts", ivs, "ivs", "ive",
        keyCol = Some("user_id"), bucketSeconds = 3600L)
      .select($"pid", $"iid").as[(Long, Long)].collect().toSet
    // naive oracle: cross filter with the same inclusive containment + key
    val naive = pts.as("p").crossJoin(ivs.as("i"))
      .filter($"p.user_id" === $"i.user_id" &&
        $"p.pts" >= $"i.ivs" && $"p.pts" <= $"i.ive")
      .select($"pid", $"iid").as[(Long, Long)].collect().toSet
    assert(got == naive)
    // hand expectations: both boundaries inclusive, multi-bucket span
    // matches, inverted interval matches nothing, unmatched point drops
    assert(got == Set((1L, 100L), (2L, 100L), (3L, 101L), (4L, 102L)))
    // the plan is an equi-join, never a nested-loop/cartesian
    val plan = Temporal.intervalJoin(pts, "pts", ivs, "ivs", "ive",
      keyCol = Some("user_id")).queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin") && !plan.contains("CartesianProduct"))
    // keyless variant: every interval of any user is eligible
    val keyless = Temporal.intervalJoin(pts.drop("user_id"), "pts",
        ivs.drop("user_id"), "ivs", "ive")
      .select($"pid", $"iid").as[(Long, Long)].collect().toSet
    assert(keyless == Set((1L, 100L), (2L, 100L), (3L, 101L),
      (1L, 102L), (2L, 102L), (3L, 102L), (4L, 100L), (4L, 102L)))
    // blowup guard: a month-long interval at 1-second buckets fails loud
    val e = intercept[Exception] {
      Temporal.intervalJoin(pts, "pts",
        ivs.filter($"iid" === 102L), "ivs", "ive",
        keyCol = Some("user_id"), bucketSeconds = 1L,
        maxBucketsPerInterval = 100).count()
    }
    assert(e.getMessage != null && e.getMessage.contains("intervalJoin"))
    // overlapping non-key columns fail loud
    val bad = intercept[IllegalArgumentException](
      Temporal.intervalJoin(pts.withColumnRenamed("pid", "iid"), "pts",
        ivs, "ivs", "ive", keyCol = Some("user_id")))
    assert(bad.getMessage.contains("rename before joining"))
  }
}
