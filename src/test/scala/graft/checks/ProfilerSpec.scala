package graft.checks

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Generic one-pass column profiler (E35): typed detail per column class,
  * exact hand values at the exactDistinct config, null/empty regimes, and
  * the one-fused-pass plan shape. */
class ProfilerSpec extends AnyFunSuite {
  lazy val spark = graft.SparkTestBase.spark
  import spark.implicits._

  private lazy val df = Seq(
    (1L, Some("alpha"), Some(2.0), Seq("a", "b")),
    (2L, Some("beta"), Some(4.0), Seq("c")),
    (3L, None, Some(6.0), Seq.empty[String]),
    (4L, Some("beta"), None, Seq("d"))
  ).toDF("id", "name", "score", "tags")

  test("hand values: numeric, string, and complex columns in one pass") {
    val p = Profiler.profile(df, exactDistinct = true)
      .collect().map(r => r.getAs[String]("column") -> r).toMap
    assert(p.keySet == Set("id", "name", "score", "tags"))

    val id = p("id")
    assert(id.getAs[Long]("n") == 4 && id.getAs[Long]("null_count") == 0)
    assert(id.getAs[Long]("distinct_est") == 4)
    assert(id.getAs[Double]("min_num") == 1.0 && id.getAs[Double]("max_num") == 4.0)
    assert(id.getAs[Double]("mean") == 2.5)

    val name = p("name")
    assert(name.getAs[Long]("null_count") == 1)
    assert(name.getAs[Double]("null_rate") == 0.25)
    assert(name.getAs[Long]("distinct_est") == 2)
    assert(name.getAs[String]("min_str") == "alpha" &&
      name.getAs[String]("max_str") == "beta")
    assert(name.getAs[Double]("avg_length") == (5 + 4 + 4).toDouble / 3)
    assert(name.getAs[Long]("max_length") == 5)
    assert(name.isNullAt(name.fieldIndex("min_num")))

    val score = p("score")
    assert(score.getAs[Long]("null_count") == 1)
    assert(score.getAs[Double]("mean") == 4.0)
    // stddev_pop over {2,4,6}
    assert(math.abs(score.getAs[Double]("stddev") - math.sqrt(8.0 / 3)) < 1e-12)

    val tags = p("tags")
    assert(tags.getAs[Long]("n") == 4 && tags.getAs[Long]("null_count") == 0)
    assert(tags.getAs[Long]("distinct_est") == 4)
    assert(tags.isNullAt(tags.fieldIndex("min_num")) &&
      tags.isNullAt(tags.fieldIndex("min_str")))
  }

  test("column subset, unknown column loud, empty table null-rate regime") {
    val sub = Profiler.profile(df, columns = Seq("id")).collect()
    assert(sub.map(_.getAs[String]("column")).toSeq == Seq("id"))
    val e = intercept[IllegalArgumentException](
      Profiler.profile(df, columns = Seq("nope")))
    assert(e.getMessage.contains("no column 'nope'"))
    val empty = Profiler.profile(df.filter(lit(false)), columns = Seq("id"))
      .collect().head
    assert(empty.getAs[Long]("n") == 0 && empty.getAs[Double]("null_rate") == 0.0)
  }

  test("a MapType column profiles to counts with the -1 cardinality sentinel, not a crash") {
    val m = Seq((1, Map("a" -> 1)), (2, Map("b" -> 2))).toDF("id", "kv")
    val p = Profiler.profile(m, exactDistinct = true).collect()
      .map(r => r.getAs[String]("column") -> r).toMap
    assert(p("kv").getAs[Long]("n") == 2 && p("kv").getAs[Long]("null_count") == 0)
    assert(p("kv").getAs[Long]("distinct_est") == -1L)
    assert(p("id").getAs[Long]("distinct_est") == 2L)
  }

  test("approx (default) and exact cardinalities agree at small scale; timestamps format") {
    val t = Seq(
      (java.sql.Timestamp.valueOf("2024-03-01 10:00:00"), 1),
      (java.sql.Timestamp.valueOf("2024-03-02 11:30:00"), 2)
    ).toDF("ts", "v")
    val exact = Profiler.profile(t, exactDistinct = true).collect()
      .map(r => r.getAs[String]("column") -> r).toMap
    val approx = Profiler.profile(t).collect()
      .map(r => r.getAs[String]("column") -> r).toMap
    assert(exact("ts").getAs[String]("min_ts") == "2024-03-01 10:00:00")
    assert(exact("ts").getAs[String]("max_ts") == "2024-03-02 11:30:00")
    // HLL at cardinality 2 is exact
    assert(approx("v").getAs[Long]("distinct_est") == 2)
    assert(exact("v").getAs[Long]("distinct_est") == 2)
  }

  test("profileBy: per-group profiles equal per-group filtered profile() runs") {
    val grouped = Profiler.profileBy(df, "name", columns = Seq("id", "score"),
        exactDistinct = true)
      .collect().map(r => (r.getAs[String]("group"), r.getAs[String]("column")) -> r).toMap
    assert(grouped.keySet.map(_._1) == Set("alpha", "beta", null))
    // each group's rows equal a standalone profile() of that group's slice
    for (g <- Seq("alpha", "beta")) {
      val solo = Profiler.profile(df.filter($"name" === g),
          columns = Seq("id", "score"), exactDistinct = true)
        .collect().map(r => r.getAs[String]("column") -> r).toMap
      for (c <- Seq("id", "score"); f <- Seq("n", "null_count", "distinct_est"))
        assert(grouped((g, c)).getAs[Long](f) == solo(c).getAs[Long](f),
          s"$g/$c/$f")
      assert(grouped((g, "score")).get(grouped((g, "score")).fieldIndex("mean")) ==
        solo("score").get(solo("score").fieldIndex("mean")))
    }
    // a NULL group key is a group (the engine-wide null-safe-group law)
    assert(grouped((null, "id")).getAs[Long]("n") == 1)
    // profiling the group column itself is loud
    val e = intercept[IllegalArgumentException](
      Profiler.profileBy(df, "name", columns = Seq("name")))
    assert(e.getMessage.contains("cannot also be profiled"))
  }

  test("default path is ONE fused aggregate: no join, no expand in the plan") {
    val plan = Profiler.aggPlan(df, Seq.empty, exactDistinct = false)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Join"), "profiler must not plan joins")
    assert(!plan.contains("Expand"),
      "approx path must not need the count-distinct Expand")
    // one logical aggregate: exactly one final HashAggregate pair boundary
    assert(plan.contains("HashAggregate") || plan.contains("ObjectHashAggregate")
      || plan.contains("SortAggregate"))
  }
}
