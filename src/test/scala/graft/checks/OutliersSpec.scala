package graft.checks

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class OutliersSpec extends AnyFunSuite {
  lazy val spark = graft.SparkTestBase.spark
  import spark.implicits._

  test("hand values: 0,0,0,0,100 at k=1 flags only 100 with z=2.0") {
    val df = Seq(1L -> 0.0, 2L -> 0.0, 3L -> 0.0, 4L -> 0.0, 5L -> 100.0)
      .toDF("id", "v")
    val f = Outliers.flag(df, "v", k = 1.0).collect()
    assert(f.length == 1 && f.head.getLong(0) == 5L)
    assert(f.head.getDouble(2) == 2.0) // mu=20, sd=40, z=(100-20)/40
  }

  test("constant group flags nothing; nulls never flag and survive the gate") {
    val df = Seq(
      (1L, "a", Some(5.0)), (2L, "a", Some(5.0)), (3L, "a", Some(5.0)),
      (4L, "b", Some(0.0)), (5L, "b", Some(0.0)), (6L, "b", Some(0.0)),
      (7L, "b", Some(90.0)), (8L, "b", None)
    ).toDF("id", "g", "v")
    val flagged = Outliers.flag(df, "v", k = 1.0, groupCols = Seq("g"))
      .select($"id").as[Long].collect().toSet
    assert(flagged == Set(7L)) // group a constant; null row never flags
    val kept = Outliers.gate(df, "v", k = 1.0, groupCols = Seq("g"))
      .select($"id").as[Long].collect().toSet
    assert(kept == Set(1L, 2L, 3L, 4L, 5L, 6L, 8L))
    assert((kept ++ flagged) == (1L to 8L).toSet && (kept & flagged).isEmpty)
  }

  test("null GROUP key is a group like any other (null-safe join partitions exactly)") {
    val df = Seq(
      (1L, Some("a"), 1.0), (2L, Some("a"), 1.2), (3L, Some("a"), 50.0),
      (4L, None, 2.0), (5L, None, 2.2), (6L, None, 80.0)
    ).toDF("id", "g", "v")
    val flagged = Outliers.flag(df, "v", k = 1.0, groupCols = Seq("g"))
      .select($"id").as[Long].collect().toSet
    val kept = Outliers.gate(df, "v", k = 1.0, groupCols = Seq("g"))
      .select($"id").as[Long].collect().toSet
    assert(flagged == Set(3L, 6L), s"flagged=$flagged") // the null group's own outlier flags too
    assert((kept ++ flagged) == (1L to 6L).toSet && (kept & flagged).isEmpty)
  }

  test("grouped vs global differ on per-group shifts; partitioning-invariant") {
    // two groups with distinct means: each group's outlier is mild globally
    val rows = (1L to 200L).map(i => (i, if (i % 2 == 0) "lo" else "hi",
      (if (i % 2 == 0) 10.0 else 1000.0) + (i % 7))) :+
      ((201L, "lo", 40.0)) // 'lo' outlier hidden inside the global spread
    val df = rows.toDF("id", "g", "v")
    val grouped = Outliers.flag(df, "v", k = 3.0, groupCols = Seq("g"))
      .select($"id").as[Long].collect().toSet
    val global = Outliers.flag(df, "v", k = 3.0)
      .select($"id").as[Long].collect().toSet
    assert(grouped.contains(201L) && !global.contains(201L))
    val reparted = Outliers.flag(df.repartition(13), "v", k = 3.0, groupCols = Seq("g"))
      .select($"id").as[Long].collect().toSet
    assert(reparted == grouped)
  }

  test("one NaN neither poisons its group's stats nor flags; partition property holds") {
    val df = Seq(
      (1L, 0.0), (2L, 0.0), (3L, 0.0), (4L, 0.0), (5L, 100.0),
      (6L, Double.NaN)
    ).toDF("id", "v")
    // stats over finite values only: the genuine outlier still flags
    val flagged = Outliers.flag(df, "v", k = 1.0)
      .select($"id").as[Long].collect().toSet
    assert(flagged == Set(5L), s"flagged=$flagged")
    val kept = Outliers.gate(df, "v", k = 1.0)
      .select($"id").as[Long].collect().toSet
    assert(kept == Set(1L, 2L, 3L, 4L, 6L)) // NaN row survives the gate
    assert((kept ++ flagged) == (1L to 6L).toSet && (kept & flagged).isEmpty)
  }

  test("guards are loud") {
    val df = Seq((1L, 1.0)).toDF("id", "v")
    assert(intercept[IllegalArgumentException](Outliers.flag(df, "v", k = 0.0))
      .getMessage.contains("k must be"))
    assert(intercept[IllegalArgumentException](
      Outliers.flag(df, "v", groupCols = Seq("v")))
      .getMessage.contains("group key"))
  }
}
