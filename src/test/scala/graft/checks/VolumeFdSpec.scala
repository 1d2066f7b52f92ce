package graft.checks

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class VolumeFdSpec extends AnyFunSuite {
  lazy val spark = graft.SparkTestBase.spark
  import spark.implicits._

  // ---- VolumeCheck (E27) ----

  /** Counts {8,9,10,10,11,12,13,14,15,100}: med=11.5; deviations sorted
    * {0.5,0.5,1.5,1.5,1.5,2.5,2.5,3.5,3.5,88.5} → interpolated MAD=2.0.
    * Fence at k=3.5: |n-11.5| > 3.5*1.4826*2.0 = 10.38 → only 100 flags. */
  test("hand values: one spiked window flags; every window is emitted") {
    val counts = Seq(8, 9, 10, 10, 11, 12, 13, 14, 15, 100)
    val rows = counts.zipWithIndex.flatMap { case (n, w) =>
      (0 until n).map(i => (s"g$w", i))
    }
    val df = rows.toDF("w", "i")
    val out = VolumeCheck.anomaly(df, Seq("w"), k = 3.5).collect()
    assert(out.length == 10) // coverage: unflagged windows present too
    val byW = out.map(r => r.getString(0) -> r).toMap
    assert(byW("g9").getAs[Boolean]("is_anomaly"))
    assert(out.count(_.getAs[Boolean]("is_anomaly")) == 1)
    assert(byW("g9").getAs[Double]("median_n") == 11.5)
    assert(byW("g9").getAs[Double]("mad_n") == 2.0)
    // robust_z = (100 - 11.5) / (1.4826 * 2.0)
    val z = byW("g9").getAs[Double]("robust_z")
    assert(math.abs(z - 88.5 / (1.4826 * 2.0)) < 1e-6)
    // the spike cannot move its own fence: median/MAD identical without it
    val ctl = VolumeCheck.anomaly(
      df.filter($"w" =!= "g9"), Seq("w"), k = 3.5).collect()
    assert(ctl.head.getAs[Double]("median_n") == 11.0) // robust stat shifts only half a rank
  }

  test("MAD=0 regime flags nothing and robust_z is NULL") {
    val rows = (0 until 6).flatMap(w => (0 until 10).map(i => (s"g$w", i))) ++
      (0 until 500).map(i => ("spike", i))
    val out = VolumeCheck.anomaly(rows.toDF("w", "i"), Seq("w")).collect()
    assert(out.forall(!_.getAs[Boolean]("is_anomaly")))
    assert(out.forall(_.isNullAt(out.head.fieldIndex("robust_z"))))
  }

  test("partitioning invariance: identical rows at 2 vs 16 partitions") {
    val rows = (0 until 40).flatMap(w => (0 to w % 7).map(i => (s"g$w", i)))
    val a = VolumeCheck.anomaly(rows.toDF("w", "i").repartition(2), Seq("w"))
      .orderBy("w").collect().toSeq
    val b = VolumeCheck.anomaly(rows.toDF("w", "i").repartition(16), Seq("w"))
      .orderBy("w").collect().toSeq
    assert(a == b)
  }

  test("anomalyByTime: null timestamps form their own window") {
    val df = Seq(
      (1L, Some("2024-01-01 10:15:00")), (2L, Some("2024-01-01 10:45:00")),
      (3L, Some("2024-01-01 11:05:00")), (4L, None)
    ).toDF("id", "s").withColumn("ts", col("s").cast("timestamp"))
    val out = VolumeCheck.anomalyByTime(df, "ts", unit = "hour")
    assert(out.count() == 3) // 10h, 11h, null
    assert(out.filter(col("w").isNull).head().getAs[Long]("n") == 1L)
  }

  test("guards: empty group cols, missing column, bad k all fail loud") {
    val df = Seq(("a", 1)).toDF("w", "i")
    intercept[IllegalArgumentException](VolumeCheck.anomaly(df, Nil))
    intercept[IllegalArgumentException](VolumeCheck.anomaly(df, Seq("nope")))
    intercept[IllegalArgumentException](VolumeCheck.anomaly(df, Seq("w"), k = 0))
  }

  // ---- verdictsFromCounts (E27 as a flagship check family) ----

  test("verdictsFromCounts: same fence as the distributed check, verdict shape") {
    val counts = Seq(8, 9, 10, 10, 11, 12, 13, 14, 15, 100)
      .zipWithIndex.map { case (n, p) => p -> n.toLong }.toMap
    val vs = VolumeCheck.verdictsFromCounts("r", 0.01, counts, snapshotId = 7L)
    assert(vs.map(_.part) == (0 until 10)) // sorted, one per part
    assert(vs.forall(_.check_id == "volume"))
    val byP = vs.map(v => v.part -> v).toMap
    // med=11.5, mad=2.0 (same hand values as the distributed spec above)
    assert(byP(9).passed == false && byP(9).metrics("median_n") == 11.5
      && byP(9).metrics("mad_n") == 2.0)
    assert(vs.count(!_.passed) == 1)
    val z = 88.5 / (1.4826 * 2.0)
    assert(math.abs(byP(9).distance - z) < 1e-9
      && math.abs(byP(9).metrics("robust_z") - z) < 1e-9)
    // below-median part: distance is |z|, robust_z keeps the sign
    assert(byP(0).metrics("robust_z") < 0 && byP(0).distance > 0 && byP(0).passed)
  }

  test("verdictsFromCounts: MAD=0 passes everything, robust_z omitted (no NaN)") {
    val vs = VolumeCheck.verdictsFromCounts("r", 0.01,
      Map(0 -> 10L, 1 -> 10L, 2 -> 10L, 3 -> 500L), snapshotId = 1L)
    assert(vs.forall(_.passed))
    assert(vs.forall(v => !v.metrics.contains("robust_z")))
    assert(vs.forall(_.distance == 0.0))
    assert(VolumeCheck.verdictsFromCounts("r", 0.01, Map.empty, 1L).isEmpty)
    intercept[IllegalArgumentException](
      VolumeCheck.verdictsFromCounts("r", 0.01, Map(0 -> 1L), 1L, k = 0))
  }

  // ---- functionalDependency (E28) ----

  test("FD violations: counts, witnesses; satisfied FD returns empty") {
    val df = Seq(
      (1L, "en", "web"), (1L, "en", "web"), // consistent dup rows: no violation
      (2L, "en", "web"), (2L, "de", "web"), (2L, "de", "book"),
      (3L, "fr", "web")
    ).toDF("k", "lang", "src")
    val v = ConstraintChecks.functionalDependency(df, Seq("k"), "lang")
      .orderBy("k").collect()
    assert(v.length == 1 && v.head.getLong(0) == 2L)
    assert(v.head.getAs[Long]("n_distinct_rhs") == 2L)
    assert(v.head.getAs[Long]("n_rows") == 3L)
    assert(v.head.getAs[String]("rhs_min") == "de")
    assert(v.head.getAs[String]("rhs_max") == "en")
    // k → (lang, src)? src is violated for k=2 as well
    val ok = ConstraintChecks.functionalDependency(
      df.filter($"k" =!= 2L), Seq("k"), "lang")
    assert(ok.count() == 0)
  }

  test("NULL rhs is a distinct VALUE: {NULL,'x'} violates; all-NULL does not") {
    val df = Seq(
      (1L, Some("x")), (1L, None),
      (2L, None), (2L, None)
    ).toDF("k", "v")
    val v = ConstraintChecks.functionalDependency(df, Seq("k"), "v").collect()
    assert(v.length == 1 && v.head.getLong(0) == 1L)
    assert(v.head.getAs[Long]("n_distinct_rhs") == 2L)
    // witnesses ignore NULL: both witness 'x', the NULL side implied
    assert(v.head.getAs[String]("rhs_min") == "x")
    assert(v.head.getAs[String]("rhs_max") == "x")
  }

  test("composite determinant and guards") {
    val df = Seq(
      ("a", 1, "p"), ("a", 1, "q"), ("a", 2, "p")
    ).toDF("x", "y", "z")
    val v = ConstraintChecks.functionalDependency(df, Seq("x", "y"), "z")
      .collect()
    assert(v.length == 1 && v.head.getString(0) == "a" && v.head.getInt(1) == 1)
    intercept[IllegalArgumentException](
      ConstraintChecks.functionalDependency(df, Nil, "z"))
    intercept[IllegalArgumentException](
      ConstraintChecks.functionalDependency(df, Seq("z"), "z"))
    intercept[IllegalArgumentException](
      ConstraintChecks.functionalDependency(df, Seq("x"), "nope"))
  }

  test("FD partitioning invariance") {
    val rows = (0 until 300).map(i => (i % 37L, s"v${i % 5}"))
    val a = ConstraintChecks.functionalDependency(
      rows.toDF("k", "v").repartition(2), Seq("k"), "v")
      .orderBy("k").collect().toSeq
    val b = ConstraintChecks.functionalDependency(
      rows.toDF("k", "v").repartition(16), Seq("k"), "v")
      .orderBy("k").collect().toSeq
    assert(a == b && a.nonEmpty)
  }
}
