package graft.sketch

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.sketch.KllSketchAgg.kllSketch

class KllSketchAggSpec extends AnyFunSuite {
  lazy val spark = graft.SparkTestBase.spark
  import spark.implicits._

  test("kll sketch quantiles match exact percentiles within error bound") {
    val df = spark.range(100000).select((col("id") % 1000).cast("double").as("v"))
    val bytes = df.agg(kllSketch($"v")).head().getAs[Array[Byte]](0)
    assert(KllOps.n(bytes) == 100000L)
    val qs = KllOps.quantiles(bytes, Array(0.1, 0.5, 0.9))
    // exact quantiles of uniform 0..999: ~100, ~500, ~900; KLL k=200 err ~1.7%
    assert(math.abs(qs(0) - 100) < 40, qs.mkString(","))
    assert(math.abs(qs(1) - 500) < 40, qs.mkString(","))
    assert(math.abs(qs(2) - 900) < 40, qs.mkString(","))
  }

  test("sketch merge across groups/partitions is consistent (partial agg)") {
    val df = spark.range(50000).repartition(8)
      .select((col("id") % 100).cast("double").as("v"))
    val merged = df.agg(kllSketch($"v")).head().getAs[Array[Byte]](0)
    assert(KllOps.n(merged) == 50000L)
    val cdf = KllOps.cdf(merged)
    assert(math.abs(cdf(49.5) - 0.5) < 0.05)
  }

  test("ksD: same distribution ~0, shifted distribution large") {
    val a = spark.range(20000).select((rand(1) * 100).as("v"))
      .agg(kllSketch($"v")).head().getAs[Array[Byte]](0)
    val b = spark.range(20000).select((rand(2) * 100).as("v"))
      .agg(kllSketch($"v")).head().getAs[Array[Byte]](0)
    val c = spark.range(20000).select((rand(3) * 100 + 50).as("v"))
      .agg(kllSketch($"v")).head().getAs[Array[Byte]](0)
    assert(KllOps.ksD(a, b) < 0.05)
    assert(KllOps.ksD(a, c) > 0.3)
  }

  test("grouped sketches: one per group") {
    val df = spark.range(10000).select(
      (col("id") % 4).as("g"), col("id").cast("double").as("v"))
    val rows = df.groupBy("g").agg(kllSketch($"v").as("sk")).collect()
    assert(rows.length == 4)
    rows.foreach(r => assert(KllOps.n(r.getAs[Array[Byte]]("sk")) == 2500L))
  }
}
