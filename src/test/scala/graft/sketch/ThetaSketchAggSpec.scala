package graft.sketch

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class ThetaSketchAggSpec extends AnyFunSuite {
  lazy val spark = graft.SparkTestBase.spark
  import spark.implicits._

  private def sketchOf(ids: Range, parts: Int = 8): Array[Byte] =
    spark.range(ids.start, ids.end).repartition(parts)
      .agg(ThetaSketchAgg.thetaSketch(col("id")))
      .head.getAs[Array[Byte]](0)

  test("exact mode: estimate equals the exact distinct count below nominal entries") {
    val sk = sketchOf(0 until 3000)
    assert(ThetaOps.estimateLong(sk) == 3000L)
  }

  test("set ops are exact on exact-mode sketches with known overlap") {
    val a = sketchOf(0 until 3000)       // {0..2999}
    val b = sketchOf(2000 until 4000)    // {2000..3999}; union 4000 < 4096
    assert(ThetaOps.estimateLong(ThetaOps.intersect(a, b)) == 1000L)
    assert(ThetaOps.estimateLong(ThetaOps.union(a, b)) == 4000L)
    assert(ThetaOps.estimateLong(ThetaOps.aNotB(a, b)) == 2000L)
    assert(ThetaOps.estimateLong(ThetaOps.aNotB(b, a)) == 1000L)
  }

  test("a union exceeding its nominal entries re-enters estimation mode; sizing it restores exactness") {
    val a = sketchOf(0 until 3000)
    val b = sketchOf(2000 until 5000)    // union 5000 > default 4096
    val est = ThetaOps.estimateLong(ThetaOps.union(a, b))
    assert(math.abs(est - 5000L) < 250L, est.toString)
    assert(ThetaOps.estimateLong(ThetaOps.union(a, b, nominal = 8192)) == 5000L)
  }

  test("estimation mode: relative error within 3x RSE at 200k distinct / nominal 4096") {
    val sk = spark.range(200000).repartition(16)
      .agg(ThetaSketchAgg.thetaSketch(col("id")))
      .head.getAs[Array[Byte]](0)
    val est = ThetaOps.estimate(sk)
    // RSE ~ 1/sqrt(4096) = 1.56%; 3x = 4.7%
    assert(math.abs(est - 200000.0) / 200000.0 < 0.047, est.toString)
  }

  test("estimates are partitioning-invariant (retained set is value-deterministic)") {
    def est(parts: Int, n: Long): Double = {
      val sk = spark.range(n).repartition(parts)
        .agg(ThetaSketchAgg.thetaSketch(col("id")))
        .head.getAs[Array[Byte]](0)
      ThetaOps.estimate(sk)
    }
    // exact mode AND estimation mode: the union's retained set is a pure
    // function of the value set (hash < theta), so cluster width is moot —
    // the determinism contract KLL/t-digest cannot offer
    assert(est(2, 3000) == est(32, 3000))
    assert(est(2, 200000) == est(32, 200000))
  }

  test("string and long keys hash to distinct families (canonicalization contract)") {
    val longs = spark.range(100)
      .agg(ThetaSketchAgg.thetaSketch(col("id"))).head.getAs[Array[Byte]](0)
    val strs = spark.range(100).select(col("id").cast("string").as("id"))
      .agg(ThetaSketchAgg.thetaSketch(col("id"))).head.getAs[Array[Byte]](0)
    assert(ThetaOps.estimateLong(longs) == 100L)
    assert(ThetaOps.estimateLong(strs) == 100L)
    // "1" and 1L are different keys by design
    assert(ThetaOps.estimateLong(ThetaOps.intersect(longs, strs)) == 0L)
  }

  test("nulls are skipped, empty input yields an empty sketch") {
    val sk = Seq[Option[Long]](Some(1L), None, Some(2L), None).toDF("v")
      .agg(ThetaSketchAgg.thetaSketch(col("v"))).head.getAs[Array[Byte]](0)
    assert(ThetaOps.estimateLong(sk) == 2L)
    val empty = spark.range(0)
      .agg(ThetaSketchAgg.thetaSketch(col("id"))).head.getAs[Array[Byte]](0)
    assert(ThetaOps.estimateLong(empty) == 0L)
  }
}
