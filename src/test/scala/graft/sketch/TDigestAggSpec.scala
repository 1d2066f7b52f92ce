package graft.sketch

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.sketch.TDigestAgg.tdigest

class TDigestAggSpec extends AnyFunSuite {
  lazy val spark = graft.SparkTestBase.spark
  import spark.implicits._

  test("exact fields: total weight, min, max survive partial agg + merge") {
    val df = spark.range(100000).repartition(8)
      .select((col("id") % 997).cast("double").as("v"))
    val bytes = df.agg(tdigest($"v")).head().getAs[Array[Byte]](0)
    assert(TDigestOps.n(bytes) == 100000L)
    assert(TDigestOps.min(bytes) == 0.0)
    assert(TDigestOps.max(bytes) == 996.0)
  }

  test("interior quantiles within rank error of exact (uniform)") {
    val df = spark.range(100000).select((col("id") % 1000).cast("double").as("v"))
    val bytes = df.agg(tdigest($"v")).head().getAs[Array[Byte]](0)
    val qs = TDigestOps.quantiles(bytes, Array(0.1, 0.5, 0.9))
    assert(math.abs(qs(0) - 100) < 20, qs.mkString(","))
    assert(math.abs(qs(1) - 500) < 20, qs.mkString(","))
    assert(math.abs(qs(2) - 900) < 20, qs.mkString(","))
  }

  test("tail accuracy: p99.9 of a long-tailed distribution beats KLL's band") {
    // exponential-ish tail: v = 10^(id/n * 4) over 200k points, exact p99.9
    // is the 199800th sorted value; the k1 scale function concentrates
    // resolution at the tails, so demand a tight relative error there.
    val n = 200000
    val df = spark.range(n).select(
      pow(lit(10.0), col("id").cast("double") / n * 4.0).as("v"))
    val bytes = df.agg(tdigest($"v")).head().getAs[Array[Byte]](0)
    val exact = math.pow(10.0, 0.999 * 4.0)
    val est = TDigestOps.quantiles(bytes, Array(0.999))(0)
    assert(math.abs(est - exact) / exact < 0.01, s"est=$est exact=$exact")
  }

  test("grouped digests: one per group, weights exact") {
    val df = spark.range(10000).select(
      (col("id") % 4).as("g"), col("id").cast("double").as("v"))
    val rows = df.groupBy("g").agg(tdigest($"v").as("td")).collect()
    assert(rows.length == 4)
    rows.foreach(r => assert(TDigestOps.n(r.getAs[Array[Byte]]("td")) == 2500L))
  }

  test("nulls are skipped, empty input yields empty digest") {
    val df = Seq(Some(1.0), None, Some(3.0)).toDF("v")
    val bytes = df.agg(tdigest($"v")).head().getAs[Array[Byte]](0)
    assert(TDigestOps.n(bytes) == 2L)
    val empty = df.filter($"v" > 100).agg(tdigest($"v")).head().getAs[Array[Byte]](0)
    assert(TDigestOps.n(empty) == 0L)
    assert(TDigestOps.quantiles(empty, Array(0.5))(0).isNaN)
  }

  test("parallelism stability is within-tolerance, not bit-level (documented)") {
    // The same data at 2 vs 8 partitions may produce different centroid
    // layouts (merge-order dependence, like KLL) but estimates must agree
    // within the sketch's rank-error band.
    val base = spark.range(50000).select((col("id") % 500).cast("double").as("v"))
    val b2 = base.repartition(2).agg(tdigest($"v")).head().getAs[Array[Byte]](0)
    val b8 = base.repartition(8).agg(tdigest($"v")).head().getAs[Array[Byte]](0)
    // compare in RANK space (the sketch's accuracy contract): the two
    // digests' CDFs at fixed probe values must agree within a few % rank
    val cdf2 = TDigestOps.cdf(b2); val cdf8 = TDigestOps.cdf(b8)
    Seq(50.0, 125.0, 250.0, 375.0, 450.0, 495.0).foreach { x =>
      assert(math.abs(cdf2(x) - cdf8(x)) < 0.05, s"rank mismatch at $x")
    }
    assert(TDigestOps.n(b2) == TDigestOps.n(b8))
  }

  test("plan: partial ObjectHashAggregate before the exchange (map-side sketch)") {
    val df = spark.range(10000).repartition(4)
      .select((col("id") % 7).as("g"), col("id").cast("double").as("v"))
      .groupBy("g").agg(tdigest($"v").as("td"))
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("ObjectHashAggregate"), plan)
    // two ObjectHashAggregate nodes (partial + final) straddling the exchange
    assert("ObjectHashAggregate".r.findAllIn(plan).length >= 2, plan)
  }
}
