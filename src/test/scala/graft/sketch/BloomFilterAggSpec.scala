package graft.sketch

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.BloomMightContain.bloom_might_contain

class BloomFilterAggSpec extends AnyFunSuite {
  lazy val spark = graft.SparkTestBase.spark
  import spark.implicits._

  private def filterOf(df: org.apache.spark.sql.DataFrame, c: String,
                       expected: Long, fpp: Double, parts: Int): Array[Byte] =
    df.repartition(parts)
      .agg(BloomFilterAgg.bloomFilter(col(c), expected, fpp))
      .head.getAs[Array[Byte]](0)

  test("no false negatives: every inserted value probes true (string and long domains)") {
    val words = (0 until 5000).map(i => s"shingle $i of the eval set")
    val bf = filterOf(words.toDF("s"), "s", 10000, 0.01, 8)
    val missed = words.toDF("s")
      .filter(!bloom_might_contain(lit(bf), col("s"))).count()
    assert(missed == 0, "an inserted string probed false")

    val bfL = filterOf(spark.range(5000).toDF("id"), "id", 10000, 0.01, 8)
    val missedL = spark.range(5000)
      .filter(!bloom_might_contain(lit(bfL), col("id"))).count()
    assert(missedL == 0, "an inserted long probed false")
  }

  test("false-positive rate on a disjoint probe set stays near fpp") {
    val bf = filterOf((0 until 20000).map(i => s"in $i").toDF("s"), "s",
      20000, 0.01, 8)
    val fp = (0 until 20000).map(i => s"out $i").toDF("s")
      .filter(bloom_might_contain(lit(bf), col("s"))).count()
    // expect ~200; allow 3x headroom against hash luck
    assert(fp <= 600, s"fp rate ${fp / 20000.0} >> fpp 0.01")
    assert(fp > 0, "a 20k-item filter at fpp 0.01 with zero FPs suggests " +
      "the probe set never hit the filter at all — check canonicalization")
  }

  test("serialized filter is bit-identical across partitionings and row orders") {
    val df = (0 until 30000).map(i => s"doc shingle $i").toDF("s")
    val a = filterOf(df, "s", 50000, 0.001, 2)
    val b = filterOf(df.orderBy(rand(7)), "s", 50000, 0.001, 32)
    assert(java.util.Arrays.equals(a, b),
      "bloom blob differs across partitioning — the OR-fold contract broke")
  }

  test("value canonicalization: UTF8String path ≡ putString, families independent") {
    val bf = BloomOps.fromBytes(filterOf(Seq("42").toDF("s"), "s", 100, 0.01, 1))
    assert(bf.mightContainString("42"))
    assert(!bf.mightContainLong(42L), "string '42' must not alias long 42")
  }

  test("SQL surface: bloom_filter_agg + bloom_might_contain") {
    graft.functions.GraftExtensions.register(spark)
    spark.range(1000).createOrReplaceTempView("bloom_in")
    val blob = spark.sql(
      "SELECT bloom_filter_agg(CAST(id AS STRING), 2000, CAST(0.01 AS DOUBLE)) FROM bloom_in")
      .head.getAs[Array[Byte]](0)
    spark.sql("DROP VIEW bloom_in")
    val hex = blob.map("%02x".format(_)).mkString
    val hit = spark.sql(
      s"SELECT bloom_might_contain(unhex('$hex'), '500') AS h").head.getBoolean(0)
    assert(hit)
  }

  test("guards fail loud: fpp range, oversupported type, non-foldable blob") {
    intercept[IllegalArgumentException] {
      BloomFilterAgg(null, expectedItems = 0)
    }
    intercept[IllegalArgumentException] {
      BloomFilterAgg(null, fpp = 1.0)
    }
    // double values have no bloom domain — loud, not a silent cast
    val ex = intercept[Exception] {
      Seq(1.5, 2.5).toDF("d")
        .agg(BloomFilterAgg.bloomFilter(col("d"), 100, 0.01)).head()
    }
    assert(ex.getMessage != null)
    // the filter side must be a literal: a per-row blob cannot deserialize
    // once per task
    val an = intercept[Exception] {
      Seq(("a", Array[Byte](1, 2))).toDF("s", "b")
        .select(bloom_might_contain(col("b"), col("s"))).head()
    }
    assert(an.getMessage.contains("foldable"), an.getMessage)
  }

  test("sizeBytes: the fixed budget is what the blob actually takes (± header)") {
    val expected = BloomOps.sizeBytes(1000000, 0.001)
    val blob = filterOf(Seq("x").toDF("s"), "s", 1000000, 0.001, 1)
    assert(math.abs(blob.length - expected) <= 64,
      s"blob ${blob.length} vs bit-budget $expected")
  }
}
