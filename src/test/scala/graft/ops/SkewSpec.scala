package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.sketch.{FreqItemsAgg, FreqOps}

/** Frequent-items sketch + differentiated salted join (E13 detection+remedy). */
class SkewSpec extends AnyFunSuite {
  lazy val spark = graft.SparkTestBase.spark
  import spark.implicits._

  test("exact regime: retained counts equal groupBy counts, maxError 0, partitioning-invariant") {
    val df = spark.range(10000)
      .select(concat(lit("k"), pmod($"id", lit(37))).as("k"))
    val exact = df.groupBy($"k").count().as[(String, Long)].collect().toMap
    def sketchOf(parts: Int) = df.repartition(parts)
      .agg(FreqItemsAgg.freqItems($"k", maxMapSize = 64)).head().getAs[Array[Byte]](0)
    for (parts <- Seq(2, 7)) {
      val bytes = sketchOf(parts)
      assert(FreqOps.maxError(bytes) == 0L)
      assert(FreqOps.streamLength(bytes) == 10000L)
      val items = FreqOps.heavyHitters(bytes, 1L).map(h => h.item -> h.estimate).toMap
      assert(items == exact)
      // exact mode: bounds collapse onto the estimate
      assert(FreqOps.heavyHitters(bytes, 1L).forall(h =>
        h.lowerBound == h.estimate && h.upperBound == h.estimate))
    }
  }

  test("no false negatives under purge: hot key among 20k distinct survives a 128-slot map") {
    // hot key = 10% of mass; 20k distinct cold keys overflow maxMapSize=128
    val df = spark.range(50000).select(
      when(pmod($"id", lit(10)) === 0, lit("HOT"))
        .otherwise(concat(lit("c"), $"id")).as("k"))
    val hot = Skew.heavyKeys(df, "k", minFrac = 0.05, maxMapSize = 128)
    assert(hot.map(_.key).contains("HOT"))
    val h = hot.find(_.key == "HOT").get
    assert(h.lowerBound <= 5000L && h.upperBound >= 5000L)
  }

  test("heavyKeys: golden hot-doc_id fixture is detected; clean part yields nothing") {
    val hotDocs = graft.model.DocsGen.docs(spark, 4000,
      Seq(graft.model.PartSpec(3, hotKeyFrac = 0.2)))
    val hot = Skew.heavyKeys(hotDocs, "doc_id", minFrac = 0.1)
    assert(hot.map(_.key) == Seq("doc-003-hot"))
    val clean = graft.model.DocsGen.docs(spark, 4000, Seq(graft.model.PartSpec(0)))
    assert(Skew.heavyKeys(clean, "doc_id", minFrac = 0.1).isEmpty)
  }

  test("heavyKeys: map too small for threshold fails loud; empty input is empty") {
    val df = spark.range(10).select($"id".cast("string").as("k"))
    val e = intercept[IllegalArgumentException] {
      Skew.heavyKeys(df, "k", minFrac = 0.01, maxMapSize = 64)
    }
    assert(e.getMessage.contains("maxMapSize"))
    assert(Skew.heavyKeys(df.filter(lit(false)), "k", minFrac = 0.1).isEmpty)
  }

  test("saltedJoinHot: identical result set to the plain inner join") {
    // left: 30% of rows on one hot key, rest uniform over 50 keys
    val left = spark.range(6000).select(
      when(pmod($"id", lit(10)) < 3, lit(7L)).otherwise(pmod($"id", lit(50))).as("k"),
      ($"id" * 3).as("payload"))
    val right = spark.range(50).select($"id".as("k"), concat(lit("d"), $"id").as("dim"))
    val plain = left.join(right, Seq("k"))
      .select($"k", $"payload", $"dim").as[(Long, Long, String)].collect().sorted
    val salted = Skew.saltedJoinHot(left, right, "k", Seq("7"), salts = 8)
      .select($"k", $"payload", $"dim").as[(Long, Long, String)].collect().sorted
    assert(salted.sameElements(plain))
    // the hot key's build rows really replicated: 8 salt values present
    val saltsUsed = Skew.saltedJoinHot(left, right, "k", Seq("7"), salts = 8)
    assert(saltsUsed.count() == plain.length)
  }

  test("saltedJoinAuto: detects and salts the hot key; uniform input takes the plain path") {
    val left = spark.range(6000).select(
      when(pmod($"id", lit(10)) < 3, lit(7L)).otherwise(pmod($"id", lit(50))).as("k"),
      ($"id" * 3).as("payload"))
    val right = spark.range(50).select($"id".as("k"), concat(lit("d"), $"id").as("dim"))
    val (joined, hot) = Skew.saltedJoinAuto(left, right, "k", minFrac = 0.1, salts = 4)
    assert(hot.map(_.key) == Seq("7"))
    assert(joined.count() == left.join(right, Seq("k")).count())
    val uniform = spark.range(5000).select(pmod($"id", lit(100)).as("k"), $"id".as("payload"))
    val (_, none) = Skew.saltedJoinAuto(uniform, right, "k", minFrac = 0.1)
    assert(none.isEmpty)
  }

  test("saltedJoinHot guards: shared non-key columns and tiny salts fail loud") {
    val l = spark.range(5).select($"id".as("k"), $"id".as("x"))
    val r = spark.range(5).select($"id".as("k"), $"id".as("x"))
    assert(intercept[IllegalArgumentException] {
      Skew.saltedJoinHot(l, r, "k", Seq("1"))
    }.getMessage.contains("both sides"))
    assert(intercept[IllegalArgumentException] {
      Skew.saltedJoinHot(l, r.withColumnRenamed("x", "y"), "k", Seq("1"), salts = 1)
    }.getMessage.contains("salts"))
  }

  test("SQL surface: freq_items_agg callable from spark.sql") {
    graft.functions.GraftExtensions.register(spark)
    spark.range(1000).select(pmod($"id", lit(5)).cast("string").as("k"))
      .createOrReplaceTempView("freq_in")
    val bytes = spark.sql("SELECT freq_items_agg(k, 64) AS sk FROM freq_in")
      .head().getAs[Array[Byte]]("sk")
    assert(FreqOps.maxError(bytes) == 0L)
    assert(FreqOps.heavyHitters(bytes, 1L).map(_.estimate).toSet == Set(200L))
  }
}
