package graft.ops

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Deterministic sampling: the bounded-agg quota path must equal its
  * window twin bit-for-bit, and every decision must be a pure function of
  * the id (partitioning-invariant). */
class SampleSpec extends AnyFunSuite {
  lazy val spark = graft.SparkTestBase.spark
  import spark.implicits._

  lazy val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")

  test("quotaPerGroup equals the window row_number twin (rank ASC, id ASC)") {
    val cap = 7
    val got = Sample.quotaPerGroup(docs, "doc_id", "lang", cap)
      .select($"lang", $"doc_id").as[(String, Long)].collect().sorted.toSeq
    val w = Window.partitionBy($"lang")
      .orderBy(Sample.md5Rank32($"doc_id").asc, $"doc_id".asc)
    val want = docs.withColumn("rn", row_number().over(w)).filter($"rn" <= cap)
      .select($"lang", $"doc_id").as[(String, Long)].collect().sorted.toSeq
    assert(got == want)
    // every group hit its cap (fixture groups are all larger than 7)
    val perGroup = got.groupBy(_._1).view.mapValues(_.size).toMap
    assert(perGroup.values.forall(_ == cap), perGroup.toString)
  }

  test("quota and fraction decisions are partitioning-invariant") {
    val a = Sample.quotaPerGroup(docs, "doc_id", "lang", 5)
      .select($"doc_id").as[Long].collect().sorted.toSeq
    val b = Sample.quotaPerGroup(docs.repartition(17, $"text"), "doc_id", "lang", 5)
      .select($"doc_id").as[Long].collect().sorted.toSeq
    assert(a == b)
    val f1 = Sample.byFraction(docs, "doc_id", 0.3)
      .select($"doc_id").as[Long].collect().sorted.toSeq
    val f2 = Sample.byFraction(docs.repartition(17), "doc_id", 0.3)
      .select($"doc_id").as[Long].collect().sorted.toSeq
    assert(f1 == f2)
  }

  test("fractions nest (the 0.1 sample is a subset of the 0.25 sample) " +
    "and land near the target rate") {
    val n = docs.count().toDouble
    val s10 = Sample.byFraction(docs, "doc_id", 0.1)
      .select($"doc_id").as[Long].collect().toSet
    val s25 = Sample.byFraction(docs, "doc_id", 0.25)
      .select($"doc_id").as[Long].collect().toSet
    assert(s10.subsetOf(s25))
    assert(math.abs(s25.size / n - 0.25) < 0.06, s"${s25.size / n}")
    assert(Sample.byFraction(docs, "doc_id", 0.0).count() == 0L)
    assert(Sample.byFraction(docs, "doc_id", 1.0).count() == n.toLong)
  }

  test("quota caps hold when the same id appears in several groups " +
    "(keep-set joins on (group, id), not id alone)") {
    // id 0..9 duplicated into two groups; with cap 3 each group must
    // return exactly its own 3 smallest-rank rows — an id kept by group A
    // must not smuggle its twin past group B's cap
    val two = (0L until 10L).flatMap(i => Seq((i, "a"), (i, "b")))
      .toDF("doc_id", "grp")
    val got = Sample.quotaPerGroup(two, "doc_id", "grp", cap = 3)
      .groupBy($"grp").count().as[(String, Long)].collect().toMap
    assert(got == Map("a" -> 3L, "b" -> 3L), got.toString)
  }

  test("a NULL group is its own quota partition (null-safe join), " +
    "matching the window twin") {
    val withNull = (0L until 10L).map(i => (i, if (i < 6) "a" else null))
      .toDF("doc_id", "grp")
    val got = Sample.quotaPerGroup(withNull, "doc_id", "grp", cap = 3)
      .groupBy($"grp").count().as[(String, Long)].collect().toMap
    assert(got == Map("a" -> 3L, (null: String) -> 3L), got.toString)
  }

  test("null ids are dropped at every fraction (documented: no identity, " +
    "no deterministic decision)") {
    val withNull = docs.select($"doc_id", $"lang")
      .unionByName(Seq((Option.empty[Long], "xx")).toDF("doc_id", "lang"))
    assert(Sample.byFraction(withNull, "doc_id", 1.0).count() == docs.count())
  }

  test("byFractionPerGroup honors per-group rates (1.0 keeps everything, " +
    "0.0 drops everything, absent groups get the default) and nests") {
    val full = docs.groupBy($"lang").count().as[(String, Long)].collect().toMap
    val mixed = Sample.byFractionPerGroup(docs, "doc_id", "lang",
        Map("de" -> 1.0, "en" -> 0.0), defaultFraction = 0.5)
      .groupBy($"lang").count().as[(String, Long)].collect().toMap
    assert(mixed("de") == full("de"))
    assert(!mixed.contains("en"))
    val others = full.keySet -- Set("de", "en")
    others.foreach { g =>
      assert(math.abs(mixed(g).toDouble / full(g) - 0.5) < 0.15,
        s"$g: ${mixed(g)} of ${full(g)}")
    }
    // per-group nesting: the 0.2-rate en sample is a subset of the 0.6 one
    def enIds(r: Double) = Sample.byFractionPerGroup(docs, "doc_id", "lang",
        Map("en" -> r), defaultFraction = 0.0)
      .select($"doc_id").as[Long].collect().toSet
    assert(enIds(0.2).subsetOf(enIds(0.6)))
  }

  test("quota shuffles bounded pairs, not the corpus: the aggregate is " +
    "partial before the exchange and no window sort exists") {
    val plan = Sample.quotaPerGroup(docs, "doc_id", "lang", 5)
      .queryExecution.executedPlan.toString
    assert(plan.contains("partial_topk_pairs"), plan.take(2000))
    assert(!plan.contains("Window"), "quota must not fall back to a window sort")
  }

  test("splitByFractions: disjoint, exhaustive, prefix-nests with byFraction, " +
    "and invariant to partitioning") {
    val splits = Seq(("train", 0.8), ("val", 0.1), ("test", 0.1))
    val labeled = Sample.splitByFractions(docs, "doc_id", splits)
      .select($"doc_id", $"split").as[(Long, String)].collect()
    // exhaustive over all non-null ids, exactly one label each
    assert(labeled.length == docs.count())
    assert(labeled.map(_._2).toSet == Set("train", "val", "test"))
    // the train split IS byFraction(0.8) — prefix nesting by construction
    val train = labeled.filter(_._2 == "train").map(_._1).sorted.toSeq
    val frac = Sample.byFraction(docs, "doc_id", 0.8)
      .select($"doc_id").as[Long].collect().sorted.toSeq
    assert(train == frac)
    // pure function of the id: partitioning changes nothing
    val re = Sample.splitByFractions(docs.repartition(13), "doc_id", splits)
      .select($"doc_id", $"split").as[(Long, String)].collect()
    assert(re.sorted.toSeq == labeled.sorted.toSeq)
    // rough proportions at 500 docs
    val counts = labeled.groupBy(_._2).view.mapValues(_.length).toMap
    assert(counts("train") > counts("val") && counts("train") > counts("test"))
  }

  test("splitByFractions guards: labels unique, fractions sum to 1") {
    val ex1 = intercept[IllegalArgumentException](
      Sample.splitByFractions(docs, "doc_id", Seq(("a", 0.5), ("a", 0.5))))
    assert(ex1.getMessage.contains("duplicate"))
    val ex2 = intercept[IllegalArgumentException](
      Sample.splitByFractions(docs, "doc_id", Seq(("a", 0.5), ("b", 0.4))))
    assert(ex2.getMessage.contains("sum to 1"))
  }

  test("string ids fail loud instead of silently null-casting") {
    val e = intercept[IllegalArgumentException](
      Sample.quotaPerGroup(docs.withColumn("sid", $"doc_id".cast("string")),
        "sid", "lang", 5))
    assert(e.getMessage.contains("integral"))
  }

  test("temperatureRates: hand values, tau=1 identity, flattening, cap") {
    // a:80 b:20, tau=2, budget 50%: q ∝ sqrt(p); f_a ≈ .41667, f_b ≈ .83333
    val r = Sample.temperatureRates(Seq(("a", 80L), ("b", 20L)), 2.0, 0.5)
    val z = math.sqrt(0.8) + math.sqrt(0.2)
    assert(math.abs(r("a") - math.min(1, 50 * (math.sqrt(0.8) / z) / 80)) < 1e-6)
    assert(math.abs(r("b") - math.min(1, 50 * (math.sqrt(0.2) / z) / 20)) < 1e-6)
    // tau=1: every group keeps exactly the budget fraction
    val r1 = Sample.temperatureRates(Seq(("a", 80L), ("b", 20L)), 1.0, 0.3)
    assert(r1("a") == 0.3 && r1("b") == 0.3)
    // flattening upweights the rare group, and a tiny group caps at 1
    assert(r("b") > r("a"))
    val rc = Sample.temperatureRates(Seq(("big", 10000L), ("tiny", 3L)), 5.0, 0.5)
    assert(rc("tiny") == 1.0)
  }

  test("temperatureRatesWaterfill: hits the budget exactly where the " +
    "single-pass rule undershoots; equals it when nothing caps; nests") {
    // capping fixture: tiny groups cap under flattening, big absorbs the
    // redistributed mass
    val counts = Seq(("big", 550L), ("mid", 400L), ("small", 40L), ("tiny", 10L))
    val n = counts.map(_._2).sum.toDouble
    def keep(r: Map[String, Double]) =
      counts.map { case (g, c) => math.min(1.0, r(g)) * c }.sum
    val single = Sample.temperatureRates(counts, 4.0, 0.6)
    val wf = Sample.temperatureRatesWaterfill(counts, 4.0, 0.6)
    assert(wf("tiny") == 1.0 && wf("small") == 1.0, s"fixture must cap: $wf")
    assert(wf("big") < 1.0 && wf("mid") < 1.0, s"fixture needs 2 uncapped: $wf")
    assert(keep(single) < 0.6 * n - 1.0, "single-pass must undershoot here")
    assert(math.abs(keep(wf) - 0.6 * n) < 0.01, s"waterfill must hit B: ${keep(wf)}")
    // uncapped groups only gain mass vs single-pass; uncapped shares stay
    // tau-proportional among themselves
    assert(wf("big") > single("big") && wf("mid") > single("mid"))
    val qb = math.pow(550 / n, 0.25); val qm = math.pow(400 / n, 0.25)
    assert(math.abs(wf("big") * 550 / qb - wf("mid") * 400 / qm) /
      (wf("big") * 550 / qb) < 1e-4, "tau-proportionality among uncapped")
    // no caps -> identical to the single pass
    val flat = Seq(("a", 100L), ("b", 100L), ("c", 100L))
    assert(Sample.temperatureRatesWaterfill(flat, 2.0, 0.5) ==
      Sample.temperatureRates(flat, 2.0, 0.5))
    // rates monotone in budget -> subsets nest
    val lo = Sample.temperatureRatesWaterfill(counts, 4.0, 0.4)
    val hi = Sample.temperatureRatesWaterfill(counts, 4.0, 0.8)
    counts.foreach { case (g, _) => assert(lo(g) <= hi(g) + 1e-9, g) }
    // guards shared with the single-pass rule
    assert(intercept[IllegalArgumentException](
      Sample.temperatureRatesWaterfill(Seq(("a", 1L)), 0.0, 0.5))
      .getMessage.contains("tau"))
  }

  test("byTemperature: deterministic, nested across budgets, null groups dropped") {
    val d = docs.select($"doc_id", $"lang")
      .union(Seq((9999999L, null.asInstanceOf[String])).toDF("doc_id", "lang"))
    val small = Sample.byTemperature(d, "doc_id", "lang", 2.0, 0.2)
      .select($"doc_id").as[Long].collect().toSet
    val big = Sample.byTemperature(d, "doc_id", "lang", 2.0, 0.6)
      .select($"doc_id").as[Long].collect().toSet
    assert(small.subsetOf(big), "smaller budget must nest inside the larger")
    assert(!big.contains(9999999L), "null-group rows are dropped")
    val again = Sample.byTemperature(d.repartition(13), "doc_id", "lang", 2.0, 0.2)
      .select($"doc_id").as[Long].collect().toSet
    assert(again == small, "partitioning-invariant")
    // realized sizes track the rates (exact threshold filter, so just sanity)
    assert(small.nonEmpty && big.size > small.size)
  }

  test("byTemperature guards: non-string group, bad tau/budget") {
    assert(intercept[IllegalArgumentException](
      Sample.byTemperature(docs, "doc_id", "doc_id", 1.0, 0.5))
      .getMessage.contains("string"))
    assert(intercept[IllegalArgumentException](
      Sample.temperatureRates(Seq(("a", 1L)), 0.0, 0.5))
      .getMessage.contains("tau"))
    assert(intercept[IllegalArgumentException](
      Sample.temperatureRates(Seq(("a", 1L)), 1.0, 1.5))
      .getMessage.contains("budgetFraction"))
  }

  test("selectByTokenBudget: greedy prefix by (score DESC, id ASC), " +
    "inclusive boundary, budgets nest") {
    // layout order: id 3 (q 90), id 1 (q 80), id 4 (q 80), id 2 (q 10)
    // running tokens:      10,        30,        60,          70
    val docs = Seq(
      (1L, 80L, 20L), (2L, 10L, 10L), (3L, 90L, 10L), (4L, 80L, 30L))
      .toDF("doc_id", "q", "tok")
    def sel(b: Long) = Sample.selectByTokenBudget(docs, "doc_id", "q", "tok", b)
      .select("doc_id").as[Long].collect().toSet
    assert(sel(9L) == Set.empty[Long], "first doc overflows -> empty prefix")
    assert(sel(10L) == Set(3L), "inclusive boundary")
    assert(sel(59L) == Set(3L, 1L), "id 4 would overflow; prefix STOPS there")
    assert(sel(60L) == Set(3L, 1L, 4L))
    assert(sel(1000L) == Set(1L, 2L, 3L, 4L))
    // nesting
    assert(sel(10L).subsetOf(sel(60L)) && sel(60L).subsetOf(sel(1000L)))
  }

  test("selectByTokenBudget: partitioning- and parts-invariant " +
    "(two-pass prefix sum equals the global window rule)") {
    val rnd = new scala.util.Random(7)
    val docs = Seq.tabulate(500)(i =>
      (i.toLong, rnd.nextInt(100).toLong, (1 + rnd.nextInt(50)).toLong))
      .toDF("doc_id", "q", "tok")
    // driver-side global replay of the prefix rule
    val rows = docs.as[(Long, Long, Long)].collect()
      .sortBy { case (id, q, _) => (-q, id) }
    var cum = 0L
    val expected = rows.takeWhile { case (_, _, t) => cum += t; cum <= 3000L }
      .map(_._1).toSet
    for (d <- Seq(docs, docs.repartition(17)); p <- Seq(2, 8)) {
      val got = Sample.selectByTokenBudget(d, "doc_id", "q", "tok", 3000L, parts = p)
        .select("doc_id").as[Long].collect().toSet
      assert(got == expected, s"parts=$p diverged")
    }
    // managed release leaves no persisted blocks behind (unpersist is
    // async — poll like IndexAppendSpec)
    val before = spark.sparkContext.getPersistentRDDs.keySet
    val (out, release) = Sample.selectByTokenBudgetManaged(
      docs, "doc_id", "q", "tok", 3000L)
    assert(out.count() == expected.size)
    release()
    val deadline = System.nanoTime() + 10000000000L
    while (spark.sparkContext.getPersistentRDDs.keySet.size > before.size &&
        System.nanoTime() < deadline) Thread.sleep(50)
    assert(spark.sparkContext.getPersistentRDDs.keySet.subsetOf(before),
      "selectByTokenBudgetManaged leaked persisted RDDs past release()")
  }

  test("group-keyed splitByFractions is leakage-free: no group straddles " +
    "a split boundary") {
    val docs = Seq.tabulate(300)(i => (i.toLong, s"src${i % 23}"))
      .toDF("doc_id", "source")
    val split = Sample.splitByFractions(docs, "source",
      Seq("train" -> 0.8, "test" -> 0.2))
    val straddlers = split.groupBy($"source")
      .agg(countDistinct($"split").as("n")).filter($"n" > 1).count()
    assert(straddlers == 0L, "a source appeared in more than one split")
    assert(split.select("split").distinct().count() == 2,
      "fixture must actually populate both splits")
  }

  test("selectByTokenBudget guards: null score / null or negative tokens " +
    "fail loud; bad budget rejected") {
    val bad1 = Seq((1L, Option.empty[Long], Option(5L)),
      (2L, Option(3L), Option(5L))).toDF("doc_id", "q", "tok")
    assert(intercept[Exception](
      Sample.selectByTokenBudget(bad1, "doc_id", "q", "tok", 10L).collect())
      .getMessage != null)
    val bad2 = Seq((1L, Option(3L), Option(-5L))).toDF("doc_id", "q", "tok")
    assert(intercept[Exception](
      Sample.selectByTokenBudget(bad2, "doc_id", "q", "tok", 10L).collect())
      .getMessage != null)
    assert(intercept[IllegalArgumentException](
      Sample.selectByTokenBudget(bad1, "doc_id", "q", "tok", -1L))
      .getMessage.contains("budget"))
  }


  test("upsampleByFactors: floor+fractional epoch copies; f<1 degenerates " +
    "to byFractionPerGroup; copies monotone in f; narrow plan; guards") {
    val d = docs.select($"doc_id", $"lang")
    val up = Sample.upsampleByFactors(d, "doc_id", "lang",
      Map("de" -> 2.5, "en" -> 0.4), defaultFactor = 1.0)
    // every de doc appears 2 or 3 times, epochs contiguous from 0
    val de = up.filter($"lang" === "de").groupBy($"doc_id")
      .agg(count(lit(1)).as("c"), min($"epoch").as("lo"), max($"epoch").as("hi"))
      .collect()
    assert(de.nonEmpty && de.forall { r =>
      val c = r.getAs[Long]("c")
      (c == 2L || c == 3L) && r.getAs[Long]("lo") == 0L && r.getAs[Long]("hi") == c - 1 })
    val rate = de.map(_.getAs[Long]("c")).sum.toDouble / de.length
    assert(rate > 2.2 && rate < 2.8, s"realized de rate $rate")
    // en at 0.4 is EXACTLY byFractionPerGroup(0.4), tagged epoch 0
    val enUp = up.filter($"lang" === "en").select($"doc_id", $"epoch")
      .as[(Long, Long)].collect().toSet
    val enFr = Sample.byFractionPerGroup(d.filter($"lang" === "en"),
        "doc_id", "lang", Map("en" -> 0.4))
      .select($"doc_id").as[Long].collect().map(_ -> 0L).toSet
    assert(enUp == enFr && enUp.nonEmpty)
    // other langs (default 1.0): exactly one epoch-0 copy each
    val others = up.filter(!$"lang".isin("de", "en"))
    assert(others.count() == d.filter(!$"lang".isin("de", "en")).count())
    assert(others.filter($"epoch" =!= 0L).count() == 0)
    // copies monotone in the factor -> mixes nest
    def copiesOf(f: Double) = Sample.upsampleByFactors(d, "doc_id", "lang",
        Map("de" -> f), 1.0).filter($"lang" === "de")
      .groupBy($"doc_id").count().as[(Long, Long)].collect().toMap
    val lo = copiesOf(1.25); val hi = copiesOf(1.75)
    assert(lo.nonEmpty && lo.forall { case (id, c) => c <= hi(id) })
    // narrow: no shuffle anywhere
    val plan = up.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), plan)
    // null ids dropped
    val withNull = d.union(Seq((null.asInstanceOf[java.lang.Long], "de"))
      .map(t => (Option(t._1).map(_.toLong).getOrElse(0L), t._2)).toDF("doc_id", "lang")
      .withColumn("doc_id", when($"lang" === "de" && $"doc_id" === 0L, lit(null))
        .otherwise($"doc_id")))
    // (fixture has no real doc_id 0 in de; the nulled row must vanish)
    val withNullUp = Sample.upsampleByFactors(withNull, "doc_id", "lang",
      Map("de" -> 2.0), 1.0)
    assert(withNullUp.filter($"doc_id".isNull).count() == 0)
    assert(intercept[IllegalArgumentException](
      Sample.upsampleByFactors(d, "doc_id", "lang", Map("de" -> -0.1)))
      .getMessage.contains("factor"))
    assert(intercept[IllegalArgumentException](
      Sample.upsampleByFactors(d, "doc_id", "lang", Map.empty, 1001.0))
      .getMessage.contains("factor"))
  }


  test("globalOrdinal equals the global window twin; partitioning-invariant; " +
    "no single-partition exchange; null score fails loud; null ids dropped") {
    val scored = docs.select($"doc_id",
      (pmod(xxhash64($"doc_id"), lit(50L))).cast("double").as("sc"))
    val (ord, release) = Sample.globalOrdinal(scored, "doc_id", "sc")
    val got = ord.as[(Long, Long)].collect().sorted.toSeq
    release()
    val w = Window.orderBy($"sc".desc, $"doc_id".asc)
    val want = scored.withColumn("ordinal", row_number().over(w) - 1)
      .select($"doc_id", $"ordinal".cast("long"))
      .as[(Long, Long)].collect().sorted.toSeq
    assert(got.nonEmpty && got == want)
    // pure function of (score, id): input partitioning changes nothing
    val (ord2, release2) = Sample.globalOrdinal(scored.repartition(17), "doc_id", "sc")
    val re = ord2.as[(Long, Long)].collect().sorted.toSeq
    release2()
    assert(re == want)
    // the plan must never collapse to one partition (the window twin does)
    val (ord3, release3) = Sample.globalOrdinal(scored, "doc_id", "sc")
    val plan = ord3.queryExecution.executedPlan.toString
    release3()
    assert(!plan.contains("Exchange SinglePartition"), plan.take(1500))
    assert(plan.contains("Exchange rangepartitioning"), plan.take(1500))
    // null score fails loud; null ids dropped
    val withNullScore = scored.withColumn("sc",
      when($"doc_id" === got.head._1, lit(null)).otherwise($"sc"))
    // raises during the eager pass-1 totals collect inside the call
    val ex = intercept[Exception] {
      val (bad, releaseBad) = Sample.globalOrdinal(withNullScore, "doc_id", "sc")
      bad.collect(); releaseBad()
    }
    assert(ex.getMessage.contains("null score"), ex.getMessage)
    val withNullId = scored.unionByName(
      Seq((Option.empty[Long], 1.0)).toDF("doc_id", "sc"))
    val (nid, releaseNid) = Sample.globalOrdinal(withNullId, "doc_id", "sc")
    assert(nid.count() == scored.count())
    releaseNid()
  }
}
