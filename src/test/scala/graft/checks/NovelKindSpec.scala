package graft.checks

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.model.{DocsGen, PartSpec}

/** Novel/lost-category check (E33): a category the reference window never
  * saw is an existence-graded alarm — flagged on ANY novel mass — while a
  * reference category with zero production mass is reported (lost_kinds)
  * but not flagged. Null kinds belong to the null_kind constraint family
  * and must be invisible to this check on both sides. */
class NovelKindSpec extends AnyFunSuite {
  lazy val spark = graft.SparkTestBase.spark
  import spark.implicits._

  // parts: 0-1 control, 2 emits the novel 'chart' kind, 3 loses 'audio'
  // entirely and also carries null kinds (sentinel-exclusion fixture)
  private lazy val docs = DocsGen.docs(spark, 4000, Seq(
      PartSpec(0), PartSpec(1),
      PartSpec(2, novelKindRate = 0.05),
      PartSpec(3, nullKindRate = 0.2)))
    .withColumn("spans",
      when($"part" === 3,
        filter($"spans", s => s.getField("kind").isNull ||
          s.getField("kind") =!= "audio"))
        .otherwise($"spans"))
    .cache()

  private lazy val ref = Fit.fit(docs.filter($"part" === 0), maxSample = 50)

  private def verdictsOf(d: org.apache.spark.sql.DataFrame) = {
    val (summaries, _) = PartStats.computeFused(d, maxSample = 8,
      mode = graft.sketch.DocStatsAgg.ModeStats)
    DriftChecks.novelKind("t", 0.05, ref, summaries)
  }

  test("novel category flags with exact counts; controls pass; lost kind reported, not flagged") {
    val v = verdictsOf(docs).map(x => x.part -> x).toMap
    // controls: nothing novel, nothing lost
    for (p <- Seq(0, 1)) {
      assert(!v(p).is_drift && v(p).passed, s"control part $p must pass")
      assert(v(p).metrics("novel_kinds") == 0.0 && v(p).metrics("lost_kinds") == 0.0)
      assert(v(p).distance == 0.0)
    }
    // part 2: 'chart' is novel — hard alarm with exact recounted mass
    val chartSpans = docs.filter($"part" === 2)
      .select(explode($"spans.kind").as("k")).filter($"k" === "chart").count()
    assert(chartSpans > 0, "fixture must emit chart spans")
    assert(v(2).is_drift && !v(2).passed)
    assert(v(2).metrics("novel_kinds") == 1.0)
    assert(v(2).metrics("novel_spans") == chartSpans.toDouble)
    val nonNull2 = docs.filter($"part" === 2)
      .select(explode($"spans.kind").as("k")).filter($"k".isNotNull).count()
    assert(v(2).distance == chartSpans.toDouble / nonNull2)
    // part 3: 'audio' lost — reported, NOT flagged; nulls are not novel
    assert(!v(3).is_drift, "coverage loss alone must not alarm")
    assert(v(3).metrics("lost_kinds") == 1.0)
    assert(v(3).metrics("novel_kinds") == 0.0,
      "null kinds must not read as a novel category")
  }

  test("verdicts are partitioning-invariant (exact integer counts)") {
    val a = verdictsOf(docs)
      .map(v => (v.part, v.distance, v.p_value, v.is_drift, v.metrics))
    val b = verdictsOf(docs.repartition(7))
      .map(v => (v.part, v.distance, v.p_value, v.is_drift, v.metrics))
    assert(a == b)
  }

  test("flagship run emits the novel_kind family and flags the novel part") {
    val media = DocsGen.media(spark)
    val r = graft.engine.ValidationRun.run(docs, media, ref,
      graft.engine.RunConfig(runId = "nk", maxSample = 50, numPermutations = 5))
    val rows = r.verdicts.filter(_.check_id == "novel_kind").collect()
    assert(rows.length == 4, "one novel_kind verdict per part")
    assert(rows.filter(_.is_drift).map(_.part).toSeq == Seq(2))
  }
}
