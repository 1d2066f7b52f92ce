package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class DecontaminateSpec extends AnyFunSuite {
  lazy val spark = graft.SparkTestBase.spark
  import spark.implicits._

  // corpus: d1 shares the bench trigram, d2 shares two bench trigrams (one
  // per bench doc), d3 shares nothing, d4 is an exact bench member
  private def corpus = Seq(
    (1L, "alpha beta gamma delta"),
    (2L, "alpha beta gamma zz red green blue yy"),
    (3L, "one two three four five"),
    (4L, "red green blue")
  ).toDF("doc_id", "text")

  private def bench = Seq(
    (100L, "alpha beta gamma"),
    (101L, "red green blue")
  ).toDF("bench_id", "text")

  test("report counts distinct shared shingles per doc") {
    val r = Decontaminate.contaminationReport(corpus, "doc_id", "text",
        bench, "text", n = 3)
      .collect().map(x => x.getAs[Long]("doc_id") -> x.getAs[Long]("hits")).toMap
    // d1: "alpha beta gamma" only; d2: that + "red green blue"; d4: itself
    assert(r == Map(1L -> 1L, 2L -> 2L, 4L -> 1L))
  }

  test("minHits raises the bar") {
    val r = Decontaminate.contaminationReport(corpus, "doc_id", "text",
        bench, "text", n = 3, minHits = 2)
      .collect().map(_.getAs[Long]("doc_id")).toSet
    assert(r == Set(2L))
  }

  test("dropContaminated keeps exactly the clean docs, all columns") {
    val surv = Decontaminate.dropContaminated(corpus, "doc_id", "text",
      bench, "text", n = 3)
    assert(surv.columns.toSeq == Seq("doc_id", "text"))
    assert(surv.collect().map(_.getAs[Long]("doc_id")).toSeq == Seq(3L))
  }

  test("shuffled fallback (bench over the broadcast bound) matches the broadcast path") {
    val broad = Decontaminate.contaminationReport(corpus, "doc_id", "text",
      bench, "text", n = 3).collect().map(_.toSeq).sortBy(_.head.asInstanceOf[Long])
    val shuf = Decontaminate.contaminationReport(corpus, "doc_id", "text",
      bench, "text", n = 3, maxBroadcastShingles = 1L)
      .collect().map(_.toSeq).sortBy(_.head.asInstanceOf[Long])
    assert(broad.toSeq == shuf.toSeq)
  }

  test("small bench side is broadcast (corpus side never shuffles before the join)") {
    val df = Decontaminate.contaminationReport(corpus, "doc_id", "text",
      bench, "text", n = 3)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), plan)
  }

  test("bloom rung: equals the exact gate on the fixture, never misses an exact hit at volume") {
    // fixture scale: a tight filter makes FPs on 9 distinct corpus
    // shingles essentially impossible -> bloom report == exact report
    val blob = Decontaminate.prepareBenchBloom(bench, "text", n = 3,
      expectedShingles = 100, fpp = 1e-9)
    val exact = Decontaminate.contaminationReport(corpus, "doc_id", "text",
        bench, "text", n = 3)
      .collect().map(x => x.getAs[Long]("doc_id") -> x.getAs[Long]("hits")).toMap
    val bloom = Decontaminate.reportByBloom(corpus, "doc_id", "text", blob, n = 3)
      .collect().map(x => x.getAs[Long]("doc_id") -> x.getAs[Long]("hits")).toMap
    assert(bloom == exact)

    // volume: 2000 docs, every 10th contaminated; at fpp 0.01 the flagged
    // set must CONTAIN the exact set (no false negatives, one-sided error)
    val big = spark.range(2000).selectExpr("id AS doc_id",
      "CASE WHEN id % 10 = 0 THEN concat('alpha beta gamma tail', id) " +
        "ELSE concat('w', id, ' x', id, ' y', id, ' z', id) END AS text")
    val blob2 = Decontaminate.prepareBenchBloom(bench, "text", n = 3,
      expectedShingles = 100, fpp = 0.01)
    val exactIds = Decontaminate.contaminationReport(big, "doc_id", "text",
      bench, "text", n = 3).collect().map(_.getAs[Long]("doc_id")).toSet
    val bloomIds = Decontaminate.reportByBloom(big, "doc_id", "text", blob2, n = 3)
      .collect().map(_.getAs[Long]("doc_id")).toSet
    assert(exactIds.subsetOf(bloomIds),
      s"bloom missed exact hits: ${exactIds -- bloomIds}")
    // over-flagging is the documented trade but must stay near fpp scale
    assert((bloomIds -- exactIds).size <= 60,
      s"${(bloomIds -- exactIds).size} spurious flags at fpp 0.01 over ~8k shingles")
    // drop containment: every exact-dropped doc is bloom-dropped
    val bloomSurv = Decontaminate.dropByBloom(big, "doc_id", "text", blob2, n = 3)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val exactSurv = Decontaminate.dropContaminated(big, "doc_id", "text",
      bench, "text", n = 3).select("doc_id").collect().map(_.getLong(0)).toSet
    assert(bloomSurv.subsetOf(exactSurv))

    // the blob gate is a per-row scalar: ZERO exchanges in report and drop
    for (df <- Seq(
        Decontaminate.dropByBloom(big, "doc_id", "text", blob2, n = 3),
        Decontaminate.reportByBloom(big, "doc_id", "text", blob2, n = 3))) {
      val plan = df.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"), plan)
    }

    // streaming twin: per-row gate ⇒ micro-batch-boundary invariant and
    // equal to the batch drop
    val streamSurv = StreamingOps.runDecontaminateStreamBloom(spark, big,
        "doc_id", "text", blob2, shingleN = 3, slices = 4, tag = "bloomspec")
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(streamSurv == bloomSurv)
  }

  test("null-text docs cannot be contaminated: the bloom gate KEEPS them, " +
    "like the exact twin (size(null) is NULL in Spark 4 — a bare " +
    "hits<minHits filter would silently drop them)") {
    val c = Seq((1L, "alpha beta gamma tail1"), (2L, null.asInstanceOf[String]))
      .toDF("doc_id", "text")
    val blob = Decontaminate.prepareBenchBloom(bench, "text", n = 3,
      expectedShingles = 100, fpp = 1e-6)
    val bloomKept = Decontaminate.dropByBloom(c, "doc_id", "text", blob, n = 3)
      .select("doc_id").as[Long].collect().toSet
    val exactKept = Decontaminate.dropContaminated(c, "doc_id", "text",
        bench, "text", n = 3)
      .select("doc_id").as[Long].collect().toSet
    assert(exactKept == Set(2L), s"fixture: doc 1 must be contaminated, got $exactKept")
    assert(bloomKept == exactKept, s"bloom=$bloomKept exact=$exactKept")
    // and the report schema matches the exact report's (long hits)
    assert(Decontaminate.reportByBloom(c, "doc_id", "text", blob, n = 3)
      .schema("hits").dataType.typeName == "long")
  }

  test("bloom rung guards: oversubscribed filter and bad params fail loud") {
    val ex = intercept[IllegalArgumentException] {
      Decontaminate.prepareBenchBloom(bench, "text", n = 3,
        expectedShingles = 1, fpp = 0.01) // fixture has 2 distinct shingles
    }
    assert(ex.getMessage.contains("oversubscribed"), ex.getMessage)
    intercept[IllegalArgumentException] {
      Decontaminate.reportByBloom(corpus, "doc_id", "text",
        Array.emptyByteArray, n = 3)
    }
  }

  test("streaming twin: survivors are micro-batch-boundary invariant and equal the batch drop") {
    val big = spark.range(200).selectExpr("id AS doc_id",
      // every 10th doc embeds the eval trigram -> contaminated
      "CASE WHEN id % 10 = 0 THEN concat('alpha beta gamma tail', id) " +
        "ELSE concat('w', id, ' x', id, ' y', id, ' z', id) END AS text")
    val bench = Seq((9999L, "alpha beta gamma")).toDF("doc_id", "text")
    val batchSurv = Decontaminate.dropContaminated(big, "doc_id", "text",
      bench, "text", n = 3).select("doc_id")
      .collect().map(_.getLong(0)).sorted.toSeq
    def stream(slices: Int) = StreamingOps.runDecontaminateStream(spark, big,
      "doc_id", "text", bench, "text", shingleN = 3, slices = slices,
      tag = s"spec$slices")
      .select("doc_id").collect().map(_.getLong(0)).sorted.toSeq
    assert(stream(1) == batchSurv)
    assert(stream(4) == batchSurv)
    assert(batchSurv.size == 180)
  }

  test("self-overlap: a benchmark member inside the corpus always flags itself") {
    val r = Decontaminate.contaminationReport(corpus, "doc_id", "text",
        corpus.filter($"doc_id" === 3L), "text", n = 3)
      .collect().map(_.getAs[Long]("doc_id")).toSet
    assert(r.contains(3L))
  }

  // ---- embedding-space rung ----

  private def embCorpus = {
    val r = new scala.util.Random(7)
    // background vectors + two PLANTED leaks: 90 is a verbatim copy of eval
    // vector A (cos 1.0), 91 a scaled copy of B (cosine is scale-invariant)
    val a = Array.fill(16)(r.nextDouble() * 2 - 1)
    val b = Array.fill(16)(r.nextDouble() * 2 - 1)
    val bg = (1L to 80L).map(id => (id, Array.fill(16)(r.nextDouble() * 2 - 1).toSeq))
    (bg :+ (90L, a.toSeq) :+ (91L, b.map(_ * 2.5).toSeq),
      Seq((0L, a.toSeq), (1L, b.toSeq)))
  }

  test("embeddingReport flags exactly the planted leaks; drop removes them and null rows") {
    val (cRows, eRows) = embCorpus
    val c = cRows.toDF("vec_id", "emb")
    val e = eRows.toDF("eval_id", "emb")
    val rep = Decontaminate.embeddingReport(c, "vec_id", "emb", e, "emb",
      threshold = 0.99)
      .collect().map(x => x.getLong(0) -> (x.getLong(1), x.getDouble(2))).toMap
    assert(rep.keySet == Set(90L, 91L), s"flagged ${rep.keySet}")
    assert(rep(90L) == ((1L, 1.0)) && rep(91L) == ((1L, 1.0)))
    val withNull = c.unionByName(
      Seq((99L, null.asInstanceOf[Seq[Double]])).toDF("vec_id", "emb"))
    val kept = Decontaminate.dropByEmbedding(withNull, "vec_id", "emb", e, "emb",
      threshold = 0.99).select($"vec_id").as[Long].collect().toSet
    assert(kept == (1L to 80L).toSet, s"survivors wrong: missing=${(1L to 80L).toSet -- kept} extra=${kept -- (1L to 80L).toSet}")
  }

  test("LSH rung == exact rung on verbatim leaks (identical-direction copies always share a bucket)") {
    val (cRows, eRows) = embCorpus
    val c = cRows.toDF("vec_id", "emb")
    val e = eRows.toDF("eval_id", "emb")
    val exact = Decontaminate.embeddingReport(c, "vec_id", "emb", e, "emb",
      threshold = 0.99).collect().map(_.toSeq).sortBy(_.head.toString)
    val lsh = Decontaminate.embeddingReportLsh(c, "vec_id", "emb", e, "emb",
      threshold = 0.99, planes = 12, probes = 2)
      .collect().map(_.toSeq).sortBy(_.head.toString)
    assert(lsh.sameElements(exact))
    // no shuffle reaches the corpus before the match-only aggregate: the
    // only Exchange keys on the corpus id (post-filter), never on raw rows
    val plan = Decontaminate.embeddingReport(c, "vec_id", "emb", e, "emb")
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastNestedLoopJoin"), plan)
  }

  test("unscorable rows: zero-norm eval fails loud; width-mismatch and zero-norm corpus rows drop, never report") {
    val (cRows, eRows) = embCorpus
    val c = cRows.toDF("vec_id", "emb")
    val e = eRows.toDF("eval_id", "emb")
    // a zero-norm EVAL vector would NaN-match everything (NaN sorts above
    // every number in Spark) — must be rejected loudly
    val badEval = e.unionByName(Seq((9L, Seq.fill(16)(0.0))).toDF("eval_id", "emb"))
    assert(intercept[IllegalArgumentException](
      Decontaminate.embeddingReport(c, "vec_id", "emb", badEval, "emb"))
      .getMessage.contains("zero-norm"))
    // width-mismatched (8-dim) and zero-norm CORPUS rows: unscorable →
    // dropped by the drop variant, absent from the report
    val weird = c.unionByName(Seq(
      (200L, Seq.fill(8)(0.5)), (201L, Seq.fill(16)(0.0))).toDF("vec_id", "emb"))
    val rep = Decontaminate.embeddingReport(weird, "vec_id", "emb", e, "emb",
      threshold = 0.99).select($"vec_id").as[Long].collect().toSet
    assert(rep == Set(90L, 91L), s"report flagged $rep")
    val kept = Decontaminate.dropByEmbedding(weird, "vec_id", "emb", e, "emb",
      threshold = 0.99).select($"vec_id").as[Long].collect().toSet
    assert(kept == (1L to 80L).toSet,
      s"unscorable rows slipped through: ${kept -- (1L to 80L).toSet}")
  }

  test("duplicated eval vectors count once: hits agree between rungs and with a distinct eval set") {
    val (cRows, eRows) = embCorpus
    val c = cRows.toDF("vec_id", "emb")
    val e = eRows.toDF("eval_id", "emb")
    val dupEval = e.unionByName(e) // every eval vector twice
    def hits(ev: org.apache.spark.sql.DataFrame) =
      Decontaminate.embeddingReport(c, "vec_id", "emb", ev, "emb", threshold = 0.99)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(hits(dupEval) == hits(e))
    val lsh = Decontaminate.embeddingReportLsh(c, "vec_id", "emb", dupEval, "emb",
        threshold = 0.99, planes = 12, probes = 2)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(lsh == hits(e))
  }

  test("embedding guards are loud: threshold range, oversized eval set") {
    val (cRows, eRows) = embCorpus
    val c = cRows.toDF("vec_id", "emb")
    val e = eRows.toDF("eval_id", "emb")
    assert(intercept[IllegalArgumentException](
      Decontaminate.embeddingReport(c, "vec_id", "emb", e, "emb", threshold = 1.5))
      .getMessage.contains("threshold"))
    assert(intercept[IllegalArgumentException](
      Decontaminate.embeddingReport(c, "vec_id", "emb", e, "emb", maxEval = 1))
      .getMessage.contains("eval side"))
  }
}
