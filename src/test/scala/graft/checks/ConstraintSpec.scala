package graft.checks

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.model.DocsGen

class ConstraintSpec extends AnyFunSuite {
  lazy val spark = graft.SparkTestBase.spark
  import spark.implicits._

  test("span-sequence equality: detects reordered/mutated spans, passes identical") {
    val docs = DocsGen.docs(spark, 300, DocsGen.cleanScenario(2)).cache()
    // identical copy: no violations
    assert(ConstraintChecks.spanSequenceEquality(docs, docs, "t").count() == 0)
    // mutate: reverse span order of docs with >1 span
    val mutated = docs.withColumn("spans",
      when(size($"spans") > 1, reverse($"spans")).otherwise($"spans"))
    val viol = ConstraintChecks.spanSequenceEquality(mutated, docs, "t").collect()
    val multi = docs.filter(size($"spans") > 1).count()
    assert(viol.length == multi, s"${viol.length} vs $multi multi-span docs")
    assert(viol.forall(_.check_id == "span_seq_equality"))
    // mutate a field value only (same order): also caught
    val tweaked = docs.withColumn("spans",
      transform($"spans", s => struct(s.getField("kind").as("kind"),
        s.getField("text").as("text"), s.getField("media_ref").as("media_ref"),
        (s.getField("offset") + 1).as("offset"))))
    assert(ConstraintChecks.spanSequenceEquality(tweaked, docs, "t").count() == docs.count())
  }

  test("span_flags: compiled integrity flags match hand cases and DocStatsAgg counts") {
    import graft.functions.SpanFlags
    val rows = Seq(
      ("ok", Seq("text", "image"), Seq(1, 5), 0),
      ("empty", Seq.empty[String], Seq.empty[Int], 0),
      ("single", Seq("text"), Seq(3), 0),
      ("eq_off", Seq("text", "text"), Seq(4, 4), SpanFlags.OrdBit), // equal = violation
      ("backward", Seq("text", "text", "text"), Seq(4, 9, 2), SpanFlags.OrdBit),
      ("nullkind", Seq(null, "text"), Seq(1, 2), SpanFlags.NullKindBit),
      ("both", Seq("text", null), Seq(5, 5), SpanFlags.OrdBit | SpanFlags.NullKindBit))
    val df = rows.map(r => (r._1, r._2, r._3)).toDF("id", "kinds", "offs")
    val got = df.select($"id",
        SpanFlags.span_flags($"kinds", $"offs").as("fl"))
      .collect().map(r => r.getString(0) -> r.getInt(1)).toMap
    rows.foreach { case (id, _, _, want) => assert(got(id) == want, id) }

    // parity with the fused scan's counters on a generated dirty table
    val docs = graft.model.DocsGen.docs(spark, 2000,
      Seq(graft.model.PartSpec(0, swapProb = 0.3, nullKindRate = 0.1))).cache()
    val (sm, _) = PartStats.computeFused(docs, 10)
    val byFlags = docs.select(
        SpanFlags.span_flags(col("spans.kind"), col("spans.offset")).as("fl"))
      .agg(sum(when(($"fl".bitwiseAND(SpanFlags.OrdBit)) =!= 0, 1L).otherwise(0L)),
        sum(when(($"fl".bitwiseAND(SpanFlags.NullKindBit)) =!= 0, 1L).otherwise(0L)))
      .head()
    assert(byFlags.getLong(0) == sm(0).ordViolationDocs)
    assert(byFlags.getLong(1) == sm(0).nullKindDocs)
    docs.unpersist()
  }

  test("fitSplit: seeded random carve is deterministic and ~detector_fraction") {
    val docs = DocsGen.docs(spark, 6000, DocsGen.cleanScenario(3)).cache()
    val (ref1, rest1) = Fit.fitSplit(docs, detectorFraction = 0.1, maxSample = 300)
    val (ref2, rest2) = Fit.fitSplit(docs, detectorFraction = 0.1, maxSample = 300)
    assert(ref1.nDocs == ref2.nDocs && ref1.sigma == ref2.sigma) // deterministic
    assert(rest1.count() == rest2.count())
    assert(ref1.nDocs + rest1.count() == 6000)
    val frac = ref1.nDocs.toDouble / 6000
    assert(frac > 0.07 && frac < 0.13, s"window fraction $frac")
    docs.unpersist()
  }

  test("fit state round-trips through the ref_state parquet table") {
    val docs = DocsGen.docs(spark, 500, DocsGen.cleanScenario(1))
    val ref = Fit.fit(docs, snapshotId = 42L, maxSample = 100)
    val path = java.nio.file.Files.createTempDirectory("refstate").toString + "/ref"
    Fit.save(spark, ref, path)
    val loaded = Fit.load(spark, path)
    assert(loaded.sigma == ref.sigma)
    assert(loaded.nDocs == ref.nDocs && loaded.nSpans == ref.nSpans)
    assert(loaded.snapshotId == 42L)
    assert(loaded.kindHist == ref.kindHist)
    assert(loaded.refSample.length == ref.refSample.length)
    assert(loaded.refSample.map(_.toSeq).toSeq == ref.refSample.map(_.toSeq).toSeq)
    assert(graft.sketch.KllOps.n(loaded.kllBytes) == graft.sketch.KllOps.n(ref.kllBytes))
  }

  test("skew fixture: salted uniqueness correct on a pathologically hot doc_id") {
    // ~30% of one partition's docs collapse onto a single hot id
    // (FIXTURES.md skewed variant); the other partition stays clean
    val docs = DocsGen.docs(spark, 20000,
      Seq(graft.model.PartSpec(0, hotKeyFrac = 0.3), graft.model.PartSpec(1))).cache()
    val hotN = docs.filter($"doc_id" === "doc-000-hot").count()
    assert(hotN > 2000 && hotN < 4000, s"hot key draw $hotN")
    val (viol, stats) = ConstraintChecks.uniqueness(docs, "t", salts = 16)
    assert(stats(0).dupKeys == 1L, s"${stats(0)}") // exactly the hot key
    assert(stats(1).dupKeys == 0L)
    assert(stats(0).totalDocs == 10000L && stats(1).totalDocs == 10000L)
    assert(stats(0).distinctKeys == 10000L - hotN + 1)
    val v = viol.collect()
    assert(v.length == hotN && v.forall(_.doc_id == "doc-000-hot"))
    assert(v.head.detail == s"duplicate doc_id x$hotN")
    docs.unpersist()
  }

  test("uniqueness salting preserves group counts (property)") {
    val df = Seq("a", "a", "a", "b", "c", "c").zipWithIndex
      .map { case (k, i) => (k, i % 2) }.toDF("doc_id", "part")
    val (viol, stats) = ConstraintChecks.uniqueness(df, "t", salts = 4)
    val v = viol.collect()
    assert(v.map(_.doc_id).toSet == Set("a", "c"))
    assert(v.find(_.doc_id == "a").get.detail == "duplicate doc_id x3")
    assert(stats.values.map(_.totalDocs).sum == 6)
    assert(stats.values.map(_.distinctKeys).sum == 3)
  }

  test("composite-key uniqueness: flagship path on caller-chosen keys; " +
    "null-sentinel keeps (a, NULL) and (NULL, a) distinct") {
    val df = Seq(
      // (k1, k2, part): two exact dup pairs across parts + swapped-null pair
      ("a", "x", 0), ("a", "x", 1),
      ("b", "y", 0),
      ("a", null, 0), (null, "a", 0), // MUST be distinct keys
      ("c", null, 1), ("c", null, 1) // null-carrying dup pair
    ).toDF("k1", "k2", "part")
    val (viol, stats) = ConstraintChecks.uniqueness(df, "t",
      keyCols = Seq("k1", "k2"))
    // dups: ("a","x") attributed to part 0, ("c",NULL) to part 1
    assert(stats(0).dupKeys == 1L && stats(1).dupKeys == 1L, stats.toString)
    assert(stats.values.map(_.totalDocs).sum == 7)
    assert(stats.values.map(_.distinctKeys).sum == 5)
    val v = viol.collect()
    assert(v.length == 4) // 2 rows per dup key
    assert(v.forall(_.check_id == "unique_k1_k2"))
    assert(v.count(_.doc_id.startsWith("a\u0001x")) == 2)
    // guards: missing column, empty key list
    intercept[IllegalArgumentException](
      ConstraintChecks.uniqueness(df, "t", keyCols = Seq("nope")))
    intercept[IllegalArgumentException](
      ConstraintChecks.uniqueness(df, "t", keyCols = Seq.empty))
    // single-column default stays bit-compatible: same stats as before
    val docs = Seq(("d1", 0), ("d1", 1), ("d2", 0)).toDF("doc_id", "part")
    val (v1, s1) = ConstraintChecks.uniqueness(docs, "t")
    assert(s1(0).dupKeys == 1L && v1.collect().forall(_.check_id == "unique_doc_id"))
  }

  test("probe-side referential: same results as the anti-join paths; catalog never exchanged") {
    val docs = DocsGen.docs(spark, 4000,
      Seq(graft.model.PartSpec(0), graft.model.PartSpec(16, danglingRate = 0.10))).cache()
    val media = DocsGen.media(spark)
    val (vP, cP) = ConstraintChecks.referentialProbeSide(docs, media, "t")
    val (vB, cB) = ConstraintChecks.referential(docs, media, "t", broadcastMedia = true)
    val (vS, cS) = ConstraintChecks.referential(docs, media, "t", broadcastMedia = false)
    assert(cP == cB && cP == cS)
    assert(cP.getOrElse(16, 0L) > 0L) // the dangling fixture actually fired
    def rows(v: org.apache.spark.sql.Dataset[Violation]) =
      v.collect().map(x => (x.part, x.doc_id, x.detail)).sorted
    assert(rows(vP).sameElements(rows(vB)))
    assert(rows(vP).sameElements(rows(vS)))
    // plan shape: the ONLY hash Exchange is the bounded refs-distinct — the
    // catalog side is scan -> BroadcastHashJoin, never exchanged
    val plan = ConstraintChecks.probeSideDangling(docs, media)
      .queryExecution.executedPlan.toString
    assert("Exchange hashpartitioning".r.findAllIn(plan).length == 1, plan)
    // r06: the hash-set PROBE variant of the row rescan (the fused path's
    // shape — rows share the counting scan's membership predicate) emits
    // the identical row set, and its plan carries no Join and no Exchange
    val set = PartStats.broadcastMediaSet(media)
    val vProbe = ConstraintChecks.referentialRows(docs, media, "t", Some(set))
    val vJoin = ConstraintChecks.referentialRows(docs, media, "t")
    assert(rows(vProbe).sameElements(rows(vJoin)))
    // assert on the rescan's own operators (above the cached input — the
    // InMemoryRelation echoes its build plan below)
    val probePlan = vProbe.queryExecution.executedPlan.toString
      .split("InMemoryTableScan")(0)
    assert(!probePlan.contains("Join") && !probePlan.contains("Exchange"), probePlan)
    docs.unpersist()
  }

  test("kind consistency: agreement counted, dangling excluded, nulls skipped") {
    import spark.implicits._
    def span(k: String, ref: String) =
      (k, null.asInstanceOf[String], ref, 0)
    val docs = Seq(
      // part 0: one agreeing image ref, one image span pointing at audio
      (0, "d0", Seq(span("image", "m-1"), span("image", "m-2"))),
      // part 1: dangling ref (not in catalog) + text span with null ref
      (1, "d1", Seq(span("audio", "m-9"), span("text", null))),
      // part 2: all three agree
      (2, "d2", Seq(span("audio", "m-2"), span("table", "m-3"), span("image", "m-1"))))
      .toDF("part", "doc_id", "spans")
      .select($"part", $"doc_id", $"spans".cast(
        "array<struct<kind:string,text:string,media_ref:string,offset:int>>").as("spans"))
    val media = Seq(("m-1", "image"), ("m-2", "audio"), ("m-3", "table"))
      .toDF("media_ref", "media_kind")
    val got = ConstraintChecks.kindConsistency(docs, media).collect()
      .map(r => r.getInt(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(got(0) == (2L, 1L)) // m-2 is audio, span says image
    assert(!got.contains(1))   // only a dangling ref + a null ref: no joined rows
    assert(got(2) == (3L, 0L))
  }
}
