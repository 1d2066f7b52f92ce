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
}
