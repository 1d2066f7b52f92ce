package graft.engine

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.model.DocsGen

/** Write-audit-publish gated ingest: clean batches publish, a batch that
  * fails a gate check rolls back (current readers never see it; the
  * audited snapshot keeps the evidence), drift stays advisory under the
  * default gate, and a rejected FIRST batch leaves an empty current. */
class WapSpec extends AnyFunSuite {
  lazy val spark = graft.SparkTestBase.spark
  import spark.implicits._

  private lazy val golden = DocsGen.docs(spark, 5400, DocsGen.goldenScenario).cache()
  private lazy val media = DocsGen.media(spark).cache()
  private def cfg(run: String) =
    RunConfig(runId = run, maxSample = 100, numPermutations = 10)
  private def ref = graft.checks.Fit.fit(golden.filter($"part" === 0),
    snapshotId = 0L, maxSample = 100)

  test("clean publish, dirty rollback, evidence retained") {
    val t = java.nio.file.Files.createTempDirectory("wap1").toString
    val batch1 = golden.filter($"part" <= 2)
    val r1 = Wap.validateAndPublish(spark, t, batch1, media, ref, cfg("wap1a"))
    assert(r1.published && r1.failing.isEmpty)
    assert(SnapshotCatalog.currentSnapshotId(t).contains(r1.currentSnapshotId))
    val n1 = SnapshotCatalog.read(spark, t, r1.currentSnapshotId).count()
    assert(n1 == batch1.count())

    // batch 2 injects duplicate doc_ids → unique_doc_id gate fails
    val clean2 = golden.filter($"part" === 3 || $"part" === 4)
    val dirty2 = clean2.unionByName(clean2.filter($"part" === 3).limit(50))
    val r2 = Wap.validateAndPublish(spark, t, dirty2, media, ref, cfg("wap1b"))
    assert(!r2.published)
    assert(r2.failing.nonEmpty &&
      r2.failing.forall(_.check_id == "unique_doc_id"))
    // current rolled back: readers see exactly batch1
    val cur = SnapshotCatalog.currentSnapshotId(t).get
    assert(SnapshotCatalog.read(spark, t, cur).count() == n1)
    // the audited snapshot keeps the rejected rows for forensics
    assert(SnapshotCatalog.read(spark, t, r2.auditedSnapshotId).count() ==
      n1 + dirty2.count())
    // and a later CLEAN batch still publishes on the rolled-back table
    val r3 = Wap.validateAndPublish(spark, t, golden.filter($"part" === 5),
      media, ref, cfg("wap1c"))
    assert(r3.published)
    assert(SnapshotCatalog.read(spark, t, r3.currentSnapshotId).count() ==
      n1 + golden.filter($"part" === 5).count())
  }

  test("drift is advisory under the default gate; gating on it rejects") {
    val t = java.nio.file.Files.createTempDirectory("wap2").toString
    Wap.validateAndPublish(spark, t, golden.filter($"part" === 0), media,
      ref, cfg("wap2a"))
    // part 10 is a strong drift rung but constraint-clean → publishes
    val drifted = golden.filter($"part" === 10)
    val r = Wap.validateAndPublish(spark, t, drifted, media, ref, cfg("wap2b"))
    assert(r.published, s"drifted-but-valid batch must publish by default: " +
      s"${r.failing.map(_.check_id).mkString(",")}")
    // the same batch under a drift-inclusive gate is rejected
    val r2 = Wap.validateAndPublish(spark, t, golden.filter($"part" === 9),
      media, ref, cfg("wap2c"),
      gateChecks = Wap.DefaultGate ++ Set("ks_offset", "chi2_kind", "mmd_features"))
    assert(!r2.published && r2.failing.exists(v =>
      Set("ks_offset", "chi2_kind", "mmd_features")(v.check_id)))
  }

  test("rejected FIRST batch leaves an empty current, evidence pinned") {
    val t = java.nio.file.Files.createTempDirectory("wap3").toString
    val b = golden.filter($"part" === 0)
    val dirty = b.unionByName(b.limit(10))
    val r = Wap.validateAndPublish(spark, t, dirty, media, ref, cfg("wap3"))
    assert(!r.published)
    val cur = SnapshotCatalog.currentSnapshotId(t).get
    assert(SnapshotCatalog.read(spark, t, cur).count() == 0)
    assert(SnapshotCatalog.read(spark, t, r.auditedSnapshotId).count() ==
      dirty.count())
  }
}
