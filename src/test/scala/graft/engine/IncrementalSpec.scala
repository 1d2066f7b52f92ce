package graft.engine

import java.nio.file.Files
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.checks.{ConstraintChecks, Fit}
import graft.model.{DocsGen, PartSpec}

/** Cross-snapshot incremental validation: only appended partitions are
  * scanned, base verdicts carry forward with lineage, and appended doc_ids
  * are checked against the base corpus without shuffling it. */
class IncrementalSpec extends AnyFunSuite {
  lazy val spark = graft.SparkTestBase.spark
  import spark.implicits._

  /** v2 docs: parts 3 and 4; every 10th doc of part 4 collides with a
    * part-0 doc_id from v1 (lid space 0..199 on both sides). */
  private def v2Docs() = {
    val raw = DocsGen.docs(spark, 400, Seq(PartSpec(3), PartSpec(4)))
    raw.withColumn("doc_id",
      when($"part" === 4 &&
          pmod(substring($"doc_id", 9, 9).cast("long"), lit(10L)) === 0,
        concat(lit("doc-000-"), substring($"doc_id", 9, 9)))
        .otherwise($"doc_id"))
  }

  test("runIncremental: new parts only, carried lineage, cross-snapshot dups") {
    val tmp = Files.createTempDirectory("incr")
    val table = s"$tmp/table"
    val resultsPath = s"$tmp/results"
    val violationsPath = s"$tmp/violations"
    val media = DocsGen.media(spark)

    // v1: three clean partitions, fully validated the ordinary way
    val docs1 = DocsGen.docs(spark, 600, DocsGen.cleanScenario(3))
    val s1 = SnapshotCatalog.commit(table, docs1)
    val ref1 = Fit.fit(SnapshotCatalog.read(spark, table, s1.snapshotId)
      .filter($"part" === 0), snapshotId = s1.snapshotId, maxSample = 200)
    val cfg = RunConfig(runId = "v1", maxSample = 200, numPermutations = 20)
    ValidationRun.runResumable(spark, SnapshotCatalog.read(spark, table, s1.snapshotId),
      media, ref1, cfg, resultsPath, violationsPath, knownParts = Some(s1.parts))

    // v2 appends parts 3,4; part 4 collides with part 0 on 20 doc_ids
    val s2 = SnapshotCatalog.commit(table, v2Docs())
    assert(s2.parts == Seq(0, 1, 2, 3, 4))
    val ref2 = Fit.fit(SnapshotCatalog.read(spark, table, s1.snapshotId)
      .filter($"part" === 0), snapshotId = s2.snapshotId, maxSample = 200)
    val r = ValidationRun.runIncremental(spark, table, media, ref2,
      cfg.copy(runId = "v2"), resultsPath, violationsPath,
      fromSnapshot = s1.snapshotId, toSnapshot = s2.snapshotId)

    assert(r.newParts == Seq(3, 4))
    assert(r.carriedParts == Seq(0, 1, 2))
    assert(r.crossDupCounts == Map(4 -> 20L))

    val res = spark.read.parquet(resultsPath).filter($"snapshot_id" === 2L)
    // every partition of v2 has verdicts under snapshot 2
    val statsParts = res.filter($"check_id" === "stats")
      .select("part").as[Int].collect().toSet
    assert(statsParts == Set(0, 1, 2, 3, 4))
    // carried rows: marked with the snapshot whose run scanned the bytes,
    // and bit-identical to their v1 originals on the verdict payload
    val carried = res.filter($"part" < 3)
    assert(carried.count() > 0)
    assert(carried.filter(element_at($"metrics", "validated_at_snapshot") =!= 1.0)
      .count() == 0)
    def payload(df: org.apache.spark.sql.DataFrame) =
      df.select($"part", $"check_id", $"distance", $"p_value", $"is_drift", $"passed")
        .as[(Int, String, Double, Double, Boolean, Boolean)].collect().sortBy(t => (t._1, t._2))
    val v1Rows = payload(spark.read.parquet(resultsPath)
      .filter($"snapshot_id" === 1L && $"part" < 3))
    assert(payload(carried).sameElements(v1Rows))
    // new parts were NOT carried (no lineage marker — they were scanned)
    assert(res.filter($"part" >= 3 &&
      element_at($"metrics", "validated_at_snapshot").isNotNull).count() == 0)

    // cross-snapshot uniqueness verdicts: 20 collisions at part 4, none at 3
    val cross = res.filter($"check_id" === "unique_doc_id_cross")
      .select($"part", $"distance", $"passed")
      .as[(Int, Double, Boolean)].collect().sortBy(_._1)
    assert(cross.toSeq == Seq((3, 0.0, true), (4, 20.0, false)))
    // ...and the violation rows name the colliding docs at the NEW part
    val viol = spark.read.parquet(violationsPath)
      .filter($"check_id" === "unique_doc_id_cross")
    assert(viol.count() == 20)
    assert(viol.select("part").distinct().as[Int].collect().toSeq == Seq(4))
    assert(viol.filter(!$"doc_id".startsWith("doc-000-")).count() == 0)

    // the WITHIN-new uniqueness check saw no dups (collisions are cross-only)
    val uniqNew = res.filter($"check_id" === "unique_doc_id" && $"part" >= 3)
      .select($"part", $"distance").as[(Int, Double)].collect().toMap
    assert(uniqNew == Map(3 -> 0.0, 4 -> 0.0))

    // full revalidation agrees: 20 duplicate keys, attributed to min part 0
    val full = ValidationRun.run(SnapshotCatalog.read(spark, table, s2.snapshotId),
      media, ref2, cfg.copy(runId = "full"))
    val fullDups = full.verdicts.filter($"check_id" === "unique_doc_id")
      .select($"part", $"distance").as[(Int, Double)].collect().toMap
    assert(fullDups(0) == 20.0)

    // chained carry keeps the ORIGINAL validation snapshot: v3 adds part 5
    val s3 = SnapshotCatalog.commit(table,
      DocsGen.docs(spark, 200, Seq(PartSpec(5))))
    val ref3 = ref2.copy(snapshotId = s3.snapshotId)
    val r3 = ValidationRun.runIncremental(spark, table, media, ref3,
      cfg.copy(runId = "v3"), resultsPath, violationsPath,
      fromSnapshot = s2.snapshotId, toSnapshot = s3.snapshotId)
    assert(r3.newParts == Seq(5) && r3.crossDupCounts.getOrElse(5, 0L) == 0L)
    val res3 = spark.read.parquet(resultsPath).filter($"snapshot_id" === 3L)
    val lineage = res3.filter($"check_id" === "stats")
      .select($"part", element_at($"metrics", "validated_at_snapshot"))
      .as[(Int, Option[Double])].collect().toMap
    assert(lineage == Map(0 -> Some(1.0), 1 -> Some(1.0), 2 -> Some(1.0),
      3 -> Some(2.0), 4 -> Some(2.0), 5 -> None))
  }

  test("uniquenessCross: broadcast and shuffled paths agree; broadcast plan has zero hash Exchange") {
    val base = DocsGen.docs(spark, 600, DocsGen.cleanScenario(3))
    val nu = v2Docs()
    val (vB, cB) = ConstraintChecks.uniquenessCross(nu, base, "t", Some(true))
    val (vS, cS) = ConstraintChecks.uniquenessCross(nu, base, "t", Some(false))
    assert(cB == Map(4 -> 20L) && cS == cB)
    assert(vB.select("doc_id").as[String].collect().sorted.toSeq ==
      vS.select("doc_id").as[String].collect().sorted.toSeq)
    // the broadcast path moves NO table bytes through a hash exchange —
    // base is scanned in place, bounded key sets ride broadcasts
    assert(BucketedTables.hasNoShuffle(
      ConstraintChecks.crossCollided(nu, base, useBroadcast = true)))
    // auto-selection: tiny new side picks the broadcast path (same counts)
    val (_, cAuto) = ConstraintChecks.uniquenessCross(nu, base, "t", None)
    assert(cAuto == cB)
  }

  test("runIncremental: volume fences recomputed over the combined window") {
    val tmp = Files.createTempDirectory("incrvol")
    val table = s"$tmp/table"
    val resultsPath = s"$tmp/results"
    val media = DocsGen.media(spark)
    // UNEVEN part counts so the fence is non-degenerate (MAD > 0):
    // v1 window {100,120,140} → med 120; v2 window {100,120,140,40} → med
    // 110, MAD 20 — every carried part's robust_z changes when the window
    // grows, which is exactly what a stale carried fence would get wrong
    val docs1 = DocsGen.docs(spark, 100, Seq(PartSpec(0)))
      .unionByName(DocsGen.docs(spark, 120, Seq(PartSpec(1))))
      .unionByName(DocsGen.docs(spark, 140, Seq(PartSpec(2))))
    val s1 = SnapshotCatalog.commit(table, docs1)
    val ref1 = Fit.fit(SnapshotCatalog.read(spark, table, s1.snapshotId)
      .filter($"part" === 0), snapshotId = s1.snapshotId, maxSample = 100)
    val cfg = RunConfig(runId = "v1", maxSample = 100, numPermutations = 5)
    ValidationRun.runResumable(spark, SnapshotCatalog.read(spark, table, s1.snapshotId),
      media, ref1, cfg, resultsPath, violationsPath = s"$tmp/viol",
      knownParts = Some(s1.parts))
    val v1Vol = spark.read.parquet(resultsPath)
      .filter($"snapshot_id" === 1L && $"check_id" === "volume")
      .select($"part", element_at($"metrics", "median_n")).as[(Int, Double)]
      .collect().toMap
    assert(v1Vol == Map(0 -> 120.0, 1 -> 120.0, 2 -> 120.0))

    val s2 = SnapshotCatalog.commit(table, DocsGen.docs(spark, 40, Seq(PartSpec(3))))
    val ref2 = ref1.copy(snapshotId = s2.snapshotId)
    ValidationRun.runIncremental(spark, table, media, ref2,
      cfg.copy(runId = "v2"), resultsPath, s"$tmp/viol",
      fromSnapshot = s1.snapshotId, toSnapshot = s2.snapshotId)

    def volPayload(df: org.apache.spark.sql.DataFrame) =
      df.select($"part", $"distance", $"passed",
          element_at($"metrics", "median_n"), element_at($"metrics", "mad_n"))
        .as[(Int, Double, Boolean, Double, Double)].collect().sortBy(_._1).toSeq
    val incr = volPayload(spark.read.parquet(resultsPath)
      .filter($"snapshot_id" === 2L && $"check_id" === "volume"))
    // exactly one volume row per part of the COMBINED window, new fence
    assert(incr.map(_._1) == Seq(0, 1, 2, 3))
    assert(incr.forall(r => r._4 == 110.0 && r._5 == 20.0))
    // ...and identical to what a full run at toSnapshot computes
    val full = ValidationRun.run(SnapshotCatalog.read(spark, table, s2.snapshotId),
      media, ref2, cfg.copy(runId = "full"))
    val fullVol = volPayload(full.verdicts.toDF().filter($"check_id" === "volume"))
    assert(incr == fullVol)
  }

  test("runIncremental: dropped partition in the chain fails loud") {
    val tmp = Files.createTempDirectory("incr2")
    val table = s"$tmp/table"
    SnapshotCatalog.commit(table, DocsGen.docs(spark, 200, DocsGen.cleanScenario(2)))
    // hand-write a v2 manifest that DROPS part 1 (append-only violation)
    val dir = java.nio.file.Paths.get(table, "_snapshots")
    java.nio.file.Files.write(dir.resolve("v2.json"),
      """{"snapshot_id":2,"created_at_ms":0,"parts":[0]}""".getBytes)
    val ref = Fit.fit(SnapshotCatalog.read(spark, table, 1L).filter($"part" === 0),
      snapshotId = 2L, maxSample = 100)
    val e = intercept[IllegalArgumentException] {
      ValidationRun.runIncremental(spark, table, DocsGen.media(spark), ref,
        RunConfig(runId = "x", maxSample = 100, numPermutations = 5),
        s"$tmp/results", s"$tmp/violations", fromSnapshot = 1L, toSnapshot = 2L)
    }
    assert(e.getMessage.contains("append-only"))
  }
}
