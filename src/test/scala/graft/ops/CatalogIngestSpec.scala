package graft.ops

import java.nio.file.Files
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.engine.SnapshotCatalog
import graft.model.{DocsGen, PartSpec}

/** Streaming ingestion into the snapshot catalog (E39): one micro-batch =
  * one snapshot through the full commit path (schema gate, key stats),
  * idempotent under foreachBatch re-delivery, and with batch markers that
  * never accumulate to pin snapshots against expiry. */
class CatalogIngestSpec extends AnyFunSuite {
  lazy val spark = graft.SparkTestBase.spark
  import spark.implicits._

  private def corpus(n: Long) =
    DocsGen.docs(spark, n, Seq(PartSpec(0))).drop("part")

  test("each micro-batch commits as one snapshot; the union equals the corpus") {
    val table = s"${Files.createTempDirectory("ing1")}/t"
    val docs = corpus(600).cache()
    val ids = StreamingOps.runCatalogIngestStream(spark, docs, table, slices = 3)
    assert(ids == Seq(1L, 2L, 3L))
    // snapshot N pins the first N batches; the final one is the whole corpus
    val h = SnapshotCatalog.history(spark, table).collect()
      .map(r => r.getAs[Long]("snapshot_id") -> r.getAs[Int]("n_parts")).toMap
    assert(h == Map(1L -> 1, 2L -> 2, 3L -> 3))
    val last = SnapshotCatalog.read(spark, table, 3L)
    assert(last.count() == 600)
    assert(last.select("doc_id").except(docs.select("doc_id")).count() == 0)
    // key stats rode along: history knows the exact row count
    assert(SnapshotCatalog.history(spark, table).collect()
      .find(_.getAs[Long]("snapshot_id") == 3L).get.getAs[Long]("known_rows") == 600L)
    // only the LATEST batch marker survives (older ones must not pin expiry)
    val markers = SnapshotCatalog.tags(table).keys.filter(_.startsWith("stream-batch-"))
    assert(markers.toSeq == Seq("stream-batch-2"))
  }

  test("continuous pipeline: streamed snapshots validate incrementally - only the new part pays") {
    import graft.engine.{RunConfig, SnapshotCatalog, ValidationRun}
    import graft.checks.Fit
    val tmp = Files.createTempDirectory("ing3")
    val table = s"$tmp/t"
    val resultsPath = s"$tmp/results"
    val violationsPath = s"$tmp/violations"
    val media = DocsGen.media(spark)
    val docs = corpus(900).withColumn("__slice",
      pmod(xxhash64($"doc_id", lit("s")), lit(3L)).cast("int")).cache()
    def slice(i: Int) = docs.filter($"__slice" === i).drop("__slice")

    // batch 0 arrives → snapshot 1, validated the ordinary way
    StreamingOps.commitMicroBatch(table, slice(0), batchId = 0L)
    val ref1 = Fit.fit(SnapshotCatalog.read(spark, table, 1L),
      snapshotId = 1L, maxSample = 100)
    val cfg = RunConfig(runId = "ing-v1", maxSample = 100, numPermutations = 5)
    ValidationRun.runResumable(spark, SnapshotCatalog.read(spark, table, 1L),
      media, ref1, cfg, resultsPath, violationsPath, knownParts = Some(Seq(0)))

    // each later batch → one snapshot → one incremental run over ITS part only
    (1 to 2).foreach { b =>
      StreamingOps.commitMicroBatch(table, slice(b), batchId = b.toLong)
      val snap = (b + 1).toLong
      val r = ValidationRun.runIncremental(spark, table, media,
        ref1.copy(snapshotId = snap), cfg.copy(runId = s"ing-v$snap"),
        resultsPath, violationsPath,
        fromSnapshot = snap - 1, toSnapshot = snap)
      assert(r.newParts == Seq(b), s"only batch $b's part is scanned")
      assert(r.carriedParts == (0 until b).toSeq)
      assert(r.crossDupCounts.isEmpty, "streamed doc_ids are disjoint")
    }

    // the final snapshot's verdict set covers every streamed part, with the
    // first batch's verdicts carried (lineage marker), the last one scanned
    val res = spark.read.parquet(resultsPath).filter($"snapshot_id" === 3L)
    assert(res.filter($"check_id" === "stats")
      .select("part").as[Int].collect().toSet == Set(0, 1, 2))
    // (volume is the one run-window-scoped family: recomputed, not carried)
    assert(res.filter($"part" === 0 && $"check_id" =!= "volume" &&
      element_at($"metrics", "validated_at_snapshot").isNull).count() == 0)
    assert(res.filter($"part" === 2 &&
      element_at($"metrics", "validated_at_snapshot").isNotNull).count() == 0)
  }

  test("re-delivered batch id is a no-op; the schema gate still applies to streaming ingest") {
    val table = s"${Files.createTempDirectory("ing2")}/t"
    val docs = corpus(100)
    assert(StreamingOps.commitMicroBatch(table, docs, batchId = 0L).contains(1L))
    // re-delivery of the SAME batch id: skipped, no new snapshot
    assert(StreamingOps.commitMicroBatch(table, docs, batchId = 0L).isEmpty)
    assert(SnapshotCatalog.manifestIds(table) == Seq(1L))
    // an evolving batch without the flag fails loud mid-stream too
    val widened = corpus(50).withColumn("quality", lit(1.0))
    val e = intercept[IllegalArgumentException](
      StreamingOps.commitMicroBatch(table, widened, batchId = 1L))
    assert(e.getMessage.contains("allowEvolution"))
    // and with the flag it commits
    assert(StreamingOps.commitMicroBatch(table, widened, batchId = 1L,
      allowEvolution = true).contains(2L))
  }
}
