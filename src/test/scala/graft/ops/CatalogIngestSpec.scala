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
