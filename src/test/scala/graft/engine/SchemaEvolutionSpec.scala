package graft.engine

import java.nio.file.Files
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.model.{DocsGen, PartSpec}

/** Manifest-tracked schema + commit-time evolution enforcement (E32):
  * additive evolution is opt-in, destructive evolution always fails loud,
  * and pinned reads see their snapshot's schema — added columns project as
  * null over pre-evolution files. */
class SchemaEvolutionSpec extends AnyFunSuite {
  lazy val spark = graft.SparkTestBase.spark
  import spark.implicits._

  test("additive evolution: denied by default, accepted with the flag, nulls backfill") {
    val tmp = Files.createTempDirectory("sevo").toString
    val table = s"$tmp/t"
    val s1 = SnapshotCatalog.commit(table, DocsGen.docs(spark, 100, Seq(PartSpec(0))))
    assert(s1.schemaJson.isDefined)

    val v2docs = DocsGen.docs(spark, 80, Seq(PartSpec(1)))
      .withColumn("quality", lit(0.5))
    // default: adding a leaf fails loud
    val e = intercept[IllegalArgumentException](
      SnapshotCatalog.commit(table, v2docs))
    assert(e.getMessage.contains("allowEvolution"))
    // opt-in: accepted; the manifest schema becomes the superset
    val s2 = SnapshotCatalog.commit(table, v2docs, allowEvolution = true)
    val after = SnapshotCatalog.read(spark, table, s2.snapshotId)
    assert(after.columns.contains("quality"))
    // old files project the added column as NULL; new files carry it
    assert(after.filter($"part" === 0 && $"quality".isNotNull).count() == 0)
    assert(after.filter($"part" === 1 && $"quality".isNull).count() == 0)
    // the PINNED pre-evolution read still sees the v1 schema
    val pinned = SnapshotCatalog.read(spark, table, s1.snapshotId)
    assert(!pinned.columns.contains("quality"))
    // a later same-schema commit needs no flag
    val s3 = SnapshotCatalog.commit(table,
      DocsGen.docs(spark, 60, Seq(PartSpec(2))).withColumn("quality", lit(0.7)))
    assert(SnapshotCatalog.read(spark, table, s3.snapshotId).count() == 240)
  }

  test("destructive evolution always fails loud: dropped and retyped leaves") {
    val tmp = Files.createTempDirectory("sevo2").toString
    val table = s"$tmp/t"
    SnapshotCatalog.commit(table, DocsGen.docs(spark, 100, Seq(PartSpec(0))))
    val drop = DocsGen.docs(spark, 50, Seq(PartSpec(1))).drop("spans")
    val eDrop = intercept[IllegalArgumentException](
      SnapshotCatalog.commit(table, drop, allowEvolution = true))
    assert(eDrop.getMessage.contains("drops"))
    val retype = DocsGen.docs(spark, 50, Seq(PartSpec(1)))
      .withColumn("doc_id", xxhash64($"doc_id"))
    val eRetype = intercept[IllegalArgumentException](
      SnapshotCatalog.commit(table, retype, allowEvolution = true))
    assert(eRetype.getMessage.contains("retypes"))
  }

  test("schema survives rollback and copy-on-write merges") {
    val tmp = Files.createTempDirectory("sevo3").toString
    val table = s"$tmp/t"
    val s1 = SnapshotCatalog.commit(table, DocsGen.docs(spark, 100, Seq(PartSpec(0))))
    val s2 = SnapshotCatalog.commit(table,
      DocsGen.docs(spark, 80, Seq(PartSpec(1))).withColumn("quality", lit(1.0)),
      allowEvolution = true)
    // merge against the evolved snapshot: schema carries through
    val docs = SnapshotCatalog.read(spark, table, s2.snapshotId)
    val upd = docs.filter($"part" === 1).limit(3)
      .select(docs.columns.filterNot(_ == "part").map(col): _*)
    val r = Merge.merge(spark, table, upd, Seq.empty[String].toDF("doc_id"))
    assert(r.snapshot.schemaJson == s2.schemaJson)
    assert(SnapshotCatalog.read(spark, table, r.snapshot.snapshotId)
      .columns.contains("quality"))
    // rollback to pre-evolution: the rolled-back schema is v1's
    val rb = SnapshotCatalog.rollbackTo(table, s1.snapshotId)
    assert(rb.schemaJson == s1.schemaJson)
    assert(!SnapshotCatalog.read(spark, table, rb.snapshotId)
      .columns.contains("quality"))
  }
}
