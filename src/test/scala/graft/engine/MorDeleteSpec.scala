package graft.engine

import org.scalatest.funsuite.AnyFunSuite

/** MERGE-ON-READ deletes (Iceberg v2 equality-delete semantics): commit a
  * delete set without rewriting data, reads apply it, time travel before
  * the delete still sees the rows, appends keep it in force, materialize
  * folds it into a COW rewrite and clears the list, expiry GCs
  * unreferenced sets, and the guards are loud. */
class MorDeleteSpec extends AnyFunSuite {
  lazy val spark = graft.SparkTestBase.spark
  import spark.implicits._

  private def freshTable(prefix: String): String =
    java.nio.file.Files.createTempDirectory(prefix).toString

  private def docsDf(ids: Seq[Long], part: Int) =
    ids.map(i => (f"d-$i%05d", s"text $i", part)).toDF("doc_id", "text", "part")

  test("delete set: no data rewrite, reads apply, time travel exact, appends carry") {
    val t = freshTable("mor1")
    val s1 = SnapshotCatalog.commit(t, docsDf(0L until 10L, 0))
    val s2 = SnapshotCatalog.commit(t, docsDf(10L until 20L, 1))
    assert(s2.deleteFiles.isEmpty)
    val del = Seq("d-00003", "d-00013", "d-00099").toDF("doc_id") // 99: no-op key
    val s3 = SnapshotCatalog.commitDeletes(t, del, "doc_id")
    // same parts, no rewrite — only the manifest and the delete set changed
    assert(s3.parts == s2.parts && s3.deleteFiles == Seq(s"del-${s3.snapshotId}"))
    val now = SnapshotCatalog.read(spark, t, s3.snapshotId)
      .select("doc_id").as[String].collect().toSet
    assert(now.size == 18 && !now("d-00003") && !now("d-00013"))
    // time travel: the pre-delete snapshot still sees every row
    assert(SnapshotCatalog.read(spark, t, s2.snapshotId).count() == 20)
    // a later append leaves the pending set in force
    val s4 = SnapshotCatalog.commit(t, docsDf(20L until 25L, 2))
    assert(s4.deleteFiles == s3.deleteFiles)
    val afterAppend = SnapshotCatalog.read(spark, t, s4.snapshotId)
      .select("doc_id").as[String].collect().toSet
    assert(afterAppend.size == 23 && !afterAppend("d-00003"))
    // key-range reads apply the delete too
    assert(SnapshotCatalog.readKeyRange(spark, t, s4.snapshotId,
      "doc_id", "d-00003", "d-00003").count() == 0)
    // rollback to the post-delete snapshot carries its delete list
    assert(SnapshotCatalog.rollbackTo(t, s3.snapshotId).deleteFiles == s3.deleteFiles)
  }

  test("materialize: physical rewrite, delete list cleared, history intact, GC") {
    val t = freshTable("mor2")
    SnapshotCatalog.commit(t, docsDf(0L until 10L, 0))
    SnapshotCatalog.commit(t, docsDf(10L until 20L, 1))
    val s3 = SnapshotCatalog.commitDeletes(t, Seq("d-00004").toDF("doc_id"), "doc_id")
    val s4 = SnapshotCatalog.commitDeletes(t, Seq("d-00015").toDF("doc_id"), "doc_id")
    assert(s4.deleteFiles.size == 2)
    val s5 = SnapshotCatalog.materializeDeletes(spark, t)
    assert(s5.deleteFiles.isEmpty)
    // both affected parts were rewritten under fresh ids
    assert(s5.parts.toSet.intersect(Set(0, 1)).isEmpty)
    val now = SnapshotCatalog.read(spark, t, s5.snapshotId)
      .select("doc_id").as[String].collect().toSet
    assert(now.size == 18 && !now("d-00004") && !now("d-00015"))
    // materialize with nothing pending is a pure no-op (same snapshot back)
    assert(SnapshotCatalog.materializeDeletes(spark, t).snapshotId == s5.snapshotId)
    // pinned history across the materialization is exact
    assert(SnapshotCatalog.read(spark, t, s3.snapshotId).count() == 19)
    assert(SnapshotCatalog.read(spark, t, s4.snapshotId).count() == 18)
    // expiry to the newest snapshot GCs the now-unreferenced delete sets
    SnapshotCatalog.expireSnapshots(t, 1)
    val delDir = java.nio.file.Paths.get(t, "_deletes")
    assert(!java.nio.file.Files.exists(delDir) ||
      { val l = java.nio.file.Files.list(delDir)
        try l.count() == 0 finally l.close() })
    assert(SnapshotCatalog.read(spark, t, s5.snapshotId).count() == 18)
  }

  test("materialize prunes by manifest key stats: unaffected parts not rewritten") {
    val t = freshTable("mor3")
    SnapshotCatalog.commit(t, docsDf(0L until 10L, 0))   // keys d-00000..9
    SnapshotCatalog.commit(t, docsDf(100L until 110L, 1)) // keys d-00100..109
    SnapshotCatalog.commitDeletes(t, Seq("d-00005").toDF("doc_id"), "doc_id")
    val s = SnapshotCatalog.materializeDeletes(spark, t)
    // part 1's [d-00100, d-00109] range cannot contain d-00005 → untouched
    assert(s.parts.contains(1) && !s.parts.contains(0))
    assert(SnapshotCatalog.read(spark, t, s.snapshotId).count() == 19)
  }

  test("runIncremental refuses to carry verdicts across a MOR delete") {
    val t = freshTable("mor5")
    val docs0 = graft.model.DocsGen.docs(spark, 600, graft.model.DocsGen.goldenScenario)
      .filter(org.apache.spark.sql.functions.col("part") === 0)
    val s1 = SnapshotCatalog.commit(t, docs0)
    val someKey = docs0.select("doc_id").as[String].head()
    val s2 = SnapshotCatalog.commitDeletes(t, Seq(someKey).toDF("doc_id"), "doc_id")
    val media = graft.model.DocsGen.media(spark)
    val ref = graft.checks.Fit.fit(docs0, snapshotId = s2.snapshotId, maxSample = 50)
    val out = java.nio.file.Files.createTempDirectory("mor5-res").toString
    val e = intercept[IllegalArgumentException](
      ValidationRun.runIncremental(spark, t, media, ref,
        RunConfig(runId = "mor-inc", maxSample = 50, numPermutations = 10),
        s"$out/results", s"$out/violations",
        fromSnapshot = s1.snapshotId, toSnapshot = s2.snapshotId))
    assert(e.getMessage.contains("MOR delete sets changed"))
  }

  test("guards: no table, missing key column, foreign key column, multi-column set") {
    val t = freshTable("mor4")
    intercept[IllegalArgumentException](
      SnapshotCatalog.commitDeletes(t, Seq("x").toDF("doc_id"), "doc_id"))
    SnapshotCatalog.commit(t, docsDf(0L until 5L, 0))
    intercept[IllegalArgumentException](
      SnapshotCatalog.commitDeletes(t, Seq("x").toDF("other"), "doc_id"))
    intercept[IllegalArgumentException](
      SnapshotCatalog.commitDeletes(t, Seq("x").toDF("nope"), "nope"))
  }
}
