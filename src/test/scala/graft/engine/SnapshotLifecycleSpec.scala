package graft.engine

import java.nio.file.{Files, Paths}
import org.scalatest.funsuite.AnyFunSuite
import graft.model.DocsGen

/** Snapshot lifecycle (E25): rollback + expiry with orphaned-partition GC —
  * the part-grain analogs of Iceberg's rollback_to_snapshot and
  * expire_snapshots. */
class SnapshotLifecycleSpec extends AnyFunSuite {
  lazy val spark = graft.SparkTestBase.spark
  import spark.implicits._

  private def freshTable(): String =
    Files.createTempDirectory("snaplife").toString + "/t"

  private def commitParts(table: String, parts: Seq[Int], docsPerPart: Int = 100) = {
    val specs = parts.map(p => graft.model.PartSpec(p))
    SnapshotCatalog.commit(table,
      DocsGen.docs(spark, docsPerPart.toLong * parts.size, specs),
      appendedParts = Some(parts))
  }

  test("rollback: new manifest with the target's parts; history stays pinned-readable") {
    val t = freshTable()
    val s1 = commitParts(t, Seq(0, 1))
    val s2 = commitParts(t, Seq(2, 3))
    assert(s2.parts == Seq(0, 1, 2, 3))
    val s3 = SnapshotCatalog.rollbackTo(t, s1.snapshotId)
    assert(s3.snapshotId == 3L && s3.parts == Seq(0, 1))
    // current view = v1's rows; the rolled-past snapshot is still pinned-readable
    assert(SnapshotCatalog.read(spark, t, 3L).count() == 200)
    assert(SnapshotCatalog.read(spark, t, 2L).count() == 400)
    assert(SnapshotCatalog.currentSnapshotId(t).contains(3L))
  }

  test("commit after rollback never resurrects orphaned parts") {
    val t = freshTable()
    commitParts(t, Seq(0, 1))
    commitParts(t, Seq(2, 3))
    SnapshotCatalog.rollbackTo(t, 1L)
    // default (no hint) path: fresh parts derived as dirs-minus-historical
    val specs = Seq(graft.model.PartSpec(4))
    val s4 = SnapshotCatalog.commit(t, DocsGen.docs(spark, 100, specs))
    assert(s4.parts == Seq(0, 1, 4), s"orphans 2,3 must stay out, got ${s4.parts}")
    assert(SnapshotCatalog.read(spark, t, s4.snapshotId).count() == 300)
    // orphan dirs still on disk for the pinned v2 reader
    assert(Files.exists(Paths.get(t, "data", "part=2")))
    assert(SnapshotCatalog.read(spark, t, 2L).count() == 400)
  }

  test("commit with the hint fails loud on orphaned part-id reuse") {
    val t = freshTable()
    commitParts(t, Seq(0))
    commitParts(t, Seq(1))
    SnapshotCatalog.rollbackTo(t, 1L)
    val e = intercept[IllegalArgumentException] {
      commitParts(t, Seq(1)) // part 1 is orphaned, not expired
    }
    assert(e.getMessage.contains("orphaned"))
    // after expiry GCs the orphan, the id is reusable
    SnapshotCatalog.expireSnapshots(t, keepLast = 1)
    val s = commitParts(t, Seq(1), docsPerPart = 50)
    assert(s.parts == Seq(0, 1))
    assert(SnapshotCatalog.read(spark, t, s.snapshotId).count() == 150)
  }

  test("expire: manifests below keepLast deleted, unreferenced part dirs GC'd, retained reads intact") {
    val t = freshTable()
    commitParts(t, Seq(0, 1))       // v1
    commitParts(t, Seq(2))          // v2
    SnapshotCatalog.rollbackTo(t, 1L) // v3 -> part 2 orphaned
    commitParts(t, Seq(3))          // v4: parts 0,1,3
    val (expired, gcd) = SnapshotCatalog.expireSnapshots(t, keepLast = 2)
    assert(expired == Seq(1L, 2L))
    assert(gcd == Seq(2), s"only the orphaned part 2 is GC-able, got $gcd")
    assert(!Files.exists(Paths.get(t, "data", "part=2")))
    assert(Files.exists(Paths.get(t, "data", "part=0"))) // still referenced by v3,v4
    assert(SnapshotCatalog.manifestIds(t) == Seq(3L, 4L))
    assert(SnapshotCatalog.read(spark, t, 4L).count() == 300)
    // expired snapshot reads fail loud (manifest gone)
    intercept[Exception] { SnapshotCatalog.read(spark, t, 1L) }
  }

  test("expire everything-but-current on an append-only chain GCs nothing") {
    val t = freshTable()
    commitParts(t, Seq(0))
    commitParts(t, Seq(1))
    commitParts(t, Seq(2))
    val (expired, gcd) = SnapshotCatalog.expireSnapshots(t, keepLast = 1)
    assert(expired == Seq(1L, 2L) && gcd.isEmpty)
    assert(SnapshotCatalog.read(spark, t, 3L).count() == 300)
  }

  test("guards: rollback to a missing snapshot; keepLast < 1; empty table") {
    val t = freshTable()
    commitParts(t, Seq(0))
    assert(intercept[IllegalArgumentException] {
      SnapshotCatalog.rollbackTo(t, 9L)
    }.getMessage.contains("does not exist"))
    assert(intercept[IllegalArgumentException] {
      SnapshotCatalog.expireSnapshots(t, 0)
    }.getMessage.contains("keepLast"))
    assert(intercept[IllegalArgumentException] {
      SnapshotCatalog.expireSnapshots(freshTable(), 1)
    }.getMessage.contains("no snapshots"))
  }

  test("resume after rollback: incremental validation sees the rolled-back part set") {
    val t = freshTable()
    val s1 = commitParts(t, Seq(0, 1))
    commitParts(t, Seq(2))
    val s3 = SnapshotCatalog.rollbackTo(t, s1.snapshotId)
    // the rolled-back current view is exactly v1's: same parts, same rows
    val a = SnapshotCatalog.read(spark, t, s1.snapshotId)
      .select("doc_id").as[String].collect().sorted.toSeq
    val b = SnapshotCatalog.read(spark, t, s3.snapshotId)
      .select("doc_id").as[String].collect().sorted.toSeq
    assert(a == b)
  }
}
