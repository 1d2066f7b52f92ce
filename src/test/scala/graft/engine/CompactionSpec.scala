package graft.engine

import java.nio.file.Files
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class CompactionSpec extends AnyFunSuite {
  lazy val spark = graft.SparkTestBase.spark
  import spark.implicits._

  test("plan: start-offset binning, keep threshold, overflow file stays whole") {
    // part 0 small files in file order: 60, 60, 90, 150 (rewrite gate is
    // bytes < smallBytes=200); target bin size 100
    val files = Seq(
      (0, "a", 60L), (0, "b", 60L), (0, "c", 90L), (0, "d", 150L),
      (0, "z", 5000L), // keep (>= smallBytes)
      (1, "a", 100L)
    ).toDF("part", "file", "bytes")
    val p = Compaction.plan(files, targetBytes = 100L, smallBytes = 200L)
      .collect().map(r => (r.getInt(0), r.getString(1), r.getString(3), r.getInt(4))).toSet
    // cums: a=60(start 0→bin0), b=120(start 60→bin0), c=210(start 120→bin1),
    // d=360(start 210→bin2); z keep; part1 a start 0→bin0
    assert(p == Set(
      (0, "a", "rewrite", 0), (0, "b", "rewrite", 0), (0, "c", "rewrite", 1),
      (0, "d", "rewrite", 2), (0, "z", "keep", -1), (1, "a", "rewrite", 0)), s"got $p")
  }

  test("plan is partitioning-invariant") {
    val files = (1 to 500).map(i => (i % 7, f"f$i%04d", (i * 37 % 900 + 10).toLong))
      .toDF("part", "file", "bytes")
    val a = Compaction.plan(files, 1000L, 500L).collect().map(_.toSeq).toSet
    val b = Compaction.plan(files.repartition(11), 1000L, 500L)
      .collect().map(_.toSeq).toSet
    assert(a == b)
  }

  test("compactParts: fewer files, identical rows, manifest advances") {
    val dir = Files.createTempDirectory("compact").toString + "/t"
    // 3 parts × 8 small files each (repartition before commit fans out files)
    val df = spark.range(3000).select(
      (col("id") % 3).cast("int").as("part"),
      col("id").as("k"),
      md5(col("id").cast("string")).as("payload"))
      .repartition(24)
    val snap = SnapshotCatalog.commit(dir, df)
    val before = Compaction.fileMetadata(spark, dir, snap.snapshotId)
    val nBefore = before.count()
    assert(nBefore >= 24, s"expected many small files, got $nBefore")

    val (newId, rewritten, fb, fa) = Compaction.compactParts(
      spark, dir, snap.snapshotId, targetBytes = 64L * 1024 * 1024, smallBytes = 1L << 20)
    assert(newId == snap.snapshotId + 1)
    assert(rewritten == 3)
    assert(fb == nBefore)
    assert(fa == 3, s"one target-size bin per part expected, got $fa") // all smalls, one bin
    val after = SnapshotCatalog.read(spark, dir, newId)
      .select("part", "k", "payload").collect().map(_.toSeq).toSet
    val orig = df.select("part", "k", "payload").collect().map(_.toSeq).toSet
    assert(after == orig)
  }

  test("compactParts is a no-op when files already meet the target") {
    val dir = Files.createTempDirectory("compact2").toString + "/t"
    val df = spark.range(100).select(
      lit(0).cast("int").as("part"), col("id").as("k"))
      .coalesce(1)
    val snap = SnapshotCatalog.commit(dir, df)
    val n0 = Compaction.fileMetadata(spark, dir, snap.snapshotId).count()
    val (_, rewritten, fb, fa) = Compaction.compactParts(
      spark, dir, snap.snapshotId, targetBytes = 64L * 1024 * 1024, smallBytes = 1L << 20)
    assert(rewritten == 0 && fb == n0 && fa == n0)
  }

  test("guards are loud") {
    val files = Seq((0, "a", 1L)).toDF("part", "file", "bytes")
    assert(intercept[IllegalArgumentException](
      Compaction.plan(files, 0L, 1L)).getMessage.contains("targetBytes"))
    assert(intercept[IllegalArgumentException](
      Compaction.plan(files, 1L, 0L)).getMessage.contains("smallBytes"))
  }
}
