package graft.engine

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Z-order layout: the interleave must match hand values, and the written
  * layout must actually deliver two-column data skipping — per-file
  * bounding boxes become compact rectangles, so a filter on EITHER column
  * touches a small subset of files where a single-column sort degenerates
  * to scanning everything for the other column. */
class ZOrderSpec extends AnyFunSuite {
  lazy val spark = graft.SparkTestBase.spark
  import spark.implicits._

  test("zvalue: hand values, symmetry positions, out-of-domain fails loud") {
    def zv(x: Long, y: Long, bits: Int = 10): Long =
      Seq((x, y)).toDF("x", "y")
        .select(ZOrder.zvalue($"x", $"y", bits).as("z")).as[Long].head()
    // x=5(101), y=3(011): 1<<0 | 1<<1 | 0<<2 | 1<<3 | 1<<4 | 0<<5 = 27
    assert(zv(5L, 3L) == 27L)
    assert(zv(0L, 0L) == 0L)
    assert(zv(1L, 0L) == 1L && zv(0L, 1L) == 2L) // x gets even positions
    assert(zv(1023L, 1023L) == (1L << 20) - 1)
    val ex = intercept[Exception](zv(1024L, 0L))
    assert(ex.getMessage.contains("out of"), ex.getMessage)
    val exNull = intercept[Exception](
      Seq((Option.empty[Long], 1L)).toDF("x", "y")
        .select(ZOrder.zvalue($"x", $"y", 10)).collect())
    assert(exNull.getMessage.contains("out of"), exNull.getMessage)
    assert(intercept[IllegalArgumentException](
      ZOrder.zvalue($"x", $"y", 0)).getMessage.contains("bits"))
  }

  test("z-ordered layout prunes on BOTH columns where a linear sort " +
    "degenerates on the second (per-file bounding boxes measured)") {
    // 128x128 uniform grid, 16 files each way
    val grid = spark.range(128L * 128L)
      .select(($"id" % 128).as("a"), ($"id" / 128).cast("long").as("b"))
    val dirZ = java.nio.file.Files.createTempDirectory("graft-zorder").toString
    val dirL = java.nio.file.Files.createTempDirectory("graft-linear").toString
    ZOrder.writeZOrdered(grid, dirZ, "a", "b", bits = 7, files = 16)
    grid.repartitionByRange(16, $"a").sortWithinPartitions($"a")
      .write.mode("overwrite").parquet(dirL)

    def boxes(d: String) = ZOrder.boundingBoxes(spark, d, "a", "b")
      .select($"a_min", $"a_max", $"b_min", $"b_max")
      .as[(Long, Long, Long, Long)].collect().toSeq
    val z = boxes(dirZ); val l = boxes(dirL)
    assert(z.size == 16 && l.size == 16)
    // a filter on b=64 touches every linear file but only the z files
    // whose 32-wide b-band covers it (a depth-2 Morton cell split)
    def touching(bs: Seq[(Long, Long, Long, Long)], bVal: Long) =
      bs.count { case (_, _, lo, hi) => lo <= bVal && bVal <= hi }
    assert(touching(l, 64L) == 16, s"linear layout must be useless on b: $l")
    assert(touching(z, 64L) <= 8, s"z layout must prune on b: $z")
    // and the z layout still prunes on a (worse than linear's 1-2, but
    // bounded — the balanced trade z-ordering makes). Range-exchange
    // boundaries are SAMPLED (and the sample varies with task scheduling /
    // suite parallelism), so a few files straddle Morton quadrant seams
    // and carry wide boxes; roughly half the files may touch, with one
    // file of seam slack for the sampling wobble.
    val touchingA = z.count { case (lo, hi, _, _) => lo <= 64L && 64L <= hi }
    assert(touchingA <= 9, s"z layout must prune on a too: $z")
    // per-file b-width: linear is full-range 128, z is band-limited
    val zWidths = z.map { case (_, _, lo, hi) => hi - lo + 1 }
    val lWidths = l.map { case (_, _, lo, hi) => hi - lo + 1 }
    assert(lWidths.forall(_ == 128L))
    assert(zWidths.max <= 64L, s"z b-widths: $zWidths")
    Seq(dirZ, dirL).foreach { d =>
      try { import scala.sys.process._; Seq("rm", "-rf", d).! }
      catch { case _: Throwable => } }
  }
}
