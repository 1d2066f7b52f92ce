package graft.checks

import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestBase

/** The round-6 single-exchange uniqueness path must be output-identical to
  * the stacked-groupBy formulation it replaced — same per-part stats, same
  * violation rows — on every fixture shape the check supports: within-part
  * dups, cross-part dups (attribution to min part, recovery range pruning),
  * a pathologically hot key, composite keys with nulls, and a clean table. */
class UniqSinglePassSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark
  import org.apache.spark.sql.functions._

  private def docsOf(rows: Seq[(String, Int)]) = {
    import spark.implicits._
    rows.toDF("doc_id", "part")
  }

  private def assertSame(docs: org.apache.spark.sql.DataFrame,
                         keyCols: Seq[String] = Seq("doc_id")): Unit = {
    val (vNew, sNew) = ConstraintChecks.uniquenessSinglePass(docs, "t", keyCols)
    val (vOld, sOld) = ConstraintChecks.uniquenessStacked(docs, "t", 0, keyCols)
    assert(sNew === sOld)
    val oldRows = vOld.collect().sortBy(v => (v.part, v.doc_id, v.detail)).toSeq
    assert(vNew.collect().sortBy(v => (v.part, v.doc_id, v.detail)).toSeq === oldRows)
  }

  test("within-part duplicates: stats and rows identical to stacked") {
    assertSame(docsOf(Seq(
      ("a", 0), ("a", 0), ("b", 0), ("c", 1), ("d", 2), ("d", 2), ("d", 2))))
  }

  test("cross-part duplicates: min-part attribution and range identical") {
    assertSame(docsOf(Seq(
      ("x", 0), ("x", 3), ("y", 1), ("y", 5), ("z", 2), ("w", 4))))
  }

  test("hot key: one key with many copies across many parts") {
    val rows = (0 until 500).map(i => ("hot", i % 7)) ++
      (0 until 100).map(i => (s"u$i", i % 7))
    assertSame(docsOf(rows))
  }

  test("composite keys with nulls: (a,NULL) vs (NULL,a) stay distinct") {
    import spark.implicits._
    val df = Seq(
      (Some("a"), None: Option[String], 0),
      (None: Option[String], Some("a"), 0),
      (Some("a"), None: Option[String], 1), // dup of row 1 across parts
      (Some("b"), Some("c"), 2),
      (Some("b"), Some("c"), 2))
      .toDF("k1", "k2", "part")
    assertSame(df, keyCols = Seq("k1", "k2"))
  }

  test("clean table: no dups, empty violations, stats identical") {
    assertSame(docsOf((0 until 200).map(i => (s"d$i", i % 5))))
  }

  test("dup side-channel overflow falls back to re-aggregation with " +
    "identical rows") {
    import spark.implicits._
    // cap is a constructor param; drive the public path with a tiny table
    // whose dup count exceeds a tiny cap via the agg directly
    val docs = docsOf(Seq(("a", 0), ("a", 1), ("b", 0), ("b", 2), ("c", 0)))
    val keyed = docs.select($"part",
      xxhash64(col("doc_id"), lit("u1")).as("h1"),
      xxhash64(col("doc_id"), lit("u2")).as("h2"))
    val dec = graft.sketch.UniqStatsAgg.decode(
      keyed.repartition(4, $"h1", $"h2")
        .agg(graft.sketch.UniqStatsAgg.uniqStats($"h1", $"h2", $"part",
          dupKeyCap = 1).as("u"))
        .head().getAs[Array[Byte]](0))
    assert(dec.dupOverflow)
    assert(dec.parts.values.map(_.dupKeys).sum === 2)
    // stats stay exact even when the side-channel overflows
    val (_, sOld) = ConstraintChecks.uniquenessStacked(docs, "t", 0, Seq("doc_id"))
    val asStats = dec.parts.map { case (p, u) =>
      p -> ConstraintChecks.UniquenessStats(u.dupKeys, u.distinctKeys, u.totalRows)
    }
    assert(asStats === sOld)
  }

  test("agg contract: merge of reduced buffers sums part stats") {
    val b1 = new graft.sketch.UniqStatsBuffer(100)
    b1.add(1L, 2L, 0); b1.add(1L, 2L, 3); b1.add(5L, 6L, 1)
    val b2 = new graft.sketch.UniqStatsBuffer(100)
    b2.add(7L, 8L, 0); b2.add(9L, 10L, 2); b2.add(9L, 10L, 2)
    b1.mergeIn(graft.sketch.UniqStatsBuffer.deserialize(b2.serialize()))
    val dec = graft.sketch.UniqStatsAgg.decode(b1.serialize())
    assert(dec.parts(0) === graft.sketch.UniqStatsAgg.PartUniq(1, 2, 3, 3))
    assert(dec.parts(1) === graft.sketch.UniqStatsAgg.PartUniq(0, 1, 1, -1))
    assert(dec.parts(2) === graft.sketch.UniqStatsAgg.PartUniq(1, 1, 2, 2))
    assert(dec.dupKeys.toSet === Set((1L, 2L, 2L), (9L, 10L, 2L)))
  }
}
