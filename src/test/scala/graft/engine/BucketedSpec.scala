package graft.engine

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Bucketed-layout co-location: key-grain aggregation and self-join over a
  * table bucketed by that key must plan NO shuffle exchange — the layout
  * lever that amortizes the corpus shuffle into the ingest write. */
class BucketedSpec extends AnyFunSuite {
  lazy val spark = graft.SparkTestBase.spark
  import spark.implicits._

  lazy val table: String = {
    // duplicate ids so the dup-group query has real output
    val docs = (0 until 2000).map(i => (f"doc-${i % 1500}%06d", i))
      .toDF("doc_id", "payload")
    BucketedTables.commit(spark, "bucketed_docs_spec", docs, "doc_id", 8)
    "bucketed_docs_spec"
  }

  test("groupBy on the bucket key plans no shuffle and counts correctly") {
    val docs = BucketedTables.read(spark, table)
    val dups = BucketedTables.dupGroupsZeroShuffle(docs)
    assert(BucketedTables.hasNoShuffle(dups),
      dups.queryExecution.executedPlan.toString.take(2000))
    // 500 ids appear twice
    assert(dups.count() == 500)
    assert(dups.agg(sum($"cnt")).as[Long].head() == 1000)
  }

  test("self-join on the bucket key plans no shuffle on either side") {
    val docs = BucketedTables.read(spark, table)
    val joined = docs.as("a").join(docs.as("b"), "doc_id")
      .groupBy().count()
    assert(BucketedTables.hasNoShuffle(joined),
      joined.queryExecution.executedPlan.toString.take(2000))
    // each duplicated id contributes 2x2 pairs, unique ids 1
    assert(joined.as[Long].head() == 500L * 4 + 1000L)
  }

  test("commit rejects qualified / hostile table names (path-safety guard)") {
    val df = Seq(("a", 1)).toDF("doc_id", "v")
    for (bad <- Seq("db.tbl", "../escape", "tbl;DROP TABLE x", "we ird", ""))
      assertThrows[IllegalArgumentException](
        BucketedTables.commit(spark, bad, df, "doc_id", 2))
  }

  test("unbucketed twin of the same aggregation DOES shuffle (control)") {
    val plain = (0 until 2000).map(i => (f"doc-${i % 1500}%06d", i))
      .toDF("doc_id", "payload")
    val dups = BucketedTables.dupGroupsZeroShuffle(plain)
    assert(!BucketedTables.hasNoShuffle(dups))
  }
}
