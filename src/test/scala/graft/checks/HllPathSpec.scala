package graft.checks

import org.scalatest.funsuite.AnyFunSuite
import graft.model.DocsGen

/** The E3 approximate-distinct path (datasketches HLL via
  * hll_sketch_agg/hll_union_agg in PartStats.compute): estimates must land
  * within HLL's published error envelope of the exact per-part counts. */
class HllPathSpec extends AnyFunSuite {
  lazy val spark = graft.SparkTestBase.spark
  import spark.implicits._

  test("approx distinct per part within 5% of exact") {
    val docs = DocsGen.docs(spark, 6000, DocsGen.goldenScenario.take(6)).cache()
    val exact = docs.groupBy($"part")
      .agg(org.apache.spark.sql.functions.countDistinct($"doc_id").as("d"))
      .as[(Int, Long)].collect().toMap
    val summaries = PartStats.compute(docs, includeHll = true)
    assert(summaries.nonEmpty && summaries.keySet == exact.keySet)
    summaries.foreach { case (p, s) =>
      val e = exact(p).toDouble
      assert(s.approxDistinctDocIds > 0)
      assert(math.abs(s.approxDistinctDocIds - e) / e < 0.05,
        s"part $p: approx ${s.approxDistinctDocIds} vs exact $e")
    }
    // the dup-fixture partition (groups of 5) must be SEEN as fewer distinct
    val dupPart = summaries.keys.max // golden scenario take(6) has no dup part
    assert(summaries(dupPart).approxDistinctDocIds <= exact(dupPart) * 1.05)
  }
}
