package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Corpus composition report: exact-integer accounting laws. */
class CorpusReportSpec extends AnyFunSuite {
  lazy val spark = graft.SparkTestBase.spark
  import spark.implicits._

  private val en = "the cat sat on the mat and it was warm for a while there"
  private val es = "el perro corre por la calle y los gatos miran desde una " +
    "ventana del segundo piso de la casa"

  test("counts, token totals, and quality mass match a per-doc replay; " +
    "null groups are reported, not dropped") {
    val docs = Seq(
      (1L, "a", en), (2L, "a", en + " again today"), (3L, "b", es),
      (4L, null.asInstanceOf[String], en))
      .toDF("doc_id", "source", "text")
    val rep = TextOps.corpusReport(docs, "source", "text")
      .collect().map(r => (Option(r.getString(0)), r.getString(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    // per-doc replay through the same gate columns
    val (lang, q, nTok) = TextOps.gateColumns(col("text"))
    val perDoc = docs.select(col("source"), lang, q, nTok.cast("long"))
      .collect().map(r => (Option(r.getString(0)), r.getString(1),
        r.getLong(2), r.getLong(3)))
    val expected = perDoc.groupBy(d => (d._1, d._2)).map { case (k, ds) =>
      k -> (ds.size.toLong, ds.map(_._4).sum, ds.map(_._3).sum)
    }
    assert(rep == expected)
    assert(rep.keySet.exists(_._1.isEmpty), "null source must be reported")
    // report merges exactly: report(a ∪ b) == element-wise sum of reports
    val r1 = TextOps.corpusReport(docs.filter($"doc_id" <= 2), "source", "text")
    val r2 = TextOps.corpusReport(docs.filter($"doc_id" > 2), "source", "text")
    val merged = r1.unionAll(r2).groupBy($"source", $"lang")
      .agg(sum($"docs").as("docs"), sum($"tokens").as("tokens"),
        sum($"quality_micros_sum").as("quality_micros_sum"))
      .collect().map(r => (Option(r.getString(0)), r.getString(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    assert(merged == rep, "reports must re-aggregate exactly")
  }

  test("one aggregation, map-side combined: no window, single exchange") {
    val docs = Seq((1L, "a", en)).toDF("doc_id", "source", "text")
    val plan = TextOps.corpusReport(docs, "source", "text")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Window"), plan)
    assert("Exchange".r.findAllIn(plan).size == 1, plan)
    assert(plan.contains("partial_"), "map-side partial agg expected: " + plan)
  }
}
