package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** PII detection / redaction (P28). */
class PiiSpec extends AnyFunSuite {
  lazy val spark = graft.SparkTestBase.spark
  import spark.implicits._

  private val fixture = Seq(
    // (id, text, emails, ipv4s, phones, redacted)
    (1L, "mail a.b+c@ex-ample.co.uk twice x@y.io", 2, 0, 0,
      "mail <EMAIL> twice <EMAIL>"),
    (2L, "ip 10.0.0.1 and 255.255.255.255 end", 0, 2, 0,
      "ip <IP> and <IP> end"),
    (3L, "call +1 555-0123 4567 or 020 7946 0958", 0, 0, 2,
      "call <PHONE> or <PHONE>"),
    (4L, "octet 999 is out: 999.1.1.1 but 99.1.1.1 is in", 0, 2, 0,
      // 999 is not an octet, but the match restarts at its second 9 and
      // "99.1.1.1" IS range-valid — documented high-precision-not-parser
      // behavior; what matters is DuckDB replays it identically
      "octet 999 is out: 9<IP> but <IP> is in"),
    (5L, "clean text with no pii at all", 0, 0, 0,
      "clean text with no pii at all"),
    (6L, "mixed: u@v.org at 192.168.1.7 dial +44 20 7946 0958", 1, 1, 1,
      "mixed: <EMAIL> at <IP> dial <PHONE>"))

  test("counts and fixed-order redaction match hand values; java replay agrees") {
    val df = fixture.map(f => (f._1, f._2)).toDF("doc_id", "text")
    val got = Pii.scrub(df, "text")
      .select($"doc_id", $"emails", $"ipv4s", $"phones", $"text_redacted")
      .as[(Long, Int, Int, Int, String)].collect().map(r => r._1 -> r).toMap
    for ((id, text, e, i, p, red) <- fixture) {
      assert(got(id) == ((id, e, i, p, red)), s"doc $id on '$text'")
      // independent java.util.regex replay of the counts
      def cnt(re: String) = re.r.findAllMatchIn(text).size
      assert(cnt(Pii.EmailRe) == e && cnt(Pii.Ipv4Re) == i && cnt(Pii.PhoneRe) == p,
        s"java replay disagrees on doc $id")
    }
  }

  test("redaction order: email consumes its digits before the phone pass") {
    // 9+ digit local part would be phone-shaped if emails weren't first
    val df = Seq((1L, "write 123456789x@ex.com now")).toDF("doc_id", "text")
    val r = Pii.scrub(df, "text").select($"text_redacted").as[String].head()
    assert(r == "write <EMAIL> now")
  }

  test("gate keeps only docs at or under maxHits; counts are partitioning-invariant") {
    val df = fixture.map(f => (f._1, f._2)).toDF("doc_id", "text")
    assert(Pii.gate(df, "text").select($"doc_id").as[Long].collect().sorted
      === Array(5L))
    // totals: doc1=2, doc2=2, doc3=2, doc4=2, doc5=0, doc6=3
    assert(Pii.gate(df, "text", maxHits = 2).select($"doc_id").as[Long]
      .collect().sorted === Array(1L, 2L, 3L, 4L, 5L))
    val rep = Pii.scrub(df.repartition(7), "text")
      .select($"doc_id", $"emails", $"ipv4s", $"phones", $"text_redacted")
      .collect().map(_.toSeq).sortBy(_.head.asInstanceOf[Long].toString)
    val one = Pii.scrub(df.coalesce(1), "text")
      .select($"doc_id", $"emails", $"ipv4s", $"phones", $"text_redacted")
      .collect().map(_.toSeq).sortBy(_.head.asInstanceOf[Long].toString)
    assert(rep.sameElements(one))
  }

  test("scrub is narrow: no Exchange in the plan; clash on existing output column is loud") {
    val df = fixture.map(f => (f._1, f._2)).toDF("doc_id", "text")
    val plan = Pii.scrub(df, "text").queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), plan)
    val clash = df.withColumn("emails", lit(1))
    val e = intercept[IllegalArgumentException](Pii.scrub(clash, "text"))
    assert(e.getMessage.contains("emails"))
  }
}
