package graft.ops

import org.scalatest.funsuite.AnyFunSuite

class SubstringDedupSpec extends AnyFunSuite {
  lazy val spark = graft.SparkTestBase.spark
  import spark.implicits._

  // A and B share the 8-token run "a b c d e f g h"; C repeats its own
  // 8-token run back-to-back (within-doc duplication merges into ONE
  // 16-token span via the adjacency rule); D is unique.
  private def fixture = Seq(
    (1L, "a b c d e f g h i j"),
    (2L, "x y a b c d e f g h z"),
    (3L, "p q r s t u v w p q r s t u v w"),
    (4L, "one two three four five six seven eight nine")
  ).toDF("doc_id", "text")

  test("hand spans: cross-doc shared run, within-doc adjacent merge, unique doc clean") {
    val spans = SubstringDedup.duplicateSpans(fixture, "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getInt(2))).toSet
    assert(spans == Set((1L, 0, 8), (2L, 2, 10), (3L, 0, 16)), s"got $spans")
  }

  test("trim removes exactly the spanned tokens; fully-duplicated doc trims to empty") {
    val t = SubstringDedup.trim(fixture, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(t(1L) == "i j")
    assert(t(2L) == "x y z")
    assert(t(3L) == "")
    assert(t(4L) == "one two three four five six seven eight nine")
  }

  test("minCount raises the duplication bar; partitioning-invariant") {
    // at minCount=3 the pair-shared run (2 occurrences) stops qualifying;
    // C's self-repeat is also only 2 occurrences -> no spans anywhere
    assert(SubstringDedup.duplicateSpans(fixture, "doc_id", "text",
      minCount = 3).count() == 0)
    val base = SubstringDedup.duplicateSpans(fixture, "doc_id", "text")
      .collect().map(_.toSeq).toSet
    val reparted = SubstringDedup.duplicateSpans(fixture.repartition(7),
      "doc_id", "text").collect().map(_.toSeq).toSet
    assert(reparted == base)
  }

  test("hashed gram keys produce the same spans as exact string keys") {
    val hashed = SubstringDedup.duplicateSpans(fixture, "doc_id", "text")
      .collect().map(_.toSeq).toSet
    val exact = SubstringDedup.duplicateSpans(fixture, "doc_id", "text",
      hashGrams = false).collect().map(_.toSeq).toSet
    assert(hashed == exact && hashed.nonEmpty)
  }

  test("guards are loud") {
    assert(intercept[IllegalArgumentException](SubstringDedup.duplicateSpans(
      fixture, "doc_id", "text", k = 0)).getMessage.contains("k must be"))
    assert(intercept[IllegalArgumentException](SubstringDedup.duplicateSpans(
      fixture, "doc_id", "text", minCount = 1)).getMessage.contains("minCount"))
  }
}
