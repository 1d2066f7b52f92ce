package graft.ops

import org.scalatest.funsuite.AnyFunSuite

class LineDedupSpec extends AnyFunSuite {
  lazy val spark = graft.SparkTestBase.spark
  import spark.implicits._

  // Docs 1–3 share a header line; docs 1 and 3 share a footer whose
  // case/whitespace differ (normalized-key merge); each doc has one
  // unique body line. Doc 4 is one unique line. Doc 5 is ONLY the header
  // (drops to empty under drop-all).
  private def fixture = Seq(
    (1L, "Shared Header\nbody one\nthe  footer"),
    (2L, "shared header\nbody two"),
    (3L, "SHARED  HEADER\nbody three\nThe Footer"),
    (4L, "a unique single line"),
    (5L, "shared header")
  ).toDF("doc_id", "text")

  test("lineStats: normalized keys merge case/whitespace variants; min witness is deterministic") {
    val st = LineDedup.lineStats(fixture, "doc_id", "text")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    // header: 4 occurrences over 4 docs; footer: 2 over 2. Witness is the
    // lexicographically-smallest RAW line of each key group.
    assert(st == Set(("SHARED  HEADER", 4L, 4L), ("The Footer", 2L, 2L)), s"got $st")
  }

  test("keepFirst: global-first occurrence survives, later copies drop; doc set complete") {
    val out = LineDedup.dedupLines(fixture, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out(1L) == "Shared Header\nbody one\nthe  footer") // first occurrences of both
    assert(out(2L) == "body two")
    assert(out(3L) == "body three")
    assert(out(4L) == "a unique single line")
    assert(out(5L) == "")
    assert(out.size == 5)
  }

  test("dropAll purges every occurrence of a repeated line") {
    val out = LineDedup.dedupLines(fixture, "doc_id", "text", keepFirst = false)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out(1L) == "body one")
    assert(out(3L) == "body three")
    assert(out(5L) == "")
  }

  test("byte-exact identity keeps case variants distinct") {
    // only docs 2 and 5 carry byte-identical lines ("shared header")
    val st = LineDedup.lineStats(fixture, "doc_id", "text", normalizeKey = false)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    assert(st == Set(("shared header", 2L, 2L)), s"got $st")
    val out = LineDedup.dedupLines(fixture, "doc_id", "text", normalizeKey = false)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out(1L) == "Shared Header\nbody one\nthe  footer") // case variants kept
    assert(out(2L) == "shared header\nbody two") // doc 2 is the first occurrence
    assert(out(5L) == "")
  }

  test("partitioning-invariant") {
    val base = LineDedup.dedupLines(fixture, "doc_id", "text")
      .collect().map(_.toSeq).toSet
    val reparted = LineDedup.dedupLines(fixture.repartition(7), "doc_id", "text")
      .collect().map(_.toSeq).toSet
    assert(reparted == base)
  }

  test("guards are loud") {
    assert(intercept[IllegalArgumentException](LineDedup.dedupLines(
      fixture, "doc_id", "text", minCount = 1)).getMessage.contains("minCount"))
  }
}
