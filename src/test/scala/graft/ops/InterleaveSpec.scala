package graft.ops

import org.scalatest.funsuite.AnyFunSuite

/** Training-sample prep: hand-valued rendering (placeholders, null
  * conventions, array order) and chunking (boundaries, overlap, short
  * final chunk, empty doc), plus loud guards. */
class InterleaveSpec extends AnyFunSuite {
  lazy val spark = graft.SparkTestBase.spark
  import spark.implicits._

  test("renderText: text verbatim, media placeholders, null conventions, array order") {
    val docs = Seq(
      ("d1", Seq(("text", "hello world", null, 0), ("image", null, "m-00000042", 5),
        ("text", "bye", null, 9), (null, null, "m-00000001", 12),
        ("audio", null, null, 15))))
      .toDF("doc_id", "spans")
      .select($"doc_id", $"spans".cast(
        "array<struct<kind:string,text:string,media_ref:string,offset:int>>").as("spans"))
    val r = Interleave.renderText(docs).collect().head
    assert(r.getInt(1) == 5)
    assert(r.getString(2) ==
      "hello world <image:m-00000042> bye <null:m-00000001> <audio:none>")
    // a text span with NULL text renders as a placeholder, not as "null"
    val d2 = Seq(("d2", Seq(("text", null.asInstanceOf[String], null.asInstanceOf[String], 0))))
      .toDF("doc_id", "spans")
      .select($"doc_id", $"spans".cast(
        "array<struct<kind:string,text:string,media_ref:string,offset:int>>").as("spans"))
    assert(Interleave.renderText(d2).collect().head.getString(2) == "<text:none>")
  }

  test("chunkByTokens: boundaries, overlap carry, short final chunk, empty doc") {
    val df = Seq(
      ("a", "t1 t2  t3\tt4 t5 t6 t7 t8 t9 t10"), // 10 toks, messy whitespace
      ("b", "solo"),
      ("c", "   ")).toDF("doc_id", "text")
    val rows = Interleave.chunkByTokens(df, "text", maxTok = 4, overlap = 1)
      .collect().map(r => (r.getString(0), r.getInt(1), r.getInt(2), r.getString(3)))
      .sortBy(x => (x._1, x._2))
    // step 3: starts 0,3,6,9 → 4+4+4+1 tokens, overlap token repeats
    assert(rows.filter(_._1 == "a").toSeq == Seq(
      ("a", 0, 4, "t1 t2 t3 t4"), ("a", 1, 4, "t4 t5 t6 t7"),
      ("a", 2, 4, "t7 t8 t9 t10"), ("a", 3, 1, "t10")))
    assert(rows.filter(_._1 == "b").toSeq == Seq(("b", 0, 1, "solo")))
    assert(!rows.exists(_._1 == "c")) // whitespace-only doc: zero chunks
    intercept[IllegalArgumentException](
      Interleave.chunkByTokens(df, "text", maxTok = 4, overlap = 4))
    intercept[IllegalArgumentException](
      Interleave.chunkByTokens(df, "text", maxTok = 0, overlap = 0))
  }
}
