package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class RepetitionSpec extends AnyFunSuite {
  lazy val spark = graft.SparkTestBase.spark
  import spark.implicits._

  private def run(texts: Seq[(Long, String)]) =
    texts.toDF("doc_id", "text")
      .select($"doc_id", TextOps.repetitionStats($"text").as("r"))
      .select($"doc_id", $"r.top_bigram_cnt", $"r.bigram_cnt",
        $"r.dup_trigram_cnt", $"r.trigram_cnt",
        TextOps.repetitiveGate($"r").as("rep"))
      .collect().map(r => r.getLong(0) ->
        ((r.getInt(1), r.getInt(2), r.getInt(3), r.getInt(4), r.getBoolean(5))))
      .toMap

  test("hand-computed fixtures") {
    val m = run(Seq(
      1L -> "a b a b a b",          // bigrams: ab,ba,ab,ba,ab → top 3 of 5
      2L -> "one two three four",   // all distinct
      3L -> "",                     // empty
      4L -> "hello",                // single token: no bigrams
      5L -> "x x x x x x x x x x")) // maximal repetition
    assert(m(1L) == ((3, 5, 2, 4, true)))
    // trigrams of doc2: 2 distinct, dup 0; top bigram 1 of 3 → 100 > 54 fires
    assert(m(2L) == ((1, 3, 0, 2, true)))
    assert(m(3L) == ((0, 0, 0, 0, false)))
    assert(m(4L) == ((0, 0, 0, 0, false)))
    assert(m(5L) == ((9, 9, 7, 8, true)))
  }

  test("counts match an independent Scala replay on a generated corpus") {
    val vocab = Array("alpha", "beta", "gamma", "delta", "eps")
    val texts = (0L until 200L).map { i =>
      val words = (0 until (i % 40 + 1).toInt)
        .map(j => vocab(((i * 31 + j * 17) % 5).toInt))
      i -> words.mkString(" ")
    }
    val got = run(texts)
    texts.foreach { case (id, text) =>
      val toks = text.toLowerCase.split("\\s+").filter(_.nonEmpty).toSeq
      def grams(n: Int) =
        if (toks.length >= n) toks.sliding(n).map(_.mkString(" ")).toSeq else Seq()
      val bg = grams(2); val tg = grams(3)
      val top = if (bg.isEmpty) 0 else bg.groupBy(identity).values.map(_.size).max
      val exp = (top, bg.length, tg.length - tg.distinct.length, tg.length,
        top * 100 > bg.length * 18 ||
          (tg.length - tg.distinct.length) * 100 > tg.length * 30)
      assert(got(id) == exp, s"doc $id: '$text'")
    }
  }

  test("plan is shuffle-free (no explode/groupBy over the corpus)") {
    val df = Seq((1L, "a b c")).toDF("doc_id", "text")
      .select($"doc_id", TextOps.repetitionStats($"text").as("r"))
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), plan)
    assert(!plan.contains("Generate"), plan)
  }
}
