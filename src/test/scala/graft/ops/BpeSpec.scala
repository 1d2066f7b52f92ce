package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class BpeSpec extends AnyFunSuite {
  lazy val spark = graft.SparkTestBase.spark
  import spark.implicits._

  // Sennrich et al. 2016's worked example: low×5, lower×2, newest×6, widest×3
  private def corpus = Seq(
    (1L, Array.fill(5)("low").mkString(" ")),
    (2L, Array.fill(2)("lower").mkString(" ")),
    (3L, Array.fill(6)("newest").mkString(" ")),
    (4L, Array.fill(3)("widest").mkString(" "))
  ).toDF("doc_id", "text")

  test("train replays the textbook merge sequence with deterministic tie-breaks") {
    val m = Bpe.train(corpus, "text", numMerges = 5)
      .collect().map(r => (r.getInt(0), r.getString(1), r.getLong(2)))
    // round-1 count-9 tie {e s, s t, t </w>} resolves pair-ASC to "e s";
    // round-2 tie {es t, t </w>} to "es t"; then est </w>, l o, lo w.
    assert(m.toSeq == Seq(
      (1, "e s", 9L), (2, "es t", 9L), (3, "est </w>", 9L),
      (4, "l o", 7L), (5, "lo w", 7L)), s"got ${m.toSeq}")
  }

  test("same-symbol runs merge greedily leftmost; adjacent occurrences merge in one round") {
    // aaaa ×3: round 1 merges (a,a) -> each word becomes "aa aa </w>"
    // (canonical greedy: NOT "aa a a" or "a aa a"); round 2 tie
    // {aa </w>, aa aa} resolves to "aa </w>" (' ' < 'a')
    val runs = Seq((1L, "aaaa aaaa aaaa")).toDF("doc_id", "text")
    val m = Bpe.train(runs, "text", numMerges = 2)
      .collect().map(r => (r.getInt(0), r.getString(1), r.getLong(2)))
    // (a,a) counts 3 overlapping occurrences per word × freq 3 = 9
    assert(m.toSeq == Seq((1, "a a", 9L), (2, "aa </w>", 3L)), s"got ${m.toSeq}")
  }

  test("encode applies the merge table in rank order") {
    val enc = Bpe.encode(Seq((1L, "lowest low"), (2L, "aaaa")).toDF("doc_id", "text"),
      "text", Seq("e s", "es t", "est </w>", "l o", "lo w", "a a"))
      .select($"doc_id", $"subwords").collect()
      .map(r => r.getLong(0) -> r.getSeq[String](1)).toMap
    // lowest: l o w e s t </w> -> es -> est -> est</w> -> lo -> low + est</w>
    assert(enc(1L) == Seq("low", "est</w>", "low", "</w>"), s"got ${enc(1L)}")
    assert(enc(2L) == Seq("aa", "aa", "</w>"), s"got ${enc(2L)}")
  }

  test("training is partitioning-invariant") {
    val a = Bpe.train(corpus, "text", 5).collect().map(_.toSeq).toSeq
    val b = Bpe.train(corpus.repartition(7), "text", 5).collect().map(_.toSeq).toSeq
    assert(a == b)
  }

  test("early stop: no pair repeats -> merge table ends") {
    val singles = Seq((1L, "ab cd ef")).toDF("doc_id", "text")
    // every word unique, every pair count 1 -> zero merges
    assert(Bpe.train(singles, "text", 10).count() == 0)
  }

  test("minFreq floors the word table; guards are loud") {
    // hapax "zzzz" excluded at minFreq=2 -> (z,z) never counted
    val c = Seq((1L, "low low zzzz")).toDF("doc_id", "text")
    val pairs = Bpe.train(c, "text", 10, minFreq = 2)
      .collect().map(_.getString(1)).toSet
    assert(!pairs.exists(_.contains("z")), s"got $pairs")
    assert(intercept[IllegalArgumentException](
      Bpe.train(c, "text", 0)).getMessage.contains("numMerges"))
  }

  test("batched training (batchK>1) equals canonical sequential on real text") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select($"doc_id", $"text")
    val seq16 = Bpe.train(docs, "text", numMerges = 16)
      .collect().map(r => (r.getInt(0), r.getString(1), r.getLong(2))).toSeq
    for (k <- Seq(2, 4, 8)) {
      val bat = Bpe.train(docs, "text", numMerges = 16, batchK = k)
        .collect().map(r => (r.getInt(0), r.getString(1), r.getLong(2))).toSeq
      assert(bat == seq16, s"batchK=$k diverged from sequential")
    }
    // textbook corpus too (ties + interacting merges: the stop-at-conflict
    // rule must keep order canonical)
    val seqT = Bpe.train(corpus, "text", numMerges = 5)
      .collect().map(r => (r.getInt(0), r.getString(1), r.getLong(2))).toSeq
    val batT = Bpe.train(corpus, "text", numMerges = 5, batchK = 4)
      .collect().map(r => (r.getInt(0), r.getString(1), r.getLong(2))).toSeq
    assert(batT == seqT)
    // guard
    intercept[IllegalArgumentException](
      Bpe.train(corpus, "text", numMerges = 2, batchK = 0))
  }
}
