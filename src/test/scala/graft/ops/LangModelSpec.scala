package graft.ops

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** P38: Stupid-Backoff bigram LM training + perplexity scoring/gating. */
class LangModelSpec extends AnyFunSuite {
  lazy val spark = graft.SparkTestBase.spark
  import spark.implicits._

  private def lg(x: Double): Double = math.log10(x)

  // corpus: "a b", "a b", "a c" -> unigrams a:3 b:2 c:1 (N=6),
  // bigrams (a,b):2 (a,c):1
  private def corpus() = Seq(
    (1L, "a b"), (2L, "a b"), (3L, "a c")).toDF("doc_id", "text")

  test("hand-computed scores: bigram, backoff, floor, head-token paths") {
    val lm = LangModel.train(corpus(), "text")
    assert(lm.totalTokens == 6L && lm.unigramRows == 3L && lm.bigramRows == 2L)

    val probe = Seq((10L, "a b"), (11L, "a c"), (12L, "z q"), (13L, "b a c"))
      .toDF("doc_id", "text")
    val got = LangModel.scoreDocs(probe, "doc_id", "text", lm)
      .select(col("doc_id"), col("logprob_sum")).as[(Long, Double)]
      .collect().toMap

    // "a b": head a = log(3/6); bigram (a,b) = log(2/3)
    assert(math.abs(got(10L) - (lg(3.0 / 6) + lg(2.0 / 3))) < 1e-12)
    // "a c": head a + bigram (a,c) = log(1/3)
    assert(math.abs(got(11L) - (lg(3.0 / 6) + lg(1.0 / 3))) < 1e-12)
    // "z q": head z unseen -> floor a/N; q unseen bigram+unigram -> floor
    assert(math.abs(got(12L) - 2 * lg(0.4 / 6)) < 1e-12)
    // "b a c": head b = log(2/6); (b,a) unseen bigram, a seen unigram ->
    // 0.4*3/6; (a,c) bigram = 1/3
    assert(math.abs(got(13L) -
      (lg(2.0 / 6) + lg(0.4 * 3 / 6) + lg(1.0 / 3))) < 1e-12)
  }

  test("minCount prunes both tables; N stays pre-prune") {
    val lm = LangModel.train(corpus(), "text", minCount = 2)
    assert(lm.totalTokens == 6L)
    assert(lm.unigramRows == 2L && lm.bigramRows == 1L) // c and (a,c) pruned
    val got = LangModel.scoreDocs(Seq((1L, "a c")).toDF("doc_id", "text"),
      "doc_id", "text", lm).select(col("logprob_sum")).as[Double].collect()(0)
    // head a = log(3/6); (a,c) pruned AND c pruned -> floor 0.4/6
    assert(math.abs(got - (lg(3.0 / 6) + lg(0.4 / 6))) < 1e-12)
  }

  test("token-less docs: n_tokens=0, NULL score, dropped by the gate") {
    val lm = LangModel.train(corpus(), "text")
    val probe = Seq((1L, "a b"), (2L, ""), (3L, "   ")).toDF("doc_id", "text")
    val s = LangModel.scoreDocs(probe, "doc_id", "text", lm)
    val byId = s.collect().map(r => r.getLong(0) -> r).toMap
    assert(byId(2L).getLong(1) == 0L && byId(2L).isNullAt(2))
    assert(byId(3L).getLong(1) == 0L && byId(3L).isNullAt(4))
    val kept = LangModel.gateByPerplexity(probe, "doc_id", "text", lm, maxPpl = 1e9)
      .select("doc_id").as[Long].collect().toSet
    assert(kept == Set(1L), "unscorable docs must not slip the gate")
  }

  test("gate keeps low-perplexity docs only; boundary is inclusive") {
    val lm = LangModel.train(corpus(), "text")
    val probe = Seq((1L, "a b"), (2L, "z q")).toDF("doc_id", "text")
    val s = LangModel.scoreDocs(probe, "doc_id", "text", lm)
      .select(col("doc_id"), col("ppl")).as[(Long, Double)].collect().toMap
    assert(s(1L) < s(2L))
    val keepBoth = LangModel.gateByPerplexity(probe, "doc_id", "text", lm, s(2L))
      .count()
    assert(keepBoth == 2L, "boundary ppl is kept (<=)")
    val keepOne = LangModel.gateByPerplexity(probe, "doc_id", "text", lm, s(1L))
      .select("doc_id").as[Long].collect().toSet
    assert(keepOne == Set(1L))
  }

  test("streaming twin: per-micro-batch gate survivors equal the batch gate") {
    val docs = spark.range(60).select(col("id").as("doc_id"),
      when(col("id") % 5 === 0, lit("zq xv jk"))   // unseen-floor gibberish
        .otherwise(concat(lit("w"), (col("id") % 7).cast("string"), lit(" w"),
          (col("id") % 3).cast("string"), lit(" tail"))).as("text"))
    val lm = LangModel.train(docs.filter(col("doc_id") % 5 =!= 0), "text",
      minCount = 2)
    val scored = LangModel.scoreDocs(docs, "doc_id", "text", lm)
      .agg(expr("percentile(ppl, 0.5)")).collect()(0).getDouble(0)
    val batch = LangModel.gateByPerplexity(docs, "doc_id", "text", lm, scored)
      .select("doc_id").as[Long].collect().toSet
    val stream = StreamingOps.runLmGateStream(spark, docs, "doc_id", "text",
        lm, scored, slices = 4, tag = "lmspec")
      .select("doc_id").as[Long].collect().toSet
    assert(stream == batch, s"stream=$stream batch=$batch")
    assert(batch.nonEmpty && batch.size < 60, "fixture must actually gate")
  }

  test("partitioning invariance and broadcast-vs-shuffled join path equality") {
    val docs = spark.range(200).select(col("id").as("doc_id"),
      concat(lit("w"), (col("id") % 7).cast("string"), lit(" w"),
        (col("id") % 3).cast("string"), lit(" tail")).as("text"))
    val lm = LangModel.train(docs, "text", minCount = 2)
    def scored(df: org.apache.spark.sql.DataFrame, maxB: Long) =
      LangModel.scoreDocs(df, "doc_id", "text", lm, maxBroadcastRows = maxB)
        .select(col("doc_id"), round(col("logprob_sum"), 9).as("s"),
          col("n_tokens"))
        .as[(Long, Double, Long)].collect().sortBy(_._1).toSeq
    val a = scored(docs, 1000000L)
    val b = scored(docs.repartition(13), 1000000L)
    val c = scored(docs, 0L) // force the shuffled joins
    assert(a == b, "scores must be partitioning-invariant")
    assert(a == c, "broadcast and shuffled join paths must agree")
  }

  test("guards: empty-corpus model, bad minCount/alpha/maxPpl") {
    val lm = LangModel.train(corpus(), "text")
    assert(intercept[IllegalArgumentException] {
      LangModel.train(corpus(), "text", minCount = 0)
    }.getMessage.contains("minCount"))
    assert(intercept[IllegalArgumentException] {
      LangModel.train(corpus(), "text", alpha = 0.0)
    }.getMessage.contains("alpha"))
    assert(intercept[IllegalArgumentException] {
      LangModel.gateByPerplexity(corpus(), "doc_id", "text", lm, 0.0)
    }.getMessage.contains("maxPpl"))
    val empty = LangModel.train(Seq((1L, "")).toDF("doc_id", "text"), "text")
    assert(intercept[IllegalArgumentException] {
      LangModel.scoreDocs(corpus(), "doc_id", "text", empty)
    }.getMessage.contains("empty"))
  }
}
