package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Stupid-Backoff LM (P38) at volume: train a bigram model over the 10M-doc
  * ProbeCorpus (300M tokens, ~4k-word Zipf-ish vocabulary + stopwords) and
  * score + gate the whole corpus against it — wall and shuffle bytes per
  * stage, plus two exactness checks:
  *   - the model's N must equal 30 × nDocs exactly (every doc is 30 tokens);
  *   - a planted batch of gibberish docs (tokens outside the vocabulary)
  *     must score at the unseen floor and be dropped by a gate the clean
  *     corpus passes — perplexity separation measured, not assumed.
  *
  * `runMain graft.tools.LmProbe [nDocs]` (default 10,000,000). Results
  * recorded in BASELINE.md.
  */
object LmProbe {
  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toLong).getOrElse(10000000L)
    val cores = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cores]")
      .appName("graft-lm-probe")
      .config("spark.sql.shuffle.partitions", cores)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val meter = new ProbeUtil.ShuffleMeter
    spark.sparkContext.addSparkListener(meter)
    import spark.implicits._

    val dir = java.nio.file.Files.createTempDirectory("lm-probe").toString
    val (base, tGen) = ProbeUtil.time(ProbeCorpus.writeBase(spark, n, dir))
    println(f"generated $n docs in $tGen%.1f s")

    // plant 10k gibberish docs (vocabulary-disjoint tokens -> unseen floor)
    val gib = spark.range(10000).select(
      (col("id") + n).as("doc_id"),
      concat_ws(" ", transform(sequence(lit(1), lit(30)),
        i => concat(lit("zzq"), (col("id") * 31 + i).cast("string")))).as("text"))
    val corpus = base.select(col("doc_id"), col("text")).union(gib)

    val s0 = meter.snapshot
    val (lm, tTrain) = ProbeUtil.time {
      graft.ops.LangModel.train(base, "text", minCount = 2)
    }
    val s1 = meter.snapshot
    println(f"train: $tTrain%.1f s, shuffle r/w ${(s1._1 - s0._1) / 1e9}%.3f/${(s1._2 - s0._2) / 1e9}%.3f GB — " +
      f"N=${lm.totalTokens} (expect ${30 * n}), unigrams=${lm.unigramRows}, " +
      f"bigrams=${lm.bigramRows}")
    assert(lm.totalTokens == 30 * n, "token accounting broke")

    // model tables above the default broadcast row bound? report which path runs
    val bcast = lm.bigramRows <= 1000000L
    println(s"scoring join path: ${if (bcast) "broadcast" else "shuffled"} " +
      s"(bigram rows ${lm.bigramRows})")

    val (scored, tScore) = ProbeUtil.time {
      val sdf = graft.ops.LangModel.scoreDocs(corpus, "doc_id", "text", lm)
        .select(col("doc_id"), col("ppl"))
      sdf.persist()
      sdf.count()
      sdf
    }
    val s2 = meter.snapshot
    val (cleanP95, gibMin) = {
      val clean = scored.filter(col("doc_id") < n)
        .agg(expr("percentile_approx(ppl, 0.95)")).as[Double].collect()(0)
      val g = scored.filter(col("doc_id") >= n)
        .agg(min(col("ppl"))).as[Double].collect()(0)
      (clean, g)
    }
    println(f"score: $tScore%.1f s, shuffle r/w ${(s2._1 - s1._1) / 1e9}%.3f/${(s2._2 - s1._2) / 1e9}%.3f GB — " +
      f"clean p95 ppl $cleanP95%.1f, gibberish min ppl $gibMin%.1f")
    assert(gibMin > cleanP95,
      "gibberish must sit above the clean corpus's tail")

    val cut = (cleanP95 + (gibMin - cleanP95) / 2).floor
    val (kept, tGate) = ProbeUtil.time {
      graft.ops.LangModel.gateByPerplexity(corpus, "doc_id", "text", lm, cut).count()
    }
    val s3 = meter.snapshot
    val gibKept = graft.ops.LangModel
      .gateByPerplexity(gib, "doc_id", "text", lm, cut).count()
    println(f"gate(maxPpl=$cut%.0f): $tGate%.1f s, shuffle r/w ${(s3._1 - s2._1) / 1e9}%.3f/${(s3._2 - s2._2) / 1e9}%.3f GB — " +
      f"kept $kept of ${n + 10000} (gibberish kept: $gibKept, expect 0)")
    assert(gibKept == 0L, "every gibberish doc must drop")
    scored.unpersist()
    spark.stop()
  }
}
