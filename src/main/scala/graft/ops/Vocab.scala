package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Corpus vocabulary operators (P35): top-N token vocabulary with
  * deterministic ranks, vocabulary coverage / OOV accounting, and
  * snapshot-to-snapshot TOKEN-DISTRIBUTION drift (E23) — the lexical twin
  * of the engine's numeric drift checks: a production snapshot whose token
  * mass shifts against the reference vocabulary (new spam vocabulary, a
  * scraper regression, a language mix change) drifts lexically long before
  * any numeric column moves.
  *
  * Scale shape: token counting is one explode into slim (token) rows and
  * one map-side-combined count exchange — the same shape as every dedup
  * gram count here; top-N selection is `orderBy(...).limit(N)`
  * (TakeOrderedAndProject: per-partition heaps, no global sort
  * materialization); coverage and drift join the corpus against the
  * VOCABULARY (≤ N rows — broadcast), never corpus-to-corpus. */
object Vocab {

  /** Top-N vocabulary: (token, cnt, rank), rank 1-based, ties broken
    * lexicographically (deterministic under any partitioning — a
    * count-only order would rank tied tokens by arrival). Tokens below
    * `minCount` never enter the ranking. */
  def build(df: DataFrame, textCol: String, topN: Int = 1000,
            minCount: Long = 1): DataFrame = {
    require(topN >= 1, s"vocab: topN must be >= 1, got $topN")
    val counts = df
      .select(explode(TextOps.tokens(col(textCol))).as("token"))
      .groupBy(col("token")).agg(count(lit(1)).as("cnt"))
      .filter(col("cnt") >= minCount)
      .orderBy(col("cnt").desc, col("token").asc)
      .limit(topN)
    // The single-partition window ranks ≤ topN rows (post-limit), never
    // the corpus — TakeOrderedAndProject bounded the input first.
    counts.withColumn("rank",
      row_number().over(Window.orderBy(col("cnt").desc, col("token").asc)))
  }

  /** Coverage of a vocabulary over a corpus, as EXACT integer counts (the
    * fractions divide out downstream; integer counts hash-compare across
    * engines with no FP risk): one row —
    * (total_tokens, in_vocab_tokens, oov_tokens, distinct_oov). The
    * pretraining question "is my tokenizer's vocab big enough for this
    * corpus" answered in one pass + one broadcast join. */
  def coverage(df: DataFrame, textCol: String, vocab: DataFrame): DataFrame = {
    val toks = df.select(explode(TextOps.tokens(col(textCol))).as("token"))
    val joined = toks.join(broadcast(vocab.select(col("token"), lit(1).as("__v"))),
      Seq("token"), "left")
    joined.agg(
      count(lit(1)).as("total_tokens"),
      sum(when(col("__v").isNotNull, 1L).otherwise(0L)).as("in_vocab_tokens"),
      sum(when(col("__v").isNull, 1L).otherwise(0L)).as("oov_tokens"),
      count_distinct(when(col("__v").isNull, col("token"))).as("distinct_oov"))
  }

  /** Per-document top-k tf-idf keywords (P42): the classic
    * corpus-statistics keyword extractor — term frequency per doc times
    * smoothed inverse document frequency (sklearn's
    * `ln((1+N)/(1+df)) + 1`, never log-of-zero, never a negative weight),
    * deterministic rank ties broken by term.
    *
    * Scale shape: one explode into slim (doc, term) rows + a
    * map-side-combined count (the gram-count shape), a term-grain df
    * aggregate with a `minDf` prune (bounds the vocabulary BEFORE the
    * join — rare garbage terms never join back), an AQE-decided join of
    * (doc, term, tf) against the pruned idf table (broadcast when the
    * vocab fits, sort-merge when it doesn't — declarative either way),
    * and a per-doc top-k via partial `collect_list` + `array_sort` +
    * `slice`: per-doc candidate lists are bounded by the doc's own
    * distinct-term count, so the "window top-k" pathology (sorting ALL
    * candidates per key after shuffling them) has no candidate explosion
    * to amplify here, and the partial aggregate still combines before the
    * exchange. The corpus size rides the plan as a 1-row cross join —
    * no separate count job, no driver scalar. */
  def tfIdfTopTerms(df: DataFrame, idCol: String, textCol: String,
                    k: Int = 5, minDf: Long = 2): DataFrame = {
    require(k >= 1, s"tfIdfTopTerms: k must be >= 1, got $k")
    require(minDf >= 1, s"tfIdfTopTerms: minDf must be >= 1, got $minDf")
    val base = df.filter(col(idCol).isNotNull && col(textCol).isNotNull)
    val nd = base.agg(count(lit(1)).as("__nd"))
    val tf = base
      .select(col(idCol).as("__doc"),
        explode(TextOps.tokens(col(textCol))).as("term"))
      .groupBy(col("__doc"), col("term")).agg(count(lit(1)).as("tf"))
    val idf = tf.groupBy(col("term")).agg(count(lit(1)).as("df"))
      .filter(col("df") >= minDf)
      .crossJoin(nd)
      .select(col("term"),
        (log((col("__nd") + lit(1.0)) / (col("df") + lit(1.0))) + lit(1.0))
          .as("idf"))
    tf.join(idf, Seq("term"))
      // rank on the ROUNDED score: a sub-ULP ln() difference between
      // engines must not flip a near-tie's rank (6 dp is the repo-wide
      // float-output contract; rounded ties break by term)
      .withColumn("tfidf", round(col("tf") * col("idf"), 6))
      .groupBy(col("__doc"))
      .agg(slice(array_sort(collect_list(struct(
        (-col("tfidf")).as("neg"), col("term").as("term")))), 1, k).as("top"))
      .select(col("__doc").as(idCol), posexplode(col("top")))
      .select(col(idCol), (col("pos") + 1).cast("long").as("rnk"),
        col("col.term").as("term"), (-col("col.neg")).as("score"))
  }

  /** The (topN+1)-long bucket count vector of a corpus against a
    * (token, rank) vocabulary — index 0 is the OOV bucket, index r the
    * vocab token ranked r. The static-reference input both the batch
    * [[tokenDrift]] and the streaming twin
    * ([[StreamingOps.tokenDriftPerWindow]]) score against. */
  def bucketCountVector(df: DataFrame, textCol: String, vocab: DataFrame,
                        topN: Int): Array[Long] = {
    val counts = df.select(explode(TextOps.tokens(col(textCol))).as("token"))
      .join(broadcast(vocab.select(col("token"), col("rank"))), Seq("token"), "left")
      .groupBy(coalesce(col("rank"), lit(0)).cast("int").as("rank"))
      .agg(count(lit(1)).as("cnt"))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap // ≤ topN+1 rows
    Array.tabulate(topN + 1)(i => counts.getOrElse(i, 0L))
  }

  /** Token-distribution drift between a reference and a production corpus
    * (E23): project both onto the REFERENCE's top-N vocabulary plus one
    * OOV bucket, then score the two count vectors with Laplace-smoothed
    * PSI (the engine's [[LatentDrift.psiFromCounts]] — bit-identical to
    * the latent-drift scorer, so one oracle formula covers both) and the
    * two-sample chi-squared homogeneity test
    * ([[graft.stats.StatMath.chi2TwoSample]], the reference's categorical
    * drift detector generalized to token buckets).
    *
    * Output: one row per bucket — (rank, token, ref_cnt, prod_cnt) with
    * rank 0 = OOV — plus the verdict columns (psi, chi2_stat, chi2_p,
    * is_drift) repeated on every row so the result is a single
    * oracle-friendly frame. Counts are exact integers; psi/chi2 are
    * deterministic scalar math over them (parallelism-invariant by
    * construction). The N+1 count pairs reach the driver (≤ topN+1 rows —
    * bounded by the vocabulary, never the corpus). */
  def tokenDrift(ref: DataFrame, prod: DataFrame, textCol: String,
                 topN: Int = 32, alpha: Double = 0.05): DataFrame = {
    val vocab = build(ref, textCol, topN).select(col("token"), col("rank"))
    def bucketCounts(df: DataFrame) = df
      .select(explode(TextOps.tokens(col(textCol))).as("token"))
      .join(broadcast(vocab), Seq("token"), "left")
      .groupBy(coalesce(col("rank"), lit(0)).as("rank"))
      .agg(count(lit(1)).as("cnt"))
    val refC = bucketCounts(ref).withColumnRenamed("cnt", "ref_cnt")
    val prodC = bucketCounts(prod).withColumnRenamed("cnt", "prod_cnt")
    // Dense bucket frame 0..topN so both engines see identical vectors
    // even when a bucket is empty on one side.
    val spark = ref.sparkSession
    val buckets = spark.range(0, topN + 1).select(col("id").cast("int").as("rank"))
    val joined = buckets
      .join(refC, Seq("rank"), "left")
      .join(prodC, Seq("rank"), "left")
      .join(vocab.withColumnRenamed("token", "__tok"), Seq("rank"), "left")
      .select(col("rank"),
        coalesce(col("__tok"), lit("<oov>")).as("token"),
        coalesce(col("ref_cnt"), lit(0L)).as("ref_cnt"),
        coalesce(col("prod_cnt"), lit(0L)).as("prod_cnt"))
      .orderBy(col("rank"))
    val rows = joined.collect() // ≤ topN+1 rows, vocabulary-bounded
    val refArr = rows.map(_.getLong(2))
    val prodArr = rows.map(_.getLong(3))
    val psi = LatentDrift.psiFromCounts(refArr, prodArr)
    val (stat, p) = graft.stats.StatMath.chi2TwoSample(refArr, prodArr)
    val statR = BigDecimal(stat).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    val pR = BigDecimal(p).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    import spark.implicits._
    rows.toSeq.map(r => (r.getInt(0), r.getString(1), r.getLong(2), r.getLong(3)))
      .toDF("rank", "token", "ref_cnt", "prod_cnt")
      .withColumn("psi", lit(psi))
      .withColumn("chi2_stat", lit(statR))
      .withColumn("chi2_p", lit(pR))
      .withColumn("is_drift", lit(p <= alpha || psi > 0.2))
  }
}
