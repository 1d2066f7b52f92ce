package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** DSIR-style importance resampling (P39) — data SELECTION for LM
  * pretraining (Xie et al. 2023, "Data Selection for Language Models via
  * Importance Resampling"): pick raw-corpus docs whose hashed-n-gram
  * distribution looks like a TARGET corpus, by importance weight
  * w(doc) = Σ_features log(p_target(b) / p_raw(b)), then sample k docs
  * without replacement ∝ softmax(w) via the Gumbel-top-k trick.
  *
  * Everything is deterministic and engine-replayable:
  *  - features are word BIGRAM occurrences (the paper's hashed n-grams),
  *    built by the native [[graft.functions.BigramPairs]] — one
  *    tokenization per row;
  *  - the hash bucket is the md5 primitive [[Classifier.bucketOf]]
  *    (DuckDB replays it bit-for-bit), so the weight table is a dense
  *    `dim`-length array independent of vocabulary size;
  *  - the Gumbel noise is PURE: u = (md5Rank32(id) + 0.5) / 2³²,
  *    g = −ln(−ln u) — the [[Sample]] rank primitive, so the selected
  *    set survives re-runs, repartitioning, and cluster resizing.
  *
  * Scale shape: weight FITTING is two map-side-combined count exchanges
  * over slim (bucket) rows — O(dim) result, collected once (dim is
  * bounded, the hashing trick's point); SCORING is one narrow
  * shuffle-free pass (literal weight array, per-row fold — the
  * [[Classifier]] inference shape); SELECTION is a slim (id, key) top-k
  * + broadcast semi-join back (never ships doc payloads through the
  * top-k — the quotaPerGroup lesson), or a pure threshold filter for
  * budgets too large to enumerate on one node.
  */
object Dsir {

  /** Occurrence counts of hashed bigram features: (bucket, cnt), one
    * map-side-combined exchange of O(dim) groups. Docs shorter than two
    * tokens contribute nothing (a bigram needs two). */
  def featureCounts(df: DataFrame, textCol: String, dim: Int): DataFrame = {
    require(dim >= 2, s"dsir: dim must be >= 2, got $dim")
    df.select(explode(graft.functions.TextNative.bigram_pairs(col(textCol)))
        .as("__p"))
      .filter(col("__p.w1").isNotNull)
      .select(Classifier.bucketOf(
        concat_ws(" ", col("__p.w1"), col("__p.w2")), dim).as("bucket"))
      .groupBy(col("bucket")).agg(count(lit(1)).as("cnt"))
  }

  /** Fit the dense log-ratio table: logratio(b) = ln p̂_target(b) − ln
    * p̂_raw(b) with Laplace smoothing p̂(b) = (cnt_b + λ) / (N + λ·dim)
    * (buckets unseen on both sides get a constant harmless offset; λ > 0
    * keeps every ratio finite). Two count exchanges + one O(dim) driver
    * collect — `dim` is the model size and must be chosen bounded, like
    * any hashing-trick model. */
  def featureLogRatios(target: DataFrame, raw: DataFrame, textCol: String,
                       dim: Int = 10000, smoothing: Double = 1.0): Array[Double] = {
    require(dim >= 2 && dim <= (1 << 22),
      s"dsir: dim must be in [2, 2^22] (a dense driver-side array), got $dim")
    require(smoothing > 0.0, s"dsir: smoothing must be > 0, got $smoothing")
    def dense(df: DataFrame): (Array[Long], Double) = {
      val counts = new Array[Long](dim)
      var total = 0L
      featureCounts(df, textCol, dim).collect().foreach { r =>
        val b = r.getLong(0).toInt
        counts(b) = r.getLong(1)
        total += r.getLong(1)
      }
      (counts, total.toDouble)
    }
    val (tc, tn) = dense(target)
    val (rc, rn) = dense(raw)
    val td = tn + smoothing * dim
    val rd = rn + smoothing * dim
    Array.tabulate(dim)(b =>
      math.log((tc(b) + smoothing) / td) - math.log((rc(b) + smoothing) / rd))
  }

  /** Per-row importance log-weight: fold over the doc's bigram features
    * of the literal log-ratio table. ONE `bigram_pairs` evaluation per
    * row (the interpreted-HOF lesson: the array argument is referenced
    * exactly once), narrow, shuffle-free. Docs with no bigram features
    * score 0. */
  def logWeightCol(text: Column, logRatios: Array[Double]): Column = {
    require(logRatios.nonEmpty, "dsir: empty log-ratio table")
    val dim = logRatios.length
    val lr = typedlit(logRatios.toSeq)
    aggregate(
      filter(graft.functions.TextNative.bigram_pairs(text),
        p => p.getField("w1").isNotNull),
      lit(0.0),
      (acc, p) => acc + element_at(lr,
        (Classifier.bucketOf(
          concat_ws(" ", p.getField("w1"), p.getField("w2")), dim) + 1).cast("int")))
  }

  /** Add `out` = dsir log-weight to every row. */
  def scoreDocs(docs: DataFrame, textCol: String, logRatios: Array[Double],
                out: String = "dsir_logw"): DataFrame = {
    require(!docs.columns.contains(out),
      s"dsir: output column '$out' already exists on the input")
    docs.withColumn(out, logWeightCol(col(textCol), logRatios))
  }

  /** The Gumbel-top-k key: logw + g(id). Sampling the k largest keys
    * draws k docs WITHOUT replacement with probability ∝ exp(logw) —
    * the Gumbel-max trick; with `gumbel = false` selection is plain
    * deterministic top-k by weight (greedy, no diversity). */
  def selectionKey(idCol: Column, text: Column, logRatios: Array[Double],
                   gumbel: Boolean = true): Column = {
    val w = logWeightCol(text, logRatios)
    if (!gumbel) w
    else {
      // u in (0,1) strictly: (rank + 0.5) / 2^32 — never 0 or 1, so the
      // double log is always finite
      val u = (Sample.md5Rank32(idCol).cast("double") + lit(0.5)) / lit(4294967296.0)
      w + -log(-log(u))
    }
  }

  /** Select the k best docs (all columns): slim (id, key) top-k —
    * `orderBy(...).limit(k)` plans as TakeOrderedAndProject, a
    * per-partition partial top-k merged once, carrying only two columns —
    * then a broadcast semi-join recovers the full rows. Ties (and the
    * whole selection) are id-deterministic. k is bounded by one node's
    * memory for the slim pairs; for larger budgets use
    * [[selectByThreshold]]. NULL-id rows are dropped (no deterministic
    * Gumbel draw without an identity — the [[Sample]] policy). */
  def selectTopK(docs: DataFrame, idCol: String, textCol: String,
                 logRatios: Array[Double], k: Int,
                 gumbel: Boolean = true): DataFrame = {
    require(k >= 1, s"dsir: k must be >= 1, got $k")
    val nonNull = docs.filter(col(idCol).isNotNull)
    val keep = nonNull
      .select(col(idCol).as("__kid"),
        selectionKey(col(idCol), col(textCol), logRatios, gumbel).as("__key"))
      .orderBy(col("__key").desc, col("__kid"))
      .limit(k)
      .select(col("__kid"))
    nonNull.join(broadcast(keep), col(idCol) === col("__kid"), "left_semi")
  }

  /** The 100-TB selection rung: keep every doc whose key clears `minKey`
    * — a pure narrow filter, no top-k enumeration anywhere. Callers pick
    * `minKey` from a quantile of the key distribution (e.g. a KLL/t-digest
    * sketch at 1 − budget/N) — the threshold twin of [[selectTopK]], and
    * selections NEST as the threshold moves. */
  def selectByThreshold(docs: DataFrame, idCol: String, textCol: String,
                        logRatios: Array[Double], minKey: Double,
                        gumbel: Boolean = true): DataFrame =
    docs.filter(col(idCol).isNotNull)
      .filter(selectionKey(col(idCol), col(textCol), logRatios, gumbel) >= minKey)
}
