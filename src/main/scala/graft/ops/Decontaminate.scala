package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Benchmark decontamination — drop training documents that overlap an
  * evaluation set by shared word n-grams, the step an LM pretraining
  * pipeline runs so eval scores measure generalization rather than
  * memorization (the reference's train/detector/test split discipline,
  * ml/training.py:248-270, generalized to corpus grain).
  *
  * Semantics: a corpus doc is CONTAMINATED iff it shares at least `minHits`
  * distinct n-gram shingles with the union of benchmark documents.
  * Benchmark members present in the corpus flag themselves (hits = their
  * whole shingle set) — deliberately: eval rows must leave the training
  * set, not just their near-copies.
  *
  * Scale shape: the benchmark side is small by nature (eval sets are
  * 10³–10⁶ docs against a 10¹²-doc corpus), so its distinct shingle set
  * broadcasts and the corpus pays ONE narrow pass — explode(shingles) is
  * pipelined straight into the broadcast hash join, so non-matching
  * shingles (the overwhelming majority) die inside the stage and never
  * reach an exchange. The only shuffled rows are matches, map-side
  * combined to (doc, hits) — O(contamination), not O(corpus). The
  * broadcast is guarded the same way the referential media path is
  * (ValidationRun round-4 lesson): above `maxBroadcastShingles` the hint is
  * withheld and the planner falls back to a shuffled join rather than
  * OOMing the driver.
  */
object Decontaminate {

  /** Distinct shingle set of the benchmark, one row per shingle. */
  private def benchShingles(bench: DataFrame, textCol: String, n: Int) =
    bench.select(explode(TextOps.shingles(col(textCol), n)).as("__s"))
      .distinct()

  /** Resolve the eval side ONCE for repeated gating (e.g. one resolution
    * per stream, not per micro-batch): up to `maxBroadcastShingles` the
    * distinct shingle union is collected (exactly the payload the
    * broadcast hash relation would hold) and rebuilt as a broadcast-hinted
    * local relation; past the bound the lazy plan is returned and the
    * join shuffles. The result plugs into [[reportAgainst]]/[[dropAgainst]]. */
  def prepareBench(bench: DataFrame, benchTextCol: String, n: Int = 3,
                   maxBroadcastShingles: Long = 10L * 1000 * 1000): DataFrame = {
    require(n >= 1, s"prepareBench: n must be >= 1, got $n")
    require(maxBroadcastShingles >= 0,
      s"prepareBench: maxBroadcastShingles must be >= 0, got $maxBroadcastShingles")
    val bs = benchShingles(bench, benchTextCol, n)
    // cap BEFORE adding 1: maxBroadcastShingles = Long.MaxValue must mean
    // "no cap", not an overflow into limit(0) and a silently EMPTY eval set
    val probe =
      if (maxBroadcastShingles >= Int.MaxValue - 1L) Int.MaxValue
      else (maxBroadcastShingles + 1).toInt
    val head = bs.limit(probe).collect()
    if (head.length <= maxBroadcastShingles)
      broadcast(bench.sparkSession.createDataFrame(
        java.util.Arrays.asList(head: _*), bs.schema))
    else bs
  }

  /** The report body over a pre-resolved eval side ([[prepareBench]]). */
  def reportAgainst(corpus: DataFrame, idCol: String, textCol: String,
                    benchSide: DataFrame, n: Int = 3, minHits: Int = 1): DataFrame = {
    require(minHits >= 1, s"reportAgainst: minHits must be >= 1, got $minHits")
    corpus
      .filter(col(idCol).isNotNull)
      .select(col(idCol), explode(TextOps.shingles(col(textCol), n)).as("__s"))
      .join(benchSide, "__s")
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("hits"))
      .filter(col("hits") >= minHits)
  }

  /** The drop body over a pre-resolved eval side ([[prepareBench]]);
    * NULL-id rows are dropped (see [[dropContaminated]]). */
  def dropAgainst(corpus: DataFrame, idCol: String, textCol: String,
                  benchSide: DataFrame, n: Int = 3, minHits: Int = 1): DataFrame =
    corpus.filter(col(idCol).isNotNull).join(
      reportAgainst(corpus, idCol, textCol, benchSide, n, minHits).select(col(idCol)),
      Seq(idCol), "left_anti")

  /** Contamination report: (id, hits) for every corpus doc sharing >=
    * `minHits` distinct n-gram shingles with any benchmark doc; `hits` =
    * number of distinct shingles shared with the benchmark union.
    *
    * NULL-id corpus rows are excluded (no identity → nothing the drop can
    * anti-join on); [[dropContaminated]] drops them outright, so a
    * null-id eval copy can never leak through the gate.
    *
    * `maxBroadcastShingles` bounds the memory the eval shingle union may
    * take: up to the bound, the set is collected ONCE (the collected rows
    * are exactly the payload the broadcast hash relation would hold) and
    * rebuilt as a local relation, so the bench plan is never evaluated
    * twice; past the bound, the planner falls back to a shuffled join
    * (same answer, corpus-side exchange paid) with the bench plan
    * evaluated once inside the join. */
  def contaminationReport(corpus: DataFrame, idCol: String, textCol: String,
                          bench: DataFrame, benchTextCol: String,
                          n: Int = 3, minHits: Int = 1,
                          maxBroadcastShingles: Long = 10L * 1000 * 1000): DataFrame = {
    require(n >= 1, s"contaminationReport: n must be >= 1, got $n")
    reportAgainst(corpus, idCol, textCol,
      prepareBench(bench, benchTextCol, n, maxBroadcastShingles), n, minHits)
  }

  /** The decontaminated corpus: every column of `corpus`, minus docs the
    * report flags — and minus NULL-id rows, which the report cannot flag
    * (an anti-join keeps NULL keys), so keeping them would let an
    * unidentified eval copy slip through the one gate built to stop it.
    * Anti-join on the (small) contaminated-id set — at scale AQE converts
    * it to broadcast, so the corpus pays one narrow pass + the report's
    * match-only shuffle. */
  def dropContaminated(corpus: DataFrame, idCol: String, textCol: String,
                       bench: DataFrame, benchTextCol: String,
                       n: Int = 3, minHits: Int = 1,
                       maxBroadcastShingles: Long = 10L * 1000 * 1000): DataFrame =
    dropAgainst(corpus, idCol, textCol,
      prepareBench(bench, benchTextCol, n, maxBroadcastShingles), n, minHits)

  // ---- Bloom-bounded decontamination ----
  // The exact gate's memory story has two regimes: the eval shingle union
  // fits the broadcast bound (one narrow corpus pass), or it doesn't and
  // the corpus pays a shuffled join. The Bloom rung removes the second
  // regime: the eval side compresses to a FIXED byte budget chosen from
  // (expectedShingles, fpp) — a 100M-shingle eval set at fpp 1e-3 is
  // ~170 MB regardless of shingle length, and 10M is ~17 MB — so the
  // corpus ALWAYS runs the narrow broadcast-free pass. The trade is
  // one-sided error: a shingle the filter wrongly claims (prob ≤ fpp)
  // inflates a doc's hit count, so flagging is a SUPERSET of exact
  // (quantified over-drop, ~fpp × shingles-per-doc expected spurious hits
  // per clean doc — size minHits accordingly); an exact-shared shingle is
  // NEVER missed, so no eval leak can slip through. The production shape
  // for 10⁹-doc eval unions (e.g. decontaminating against an entire
  // held-out SNAPSHOT rather than a benchmark suite).

  /** Build the benchmark's Bloom filter: distinct eval shingles folded
    * into one fixed-size blob ([[graft.sketch.BloomFilterAgg]] — bit-
    * identical across partitionings). `expectedShingles` must bound the
    * TRUE distinct count or fpp degrades (checked: fails loud if the
    * actual count exceeds it, the silent-recall-loss guard). */
  def prepareBenchBloom(bench: DataFrame, benchTextCol: String, n: Int = 3,
                        expectedShingles: Long = 10L * 1000 * 1000,
                        fpp: Double = 0.001): Array[Byte] = {
    require(n >= 1, s"prepareBenchBloom: n must be >= 1, got $n")
    val bs = benchShingles(bench, benchTextCol, n)
    val row = bs.agg(
      graft.sketch.BloomFilterAgg.bloomFilter(col("__s"), expectedShingles, fpp)
        .as("bf"),
      count(lit(1)).as("n")).head()
    val actual = row.getLong(1)
    require(actual <= expectedShingles,
      s"prepareBenchBloom: eval set has $actual distinct shingles > " +
        s"expectedShingles=$expectedShingles — the filter is oversubscribed " +
        "and its false-positive rate is no longer fpp; raise expectedShingles")
    row.getAs[Array[Byte]](0)
  }

  /** Per-row Bloom hit count: how many of the doc's DISTINCT shingles
    * MIGHT be in the eval set. A pure scalar expression — the shingle
    * array is an HOF argument exactly once, the membership probe is a
    * per-element call against the task-constant filter — so everything
    * built on it is exchange-free. NULL text coalesces to 0 hits: a doc
    * with no shingles cannot be contaminated, so the gate must KEEP it
    * (the exact twin's explode drops such rows from the report, never
    * from the corpus — `size(null)` is NULL in Spark 4 and a bare
    * `hits < minHits` filter would silently DROP them instead). */
  private def bloomHits(textCol: Column, filterBlob: Array[Byte], n: Int): Column =
    coalesce(size(filter(TextOps.shingles(textCol, n),
      s => graft.functions.BloomMightContain.bloom_might_contain(
        lit(filterBlob), s))), lit(0))

  /** Bloom-gated contamination report: same (id, hits) shape as
    * [[contaminationReport]], hits counted over the doc's distinct
    * shingles that MIGHT be in the eval set — per doc, hits_bloom ≥
    * hits_exact (the filter never misses an inserted shingle), so at any
    * `minHits` the flagged set is a superset of the exact gate's.
    * ZERO exchanges (plan-asserted): where the exact path must join the
    * eval side and shuffle its matches, membership against the blob is a
    * per-row scalar, so the report is a narrow scan — the whole point of
    * paying the fpp trade. */
  def reportByBloom(corpus: DataFrame, idCol: String, textCol: String,
                    filterBlob: Array[Byte], n: Int = 3,
                    minHits: Int = 1): DataFrame = {
    require(n >= 1, s"reportByBloom: n must be >= 1, got $n")
    require(minHits >= 1, s"reportByBloom: minHits must be >= 1, got $minHits")
    require(filterBlob != null && filterBlob.nonEmpty,
      "reportByBloom: empty filter blob")
    corpus
      .filter(col(idCol).isNotNull)
      // long like the exact report's count — "same (id, hits) shape" must
      // mean the schema too, not just the values
      .select(col(idCol),
        bloomHits(col(textCol), filterBlob, n).cast("long").as("hits"))
      .filter(col("hits") >= minHits)
  }

  /** The Bloom-decontaminated corpus: [[dropContaminated]] semantics with
    * the eval side as a fixed-size blob — NULL-id rows dropped for the
    * same cannot-flag-must-not-slip reason. Guaranteed to drop every doc
    * the exact gate drops (no false negatives); may over-drop at the fpp
    * rate. ONE narrow filter, zero exchanges — no report join needed
    * because the hit count is a per-row scalar. */
  def dropByBloom(corpus: DataFrame, idCol: String, textCol: String,
                  filterBlob: Array[Byte], n: Int = 3,
                  minHits: Int = 1): DataFrame = {
    require(n >= 1, s"dropByBloom: n must be >= 1, got $n")
    require(minHits >= 1, s"dropByBloom: minHits must be >= 1, got $minHits")
    require(filterBlob != null && filterBlob.nonEmpty,
      "dropByBloom: empty filter blob")
    corpus.filter(col(idCol).isNotNull)
      .filter(bloomHits(col(textCol), filterBlob, n) < minHits)
  }

  // ---- embedding-space decontamination ----
  // The n-gram gate catches verbatim/near-verbatim text leaks; paraphrased
  // or re-rendered eval items survive it. The EMBEDDING-space gate closes
  // that hole: drop corpus rows whose vector sits within cosine `threshold`
  // of ANY eval vector (the reference's split discipline lifted to the
  // latent space its detector actually operates in, ml/training.py:248-270
  // + testing.py:103-126).

  /** Exact rung: per-pair cosine against the BROADCAST eval matrix
    * (BroadcastNestedLoopJoin — no shuffle on the corpus side; the only
    * exchange carries match rows map-combined to (id, hits, max_cos)).
    * The eval side is size-guarded like [[prepareBench]]: eval sets are
    * small by nature, and `maxEval` fails loud before a driver-melting
    * broadcast. At 10⁶+ eval rows use [[embeddingReportLsh]] — same
    * verify, LSH-pruned candidate generation. */
  def embeddingReport(corpus: DataFrame, idCol: String, embCol: String,
                      eval: DataFrame, evalEmbCol: String,
                      threshold: Double = 0.95,
                      maxEval: Long = 100000): DataFrame = {
    val ev = boundedEval(eval, evalEmbCol, maxEval)
    corpus.crossJoin(broadcast(ev))
      .select(col(idCol),
        round(Similarity.cosine(col(embCol).cast("array<double>"), col("__ev")), 6)
          .as("cos"))
      // scoreable matches only: a null cosine (width mismatch) or NaN
      // (zero-norm corpus vector) is unscorable — excluded here, DROPPED
      // by dropByEmbedding (Spark orders NaN above every number, so an
      // unguarded >= would mass-flag the corpus against one bad vector)
      .filter(col("cos").isNotNull && !isnan(col("cos")) &&
        col("cos") >= checkedThreshold(threshold))
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("hits"), max(col("cos")).as("max_cos"))
  }

  /** The embedding-decontaminated corpus: one LEFT ANTI
    * BroadcastNestedLoopJoin — zero shuffles end to end. A row the gate
    * CANNOT SCORE must not slip through it: NULL embeddings are dropped
    * like [[dropContaminated]] drops NULL ids, and so are rows whose
    * cosine is unscorable against the (validated) eval side — a null
    * cosine means a width-mismatched vector, NaN means a zero-norm one. */
  def dropByEmbedding(corpus: DataFrame, idCol: String, embCol: String,
                      eval: DataFrame, evalEmbCol: String,
                      threshold: Double = 0.95,
                      maxEval: Long = 100000): DataFrame = {
    val ev = boundedEval(eval, evalEmbCol, maxEval)
    val c = round(
      Similarity.cosine(col(embCol).cast("array<double>"), col("__ev")), 6)
    corpus.filter(col(embCol).isNotNull)
      .join(broadcast(ev),
        c.isNull || isnan(c) || c >= checkedThreshold(threshold),
        "left_anti")
  }

  /** Scale rung: candidates restricted to hyperplane-bucket collisions
    * (eval side additionally multi-probed for recall), exact-cosine
    * verified — the [[Dedup.embeddingCosineDups]] shape across two tables.
    * The bucketed eval side broadcasts, so the corpus still never
    * shuffles before the match-only aggregate; per-row verify work drops
    * from |eval| to the probed buckets' population. Recall < 1 by LSH
    * nature (raise `probes`/lower `planes` to trade); IDENTICAL direction
    * copies (true leaks, cos = 1) always share a bucket → recall 1 on
    * verbatim embedding leaks. */
  def embeddingReportLsh(corpus: DataFrame, idCol: String, embCol: String,
                         eval: DataFrame, evalEmbCol: String,
                         threshold: Double = 0.95, planes: Int = 12,
                         probes: Int = 1, maxEval: Long = 100000): DataFrame = {
    require(probes >= 1 && probes <= planes + 1,
      s"embeddingReportLsh: probes must be in [1, planes + 1], got $probes")
    val ev = boundedEval(eval, evalEmbCol, maxEval)
      .select(col("__ev"),
        Similarity.hyperplaneBucket(col("__ev"), planes).as("__b0"))
    // columnar multi-probe: each eval vector occupies its own bucket plus
    // Hamming-1 neighbors on the first probes-1 planes (same probe set as
    // Similarity.lshTopK)
    val probeCols = col("__b0") +: (0 until math.min(probes - 1, planes))
      .map(b => col("__b0").bitwiseXOR(lit(1L << b)))
    val evProbed = ev.select(col("__ev"),
      explode(array(probeCols: _*)).as("__b")).distinct()
    corpus.select(col(idCol), col(embCol).cast("array<double>").as("__emb"),
        Similarity.hyperplaneBucket(col(embCol), planes).as("__b"))
      .join(broadcast(evProbed), "__b")
      .select(col(idCol),
        round(Similarity.cosine(col("__emb"), col("__ev")), 6).as("cos"))
      // same scoreable-only rule as the exact rung (rung-parity contract)
      .filter(col("cos").isNotNull && !isnan(col("cos")) &&
        col("cos") >= checkedThreshold(threshold))
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("hits"), max(col("cos")).as("max_cos"))
  }

  private def checkedThreshold(t: Double): Double = {
    require(t > 0.0 && t <= 1.0,
      s"embedding decontamination: threshold must be in (0, 1], got $t")
    t
  }

  /** Null-free, DISTINCT, double-cast, size-guarded eval side. Distinct
    * so both rungs count `hits` over unique eval vectors (a duplicated
    * benchmark item must not double-count — and the LSH rung's probe-set
    * distinct would otherwise disagree with the exact rung). Zero-norm
    * eval vectors fail LOUD: their cosine is NaN against everything and
    * Spark orders NaN above every number, so one silently-kept zero
    * vector would flag the entire corpus. */
  private def boundedEval(eval: DataFrame, evalEmbCol: String,
                          maxEval: Long): DataFrame = {
    require(maxEval >= 1, s"maxEval must be >= 1, got $maxEval")
    val ev = eval.filter(col(evalEmbCol).isNotNull)
      .select(col(evalEmbCol).cast("array<double>").as("__ev"))
      .distinct()
    val zeroNorm = ev.filter(
      aggregate(col("__ev"), lit(0.0), (acc, x) => acc + x * x) === 0.0).count()
    require(zeroNorm == 0,
      s"embedding decontamination: eval side has $zeroNorm zero-norm " +
        "vector(s) — cosine against them is undefined; drop or fix them first")
    val n = ev.limit((math.min(maxEval, Int.MaxValue - 1L) + 1).toInt).count()
    require(n <= maxEval,
      s"embedding decontamination: eval side has > $maxEval DISTINCT vectors " +
        "— too large to broadcast; raise maxEval deliberately or pre-filter the eval set")
    ev
  }
}
