package graft.ops

import org.apache.spark.sql.DataFrame
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

  /** Contamination report: (id, hits) for every corpus doc sharing >=
    * `minHits` distinct n-gram shingles with any benchmark doc; `hits` =
    * number of distinct shingles shared with the benchmark union.
    *
    * `maxBroadcastShingles` bounds the driver/executor memory the broadcast
    * may take; a larger benchmark silently selects the shuffled join (same
    * answer, corpus-side exchange paid). */
  def contaminationReport(corpus: DataFrame, idCol: String, textCol: String,
                          bench: DataFrame, benchTextCol: String,
                          n: Int = 3, minHits: Int = 1,
                          maxBroadcastShingles: Long = 10L * 1000 * 1000): DataFrame = {
    require(n >= 1, s"contaminationReport: n must be >= 1, got $n")
    require(minHits >= 1, s"contaminationReport: minHits must be >= 1, got $minHits")
    val bs = benchShingles(bench, benchTextCol, n)
    // cheap bounded count decides the join strategy (the bench frame is
    // re-evaluated once; callers with an expensive bench plan should persist)
    val probe = math.min(maxBroadcastShingles + 1, Int.MaxValue.toLong).toInt
    val small = bs.limit(probe).count() <= maxBroadcastShingles
    val benchSide = if (small) broadcast(bs) else bs
    corpus
      .filter(col(idCol).isNotNull)
      .select(col(idCol), explode(TextOps.shingles(col(textCol), n)).as("__s"))
      .join(benchSide, "__s")
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("hits"))
      .filter(col("hits") >= minHits)
  }

  /** The decontaminated corpus: every column of `corpus`, minus docs the
    * report flags. Anti-join on the (small) contaminated-id set — at scale
    * AQE converts it to broadcast, so the corpus pays one narrow pass +
    * the report's match-only shuffle. */
  def dropContaminated(corpus: DataFrame, idCol: String, textCol: String,
                       bench: DataFrame, benchTextCol: String,
                       n: Int = 3, minHits: Int = 1,
                       maxBroadcastShingles: Long = 10L * 1000 * 1000): DataFrame = {
    val flagged = contaminationReport(corpus, idCol, textCol, bench,
      benchTextCol, n, minHits, maxBroadcastShingles)
      .select(col(idCol))
    corpus.join(flagged, Seq(idCol), "left_anti")
  }
}
