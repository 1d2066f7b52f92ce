package graft.checks

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.model.DocsGen
import graft.stats.Mmd

/** Fit the detector state on a reference window — the analog of the
  * reference's `fit_detector` (ml/training.py:116-148): σ = median pairwise
  * distance over the reference sample (lines 123-129), then store the
  * reference sample + distribution summaries; persisted like the pickled
  * detector (ml/training.py:445-460, loaded at detector_api/app/detector.py:38-42).
  */
object Fit {

  /** Fit on a reference window (all rows of `refDocs`). One stats pass +
    * one bounded sampling pass. */
  def fit(refDocs: DataFrame, snapshotId: Long = 0L, maxSample: Int = 2000,
          prefilterFrac: Double = 1.0): RefState = {
    // same fused one-pass aggregate as the validation run — the reference
    // sample MUST be featurized identically to the production samples
    val (summaries, samples) = PartStats.computeFused(
      refDocs.withColumn("part", lit(0)), maxSample)
    val s = summaries(0)
    val sample = samples(0)
    val sigma = Mmd.medianHeuristicSigma(sample, maxRows = 2000)
    RefState(sigma, sample, s.offsetKll, s.kindHist, s.nDocs, s.nSpans, snapshotId)
  }

  /** Carve the reference window out of a table by seeded random split and
    * fit on it — the direct analog of the reference's
    * `torch.utils.data.random_split` with `detector_fraction = 0.1`
    * (ml/training.py:248-270, generator seeded with 31). Returns the fitted
    * state plus the remaining (non-window) rows. Deterministic for a fixed
    * input partitioning (Spark's randomSplit seeds per partition). */
  def fitSplit(docs: DataFrame, detectorFraction: Double = 0.1,
               seed: Long = DocsGen.Seed, snapshotId: Long = 0L,
               maxSample: Int = 2000): (RefState, DataFrame) = {
    require(detectorFraction > 0 && detectorFraction < 1)
    val Array(rest, window) =
      docs.randomSplit(Array(1.0 - detectorFraction, detectorFraction), seed)
    (fit(window, snapshotId, maxSample), rest)
  }

  /** Persist fitted state to a parquet `ref_state` table (FIXTURES.md §2). */
  def save(spark: SparkSession, state: RefState, path: String): Unit = {
    import spark.implicits._
    Seq((state.sigma, state.refSample.map(_.toSeq).toSeq, state.kllBytes,
      state.kindHist, state.nDocs, state.nSpans, state.snapshotId))
      .toDF("sigma", "ref_sample", "kll_sketch", "kind_hist", "n_docs", "n_spans", "snapshot_id")
      .coalesce(1).write.mode("overwrite").parquet(path)
  }

  def load(spark: SparkSession, path: String): RefState = {
    val r = spark.read.parquet(path).head()
    RefState(
      sigma = r.getAs[Double]("sigma"),
      refSample = r.getAs[scala.collection.Seq[scala.collection.Seq[Double]]]("ref_sample")
        .map(_.toArray).toArray,
      kllBytes = r.getAs[Array[Byte]]("kll_sketch"),
      // compat: ref_state persisted by earlier builds used " NULL" as the
      // null-kind histogram sentinel; the sentinel is now "\u0000NULL"
      // (unforgeable — kind strings can contain a leading space). Normalize
      // on load so chi2 over legacy state keeps comparing the same category
      // instead of splitting nulls into two disjoint ones (spurious drift).
      kindHist = r.getAs[Map[String, Long]]("kind_hist").map {
        case (" NULL", n) => "\u0000NULL" -> n
        case kv => kv
      },
      nDocs = r.getAs[Long]("n_docs"),
      nSpans = r.getAs[Long]("n_spans"),
      snapshotId = r.getAs[Long]("snapshot_id"))
  }
}
