package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Drift detection over a latent embedding space — the reference's flagship
  * COMPOSITION, made first-class: images are encoded to latent vectors
  * (dimensionality_reduction_api/app/dr.py:136-146 — here
  * [[DimRed.project]]) and drift is then checked on the encodings
  * (ml/testing.py:103-126: encode each loader, `check_drift` per variant).
  * This operator closes the loop for arbitrary embedding columns: project
  * both windows through the SAME seeded JL matrix, histogram each latent
  * dimension on FIXED edges, and score per-dimension PSI with a verdict.
  *
  * Why per-dim PSI on fixed edges (vs the engine's KS/MMD, which also
  * exist):
  *  - the whole check is two aggregation passes over (dim, bucket) counts —
  *    O(outDim × buckets) result rows regardless of corpus size, map-side
  *    combined, no driver collect of data rows: the right 100 TB shape
  *  - fixed literal edges make verdicts parallelism- and engine-invariant
  *    (integer counts → exact PSI), and the DuckDB oracle replays the
  *    ENTIRE pipeline — projection, binning, smoothing, verdict
  *  - per-dimension attribution ("latent dim 3 drifted") is what an
  *    operator on duty actually acts on; MMD gives one number
  *
  * Laplace smoothing (+1 per bucket) keeps PSI finite when a bucket is
  * empty on one side — the standard guard, and exactly replayable. */
object LatentDrift {

  /** Default edges for JL latents of roughly unit-scale inputs (64-dim
    * uniform[-1,1] embeddings have latent std ≈ 1.6): 8 buckets. */
  val DefaultEdges: Seq[Double] = Seq(-2.0, -1.0, -0.5, 0.0, 0.5, 1.0, 2.0)

  /** Bucket index of `v` against ascending `edges`: 0 for v < edges(0), …,
    * edges.length for v ≥ last. A when-chain — codegen'd, branch-predictable,
    * and literally replayable as a SQL CASE. */
  def bucketCol(v: Column, edges: Seq[Double]): Column = {
    require(edges.nonEmpty && edges == edges.sorted && edges.distinct == edges,
      s"latentDrift: edges must be non-empty, ascending, distinct: $edges")
    edges.zipWithIndex.foldRight(lit(edges.length): Column) {
      case ((e, i), acc) => when(v < lit(e), lit(i)).otherwise(acc)
    }
  }

  /** Per-dimension PSI between two already-projected frames. Both must
    * carry `latentCol` as array<double> of equal width. Output:
    * (dim, psi, is_drift), one row per latent dimension, ordered. */
  def psiPerDimLatent(ref: DataFrame, cur: DataFrame, latentCol: String,
                      edges: Seq[Double] = DefaultEdges,
                      threshold: Double = 0.2): DataFrame = {
    require(threshold > 0, s"latentDrift: threshold must be > 0, got $threshold")
    require(edges.nonEmpty && edges == edges.sorted && edges.distinct == edges,
      s"latentDrift: edges must be non-empty, ascending, distinct: $edges")
    def binned(df: DataFrame, side: Int): DataFrame =
      df.select(posexplode(col(latentCol)).as(Seq("dim", "v")))
        .select(col("dim"), bucketCol(col("v"), edges).as("bucket"),
          lit(side).as("side"))
    psiFromBinnedKeys(binned(ref, 0).unionByName(binned(cur, 1)),
        edges.length + 1, Seq("dim"), threshold)
      .orderBy(col("dim"))
  }

  /** PSI verdicts from an already-binned `(keys…, bucket, side)` frame —
    * the generic tail [[psiPerDimLatent]] and the audio/band drift queries
    * share: side 0 = reference, side 1 = current, `bucket` ∈ [0, nb). One
    * (keys, bucket) count pass, map-side combined; result grain is
    * |keys| × nb rows no matter the corpus size. Missing buckets are
    * reconstructed by enumerating a literal range (Laplace +1 keeps them
    * finite), so the formula matches [[psiFromCounts]] and the DuckDB
    * replay bit-for-bit. */
  def psiFromBinnedKeys(binned: DataFrame, nb: Int, keyCols: Seq[String],
                        threshold: Double = 0.2): DataFrame = {
    require(nb > 1, s"latentDrift: nb must be > 1, got $nb")
    require(keyCols.nonEmpty, "latentDrift: keyCols must be non-empty")
    require(threshold > 0, s"latentDrift: threshold must be > 0, got $threshold")
    val keys = keyCols.map(col)
    val counts = binned
      .groupBy(keys :+ col("bucket"): _*)
      .agg(sum(when(col("side") === 0, 1L).otherwise(0L)).as("rc"),
        sum(when(col("side") === 1, 1L).otherwise(0L)).as("cc"))
    val totals = counts.groupBy(keys: _*)
      .agg(sum(col("rc")).as("rt"), sum(col("cc")).as("ct"))
    // Laplace: (cnt + 1) / (total + nb) on both sides, then the PSI sum.
    // Missing (keys, bucket) rows contribute (1/(rt+nb) - 1/(ct+nb)) *
    // ln(ratio) — reconstruct them by enumerating all buckets per key via
    // a literal range.
    val allBuckets = totals.select(keys ++ Seq(col("rt"), col("ct"),
      explode(lit((0 until nb).toArray)).as("bucket")): _*)
    val full = allBuckets.join(counts, keyCols :+ "bucket", "left")
      .select(keys ++ Seq(col("rt"), col("ct"),
        coalesce(col("rc"), lit(0L)).as("rc"),
        coalesce(col("cc"), lit(0L)).as("cc")): _*)
    val p = (col("rc") + 1).cast("double") / (col("rt") + nb)
    val q = (col("cc") + 1).cast("double") / (col("ct") + nb)
    full.groupBy(keys: _*)
      .agg(round(sum((p - q) * log(p / q)), 4).as("psi"))
      .select(keys :+ col("psi") :+ (col("psi") > threshold).as("is_drift"): _*)
  }

  /** Per-dim (dim × bucket) integer counts of a projected frame — the
    * BOUNDED reference state a streaming window compares against
    * (outDim × buckets longs, independent of reference-window size). */
  def binCounts(ref: DataFrame, latentCol: String, outDim: Int,
                edges: Seq[Double] = DefaultEdges): Array[Array[Long]] = {
    require(outDim > 0, s"latentDrift: outDim must be > 0, got $outDim")
    val nb = edges.length + 1
    val rows = ref.select(posexplode(col(latentCol)).as(Seq("dim", "v")))
      .select(col("dim"), bucketCol(col("v"), edges).as("bucket"))
      .groupBy(col("dim"), col("bucket")).count().collect()
    val m = Array.fill(outDim)(new Array[Long](nb))
    rows.foreach { r =>
      val d = r.getInt(0)
      require(d < outDim, s"latentDrift: reference latent is wider than " +
        s"outDim=$outDim (saw dim $d)")
      m(d)(r.getInt(1)) += r.getLong(2)
    }
    m
  }

  /** The Laplace-smoothed per-dim PSI [[psiPerDimLatent]]'s column plan
    * computes, as a scalar over two count vectors — the single
    * implementation point the streaming state operator shares. Rounding
    * matches Spark's `round(_, 4)` (HALF_UP) so streaming ≡ batch ≡ the
    * DuckDB oracle bit-for-bit. */
  def psiFromCounts(refC: Array[Long], curC: Array[Long]): Double = {
    require(refC.length == curC.length && refC.nonEmpty,
      s"latentDrift: count vectors must be equal-length and non-empty " +
        s"(${refC.length} vs ${curC.length})")
    val nb = refC.length
    val rt = refC.sum
    val ct = curC.sum
    var s = 0.0
    var i = 0
    while (i < nb) {
      val p = (refC(i) + 1.0) / (rt + nb)
      val q = (curC(i) + 1.0) / (ct + nb)
      s += (p - q) * math.log(p / q)
      i += 1
    }
    BigDecimal(s).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
  }

  /** Project both windows through the same seeded matrix, then score. */
  def psiOnEmbeddings(ref: DataFrame, cur: DataFrame, embCol: String,
                      outDim: Int = 8, seed: Int = 7,
                      edges: Seq[Double] = DefaultEdges,
                      threshold: Double = 0.2): DataFrame =
    psiPerDimLatent(
      ref.select(DimRed.projectCol(col(embCol), outDim, seed).as("latent")),
      cur.select(DimRed.projectCol(col(embCol), outDim, seed).as("latent")),
      "latent", edges, threshold)
}
