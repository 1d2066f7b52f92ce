package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.RandomProject

/** Dimensionality reduction over an embedding column — the Spark-first
  * equivalent of the reference's `POST /api/dimensionality_reduction` entry
  * point (dimensionality_reduction_api/app/api.py:58-60, app/dr.py:136-146:
  * one row in → one latent vector out, a pure per-row projection).
  *
  * The encoder is a seeded Johnson–Lindenstrauss ±1 sign matrix
  * ([[graft.functions.RandomProject]]) rather than trained conv weights:
  * deterministic, artifact-free, engine-portable (the DuckDB oracle replays
  * matrix derivation AND projection), and JL-guaranteed to preserve inner
  * products in expectation — which is exactly what the downstream consumers
  * (cosine ANN, drift-on-embeddings) need from a latent space.
  *
  * Scale shape: projection is a narrow codegen'd map (no shuffle, no
  * broadcast — the matrix is derived from the literal recipe on each
  * executor and cached). [[projectedTopK]] is the standard two-stage
  * retrieval: candidate generation in the small space (outDim ≤ 16 → 4–8×
  * fewer bytes/FLOPs per comparison, and a TakeOrdered partial top-C per
  * partition instead of a full sort), exact re-rank only the C = k ×
  * oversample survivors. */
object DimRed {

  /** The latent column expression: `emb` (array<float|double>) → outDim
    * array<double>. */
  def projectCol(emb: Column, outDim: Int, seed: Int = 7): Column =
    RandomProject.random_project(emb, outDim, seed)

  /** Driver-side projection of a query vector through the same matrix. */
  def projectVec(v: Array[Double], outDim: Int, seed: Int = 7): Array[Double] =
    RandomProject.projectVec(v, outDim, seed)

  /** Append a `latent` column (fails loud on a name clash, like
    * [[Pii.scrub]]). */
  def project(df: DataFrame, embCol: String, outDim: Int, seed: Int = 7,
              outCol: String = "latent"): DataFrame = {
    require(!df.columns.contains(outCol),
      s"dimred: output column '$outCol' already exists on the input")
    df.withColumn(outCol, projectCol(col(embCol), outDim, seed))
  }

  /** Two-stage top-k: rank ALL rows by latent-space cosine (cheap), keep the
    * top `k × oversample` candidates (deterministic: rounded latent cosine
    * desc, id asc), exact-cosine re-rank only those. Both stages are
    * SQL-expressible, so the whole pipeline is hash-oracle-able; recall vs
    * [[Similarity.bruteForceTopK]] is the measured trade (DimRedSpec). */
  def projectedTopK(df: DataFrame, idCol: String, embCol: String,
                    query: Array[Double], k: Int, outDim: Int = 8,
                    seed: Int = 7, oversample: Int = 4): DataFrame = {
    require(k >= 1 && oversample >= 1,
      s"dimred: k and oversample must be >= 1, got k=$k oversample=$oversample")
    require(k.toLong * oversample <= Int.MaxValue,
      s"dimred: k * oversample overflows Int (k=$k oversample=$oversample)")
    val qLat = typedlit(projectVec(query, outDim, seed).toSeq)
    val q = typedlit(query.toSeq)
    val cand = df.select(col(idCol), col(embCol).cast("array<double>").as("emb"),
        round(Similarity.cosine(projectCol(col(embCol), outDim, seed), qLat), 6)
          .as("lat_cos"))
      .orderBy(col("lat_cos").desc, col(idCol))
      .limit(k * oversample)
    cand.select(col(idCol), round(Similarity.cosine(col("emb"), q), 4).as("cos"))
      .orderBy(col("cos").desc, col(idCol))
      .limit(k)
  }
}
