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

  private val MetaDir = "_graft_dimred_meta"

  /** Persist a latent index: `(id, latent, emb)` parquet plus a config
    * sidecar (outDim, seed) — project ONCE at ingest, query in the small
    * space forever after. Stage-1 scans prune to `(id, latent)` (~8 doubles
    * per row instead of 64: an 8× narrower read at query time); the full
    * vectors ride along so re-ranking needs no second table. */
  def latentIndexWrite(df: DataFrame, idCol: String, embCol: String,
                       path: String, outDim: Int = 8, seed: Int = 7): Unit = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).as("id"),
        projectCol(col(embCol), outDim, seed).as("latent"),
        col(embCol).cast("array<double>").as("emb"))
      .write.mode("overwrite").parquet(path)
    // inDim rides in the sidecar: the sign matrix is keyed (outDim, inDim,
    // seed), so an append with a different embedding width would silently
    // project through a DIFFERENT matrix — incomparable latent cosines
    val inDim = firstEmbWidth(df, embCol).getOrElse(-1)
    Seq((outDim, seed, inDim)).toDF("outDim", "seed", "inDim").coalesce(1)
      .write.mode("overwrite").parquet(s"$path/$MetaDir")
  }

  private def firstEmbWidth(df: DataFrame, embCol: String): Option[Int] =
    df.select(size(col(embCol))).limit(1).collect().headOption.map(_.getInt(0))

  /** Incremental append into an existing latent index — new vectors are
    * projected through the SAME recorded (outDim, seed) matrix (fails loud
    * on a missing sidecar or an id-type change: mixed matrices would make
    * latent cosines incomparable across writes). */
  def latentIndexAppend(df: DataFrame, idCol: String, embCol: String,
                        path: String): Unit = {
    val spark = df.sparkSession
    val (outDim, seed, inDim) = readMeta(spark, path).getOrElse(throw new IllegalArgumentException(
      s"latentIndexAppend: no config sidecar at $path — not a latent index"))
    IndexMaintenance.requireSameIdType(spark, path, Some("id"),
      df.schema(idCol).dataType, "latentIndexAppend")
    if (inDim > 0) firstEmbWidth(df, embCol).foreach(w => require(w == inDim,
      s"latentIndexAppend: index at $path was built over $inDim-dim " +
        s"embeddings, append brings $w-dim — a different sign matrix would " +
        "make latent cosines incomparable"))
    df.select(col(idCol).as("id"),
        projectCol(col(embCol), outDim, seed).as("latent"),
        col(embCol).cast("array<double>").as("emb"))
      .write.mode("append").parquet(path)
  }

  private def readMeta(spark: org.apache.spark.sql.SparkSession,
                       path: String): Option[(Int, Int, Int)] =
    try {
      val meta = spark.read.parquet(s"$path/$MetaDir")
      val r = meta.select("outDim", "seed").head()
      // pre-inDim sidecars (none shipped, but the read stays lenient so a
      // missing column degrades to "skip the width check", not a crash)
      val in = if (meta.columns.contains("inDim"))
        meta.select("inDim").head().getInt(0) else -1
      Some((r.getInt(0), r.getInt(1), in))
    } catch { case _: org.apache.spark.sql.AnalysisException => None }

  /** Two-stage top-k against a persisted latent index: stage 1 ranks by
    * latent cosine reading ONLY `(id, latent)` (column pruning — the wide
    * `emb` column never leaves parquet) and keeps the top `k × oversample`
    * ids; stage 2 re-reads `(id, emb)` joined against that bounded
    * candidate set (BROADCAST hash join — a literal `isin` of thousands of
    * ids is an interpreted Or-chain in the parquet pushdown path and
    * probe-measured 25× slower at C=4000) and exact-cosine re-ranks. One
    * declarative plan, no driver collect. Results are identical to
    * [[projectedTopK]] over the same rows (spec-asserted). */
  def projectedTopKIndexed(spark: org.apache.spark.sql.SparkSession,
                           indexPath: String, query: Array[Double], k: Int,
                           oversample: Int = 4): DataFrame = {
    require(k >= 1 && oversample >= 1 && k.toLong * oversample <= Int.MaxValue,
      s"dimred: bad k=$k oversample=$oversample")
    val (outDim, seed, _) = readMeta(spark, indexPath).getOrElse(throw new IllegalArgumentException(
      s"projectedTopKIndexed: no config sidecar at $indexPath — not a latent index"))
    val qLat = typedlit(projectVec(query, outDim, seed).toSeq)
    val q = typedlit(query.toSeq)
    val idx = spark.read.parquet(indexPath)
    val cand = idx
      .select(col("id"),
        round(Similarity.cosine(col("latent"), qLat), 6).as("lat_cos"))
      .orderBy(col("lat_cos").desc, col("id"))
      .limit(k * oversample)
      .select(col("id"))
    idx.join(broadcast(cand), "id")
      .select(col("id"), round(Similarity.cosine(col("emb"), q), 4).as("cos"))
      .orderBy(col("cos").desc, col("id"))
      .limit(k)
  }
}
