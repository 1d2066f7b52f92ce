package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Similarity search over an embedding column (`array<float>`).
  *
  * Baseline: brute-force cosine top-k — one narrow projection per row against
  * a broadcast query vector (scales linearly, no shuffle except the final
  * top-k). Scale path: random-hyperplane LSH buckets so candidate generation
  * touches only the query's bucket(s) instead of the full corpus.
  */
object Similarity {

  /** Cosine similarity of two array<numeric> columns. Native single-pass
    * expression — the zip_with/aggregate chain it replaces made three
    * interpreted HOF walks plus a zip allocation per PAIR, and this kernel
    * runs per candidate pair in every similarity operator (bit-identical;
    * see graft.functions.CosineSim). */
  def cosine(a: Column, b: Column): Column =
    graft.functions.CosineSim.cosine_sim(a, b)

  /** Random-hyperplane LSH bucket id: `planes` sign bits packed into a long.
    * Same hash family for indexing and querying — cosine-similar vectors land
    * in the same bucket with high probability. Native codegen'd Expression
    * with a process-wide cached weight matrix (the interpreted HOF
    * formulation re-derived planes × dims hash-chain weights per ROW; see
    * graft.functions.HyperplaneBucket). */
  def hyperplaneBucket(emb: Column, planes: Int = 12): Column =
    graft.functions.HyperplaneBucket.hyperplane_bucket(emb, planes)

  /** Brute-force cosine top-k against one query vector (broadcast). */
  def bruteForceTopK(df: DataFrame, idCol: String, embCol: String,
                     query: Array[Double], k: Int): DataFrame = {
    val q = typedlit(query.toSeq)
    df.select(col(idCol), round(cosine(col(embCol).cast("array<double>"), q), 4).as("cos"))
      .orderBy(col("cos").desc, col(idCol))
      .limit(k)
  }

  /** LSH-bucketed ANN top-k: candidates restricted to the query's hyperplane
    * bucket, then exact cosine rank. `probes > 1` additionally searches
    * buckets at Hamming distance 1 (multi-probe) for recall. */
  def lshTopK(df: DataFrame, idCol: String, embCol: String,
              query: Array[Double], k: Int, planes: Int = 12, probes: Int = 1): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val qBucket = spark.range(1)
      .select(hyperplaneBucket(typedlit(query.toSeq), planes))
      .head().getLong(0)
    val targets: Seq[Long] =
      if (probes <= 1) Seq(qBucket)
      else qBucket +: (0 until planes).map(b => qBucket ^ (1L << b))
    val q = typedlit(query.toSeq)
    df.select(col(idCol), col(embCol).cast("array<double>").as("emb"),
        hyperplaneBucket(col(embCol), planes).as("bucket"))
      .filter(col("bucket").isin(targets: _*))
      .select(col(idCol), round(cosine(col("emb"), q), 4).as("cos"))
      .orderBy(col("cos").desc, col(idCol))
      .limit(k)
  }

  /** LSH-bucketed top-k neighbors for EVERY row — the corpus-scale kNN join
    * a training-data pipeline runs for near-dup clustering / semantic dedup.
    *
    * Shape: every row lands in its hyperplane bucket once (index side); the
    * query side explodes each row into its own bucket plus, when
    * `probes > 1`, all buckets at Hamming distance 1 (multi-probe union for
    * recall). The join key is the bucket id, so the shuffle is by bucket —
    * candidate generation is Σ_buckets |bucket|², never the corpus². The
    * exact cosine then ranks candidates per query row with a window top-k.
    * A probed pair can match through at most one probe value (the index row
    * has ONE bucket), so no dedup pass is needed. Skewed buckets are spread
    * by AQE's skew-join handling.
    */
  def knnJoin(df: DataFrame, idCol: String, embCol: String, k: Int,
              planes: Int = 12, probes: Int = 1): DataFrame = {
    val idx = df.select(col(idCol).as("id_b"),
      col(embCol).cast("array<double>").as("emb_b"),
      hyperplaneBucket(col(embCol), planes).as("bucket"))
    val probeArr = {
      val own = col("b0")
      if (probes <= 1) array(own)
      else array(own +: (0 until math.min(probes - 1, planes)).map(j => own.bitwiseXOR(1L << j)): _*)
    }
    val q = df.select(col(idCol).as("id_a"),
        col(embCol).cast("array<double>").as("emb_a"),
        hyperplaneBucket(col(embCol), planes).as("b0"))
      .select(col("id_a"), col("emb_a"), explode(probeArr).as("bucket"))
    // final ranking via the bounded TopKPairsAgg, NOT a window: the
    // aggregate partial-combines each map task's candidates to ≤k per query
    // row BEFORE the shuffle (O(rows × k) exchange instead of
    // O(candidates)) and never sorts a whole key's candidate list. Ordering
    // (score DESC, id ASC) is identical to the window formulation
    // (equality asserted in SimilaritySpec).
    q.join(idx, Seq("bucket"))
      .filter(col("id_a") =!= col("id_b"))
      .select(col("id_a"), col("id_b"),
        round(cosine(col("emb_a"), col("emb_b")), 6).as("cos"))
      .groupBy(col("id_a"))
      .agg(graft.sketch.TopKPairsAgg.topkPairs(col("id_b"), col("cos"), k).as("tk"))
      .select(col("id_a"), explode(col("tk")).as("p"))
      .select(col("id_a"), col("p.id").as("id_b"), col("p.score").as("cos"))
  }

  /** Persist an LSH index: the corpus written `partitionBy(bucket)`. This
    * upgrades [[lshTopK]] from compute-and-filter (which still SCANS every
    * row to compute its bucket) to storage-level pruning: a query reads
    * ONLY its probed buckets' partition directories — at 100 TB that is the
    * difference between touching ~probes/2^planes of the corpus and all of
    * it. Build cost is one shuffle-free pass + partitioned write, amortized
    * over every subsequent query. */
  def lshIndexWrite(df: DataFrame, idCol: String, embCol: String,
                    path: String, planes: Int = 12): Unit =
    df.select(col(idCol).as("id"), col(embCol).cast("array<double>").as("emb"),
        hyperplaneBucket(col(embCol), planes).as("bucket"))
      .write.mode("overwrite").partitionBy("bucket").parquet(path)

  /** ANN top-k against a persisted LSH index: the bucket predicate is a
    * PARTITION filter on the index layout, so only the probed buckets'
    * files are read (PartitionFilters in the scan — asserted in
    * SimilaritySpec). Same probe set and exact-cosine ranking as
    * [[lshTopK]]; results are identical for the same (planes, probes). */
  def lshTopKIndexed(spark: org.apache.spark.sql.SparkSession, indexPath: String,
                     query: Array[Double], k: Int, planes: Int = 12,
                     probes: Int = 1): DataFrame = {
    val qBucket = spark.range(1)
      .select(hyperplaneBucket(typedlit(query.toSeq), planes))
      .head().getLong(0)
    val targets: Seq[Long] =
      if (probes <= 1) Seq(qBucket)
      else qBucket +: (0 until planes).map(b => qBucket ^ (1L << b))
    val q = typedlit(query.toSeq)
    spark.read.parquet(indexPath)
      .filter(col("bucket").isin(targets: _*)) // partition pruning
      .select(col("id"), round(cosine(col("emb"), q), 4).as("cos"))
      .orderBy(col("cos").desc, col("id"))
      .limit(k)
  }

  /** All-pairs brute-force top-k neighbors per row for a SMALL table
    * (ground truth for LSH recall tests). */
  def allPairsTopK(df: DataFrame, idCol: String, embCol: String, k: Int): DataFrame = {
    val a = df.select(col(idCol).as("id_a"), col(embCol).cast("array<double>").as("emb_a"))
    val b = df.select(col(idCol).as("id_b"), col(embCol).cast("array<double>").as("emb_b"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("id_a")).orderBy(col("cos").desc, col("id_b"))
    a.join(b, col("id_a") =!= col("id_b"))
      .select(col("id_a"), col("id_b"), round(cosine(col("emb_a"), col("emb_b")), 4).as("cos"))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= k)
      .drop("rn")
  }
}
