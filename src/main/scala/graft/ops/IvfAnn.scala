package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** IVF (inverted-file) approximate nearest neighbor — the second ANN family
  * next to the hyperplane-LSH one (Similarity): a coarse k-means quantizer
  * learned from a bounded deterministic sample partitions the corpus into
  * `nLists` inverted lists; a query ranks the centroids, probes only the
  * `nprobe` nearest lists, and exact-cosine-ranks the candidates.
  *
  * Why both families: LSH buckets are data-oblivious (hash planes — cheap,
  * no training, recall from multi-probe); IVF lists are data-ADAPTIVE
  * (centroids follow the corpus's cluster structure), which probes far
  * fewer candidates at equal recall on clustered corpora — the common case
  * for embedding spaces. This is the standard scale architecture (FAISS-
  * style coarse quantization) re-expressed Spark-first:
  *
  *  - training: driver-side Lloyd iterations on a bounded hash-ordered
  *    sample (the same deterministic min-hash selection the MMD sampler
  *    uses) — k × sampleN × dims flops, trivially small, fully seeded;
  *  - assignment: one narrow mapPartitions pass with the broadcast
  *    centroid matrix (k × dims fused multiply-adds per row, no shuffle);
  *  - layout: `partitionBy(list)` parquet — probed lists become PARTITION
  *    filters, so a query reads only nprobe/nLists of the corpus from
  *    storage (same lever as Similarity.lshIndexWrite);
  *  - search: exact cosine rank inside the probed lists.
  *
  * Cosine is the metric throughout (assignment by max cosine — equivalent
  * to L2 on the unit sphere, and the same metric the search ranks by).
  */
object IvfAnn {

  /** Deterministic bounded sample of embedding vectors: the `sampleN`
    * smallest xxhash64(id) rows — parallelism-invariant, no RNG. */
  private def sampleVecs(df: DataFrame, idCol: String, embCol: String,
                         sampleN: Int): Array[Array[Double]] = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(xxhash64(col(idCol), lit("ivf-sample")).as("h"),
        col(embCol).cast("array<double>").as("emb"))
      .orderBy($"h")
      .limit(sampleN)
      .select($"emb").as[Seq[Double]]
      .collect().map(_.toArray)
  }

  private[ops] def cosineOf(a: Array[Double], b: Array[Double]): Double = cosine(a, b)

  private def cosine(a: Array[Double], b: Array[Double]): Double = {
    var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
    while (i < a.length) {
      dot += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i); i += 1
    }
    val d = math.sqrt(na) * math.sqrt(nb)
    if (d == 0.0) 0.0 else dot / d
  }

  /** Train the coarse quantizer: kmeans++-seeded Lloyd iterations by COSINE
    * on a bounded deterministic sample, entirely driver-side (k × sampleN ×
    * dims flops per iteration — micro-work; the corpus-scale cost lives in
    * assignment, not training, exactly like the reference's offline
    * fit / online compare split). Deterministic: seeded SplitMix64 for the
    * kmeans++ draws, hash-ordered sample. Empty clusters keep their
    * previous centroid. */
  def trainCentroids(df: DataFrame, idCol: String, embCol: String,
                     nLists: Int, sampleN: Int = 2000, iters: Int = 8,
                     seed: Long = 31L): Array[Array[Double]] = {
    val sample = sampleVecs(df, idCol, embCol, sampleN)
    require(sample.nonEmpty, "ivf: empty training sample")
    val k = math.min(nLists, sample.length)
    val rng = new graft.stats.StatMath.SplitMix64(seed)
    // kmeans++ (cosine distance = 1 - cos): first centroid = first sample
    // row; each next drawn ∝ distance to the nearest chosen centroid
    val centroids = scala.collection.mutable.ArrayBuffer[Array[Double]](sample(0))
    var exhausted = false
    while (centroids.length < k && !exhausted) {
      val d2 = sample.map { v =>
        val best = centroids.map(c => 1.0 - cosine(v, c)).min
        best * best
      }
      val total = d2.sum
      if (total <= 0.0) {
        // degenerate: every sample point coincides with a chosen centroid.
        // Fall back to the first sample row NOT already chosen (positional
        // round-robin could re-pick a duplicate of an existing centroid,
        // wasting a list); if literally all rows are duplicates, stop early
        // with fewer centroids rather than add dead ones.
        sample.find(v => !centroids.exists(_.sameElements(v))) match {
          case Some(v) => centroids += v
          case None => exhausted = true // fewer centroids beats dead duplicates
        }
      } else {
        var draw = rng.nextDouble() * total
        var i = 0
        while (i < sample.length - 1 && draw > d2(i)) { draw -= d2(i); i += 1 }
        centroids += sample(i)
      }
    }
    var cents = centroids.toArray
    val kEff = cents.length // may be < k when the sample degenerated
    (0 until iters).foreach { _ =>
      val sums = Array.fill(kEff)(new Array[Double](sample(0).length))
      val counts = new Array[Long](kEff)
      sample.foreach { v =>
        var best = 0; var bestCos = -2.0; var c = 0
        while (c < kEff) {
          val cs = cosine(v, cents(c))
          if (cs > bestCos) { bestCos = cs; best = c }
          c += 1
        }
        counts(best) += 1
        var i = 0
        while (i < v.length) { sums(best)(i) += v(i); i += 1 }
      }
      cents = Array.tabulate(kEff) { c =>
        if (counts(c) == 0) cents(c) // empty cluster: keep previous centroid
        else sums(c).map(_ / counts(c))
      }
    }
    cents
  }

  /** Assign every row to its nearest-centroid list: one narrow
    * mapPartitions pass over (id, emb) with the broadcast centroid matrix —
    * no shuffle, k × dims flops per row. The id column keeps its NATIVE
    * type (string ids are as valid here as everywhere else in the
    * Similarity/Dedup family — a previous version cast to long, silently
    * nulling non-numeric ids). */
  def assign(df: DataFrame, idCol: String, embCol: String,
             centroids: Array[Array[Double]]): DataFrame = {
    val spark = df.sparkSession
    val bc = spark.sparkContext.broadcast(centroids)
    val in = df.select(col(idCol).as("id"), col(embCol).cast("array<double>").as("emb"))
    val outSchema = org.apache.spark.sql.types.StructType(in.schema.fields :+
      org.apache.spark.sql.types.StructField(
        "list", org.apache.spark.sql.types.IntegerType, nullable = false))
    in.mapPartitions { it =>
      val cents = bc.value
      it.map { r =>
        val emb = r.getSeq[Double](1)
        val v = emb.toArray
        var best = 0; var bestCos = -2.0; var c = 0
        while (c < cents.length) {
          val cs = cosine(v, cents(c))
          if (cs > bestCos) { bestCos = cs; best = c }
          c += 1
        }
        org.apache.spark.sql.Row(r.get(0), emb, best)
      }
    }(org.apache.spark.sql.Encoders.row(outSchema))
  }

  /** Persist the IVF index: corpus written `partitionBy(list)` + the
    * centroid matrix as a small sidecar parquet — probed lists become
    * partition filters on read. */
  def indexWrite(df: DataFrame, idCol: String, embCol: String, path: String,
                 nLists: Int, sampleN: Int = 2000, iters: Int = 8,
                 seed: Long = 31L): Array[Array[Double]] = {
    val spark = df.sparkSession
    import spark.implicits._
    val cents = trainCentroids(df, idCol, embCol, nLists, sampleN, iters, seed)
    assign(df, idCol, embCol, cents)
      .write.mode("overwrite").partitionBy("list").parquet(s"$path/lists")
    cents.zipWithIndex.map { case (c, i) => (i, c.toSeq) }.toSeq
      .toDF("list", "centroid")
      .coalesce(1).write.mode("overwrite").parquet(s"$path/centroids")
    cents
  }

  /** INCREMENTAL index maintenance: assign a batch of NEW vectors to the
    * index's FROZEN centroids (read from the sidecar — no retraining) and
    * append into the `partitionBy(list)` layout; only the lists the batch
    * lands in gain files, and [[topKIndexed]] needs no changes. This is the
    * standard IVF growth mode (FAISS `add` after `train`): assignment
    * quality degrades only as far as the corpus distribution drifts from
    * the training sample — at which point the drift checks this engine
    * exists for are the signal to re-train and rebuild. */
  def indexAppend(df: DataFrame, idCol: String, embCol: String,
                  path: String): Unit = {
    // an IVF-PQ index (Pq.indexWrite) shares this centroid-sidecar format
    // but its lists hold (id, code, norm) CODES, not raw embeddings —
    // appending raw rows would mix file schemas and corrupt the layout.
    // The codebook sidecar is the family marker; fail loud on it.
    val cbPath = new org.apache.hadoop.fs.Path(s"$path/codebooks")
    val fs = cbPath.getFileSystem(df.sparkSession.sparkContext.hadoopConfiguration)
    require(!fs.exists(cbPath),
      s"indexAppend: $path has a PQ codebook sidecar - it is an IVF-PQ " +
        "index storing codes, not raw embeddings; raw appends would corrupt it")
    val cents = readCentroids(df.sparkSession, path)
    require(cents.nonEmpty, s"indexAppend: no centroid sidecar at $path")
    IndexMaintenance.requireSameIdType(df.sparkSession, s"$path/lists",
      None, df.schema(idCol).dataType, "indexAppend")
    assign(df, idCol, embCol, cents)
      .write.mode("append").partitionBy("list").parquet(s"$path/lists")
  }

  /** Centroid sidecar read — the ONE place the sidecar format is decoded
    * (shared with the PQ family; a format change lands everywhere). */
  private[ops] def readCentroids(spark: SparkSession, path: String): Array[Array[Double]] = {
    import spark.implicits._
    spark.read.parquet(s"$path/centroids")
      .orderBy("list").select("centroid").as[Seq[Double]]
      .collect().map(_.toArray)
  }

  /** Top-k against a persisted IVF index: rank centroids by cosine with the
    * query (driver-side, k × dims flops), probe the `nprobe` best lists —
    * a LITERAL partition filter, so only those lists' files are read — and
    * exact-cosine-rank the candidates. `nprobe >= nLists` degenerates to
    * exact brute force (the oracle config). */
  def topKIndexed(spark: SparkSession, indexPath: String, query: Array[Double],
                  k: Int, nprobe: Int): DataFrame = {
    val cents = readCentroids(spark, indexPath)
    val probed = cents.zipWithIndex
      .map { case (c, i) => (i, cosine(query, c)) }
      .sortBy { case (i, cs) => (-cs, i) }
      .take(math.min(nprobe, cents.length)).map(_._1)
    val q = typedlit(query.toSeq)
    spark.read.parquet(s"$indexPath/lists")
      .filter(col("list").isInCollection(probed.toSeq)) // partition pruning
      .select(col("id"), round(Similarity.cosine(col("emb"), q), 4).as("cos"))
      .orderBy(col("cos").desc, col("id"))
      .limit(k)
  }
}
