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

  /** Multi-probe XOR masks in standard probing order (Lv et al. 2007,
    * "Multi-Probe LSH"): Hamming distance ascending — the query's own
    * bucket (mask 0), then all single-bit flips in ascending bit order,
    * then all two-bit flips, and so on. Masks are constant per
    * (planes, probes): a probe bucket is `qBucket ^ mask`, so ONE mask
    * list serves both the driver-side single-query paths and the per-row
    * join explode (no per-row probe derivation). Capped at the bucket
    * universe, so `probes >= 2^planes` degrades to exact search. */
  private[ops] def probeMasks(planes: Int, probes: Int): Seq[Long] = {
    val universe = if (planes >= 62) Long.MaxValue else 1L << planes
    val want = math.min(math.max(probes, 1).toLong, universe).toInt
    val out = Seq.newBuilder[Long]
    var n = 0
    def emit(m: Long): Boolean = { out += m; n += 1; n >= want }
    var done = emit(0L)
    var h = 1
    while (!done && h <= planes) {
      // h-bit masks in lexicographic bit-position order ((0,1), (0,2), …):
      // combinations of positions advanced at the last movable index
      val idx = Array.tabulate(h)(identity)
      var more = true
      while (more && !done) {
        var m = 0L
        idx.foreach(b => m |= (1L << b))
        done = emit(m)
        var i = h - 1
        while (i >= 0 && idx(i) == planes - h + i) i -= 1
        if (i < 0) more = false
        else {
          idx(i) += 1
          var j = i + 1
          while (j < h) { idx(j) = idx(j - 1) + 1; j += 1 }
        }
      }
      h += 1
    }
    out.result()
  }

  private def probeSet(qBucket: Long, planes: Int, probes: Int): Seq[Long] =
    probeMasks(planes, probes).map(qBucket ^ _)

  /** The same probe set as a per-row Column explode: `bucketCol ^ mask`
    * for each constant mask. */
  private def probeArrCol(bucketCol: Column, planes: Int, probes: Int): Column = {
    val masks = probeMasks(planes, probes)
    array(masks.map(m => if (m == 0L) bucketCol else bucketCol.bitwiseXOR(lit(m))): _*)
  }

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
    * neighbor buckets in multi-probe order (Hamming distance ascending,
    * see [[probeMasks]]) for recall. */
  def lshTopK(df: DataFrame, idCol: String, embCol: String,
              query: Array[Double], k: Int, planes: Int = 12, probes: Int = 1): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val qBucket = spark.range(1)
      .select(hyperplaneBucket(typedlit(query.toSeq), planes))
      .head().getLong(0)
    val targets: Seq[Long] = probeSet(qBucket, planes, probes)
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
    * `probes > 1`, the next `probes - 1` buckets in multi-probe order
    * (Hamming distance ascending, [[probeMasks]] — a union for recall). The join key is the bucket
    * id, so the shuffle is by bucket — candidate generation is
    * Σ_buckets |bucket|², never the corpus². The exact cosine then ranks
    * candidates per query row via the bounded TopKPairsAgg. A probed pair
    * can match through at most one probe value (the index row has ONE key),
    * so no dedup pass is needed. Residual skew is spread by AQE's skew-join
    * handling; STRUCTURAL skew (a dominant cluster) is bounded by the
    * bucket-population cap below.
    */
  def knnJoin(df: DataFrame, idCol: String, embCol: String, k: Int,
              planes: Int = 12, probes: Int = 1,
              maxBucket: Int = 10000, splitPlanes: Int = 12,
              censusFrac: Double = 1.0): DataFrame = {
    // bucket-population cap (the Dedup.cappedBucketKeys trade, adapted to a
    // probed join): buckets whose population exceeds maxBucket re-key by
    // `splitPlanes` extra hyperplane sign bits, so one dominant cluster
    // cannot make Σ|bucket|² candidate work quadratic in the corpus. The
    // hyperplane family is prefix-stable (bucket(e,P+S) >> S == bucket(e,P)),
    // so a query probing a HOT bucket refines the probe with its OWN extra
    // sign bits — genuinely-near vectors agree on those signs w.h.p. and
    // still meet. Split keys carry a tag bit (1<<62): they can never collide
    // with an unsplit bucket id, so a (query, index-row) pair still matches
    // through AT MOST one probe value and no dedup pass is needed.
    val capped = maxBucket != Int.MaxValue
    // 61: split keys must fit below the 1<<62 tag bit
    require(!capped || planes + splitPlanes <= 61,
      s"planes + splitPlanes must be <= 61, got ${planes + splitPlanes}")
    // prefix-stability means ONE fine bucketing yields both keys:
    // bucket = fine >> splitPlanes (no second per-row hyperplane pass)
    val base = (if (capped)
        df.select(col(idCol).as("id"),
          col(embCol).cast("array<double>").as("emb"),
          hyperplaneBucket(col(embCol), planes + splitPlanes).as("fine"))
          .withColumn("bucket", shiftright(col("fine"), splitPlanes))
      else
        df.select(col(idCol).as("id"),
          col(embCol).cast("array<double>").as("emb"),
          hyperplaneBucket(col(embCol), planes).as("bucket"),
          lit(0L).as("fine")))
    // census cost: one extra read of the embedding column, executed EAGERLY
    // exactly once (a lazy census subplan referenced from both join sides
    // would execute twice) and inlined as an InSet predicate. censusFrac < 1
    // swaps the exact census for a deterministic hash-sampled one with a
    // scaled threshold — hot buckets are huge by definition, so a 1% sample
    // detects them reliably; borderline buckets may or may not split, which
    // is correct either way (see Dedup.cappedBucketKeys/hotBucketSet).
    val hotBuckets: Seq[Long] =
      if (!capped) Seq.empty
      else Dedup.hotBucketSet(base, maxBucket, censusFrac)
    val splitting = hotBuckets.nonEmpty
    val tag = lit(1L << 62)
    val idx0 = base.select(col("id").as("id_b"), col("emb").as("emb_b"),
      col("bucket"), col("fine"))
    val idx =
      (if (splitting) idx0.withColumn("key",
          when(col("bucket").isInCollection(hotBuckets), tag.bitwiseOR(col("fine")))
            .otherwise(col("bucket")))
       else idx0.withColumn("key", col("bucket")))
        .select(col("id_b"), col("emb_b"), col("key"))
    val probeArr = probeArrCol(col("b0"), planes, probes)
    val q0 = base.select(col("id").as("id_a"), col("emb").as("emb_a"),
        col("bucket").as("b0"),
        col("fine").bitwiseAND((1L << splitPlanes) - 1).as("ext"))
      .select(col("id_a"), col("emb_a"), col("ext"), explode(probeArr).as("bucket"))
    val q =
      (if (splitting) q0.withColumn("key",
          when(col("bucket").isInCollection(hotBuckets),
              tag.bitwiseOR(shiftleft(col("bucket"), splitPlanes)).bitwiseOR(col("ext")))
            .otherwise(col("bucket")))
       else q0.withColumn("key", col("bucket")))
        .select(col("id_a"), col("emb_a"), col("key"))
    // final ranking via the bounded TopKPairsAgg, NOT a window: the
    // aggregate partial-combines each map task's candidates to ≤k per query
    // row BEFORE the shuffle (O(rows × k) exchange instead of
    // O(candidates)) and never sorts a whole key's candidate list. Ordering
    // (score DESC, id ASC) is identical to the window formulation
    // (equality asserted in SimilaritySpec).
    q.join(idx, Seq("key"))
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
                    path: String, planes: Int = 12): Unit = {
    df.select(col(idCol).as("id"), col(embCol).cast("array<double>").as("emb"),
        hyperplaneBucket(col(embCol), planes).as("bucket"))
      .write.mode("overwrite").partitionBy("bucket").parquet(path)
    // config sidecar under an _-prefixed dir (invisible to parquet readers):
    // appends validate their planes against it — two plane counts in one
    // index would silently split every bucket's population in two
    writeMeta(df.sparkSession, s"$path/$MetaDir", planes)
  }

  private val MetaDir = "_graft_lsh_meta"

  private def writeMeta(spark: org.apache.spark.sql.SparkSession,
                        metaPath: String, planes: Int): Unit = {
    import spark.implicits._
    Seq(planes).toDF("planes").coalesce(1).write.mode("overwrite").parquet(metaPath)
  }

  private def readMetaPlanes(spark: org.apache.spark.sql.SparkSession,
                             path: String): Option[Int] =
    try Some(spark.read.parquet(s"$path/$MetaDir").head().getInt(0))
    catch { case _: org.apache.spark.sql.AnalysisException => None }

  /** INCREMENTAL index maintenance: append a batch of new vectors into the
    * existing `partitionBy(bucket)` layout — a growing corpus no longer
    * rebuilds the whole index per batch. New rows are bucketed with the SAME
    * hyperplane family (the hash is deterministic per (planes, dims), so a
    * bucket id means the same thing across writes), and the dynamic
    * partitioned append only touches the bucket directories the batch lands
    * in. Readers ([[lshTopKIndexed]], [[lshTopKIndexedBatch]]) need no
    * changes — partition pruning unions old and new files per bucket.
    *
    * `planes` must match the index's recorded config (fails loud on
    * mismatch; a two-family index would silently halve every bucket).
    * Indexes written before the config sidecar existed append on trust with
    * a warning. */
  def lshIndexAppend(df: DataFrame, idCol: String, embCol: String,
                     path: String, planes: Int = 12): Unit = {
    val spark = df.sparkSession
    readMetaPlanes(spark, path) match {
      case Some(p) => require(p == planes,
        s"lshIndexAppend: index at $path was built with planes=$p, append " +
          s"requested planes=$planes — bucket ids would be incompatible")
      case None =>
        org.slf4j.LoggerFactory.getLogger(getClass).warn(
          s"lshIndexAppend: no config sidecar at $path (pre-append-era " +
            "index) - trusting caller-supplied planes")
    }
    IndexMaintenance.requireSameIdType(spark, path, Some("id"),
      df.schema(idCol).dataType, "lshIndexAppend")
    df.select(col(idCol).as("id"), col(embCol).cast("array<double>").as("emb"),
        hyperplaneBucket(col(embCol), planes).as("bucket"))
      .write.mode("append").partitionBy("bucket").parquet(path)
  }

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
    val targets: Seq[Long] = probeSet(qBucket, planes, probes)
    val q = typedlit(query.toSeq)
    spark.read.parquet(indexPath)
      .filter(col("bucket").isin(targets: _*)) // partition pruning
      .select(col("id"), round(cosine(col("emb"), q), 4).as("cos"))
      .orderBy(col("cos").desc, col("id"))
      .limit(k)
  }

  /** Batch ANN against a persisted LSH index: top-k for EVERY row of a query
    * DataFrame in ONE plan — the production shape (the reference's DRS
    * encodes whole loaders batch-at-a-time, ml/utils/autoencoder.py:235-245;
    * serving one vector per job, as [[lshTopKIndexed]] does, wastes a
    * Spark job per query).
    *
    * Scale shape: each query row explodes into its probe buckets (own +
    * `probes - 1` neighbors in multi-probe order — same probe set as
    * [[lshTopKIndexed]]); the UNION of all probe buckets is collected
    * (bounded by min(queries × probes, 2^planes) longs — the query side is
    * the small side by assumption) and becomes a LITERAL `isin` predicate,
    * so the index scan partition-prunes to exactly the probed bucket
    * directories (PartitionFilters — plan-asserted in SimilaritySpec); at
    * 100 TB only probes/2^planes of the index is read. The bucket-keyed join
    * then ranks candidates with the bounded [[graft.sketch.TopKPairsAgg]]
    * (≤k per query BEFORE the exchange). Per-query results are identical to
    * [[lshTopKIndexed]] for the same (planes, probes) — asserted in spec.
    *
    * Output: (query_id, id, cos) with cos rounded to 4dp like the
    * single-query path. Query rows that also live in the index match
    * themselves (cos 1.0) — filter afterwards if unwanted. */
  def lshTopKIndexedBatch(spark: org.apache.spark.sql.SparkSession, indexPath: String,
                          queries: DataFrame, idCol: String, embCol: String,
                          k: Int, planes: Int = 12, probes: Int = 1): DataFrame =
    lshTopKIndexedBatchManaged(spark, indexPath, queries, idCol, embCol,
      k, planes, probes)._1

  /** [[lshTopKIndexedBatch]] plus a RELEASE handle for the exploded-query
    * persist it needs (the frame is referenced twice — probed-bucket collect
    * and join — so it must be persisted; without an explicit release the
    * MEMORY_AND_DISK blocks only free when the ContextCleaner GCs the frame,
    * which is nondeterministic and accumulates across repeated batch calls
    * in a long-lived session). Call `release()` once the returned plan has
    * been fully consumed (collected / written); calling it earlier only
    * costs a recompute of the query side. */
  def lshTopKIndexedBatchManaged(spark: org.apache.spark.sql.SparkSession, indexPath: String,
                                 queries: DataFrame, idCol: String, embCol: String,
                                 k: Int, planes: Int = 12, probes: Int = 1)
      : (DataFrame, () => Unit) = {
    val probeArr = probeArrCol(col("b0"), planes, probes)
    // persist the exploded query side: it is referenced twice — the
    // probed-bucket collect AND the join — and an uncached subplan would
    // re-read + re-bucket the query source per reference (Spark shares no
    // uncached subtrees). persist (NOT localCheckpoint: truncated lineage
    // in non-replicated executor blocks is unrecoverable on executor loss
    // — spot nodes / dynamic allocation would fail the job) keeps safe
    // recompute; blocks release via the ContextCleaner when the frame is
    // garbage-collected.
    val q = queries.select(col(idCol).as("query_id"),
        col(embCol).cast("array<double>").as("qemb"),
        hyperplaneBucket(col(embCol), planes).as("b0"))
      .select(col("query_id"), col("qemb"), explode(probeArr).as("bucket"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val probed: Seq[Long] =
      q.select(col("bucket")).distinct().collect().map(_.getLong(0)).toSeq
    val plan = spark.read.parquet(indexPath)
      .filter(col("bucket").isInCollection(probed)) // partition pruning (literal set)
      .join(q, Seq("bucket"))
      .select(col("query_id"), col("id"),
        round(cosine(col("qemb"), col("emb")), 4).as("cos"))
      .groupBy(col("query_id"))
      .agg(graft.sketch.TopKPairsAgg.topkPairs(col("id"), col("cos"), k).as("tk"))
      .select(col("query_id"), explode(col("tk")).as("p"))
      .select(col("query_id"), col("p.id").as("id"), col("p.score").as("cos"))
    (plan, () => { q.unpersist(blocking = false); () })
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
