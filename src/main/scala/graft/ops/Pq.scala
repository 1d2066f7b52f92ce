package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Product quantization (PQ) — the third ANN family next to hyperplane LSH
  * (data-oblivious buckets, `Similarity`) and IVF (data-adaptive pruning,
  * `IvfAnn`): MEMORY compression. The embedding space is split into `m`
  * subspaces; each subspace gets its own `k ≤ 256`-entry codebook (trained
  * like IvfAnn's coarse quantizer: bounded deterministic sample, seeded
  * k-means, driver-side micro-work); a vector is stored as `m` one-byte
  * codes plus its exact norm. At d=64 float64 dims and m=8 that is 512 B →
  * 8 B + 8 B — a 10¹¹-vector corpus's 51 TB of raw vectors becomes under
  * 2 TB of codes, which is what makes exhaustive candidate scoring feasible
  * at all on a bounded cluster.
  *
  * Search is asymmetric distance computation (ADC): the query is NOT
  * quantized — per query the driver builds an `m × k` table of partial
  * inner products ⟨q_j, codebook_j[i]⟩ (m·k·d/m = k·d flops, micro-work),
  * broadcasts it, and each row's approximate inner product is `m` table
  * lookups + adds in one narrow mapPartitions pass — no shuffle; the final
  * top-k is Spark's per-partition TakeOrdered. Cosine comes from the stored
  * exact norm: cos ≈ adc_ip / (‖q‖·‖v‖).
  *
  * Quantization is lossy in general, but EXACT whenever every subvector is
  * a codebook entry: training detects ≤ `k` distinct subvectors in the
  * sample and then uses the distinct set itself as the codebook (sorted,
  * deterministic) instead of running Lloyd. A corpus fully covered by the
  * training sample with ≤ k distinct subvectors per subspace round-trips
  * bit-exactly, ADC equals the exact inner product up to FP summation
  * order, and the top-k hash-checks against a DuckDB exact replay — the
  * same structurally-total oracle-gate pattern as `ann_lsh_exact` /
  * `ann_ivf_exact` (driver query `ann_pq_exact`); production lossy configs
  * keep rows-only entries plus recall specs.
  *
  * The IVF-PQ composition ([[indexWrite]] / [[topKIndexed]]) stores the
  * codes in `IvfAnn`'s `partitionBy(list)` layout: probed lists are
  * partition filters (read nprobe/nLists of the CODES — already 64× smaller
  * than raw vectors — from storage), ADC ranks inside them. Codes encode
  * the RAW vector, not the centroid residual (FAISS `by_residual=false`);
  * residual encoding buys accuracy at equal m but couples the codebooks to
  * the coarse quantizer — the simpler variant keeps one PQ codebook valid
  * for both the flat and the IVF layout and is the documented trade.
  */
object Pq {

  /** Per-subspace codebooks: `books(j)(i)` is subspace j's i-th centroid
    * (length d/m). `lossless(j)` records that subspace j's codebook is the
    * full distinct-subvector set of the training sample. */
  final case class Codebooks(m: Int, k: Int, dsub: Int,
                             books: Array[Array[Array[Double]]],
                             lossless: Array[Boolean]) {
    def dims: Int = m * dsub
  }

  /** Deterministic bounded sample (same selection as IvfAnn: smallest
    * xxhash64(id) rows — parallelism-invariant, no RNG). */
  private def sampleVecs(df: DataFrame, idCol: String, embCol: String,
                         sampleN: Int): Array[Array[Double]] = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(xxhash64(col(idCol), lit("pq-sample")).as("h"),
        col(embCol).cast("array<double>").as("emb"))
      .orderBy($"h")
      .limit(sampleN)
      .select($"emb").as[Seq[Double]]
      .collect().map(_.toArray)
  }

  private def l2sq(a: Array[Double], b: Array[Double]): Double = {
    var s = 0.0; var i = 0
    while (i < a.length) { val d = a(i) - b(i); s += d * d; i += 1 }
    s
  }

  private implicit val seqOrd: Ordering[Seq[Double]] =
    Ordering.Implicits.seqOrdering[Seq, Double]

  /** Train the `m` subspace codebooks on a bounded deterministic sample,
    * driver-side. Per subspace: if the sample holds ≤ `k` DISTINCT
    * subvectors, the codebook IS that distinct set (sorted — fully
    * deterministic, encoding is then exact for every sampled subvector);
    * otherwise kmeans++-seeded Lloyd by L2 (the PQ metric: subspace
    * centroids approximate subvectors, inner products are reconstructed
    * per-subspace). Empty clusters keep their previous centroid. */
  def train(df: DataFrame, idCol: String, embCol: String, m: Int,
            k: Int = 256, sampleN: Int = 2000, iters: Int = 8,
            seed: Long = 47L): Codebooks = {
    require(k >= 1 && k <= 256, s"pq: k must be in [1,256] (one-byte codes), got $k")
    val sample = sampleVecs(df, idCol, embCol, sampleN)
    require(sample.nonEmpty, "pq: empty training sample")
    val dims = sample(0).length
    require(dims % m == 0, s"pq: dims=$dims not divisible by m=$m subspaces")
    val dsub = dims / m
    val lossless = new Array[Boolean](m)
    val books = Array.tabulate(m) { j =>
      val subs = sample.map(v => v.slice(j * dsub, (j + 1) * dsub))
      val distinct = subs.map(_.toSeq).distinct.sorted
      if (distinct.length <= k) {
        lossless(j) = true
        distinct.map(_.toArray).toArray
      } else {
        // kmeans++ by L2, seeded per subspace for determinism
        val rng = new graft.stats.StatMath.SplitMix64(seed + j)
        val cents = scala.collection.mutable.ArrayBuffer[Array[Double]](subs(0))
        while (cents.length < k) {
          val d2 = subs.map(v => cents.map(c => l2sq(v, c)).min)
          val total = d2.sum
          if (total <= 0.0) {
            // degenerate mid-loop (can't happen with > k distinct, kept for
            // safety): positional fallback
            cents += subs(cents.length % subs.length)
          } else {
            var draw = rng.nextDouble() * total
            var i = 0
            while (i < subs.length - 1 && draw > d2(i)) { draw -= d2(i); i += 1 }
            cents += subs(i)
          }
        }
        var cs = cents.toArray
        (0 until iters).foreach { _ =>
          val sums = Array.fill(k)(new Array[Double](dsub))
          val counts = new Array[Long](k)
          subs.foreach { v =>
            var best = 0; var bestD = Double.MaxValue; var c = 0
            while (c < k) {
              val d = l2sq(v, cs(c))
              if (d < bestD) { bestD = d; best = c }
              c += 1
            }
            counts(best) += 1
            var i = 0
            while (i < dsub) { sums(best)(i) += v(i); i += 1 }
          }
          cs = Array.tabulate(k) { c =>
            if (counts(c) == 0) cs(c) else sums(c).map(_ / counts(c))
          }
        }
        cs
      }
    }
    Codebooks(m, k, dsub, books, lossless)
  }

  /** Per-row PQ encode, shared by [[encode]] and [[indexWrite]]: (m
    * one-byte codes, exact norm). Fails loud on a dims mismatch — the
    * codebooks only cover the trained width, silently truncating a wider
    * vector would persist wrong cosines. */
  private def encodeVec(v: Array[Double], b: Codebooks): (Array[Byte], Double) = {
    require(v.length == b.dims,
      s"pq: vector dims ${v.length} != trained dims ${b.dims}")
    val code = new Array[Byte](b.m)
    var norm = 0.0
    var i = 0
    while (i < v.length) { norm += v(i) * v(i); i += 1 }
    var j = 0
    while (j < b.m) {
      val off = j * b.dsub
      val book = b.books(j)
      var best = 0; var bestD = Double.MaxValue; var c = 0
      while (c < book.length) {
        var s = 0.0; var t = 0
        val cent = book(c)
        while (t < b.dsub) { val d = v(off + t) - cent(t); s += d * d; t += 1 }
        if (s < bestD) { bestD = s; best = c }
        c += 1
      }
      code(j) = best.toByte
      j += 1
    }
    (code, math.sqrt(norm))
  }

  /** Encode every row to `m` one-byte codes + its exact norm: one narrow
    * mapPartitions pass with the broadcast codebooks, no shuffle. Output
    * `(id (native type), code binary, norm double)`. */
  def encode(df: DataFrame, idCol: String, embCol: String,
             cb: Codebooks): DataFrame = {
    val spark = df.sparkSession
    val bc = spark.sparkContext.broadcast(cb)
    val in = df.select(col(idCol).as("id"), col(embCol).cast("array<double>").as("emb"))
    val outSchema = StructType(Seq(in.schema.fields(0),
      StructField("code", BinaryType, nullable = false),
      StructField("norm", DoubleType, nullable = false)))
    in.mapPartitions { it =>
      val b = bc.value
      it.map { r =>
        val (code, norm) = encodeVec(r.getSeq[Double](1).toArray, b)
        org.apache.spark.sql.Row(r.get(0), code, norm)
      }
    }(org.apache.spark.sql.Encoders.row(outSchema))
  }

  /** The query's ADC lookup table: `table(j)(i) = ⟨q_j, books(j)(i)⟩`.
    * k·d flops, driver-side micro-work per query. */
  private def adcTable(cb: Codebooks, query: Array[Double]): Array[Array[Double]] = {
    require(query.length == cb.dims,
      s"pq: query dims ${query.length} != trained dims ${cb.dims}")
    Array.tabulate(cb.m) { j =>
      val off = j * cb.dsub
      cb.books(j).map { cent =>
        var s = 0.0; var t = 0
        while (t < cb.dsub) { s += query(off + t) * cent(t); t += 1 }
        s
      }
    }
  }

  /** Top-k by approximate cosine over an ENCODED frame: broadcast ADC table,
    * one narrow scan of the m-byte codes (m lookups + adds per row), cosine
    * from the stored exact norm, per-partition TakeOrdered — no shuffle.
    * With a lossless codebook this is EXACT (spec + oracle gate). */
  def adcTopK(encoded: DataFrame, cb: Codebooks, query: Array[Double],
              k: Int): DataFrame = {
    val spark = encoded.sparkSession
    val qnorm = math.sqrt(query.map(x => x * x).sum)
    val bc = spark.sparkContext.broadcast(adcTable(cb, query))
    val in = encoded.select(col("id"), col("code"), col("norm"))
    val outSchema = StructType(Seq(in.schema.fields(0),
      StructField("cos", DoubleType, nullable = false)))
    in.mapPartitions { it =>
      val table = bc.value
      it.map { r =>
        val code = r.getAs[Array[Byte]](1)
        val norm = r.getDouble(2)
        var ip = 0.0; var j = 0
        while (j < table.length) { ip += table(j)(code(j) & 0xFF); j += 1 }
        val denom = qnorm * norm
        val cos = if (denom == 0.0) 0.0 else ip / denom
        org.apache.spark.sql.Row(r.get(0), cos)
      }
    }(org.apache.spark.sql.Encoders.row(outSchema))
      .select(col("id"), round(col("cos"), 4).as("cos"))
      .orderBy(col("cos").desc, col("id"))
      .limit(k)
  }

  /** Persist an IVF-PQ index: coarse IVF assignment (IvfAnn's trained
    * centroids) over PQ-ENCODED rows, written `partitionBy(list)` with the
    * codebooks and centroids as sidecars. A probed query reads
    * nprobe/nLists of the m-byte codes — partition pruning AND 64×
    * compression multiply. */
  def indexWrite(df: DataFrame, idCol: String, embCol: String, path: String,
                 nLists: Int, m: Int, k: Int = 256, sampleN: Int = 2000,
                 iters: Int = 8, seed: Long = 47L): Codebooks = {
    val spark = df.sparkSession
    import spark.implicits._
    val cb = train(df, idCol, embCol, m, k, sampleN, iters, seed)
    val cents = IvfAnn.trainCentroids(df, idCol, embCol, nLists, sampleN, iters, seed)
    writeCodes(IvfAnn.assign(df, idCol, embCol, cents), cb, path, "overwrite")
    cents.zipWithIndex.map { case (c, i) => (i, c.toSeq) }.toSeq
      .toDF("list", "centroid")
      .coalesce(1).write.mode("overwrite").parquet(s"$path/centroids")
    writeCodebooks(spark, cb, path)
    cb
  }

  /** Encode an IVF-assigned frame (id, emb, list) with `cb` and write the
    * (id, code, norm) rows `partitionBy(list)` — shared by [[indexWrite]]
    * (overwrite) and [[indexAppend]] (append). Encoding from the assigned
    * frame is join-free: assign preserves emb. */
  private def writeCodes(assigned: DataFrame, cb: Codebooks, path: String,
                         mode: String): Unit = {
    val bc = assigned.sparkSession.sparkContext.broadcast(cb)
    val outSchema = StructType(Seq(assigned.schema.fields(0),
      StructField("code", BinaryType, nullable = false),
      StructField("norm", DoubleType, nullable = false),
      StructField("list", IntegerType, nullable = false)))
    assigned.mapPartitions { it =>
      val b = bc.value
      it.map { r =>
        val (code, norm) = encodeVec(r.getSeq[Double](1).toArray, b)
        org.apache.spark.sql.Row(r.get(0), code, norm, r.getInt(2))
      }
    }(org.apache.spark.sql.Encoders.row(outSchema))
      .write.mode(mode).partitionBy("list").parquet(s"$path/lists")
  }

  /** INCREMENTAL IVF-PQ maintenance: assign a batch of new vectors to the
    * index's FROZEN coarse centroids, encode with its FROZEN codebooks
    * (both read from the sidecars — no retraining), and append into the
    * `partitionBy(list)` codes layout. Same growth contract as
    * [[IvfAnn.indexAppend]]: quality degrades only as far as the corpus
    * drifts from the training sample — the drift checks are the re-train
    * signal. Fails loud on a non-PQ index (no codebook sidecar). */
  def indexAppend(df: DataFrame, idCol: String, embCol: String,
                  path: String): Unit = {
    val spark = df.sparkSession
    val cb = readCodebooks(spark, path) // requires the sidecar — family guard
    val cents = IvfAnn.readCentroids(spark, path)
    require(cents.nonEmpty, s"pq indexAppend: no centroid sidecar at $path")
    IndexMaintenance.requireSameIdType(spark, s"$path/lists",
      None, df.schema(idCol).dataType, "pq indexAppend")
    writeCodes(IvfAnn.assign(df, idCol, embCol, cents), cb, path, "append")
  }

  private def writeCodebooks(spark: SparkSession, cb: Codebooks, path: String): Unit = {
    import spark.implicits._
    val rows = for {
      j <- 0 until cb.m
      i <- cb.books(j).indices
    } yield (j, i, cb.books(j)(i).toSeq, cb.lossless(j))
    rows.toDF("sub", "idx", "centroid", "lossless")
      .coalesce(1).write.mode("overwrite").parquet(s"$path/codebooks")
  }

  def readCodebooks(spark: SparkSession, path: String): Codebooks = {
    import spark.implicits._
    val rows = spark.read.parquet(s"$path/codebooks")
      .select($"sub", $"idx", $"centroid", $"lossless")
      .as[(Int, Int, Seq[Double], Boolean)].collect()
    require(rows.nonEmpty, s"pq: no codebook sidecar at $path")
    val m = rows.map(_._1).max + 1
    val books = Array.tabulate(m) { j =>
      rows.filter(_._1 == j).sortBy(_._2).map(_._3.toArray)
    }
    val lossless = Array.tabulate(m)(j => rows.find(_._1 == j).get._4)
    Codebooks(m, books.map(_.length).max, books(0)(0).length, books, lossless)
  }

  /** Top-k against a persisted IVF-PQ index: rank centroids driver-side,
    * probe the `nprobe` best lists (LITERAL partition filter), ADC-rank the
    * codes inside them. `nprobe ≥ nLists` + lossless codebooks degenerates
    * to exact brute force — the oracle config. */
  def topKIndexed(spark: SparkSession, indexPath: String, query: Array[Double],
                  k: Int, nprobe: Int): DataFrame = {
    import spark.implicits._
    val cb = readCodebooks(spark, indexPath)
    val cents = IvfAnn.readCentroids(spark, indexPath)
    val probed = cents.zipWithIndex
      .map { case (c, i) => (i, IvfAnn.cosineOf(query, c)) }
      .sortBy { case (i, cs) => (-cs, i) }
      .take(math.min(nprobe, cents.length)).map(_._1)
    val encoded = spark.read.parquet(s"$indexPath/lists")
      .filter(col("list").isInCollection(probed.toSeq)) // partition pruning
    adcTopK(encoded, cb, query, k)
  }
}
