package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deduplication operators for the training-data pipeline. Each scales the
  * same way: per-row signatures are narrow projections (codegen'd), candidate
  * generation is a key-partitioned shuffle on SMALL keys (band hashes /
  * simhash chunks), and exact verification runs only on candidate pairs —
  * never an all-pairs product.
  */
object Dedup {

  /** 128-bit content identity: a pair of independently-salted xxhash64s over
    * the content columns. ONE 64-bit hash is not enough at the corpus sizes
    * this engine targets: expected collisions ≈ n²/2⁶⁵, so at 10¹² docs
    * ~27,000 DISTINCT documents would silently merge — and `dropExact` would
    * then delete one of each falsely-merged pair. The pair drops the odds to
    * ~n²/2¹²⁹ ≈ 1.5e-15 at 10¹² docs — smaller than a memory bit-flip
    * (same budget as the uniqueness check, ConstraintChecks.uniqueness).
    * Shuffle rows stay fixed-width (16 B of key). */
  private[ops] def contentHash(contentCols: Seq[Column]): (Column, Column) = (
    xxhash64(contentCols :+ lit("exact-dedup-1"): _*),
    xxhash64(contentCols :+ lit("exact-dedup-2"): _*))

  /** Exact dedup via hash-groupBy (128-bit content hash of the given
    * columns). Returns one survivor per group (min tiebreak) — duplicates
    * dropped. */
  def dropExact(df: DataFrame, contentCols: Seq[String], tiebreak: String): DataFrame = {
    val (h1, h2) = contentHash(contentCols.map(col))
    // two aggregations on the content hash (partial-merged, skew-tolerant);
    // a window would sort whole partitions for no benefit
    val survivors = df.withColumn("__h1", h1).withColumn("__h2", h2)
      .groupBy(col("__h1"), col("__h2")).agg(min(col(tiebreak)).as(tiebreak))
    df.withColumn("__h1", h1).withColumn("__h2", h2)
      .join(survivors, Seq("__h1", "__h2", tiebreak), "left_semi")
      .drop("__h1", "__h2")
  }

  /** Exact duplicate groups: 128-bit content hash → group size (> 1 only). */
  def exactDupGroups(df: DataFrame, contentCols: Seq[String]): DataFrame = {
    val (h1, h2) = contentHash(contentCols.map(col))
    df.groupBy(h1.as("content_h1"), h2.as("content_h2"))
      .agg(count(lit(1)).as("cnt"), min(col(df.columns.head)).as("example"))
      .filter(col("cnt") > 1)
  }

  /** MinHash signature of a shingle array: k independent hash slots, slot i =
    * min over shingles of xxhash64(shingle, i). Native expression — each
    * shingle's bytes hash ONCE with the k slot variants as cheap int folds
    * (the HOF formulation re-hashed every string k times, interpreted; see
    * graft.functions.TextNative.MinHashSig, bit-identical). */
  def minhashSignature(shinglesCol: Column, numHashes: Int = 32): Column =
    graft.functions.TextNative.minhash_sig(shinglesCol, numHashes)

  /** LSH band keys from a MinHash signature: `bands` bands of `rows` slots,
    * each hashed to one key (array position = band id). Docs sharing ≥1
    * (band, hash) become candidates. Native expression — the previous
    * `xxhash64(to_json(slice(…)))` materialized a JSON string per band per
    * row, interpreted; band blocking only needs A deterministic slice hash
    * (candidates are exact-verified), so the cheapest fold wins. */
  def lshBandKeys(signature: Column, bands: Int, rows: Int): Column =
    graft.functions.TextNative.band_hashes(signature, bands, rows)

  /** MinHash+LSH near-duplicate pairs with exact Jaccard verification.
    * @param threshold  exact shingle-set Jaccard cutoff applied to candidates
    * Pipeline: shingle → minhash → band keys → explode → self-join within
    * (band, hash) buckets → exact verify. The self-join key space is the
    * band-hash domain, so the shuffle is by bucket, never all-pairs. */
  def minhashLshPairs(df: DataFrame, idCol: String, textCol: String,
                      threshold: Double = 0.7, numHashes: Int = 32,
                      bands: Int = 8, shingleN: Int = 3): DataFrame = {
    require(numHashes % bands == 0)
    val rows = numHashes / bands
    val sh = df.select(col(idCol).as("id"), TextOps.shingles(col(textCol), shingleN).as("sh"))
      .filter(size(col("sh")) > 0)
    val sig = sh.withColumn("sig", minhashSignature(col("sh"), numHashes))
    // candidate generation is SLIM (id, band, band-hash): the band self-join
    // shuffles 20 bytes/row, not shingle arrays. For exact verification the
    // raw TEXT re-joins for only the candidate rows and is re-shingled
    // there — shingling O(candidates) rows twice beats re-running the
    // full-corpus shingle subtree per join branch (Spark does not share the
    // un-cached `sh` plan between branches).
    val banded = sig
      .select(col("id"), posexplode(lshBandKeys(col("sig"), bands, rows)).as(Seq("band", "bh")))
    val candIds = banded.as("a").join(banded.as("b"),
        col("a.band") === col("b.band") && col("a.bh") === col("b.bh") &&
          col("a.id") < col("b.id"))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"))
      .dropDuplicates("id_a", "id_b")
    verifyJaccard(candIds, df, idCol, textCol, shingleN, threshold)
  }

  /** Exact-Jaccard verification of candidate id pairs: re-join the raw text
    * for only the candidate rows, re-shingle there, keep pairs at/above the
    * threshold. O(candidates) work — shingling candidate rows twice beats
    * re-running the full-corpus shingle subtree per join branch (Spark does
    * not share an un-cached plan between branches). */
  private def verifyJaccard(candIds: DataFrame, df: DataFrame, idCol: String,
                            textCol: String, shingleN: Int,
                            threshold: Double): DataFrame = {
    val txt = df.select(col(idCol).as("id"), col(textCol).as("t"))
    candIds
      .join(txt.select(col("id").as("id_a"), col("t").as("t_a")), Seq("id_a"))
      .join(txt.select(col("id").as("id_b"), col("t").as("t_b")), Seq("id_b"))
      .select(col("id_a"), col("id_b"),
        TextOps.shingles(col("t_a"), shingleN).as("sh_a"),
        TextOps.shingles(col("t_b"), shingleN).as("sh_b"))
      .withColumn("jaccard", jaccardFromShingles(col("sh_a"), col("sh_b")))
      .filter(col("jaccard") >= threshold)
      .select(col("id_a"), col("id_b"), col("jaccard"))
  }

  /** Exact shingle-Jaccard between two shingle-set columns, rounded to 6 dp
    * — THE verified-near-dup formula, shared by the batch operators here,
    * the streaming twin ([[StreamingOps.nearDupDroppedIds]]), and replayed
    * verbatim by the DuckDB oracle SQL; a threshold/rounding change in one
    * place is a change everywhere or a spec/oracle failure. */
  private[ops] def jaccardFromShingles(shA: org.apache.spark.sql.Column,
                                       shB: org.apache.spark.sql.Column): org.apache.spark.sql.Column = {
    val inter = size(array_intersect(shA, shB)).cast("double")
    round(inter / (size(shA) + size(shB) - inter), 6)
  }

  /** Exact n-gram Jaccard over ALL pairs sharing at least one shingle —
    * inverted-index join (shingle → posting list), correct but heavier than
    * LSH; the candidate key is the shingle itself. Use for small/medium
    * corpora or as ground truth for the LSH variant.
    *
    * @param dfCap document-frequency cap: shingles appearing in more than
    *   `dfCap` docs are dropped from the posting list BEFORE the self-join.
    *   Without it one stop-shingle shared by 10⁶ docs makes a 10¹²-candidate
    *   explosion — the posting join is O(df²) per shingle. Capped shingles
    *   are the least informative for Jaccard; pairs sharing ONLY capped
    *   shingles are missed and pairs sharing some get a conservative
    *   (under-)estimate — the standard trade. df counting is a partial-
    *   aggregated groupBy (hot keys combine map-side), and the hot-shingle
    *   set (a tiny fraction by construction) anti-joins against the posting
    *   list. `Int.MaxValue` disables the cap (exact ground-truth mode). */
  def ngramJaccardPairs(df: DataFrame, idCol: String, textCol: String,
                        threshold: Double = 0.5, shingleN: Int = 3,
                        dfCap: Int = 1000): DataFrame = {
    val sh = df.select(col(idCol).as("id"), TextOps.shingles(col(textCol), shingleN).as("sh"))
      .filter(size(col("sh")) > 0)
    val postingAll = sh.select(col("id"), size(col("sh")).as("n"), explode(col("sh")).as("s"))
    val posting =
      if (dfCap == Int.MaxValue) postingAll
      else {
        val hot = postingAll.groupBy(col("s")).agg(count(lit(1)).as("df"))
          .filter(col("df") > dfCap).select(col("s"))
        postingAll.join(hot, Seq("s"), "left_anti")
      }
    val inter = posting.as("a").join(posting.as("b"),
        col("a.s") === col("b.s") && col("a.id") < col("b.id"))
      .groupBy(col("a.id").as("id_a"), col("b.id").as("id_b"),
        col("a.n").as("n_a"), col("b.n").as("n_b"))
      .agg(count(lit(1)).cast("double").as("inter"))
    inter
      .withColumn("jaccard", round(col("inter") / (col("n_a") + col("n_b") - col("inter")), 6))
      .filter(col("jaccard") >= threshold)
      .select(col("id_a"), col("id_b"), col("jaccard"))
  }

  /** 64-bit SimHash of a token array: bit b of the result is the sign of
    * Σ_tokens (bit b of xxhash64(token) ? +1 : −1). Native codegen'd
    * Expression — one pass over the tokens with 64 local counters (the
    * interpreted HOF formulation walked the array 64 times; see
    * graft.functions.SimHash64). */
  def simhash(tokensCol: Column): Column =
    graft.functions.SimHash64.simhash64(tokensCol)

  /** SimHash near-duplicate pairs within a Hamming radius, via the standard
    * chunk trick: split 64 bits into `chunks` pieces; pairs within Hamming
    * distance < chunks must share ≥1 exact chunk (pigeonhole) — so the join
    * key is a chunk value, never all-pairs.
    *
    * COST/RECALL TRADE: recall is GUARANTEED only for Hamming ≤ chunks−1,
    * but chunk width = 64/chunks bits, so expected candidates on random
    * signatures are ≈ chunks × n² / 2^(64/chunks) — chunks=4 (16-bit keys)
    * is ~n²/2¹⁴ (Manku-style cheap, radius ≤ 3); chunks=16 (4-bit keys)
    * approaches all-pairs (~n²) and is only sensible when the radius must
    * be guaranteed large (e.g. a verification gate) or the corpus is small.
    * Pick the largest width whose radius guarantee covers your threshold. */
  def simhashPairs(df: DataFrame, idCol: String, textCol: String,
                   maxHamming: Int = 3, chunks: Int = 4): DataFrame =
    hammingPairs64(
      df.select(col(idCol).as("id"), simhash(TextOps.tokens(col(textCol))).as("sim")),
      maxHamming, chunks)

  /** The Hamming-chunk pigeonhole join over ANY 64-bit signature column —
    * the candidate machinery [[simhashPairs]] and the perceptual image
    * hash ([[Multimodal.imageNearDupPairs]]) share. Input: (id, sim);
    * output: (id_a, id_b, hamming ≤ maxHamming), id_a < id_b. Same
    * cost/recall trade as documented above. */
  def hammingPairs64(hashed: DataFrame, maxHamming: Int, chunks: Int): DataFrame = {
    require(chunks >= 1 && 64 % chunks == 0,
      s"hammingPairs64: chunks must divide 64, got $chunks")
    require(maxHamming >= 0, s"hammingPairs64: maxHamming must be >= 0, got $maxHamming")
    val width = 64 / chunks
    val mask = if (width == 64) -1L else (1L << width) - 1 // 1L<<64 wraps
    val chunked = hashed.select(col("id"), col("sim"),
        explode(transform(sequence(lit(0), lit(chunks - 1)), c =>
          struct(c.as("c"),
            call_function("shiftright", col("sim"), c * width)
              .bitwiseAND(mask).as("v")))).as("ck"))
      .select(col("id"), col("sim"), col("ck.c"), col("ck.v"))
    chunked.as("a").join(chunked.as("b"),
        col("a.c") === col("b.c") && col("a.v") === col("b.v") && col("a.id") < col("b.id"))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"),
        bit_count(col("a.sim").bitwiseXOR(col("b.sim"))).as("hamming"))
      // radius filter BEFORE the dedup exchange: hamming is a pure function
      // of the pair, so the order is result-identical, and the shuffle then
      // carries only within-radius pairs instead of every chunk-collision
      // candidate (at narrow chunks the candidate set is orders of
      // magnitude larger — the 1M-image probe measured the difference)
      .filter(col("hamming") <= maxHamming)
      .dropDuplicates("id_a", "id_b")
  }

  /** SimHash-blocked near-duplicate pairs with exact Jaccard verification:
    * candidate generation via the Hamming-chunk pigeonhole (`simhashPairs`),
    * then the same exact shingle-Jaccard verify as the MinHash pipeline.
    * The simhash signature is a cheaper blocking key than a MinHash band set
    * (one 64-bit value vs `bands` keys per row); verification makes the
    * output exact-truth comparable (and DuckDB-oracle-able). */
  def simhashJaccardPairs(df: DataFrame, idCol: String, textCol: String,
                          threshold: Double = 0.5, maxHamming: Int = 6,
                          chunks: Int = 4, shingleN: Int = 3): DataFrame = {
    val candIds = simhashPairs(df, idCol, textCol, maxHamming, chunks)
      .select(col("id_a"), col("id_b"))
    verifyJaccard(candIds, df, idCol, textCol, shingleN, threshold)
  }

  /** Bucket-population-capped LSH keys: (id, emb, key) where key is the
    * hyperplane bucket, except that OVERSIZED buckets (population > maxBucket)
    * are split by re-hashing with `splitPlanes` extra hyperplanes.
    *
    * Why: per-bucket candidate work in a bucketed self-join is Σ|bucket|².
    * A clustered corpus — exactly where dedup runs — can concentrate a large
    * corpus fraction into ONE bucket (boilerplate blobs, spam swarms), making
    * that bucket's self-join quadratic in the corpus; AQE skew-split spreads
    * the shuffle but cannot reduce the candidate COUNT. The same medicine as
    * the n-gram df-cap, but recall-preserving: instead of dropping the hot
    * bucket, its rows re-key by `splitPlanes` additional sign bits (the
    * hyperplane family is prefix-stable: plane j's weights don't depend on
    * the total plane count, so `hyperplane_bucket(e, P+S) >> S ==
    * hyperplane_bucket(e, P)`). Genuinely-similar vectors agree on the extra
    * signs with high probability and stay co-bucketed; a diverse hot bucket
    * fans out over up to 2^splitPlanes sub-buckets, cutting its candidate
    * count by up to 4^splitPlanes. A bucket that stays oversized after the
    * split is a true near-dup cluster — its quadratic pair set IS the
    * requested output.
    *
    * Split keys carry a tag bit (1<<62) so they can never collide with an
    * unsplit bucket id; a row therefore has exactly ONE key.
    *
    * The bucket census is a partial-aggregated count on the bucket column
    * (hot keys combine map-side); the hot set is ≤ n/maxBucket entries by
    * construction — broadcastable at any corpus size. The census DOES cost
    * one extra read of the embedding column; `censusFrac < 1` replaces it
    * with a deterministic hash-sampled census (threshold scales to
    * maxBucket × censusFrac): a genuinely hot bucket is huge by definition,
    * so a 1% sample detects it with ~±10% Poisson noise at the default
    * threshold (10⁴ × 0.01 = 100 expected sampled rows) — near-threshold
    * misclassification just means a may-or-may-not split, which is correct
    * either way (candidates are exact-verified). Use censusFrac=0.01 for
    * corpus-scale runs; 1.0 (exact) is the default and what tests pin. */
  private[ops] def cappedBucketKeys(df: DataFrame, idCol: String, embCol: String,
                                    planes: Int, splitPlanes: Int,
                                    maxBucket: Int,
                                    censusFrac: Double = 1.0): DataFrame = {
    if (maxBucket == Int.MaxValue)
      return df.select(col(idCol).as("id"), col(embCol).as("emb"),
        Similarity.hyperplaneBucket(col(embCol), planes).as("key"))
    // 61: split keys must fit below the 1<<62 tag bit
    require(planes + splitPlanes <= 61,
      s"planes + splitPlanes must be <= 61, got ${planes + splitPlanes}")
    // prefix-stability means ONE fine bucketing yields both keys:
    // bucket = fine >> splitPlanes (no second per-row hyperplane pass)
    val base = df.select(col(idCol).as("id"), col(embCol).as("emb"),
      Similarity.hyperplaneBucket(col(embCol), planes + splitPlanes).as("fine"))
      .withColumn("bucket", shiftright(col("fine"), splitPlanes))
    // the hot set is collected EAGERLY and inlined as an InSet predicate:
    // a lazy census subplan referenced from both sides of the downstream
    // self-join would execute TWICE (Spark shares no uncached subtrees —
    // verified in the executed plan), i.e. two extra corpus reads instead
    // of one. The set is ≤ n/maxBucket entries by construction (typically a
    // handful — skew means a FEW dominant buckets), so the driver collect
    // and the per-row probe are trivial.
    val hotBuckets = hotBucketSet(base, maxBucket, censusFrac)
    if (hotBuckets.isEmpty)
      base.select(col("id"), col("emb"), col("bucket").as("key"))
    else
      base.select(col("id"), col("emb"),
        when(col("bucket").isInCollection(hotBuckets),
            lit(1L << 62).bitwiseOR(col("fine")))
          .otherwise(col("bucket")).as("key"))
  }

  /** Eager bucket census: the (tiny) set of bucket ids whose population
    * exceeds `maxBucket`, from an exact or hash-sampled count over `base`
    * (which must carry `id` and `bucket`). One extra read of the bucketing
    * inputs, executed exactly once. */
  private[ops] def hotBucketSet(base: DataFrame, maxBucket: Int,
                                censusFrac: Double): Seq[Long] = {
    val censusBase =
      if (censusFrac >= 1.0) base
      else base.filter(pmod(xxhash64(col("id"), lit("census")), lit(1000000L))
        < (censusFrac * 1000000L).toLong)
    censusBase.groupBy(col("bucket")).agg(count(lit(1)).as("n"))
      .filter(col("n") > maxBucket * math.min(censusFrac, 1.0))
      .select(col("bucket")).collect().map(_.getLong(0)).toSeq
  }

  /** Embedding near-duplicates: pairs with cosine ≥ threshold, candidates
    * bucketed by random-hyperplane LSH (see Similarity.hyperplaneBucket) so
    * the self-join is per-bucket. Oversized buckets are split by extra
    * hyperplanes (see [[cappedBucketKeys]]) so one dominant cluster cannot
    * make candidate generation quadratic in the corpus;
    * `maxBucket = Int.MaxValue` disables the cap. */
  def embeddingCosineDups(df: DataFrame, idCol: String, embCol: String,
                          threshold: Double = 0.95, planes: Int = 12,
                          maxBucket: Int = 10000, splitPlanes: Int = 12,
                          censusFrac: Double = 1.0): DataFrame = {
    val b = cappedBucketKeys(df, idCol, embCol, planes, splitPlanes, maxBucket, censusFrac)
    b.as("a").join(b.as("b"),
        col("a.key") === col("b.key") && col("a.id") < col("b.id"))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"),
        round(Similarity.cosine(col("a.emb"), col("b.emb")), 6).as("cos"))
      .filter(col("cos") >= threshold)
  }
}
