package graft.model

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Per-partition generation parameters — the synthetic analog of the
  * reference's drift-severity transform ladder
  * (reference ml/utils/drift.py:37-198: GaussianBlur / ElasticTransform /
  * ColorJitter ladders applied to MNIST batches in ml/testing.py:60-79).
  *
  * @param gapSigma      stddev of gaussian noise added to span offset gaps
  *                      (analog of GaussianBlur σ ladder)
  * @param imageTilt     extra probability mass tilting span-kind toward
  *                      'image' (analog of ColorJitter ladder)
  * @param swapProb      probability a span's offset jumps backward, breaking
  *                      the monotone span order (analog of ElasticTransform)
  * @param dupEvery      if >1, groups of this many docs share a doc_id
  *                      (uniqueness-violation fixture)
  * @param danglingRate  probability a media span references a media_ref
  *                      missing from the catalog (referential fixture)
  * @param nullKindRate  probability a span kind is null (stats fixture)
  * @param hotKeyFrac    fraction of the partition's docs collapsed onto ONE
  *                      hot doc_id (skew fixture: exercises the salted
  *                      uniqueness stage + AQE on a pathologically hot key)
  * @param novelKindRate probability a span's kind is 'chart' — a category
  *                      the control partitions never emit (novelty fixture
  *                      for the E33 novel-category check). Carved off the
  *                      TOP of the kind uniform, so rate=0 partitions are
  *                      bit-identical to pre-fixture output
  */
case class PartSpec(
    part: Int,
    gapSigma: Double = 0.0,
    imageTilt: Double = 0.0,
    swapProb: Double = 0.0,
    dupEvery: Int = 1,
    danglingRate: Double = 0.0,
    nullKindRate: Double = 0.0,
    hotKeyFrac: Double = 0.0,
    novelKindRate: Double = 0.0)

/** Deterministic, fully-distributed synthetic generator for the interleaved
  * text+media `docs` table (BASELINE.json `input_hint` shape) and the `media`
  * catalog. Replaces the reference's torchvision dataset source
  * (reference ml/utils/constants.py:4-26, ml/training.py:241-246) — no
  * external data is allowed.
  *
  * Everything is pure column expressions over `spark.range(n)`: pseudo-random
  * draws come from `xxhash64(id, tag, seed)`, so output is identical at any
  * parallelism / partitioning (verdicts must be parallelism-invariant) and
  * generation scales linearly to any row count with zero shuffle and full
  * whole-stage codegen — the property that matters at 10^12 docs.
  */
object DocsGen {
  val Seed = 31L // mirrors the reference's random_state=31 (ml/training.py:535-537)
  val MediaCount = 100000L

  private val vocab = Seq(
    "drift", "batch", "window", "kernel", "latent", "vector", "span", "media",
    "offset", "detector", "sample", "sigma", "permute", "verdict", "schema",
    "sketch", "quantile", "anchor", "ledger", "mosaic", "quartz", "ember",
    "willow", "cobalt")

  /** Uniform(0,1) from a deterministic hash of the given columns + tag. */
  private def u(tag: String, cols: Column*): Column =
    (pmod(xxhash64((cols :+ lit(tag) :+ lit(Seed)): _*), lit(1000000L)).cast("double") + 0.5) / 1000000.0

  /** Slice a 16-bit uniform out of a 64-bit hash column: bits [16b, 16b+16).
    * One xxhash64 yields FOUR independent uniforms — higher-order-function
    * lambdas evaluate interpreted, so hash calls are the generator's unit of
    * cost and must be amortized. */
  private def uBits(h: Column, b: Int): Column =
    (shiftright(h, 16 * b).bitwiseAND(0xFFFFL).cast("double") + 0.5) / 65536.0

  /** Standard normal via Box-Muller from two 16-bit slices of a hash. */
  private def gaussianBits(h: Column, b1: Int, b2: Int): Column =
    sqrt(lit(-2.0) * log(greatest(uBits(h, b1), lit(1e-12)))) *
      cos(lit(2.0 * math.Pi) * uBits(h, b2))

  /** The golden drift scenario — mirror of the reference's 15 evaluation
    * loaders (1 reference + 14 drifted, ml/testing.py:60-79) plus three
    * constraint-violation fixture partitions. */
  def goldenScenario: Seq[PartSpec] = {
    val control = Seq(PartSpec(0))
    val gauss = Seq(1.0, 2.0, 4.0, 8.0, 16.0).zipWithIndex.map { case (s, i) =>
      PartSpec(1 + i, gapSigma = s) // GaussianBlur σ ∈ {.25,.5,1,2,4} ladder analog
    }
    val tilt = Seq(0.1, 0.2, 0.4, 0.8, 1.6).zipWithIndex.map { case (w, i) =>
      PartSpec(6 + i, imageTilt = w) // ColorJitter ladder analog
    }
    val swap = Seq(0.05, 0.1, 0.2, 0.4).zipWithIndex.map { case (s, i) =>
      PartSpec(11 + i, swapProb = s) // ElasticTransform ladder analog
    }
    val violations = Seq(
      PartSpec(15, dupEvery = 5),
      PartSpec(16, danglingRate = 0.10),
      PartSpec(17, nullKindRate = 0.05))
    control ++ gauss ++ tilt ++ swap ++ violations
  }

  /** All-clean scenario: nParts identical control partitions (bench input). */
  def cleanScenario(nParts: Int): Seq[PartSpec] =
    (0 until nParts).map(p => PartSpec(p))

  /** Generate the docs table: `nDocs` rows spread evenly over the given
    * partitions. Pure narrow transformation — no shuffle, no UDF. */
  def docs(spark: SparkSession, nDocs: Long, specs: Seq[PartSpec]): DataFrame = {
    val nParts = specs.size
    val params = spark.createDataFrame(specs).withColumnRenamed("part", "p_part")

    // row id → spec index (round-robin) → that spec's part number
    val partOf = typedlit(specs.map(_.part))
    val base = spark.range(nDocs)
      .withColumn("part",
        element_at(partOf, (pmod(col("id"), lit(nParts.toLong)) + 1).cast("int")))
      .withColumn("lid", (col("id") / nParts).cast("long")) // per-part local index
      .join(broadcast(params), col("part") === col("p_part"))

    // doc_id: unique across parts unless dupEvery>1 groups local ids, or
    // hotKeyFrac>0 collapses a draw of docs onto one hot id (skew fixture).
    val groupedLid = when(col("dupEvery") > 1, col("lid") - pmod(col("lid"), col("dupEvery")))
      .otherwise(col("lid"))
    val docId = when(col("hotKeyFrac") > 0.0 && u("hot", col("id")) < col("hotKeyFrac"),
      format_string("doc-%03d-hot", col("part")))
      .otherwise(format_string("doc-%03d-%09d", col("part"), groupedLid))

    val id = col("id")
    val nSpans = (lit(1) + floor(u("nspans", id) * 8)).cast("int") // 1..8 spans/doc

    // per-span arrays, indexed i = 0..nSpans-1. Each span draws THREE 64-bit
    // hashes (hA/hB/hC) and slices 16-bit uniforms out of them — higher-order
    // lambdas run interpreted, so hash-call count dominates generation cost.
    val idxSeq = sequence(lit(0), nSpans - 1)
    val hA = transform(idxSeq, i => xxhash64(id, i, lit("A"), lit(Seed)))
    val hB = transform(idxSeq, i => xxhash64(id, i, lit("B"), lit(Seed)))
    val hC = transform(idxSeq, i => xxhash64(id, i, lit("C"), lit(Seed)))

    // base gap uniform [5,24] + per-part gaussian noise (σ ladder); >= 1.
    // floor(x+0.5) instead of round(): Round's interpreted eval goes through
    // BigDecimal + Double.toString per span; Box-Muller skipped when σ=0.
    val gaps = transform(hA, h => {
      val base = lit(5) + floor(uBits(h, 0) * 20)
      greatest(lit(1L),
        when(col("gapSigma") === 0.0, base)
          .otherwise(floor(base + col("gapSigma") * gaussianBits(h, 1, 2) + 0.5)))
        .cast("int")
    })

    // offsets: cumulative sum of gaps (monotone strictly increasing) built in
    // ONE aggregate fold — a per-element slice-and-sum lambda would re-eval
    // the whole gaps expression per element (interpreted HOFs have no CSE:
    // O(n²) hash calls per doc). Then swap corruption: backward jump with
    // probability swapProb.
    val offsets0 = aggregate(gaps, array().cast("array<int>"),
      (acc, g) => concat(acc, array(
        when(size(acc) === 0, g).otherwise(element_at(acc, size(acc)) + g))))
    val offsets = zip_with(offsets0, hB, (off, h) =>
      when(uBits(h, 1) < col("swapProb"),
        greatest(lit(0), off - (lit(10) + floor(uBits(h, 2) * 50)).cast("int")))
        .otherwise(off))

    // span kind: categorical with per-part tilt toward 'image'
    val total = lit(1.0) + col("imageTilt")
    val cutText = lit(0.70) / total
    val cutImage = (lit(0.90) + col("imageTilt")) / total
    val cutAudio = (lit(0.95) + col("imageTilt")) / total
    val kinds = zip_with(hA, hB, (ha, hb) => {
      val uk = uBits(ha, 3)
      when(uBits(hb, 0) < col("nullKindRate"), lit(null).cast("string"))
        // novelty fixture: top novelKindRate mass of the uniform becomes a
        // category no control part emits; uk < 1 always, so rate=0 parts
        // never take this branch and stay bit-identical
        .when(uk > lit(1.0) - col("novelKindRate"), lit("chart"))
        .when(uk < cutText, lit("text"))
        .when(uk < cutImage, lit("image"))
        .when(uk < cutAudio, lit("audio"))
        .otherwise(lit("table"))
    })

    // text spans: 4 deterministic vocab words from one hash's slices
    val vocabLit = typedlit(vocab)
    val word = (h: Column, b: Int) =>
      element_at(vocabLit, (pmod(shiftright(h, 16 * b), lit(vocab.size.toLong)) + 1).cast("int"))
    val texts = zip_with(kinds, hC, (k, h) =>
      when(k === "text",
        concat_ws(" ", word(h, 0), word(h, 1), word(h, 2), word(h, 3)))
        .otherwise(lit(null).cast("string")))

    // media_ref: for non-text spans; dangling refs point past the catalog
    val mediaRefs = zip_with(kinds, zip_with(hB, hC, (b, c) => struct(b.as("b"), c.as("c"))),
      (k, h) =>
        when(k.isNotNull && k =!= "text",
          when(uBits(h.getField("b"), 3) < col("danglingRate"),
            format_string("m-%08d", lit(MediaCount) +
              pmod(h.getField("c"), lit(1000L))))
            .otherwise(format_string("m-%08d", pmod(h.getField("c"), lit(MediaCount)))))
          .otherwise(lit(null).cast("string")))

    val spans = zip_with(
      zip_with(kinds, texts, (k, t) => struct(k.as("kind"), t.as("text"))),
      zip_with(mediaRefs, offsets, (m, o) => struct(m.as("media_ref"), o.as("offset"))),
      (a, b) => struct(
        a.getField("kind").as("kind"), a.getField("text").as("text"),
        b.getField("media_ref").as("media_ref"), b.getField("offset").as("offset")))

    base.select(docId.as("doc_id"), spans.as("spans"), col("part"))
  }

  /** Media catalog: MediaCount rows, media_ref = "m-%08d". */
  def media(spark: SparkSession, count: Long = MediaCount): DataFrame = {
    val id = col("id")
    spark.range(count).select(
      format_string("m-%08d", id).as("media_ref"),
      element_at(typedlit(Seq("image", "audio", "table")),
        (pmod(xxhash64(id, lit("mk"), lit(Seed)), lit(3L)) + 1).cast("int")).as("media_kind"),
      (lit(100) + pmod(xxhash64(id, lit("mb"), lit(Seed)), lit(100000L))).cast("int").as("bytes_len"))
  }

  /** Featurize: the DRS-encoder analog (reference
    * dimensionality_reduction_api/app/dr.py:136-146 — image → latent vector).
    * A pure-column projection from span statistics to a fixed-width
    * `array<double>` feature vector; no shuffle, whole-stage codegen'd.
    *
    * Features (normalized to O(1) scale so the RBF σ heuristic is sane):
    * 0: span count/8, 1: mean gap/30, 2: text frac, 3: image frac,
    * 4: mean |gap − meanGap|/15 (dispersion → catches σ ladder),
    * 5: frac of non-positive gaps (→ catches swap/ordering corruption).
    */
  def featurize(spansCol: Column): Column = {
    val n = size(spansCol).cast("double")
    val offs = transform(spansCol, s => s.getField("offset"))
    val gapsD = when(size(spansCol) > 1,
      zip_with(slice(offs, lit(2), size(spansCol) - 1),
        slice(offs, lit(1), size(spansCol) - 1),
        (b, a) => (b - a).cast("double")))
      .otherwise(array())
    val nGaps = greatest(size(gapsD).cast("double"), lit(1.0))
    val meanGap = aggregate(gapsD, lit(0.0), (acc, g) => acc + g) / nGaps
    val meanAbsDev = aggregate(gapsD, lit(0.0), (acc, g) => acc + abs(g - meanGap)) / nGaps
    val fracNonPos = aggregate(gapsD, lit(0.0),
      (acc, g) => acc + when(g <= 0.0, 1.0).otherwise(0.0)) / nGaps
    val fracKind = (k: String) => aggregate(spansCol, lit(0.0),
      (acc, s) => acc + when(s.getField("kind") === k, 1.0).otherwise(0.0)) / n
    array(
      n / 8.0,
      meanGap / 30.0,
      fracKind("text"),
      fracKind("image"),
      meanAbsDev / 15.0,
      fracNonPos)
  }
}
