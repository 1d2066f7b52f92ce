package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing: image/audio/video payloads as opaque `binary`
  * columns with typed metadata, processed batch-wise per partition.
  *
  * Two pipelines:
  *  - `extractFeatures` over opaque payloads of ANY kind: byte-level band
  *    means + rolling-hash checksum (content features needing no codec) —
  *    the DuckDB-oracled plumbing check for the binary column path.
  *  - `decodeImageFeatures` over real PNG payloads: `javax.imageio.ImageIO`
  *    decode → luminance grayscale → 28×28 average-pool resize → band-mean
  *    features — the engine analog of the reference's PIL decode +
  *    grayscale/resize transform (dimensionality_reduction_api/app/schemas/
  *    dr.py:15-30, ml/training.py:210-221). Fully real, no stub.
  */
object Multimodal {

  case class MediaRow(media_ref: String, media_kind: String, width: Int,
                      height: Int, payload: Array[Byte])
  case class MediaFeatures(media_ref: String, media_kind: String,
                           n_bytes: Int, checksum: Long, features: Seq[Double])

  /** Deterministic synthetic media table with binary payloads (no external
    * data): payload bytes derived from xxhash64 of the ref. */
  def syntheticMedia(spark: SparkSession, count: Long): Dataset[MediaRow] = {
    import spark.implicits._
    spark.range(count).select(
        format_string("m-%08d", col("id")).as("media_ref"),
        element_at(typedlit(Seq("image", "audio", "video")),
          (pmod(col("id"), lit(3L)) + 1).cast("int")).as("media_kind"),
        (lit(16) + pmod(xxhash64(col("id"), lit("w")), lit(48L))).cast("int").as("width"),
        (lit(16) + pmod(xxhash64(col("id"), lit("h")), lit(48L))).cast("int").as("height"),
        // payload: 64 deterministic bytes (stand-in for encoded media) —
        // 4 concatenated md5 digests decoded from hex
        to_binary(concat_ws("", transform(sequence(lit(0), lit(3)), i =>
          md5(concat(col("id").cast("string"), lit("-"), i.cast("string"))))),
          lit("hex")).as("payload"))
      .as[MediaRow]
  }

  /** Frame sampling over opaque video/audio-like payloads (P47): treat the
    * binary payload as a run of fixed-size frames and keep every `everyK`-th
    * one from `offset` — the deterministic frame-subsample a video pipeline
    * runs before feature extraction, with the codec left opaque (the
    * engine's multimodal posture: Spark-side slicing/sampling plumbing is
    * REAL and oracled; codec decode is the pluggable step). Pure codegen
    * column ops — binary `substring` slicing, no UDF, no shuffle; a payload
    * shorter than one frame yields zero rows (trailing partial frames are
    * dropped, like any fixed-frame reader). `frame_hex` is the sampled
    * frame's exact bytes as uppercase hex — the cross-engine-replayable
    * fingerprint (DuckDB md5 cannot digest BLOBs). */
  def frameSample(media: DataFrame, frameBytes: Int, everyK: Int,
                  offset: Int = 0): DataFrame = {
    require(frameBytes > 0, s"frameSample: frameBytes must be > 0, got $frameBytes")
    require(everyK > 0, s"frameSample: everyK must be > 0, got $everyK")
    require(offset >= 0, s"frameSample: offset must be >= 0, got $offset")
    media.select(col("media_ref"), col("media_kind"),
        floor(length(col("payload")) / frameBytes).cast("int").as("n_frames"),
        col("payload"))
      .withColumn("frame_idx", explode(expr(
        s"CASE WHEN n_frames > 0 THEN filter(sequence(0, n_frames - 1), " +
          s"i -> i >= $offset AND (i - $offset) % $everyK = 0) " +
          "ELSE CAST(array() AS array<int>) END")))
      .select(col("media_ref"), col("media_kind"), col("n_frames"),
        col("frame_idx"),
        expr(s"hex(substring(payload, frame_idx * $frameBytes + 1, $frameBytes))")
          .as("frame_hex"))
  }

  /** Codec-free content features: per-stripe byte-value means over the raw
    * payload (stripe i collects bytes at positions ≡ i mod dims). Cheap,
    * deterministic, kind-agnostic — the feature set for payloads whose codec
    * is not decoded (audio/video kinds here), and SQL-replayable, which is
    * what lets the DuckDB oracle check the binary plumbing end to end. */
  private def byteStripeMeans(payload: Array[Byte], dims: Int = 8): Array[Double] = {
    val out = new Array[Double](dims)
    var i = 0
    while (i < payload.length) {
      out(i % dims) += (payload(i) & 0xff) / 255.0
      i += 1
    }
    val n = math.max(payload.length / dims, 1)
    out.map(_ / n)
  }

  /** Batch feature extraction over the binary column — mapPartitions so each
    * task amortizes (in a real deployment) codec init across its whole batch,
    * exactly like a Pandas UDF over mapInPandas would. Narrow transformation:
    * no shuffle, scales with partition count. */
  def extractFeatures(media: Dataset[MediaRow]): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      // real impl: initialize codec/model ONCE per partition here
      rows.map { r =>
        val checksum = graft.functions.RollingHash.hashBytes(r.payload)
        MediaFeatures(r.media_ref, r.media_kind, r.payload.length, checksum,
          byteStripeMeans(r.payload).toSeq)
      }
    }
  }

  // ===== real image pipeline (PNG encode/decode via javax.imageio) =====

  case class ImageRow(media_ref: String, payload: Array[Byte])
  case class ImageFeatures(media_ref: String, width: Int, height: Int,
                           features: Seq[Double])

  /** Deterministic synthetic PNG corpus: per-id pseudo-random RGB images
    * (SplitMix64 pixel stream, varying dimensions) encoded with
    * `ImageIO.write(_, "png", _)` inside mapPartitions — REAL compressed
    * image payloads, generated distributed, no external data. */
  def syntheticImages(spark: SparkSession, count: Long): Dataset[ImageRow] = {
    import spark.implicits._
    spark.range(count).as[Long].mapPartitions { ids =>
      ids.map { id =>
        val w = 16 + (id % 17).toInt
        val h = 16 + (id % 13).toInt
        val img = new java.awt.image.BufferedImage(w, h,
          java.awt.image.BufferedImage.TYPE_INT_RGB)
        val rng = new graft.stats.StatMath.SplitMix64(id * 0x9E3779B97F4A7C15L + 7L)
        var y = 0
        while (y < h) {
          var x = 0
          while (x < w) {
            img.setRGB(x, y, (rng.nextLong() & 0xffffffL).toInt)
            x += 1
          }
          y += 1
        }
        val bos = new java.io.ByteArrayOutputStream()
        javax.imageio.ImageIO.write(img, "png", bos)
        ImageRow(f"img-$id%08d", bos.toByteArray)
      }
    }
  }

  /** Real decode: PNG bytes → BufferedImage → ITU-R 601 luminance grayscale
    * → 28×28 box-filter (average-pool) resize → 8 horizontal-band means.
    * Grayscale + resize are hand-rolled integer/double math (not platform
    * ColorConvertOp) so results are bit-deterministic across JVMs. PNG is
    * lossless, so decoded pixels equal the generated ones exactly. */
  def decodeImage(payload: Array[Byte]): (Int, Int, Array[Double]) = {
    val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(payload))
    require(img != null, "payload is not a decodable image")
    val (w, h) = (img.getWidth, img.getHeight)
    val gray = new Array[Double](w * h)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val rgb = img.getRGB(x, y)
        gray(y * w + x) = (0.299 * ((rgb >> 16) & 0xff) + 0.587 * ((rgb >> 8) & 0xff) +
          0.114 * (rgb & 0xff)) / 255.0
        x += 1
      }
      y += 1
    }
    (w, h, resizeBox(gray, w, h, Target, Target))
  }

  final val Target = 28 // reference resizes to 28×28 (ml/training.py:210-221)

  /** Box-filter resize: each target pixel is the mean of its source box
    * [⌊tx·w/tw⌋, ⌈(tx+1)·w/tw⌉) × [⌊ty·h/th⌋, ⌈(ty+1)·h/th⌉). */
  private[ops] def resizeBox(src: Array[Double], w: Int, h: Int,
                             tw: Int, th: Int): Array[Double] = {
    val out = new Array[Double](tw * th)
    var ty = 0
    while (ty < th) {
      val y0 = ty * h / th
      val y1 = math.max(((ty + 1) * h + th - 1) / th, y0 + 1)
      var tx = 0
      while (tx < tw) {
        val x0 = tx * w / tw
        val x1 = math.max(((tx + 1) * w + tw - 1) / tw, x0 + 1)
        var s = 0.0
        var y = y0
        while (y < y1) {
          var x = x0
          while (x < x1) { s += src(y * w + x); x += 1 }
          y += 1
        }
        out(ty * tw + tx) = s / ((y1 - y0) * (x1 - x0))
        tx += 1
      }
      ty += 1
    }
    out
  }

  /** 8 horizontal-band means over the 28×28 grayscale (band b = rows
    * ⌊b·28/8⌋ until ⌊(b+1)·28/8⌋). */
  private[ops] def bandMeans(gray28: Array[Double], bands: Int = 8): Array[Double] =
    Array.tabulate(bands) { b =>
      val r0 = b * Target / bands
      val r1 = (b + 1) * Target / bands
      var s = 0.0
      var i = r0 * Target
      while (i < r1 * Target) { s += gray28(i); i += 1 }
      s / ((r1 - r0) * Target)
    }

  /** Decode + feature-extract a PNG corpus, batched per partition (codec
    * state amortized per task). Narrow, shuffle-free, scales linearly. */
  def decodeImageFeatures(images: Dataset[ImageRow]): Dataset[ImageFeatures] = {
    import images.sparkSession.implicits._
    images.mapPartitions { rows =>
      // ImageIO plugin discovery happens once per JVM; disk caching off so
      // decode stays in-memory on executors without scratch-dir access
      javax.imageio.ImageIO.setUseCache(false)
      rows.map { r =>
        val (w, h, gray28) = decodeImage(r.payload)
        ImageFeatures(r.media_ref, w, h, bandMeans(gray28).toSeq)
      }
    }
  }

  /** Planted near-dup truth: every `dupEvery`-th image gains a twin
    * re-encoded after ±1-level noise on ~0.5 % of pixels (deterministic
    * per-ref stream) — byte-different PNG, visually identical, so its
    * aHash sits within a couple of Hamming bits of the original. Twin ref
    * = original ref + "-dup" (sorts adjacent for stable pair output). */
  def withPerturbedCopies(images: Dataset[ImageRow],
                          dupEvery: Int = 10): Dataset[ImageRow] = {
    import images.sparkSession.implicits._
    require(dupEvery >= 1, s"withPerturbedCopies: dupEvery must be >= 1, got $dupEvery")
    val dups = images.mapPartitions { rows =>
      javax.imageio.ImageIO.setUseCache(false)
      rows.flatMap { r =>
        val keep = (scala.util.hashing.MurmurHash3.stringHash(r.media_ref)
          % dupEvery + dupEvery) % dupEvery == 0
        if (!keep) None
        else {
          val img = javax.imageio.ImageIO.read(
            new java.io.ByteArrayInputStream(r.payload))
          val rng = new graft.stats.StatMath.SplitMix64(
            scala.util.hashing.MurmurHash3.stringHash(r.media_ref).toLong * 0x6C8E9CF570932BD5L + 3L)
          val n = math.max(1, img.getWidth * img.getHeight / 200)
          var k = 0
          while (k < n) {
            val x = (Math.floorMod(rng.nextLong(), img.getWidth.toLong)).toInt
            val y = (Math.floorMod(rng.nextLong(), img.getHeight.toLong)).toInt
            val rgb = img.getRGB(x, y)
            val d = if ((rng.nextLong() & 1L) == 0L) 1 else -1
            def ch(v: Int) = math.min(255, math.max(0, v + d))
            img.setRGB(x, y, (ch((rgb >> 16) & 0xff) << 16) |
              (ch((rgb >> 8) & 0xff) << 8) | ch(rgb & 0xff))
            k += 1
          }
          val bos = new java.io.ByteArrayOutputStream()
          javax.imageio.ImageIO.write(img, "png", bos)
          Some(ImageRow(r.media_ref + "-dup", bos.toByteArray))
        }
      }
    }
    images.unionByName(dups)
  }

  /** 64-bit average-hash (aHash) of a decoded 28×28 luminance grid: box
    * resize to 8×8, bit i set iff cell i's mean EXCEEDS the 64-cell mean
    * (strict >, so a uniform image hashes to 0L — the hand-checkable
    * anchor). The standard perceptual fingerprint: stable under
    * re-encoding, small crops, and mild noise, so near-identical images
    * land within a few Hamming bits. */
  def aHash64(gray28: Array[Double]): Long = {
    require(gray28.length == Target * Target,
      s"aHash64: expected ${Target * Target} luminance cells, got ${gray28.length}")
    val g8 = resizeBox(gray28, Target, Target, 8, 8)
    val mean = g8.sum / 64.0
    var h = 0L
    var i = 0
    while (i < 64) {
      if (g8(i) > mean) h |= (1L << i)
      i += 1
    }
    h
  }

  case class ImageHash(media_ref: String, ahash: Long)

  /** Decode + perceptual-hash a PNG corpus — the same batched, narrow,
    * shuffle-free scan shape as [[decodeImageFeatures]]. */
  def imageHashes(images: Dataset[ImageRow]): Dataset[ImageHash] = {
    import images.sparkSession.implicits._
    images.mapPartitions { rows =>
      javax.imageio.ImageIO.setUseCache(false)
      rows.map { r =>
        val (_, _, gray28) = decodeImage(r.payload)
        ImageHash(r.media_ref, aHash64(gray28))
      }
    }
  }

  /** Perceptual near-duplicate image pairs: real decode → [[aHash64]] →
    * the Hamming-chunk pigeonhole candidate join shared with text SimHash
    * ([[Dedup.hammingPairs64]]) → exact Hamming verify. Default
    * maxHamming=3 / chunks=4 (16-bit keys): recall GUARANTEED to radius 3
    * — where noise-twin aHashes live (spec + 1M-probe-asserted) — with
    * expected candidates ≈ 4n²/2¹⁶. chunks=8 extends the guarantee to
    * radius 7 but its 8-bit keys make candidates ≈ n²/32 — QUADRATIC by
    * 10⁶ rows (the first 1M-image probe run filled the disk proving it);
    * only sensible on small corpora. One narrow decode scan + one slim
    * (id, sim, chunk) self-join — no image bytes ever shuffle. */
  def imageNearDupPairs(images: Dataset[ImageRow], maxHamming: Int = 3,
                        chunks: Int = 4): DataFrame =
    Dedup.hammingPairs64(
      imageHashes(images).toDF()
        .select(col("media_ref").as("id"), col("ahash").as("sim")),
      maxHamming, chunks)

  /** Byte-stride subsampling over opaque payloads: keeps every `stride`-th
    * byte as a 1-byte "frame" — the codec-agnostic plumbing shape for video
    * frame-sampling (schema, slicing, array output). A codec-aware variant
    * would seek keyframes instead of fixed strides; no video codec ships in
    * this environment, so the stride sampler is the honest general form. */
  def frameSample(media: Dataset[MediaRow], stride: Int): DataFrame = {
    media.toDF().select(col("media_ref"),
      transform(sequence(lit(0), ((length(col("payload")) - 1) / stride).cast("int")),
        k => col("payload").substr((k * stride + 1).cast("int"), lit(1)))
        .as("sampled_frames"))
  }
}
