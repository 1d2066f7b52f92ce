package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Real video leg — the video analog of [[Audio]]'s WAV path: raw
  * (uncompressed) video is a fixed header + packed RGB frames, so a
  * header parse plus frame slicing IS an honest decode with no codec jar,
  * exactly as a WAV parse is an honest audio decode. The container here
  * ("GVID") is the minimal raw-video interchange shape (the same layout
  * y4m/raw RGB pipes use): magic, dims, fps, frame count, then
  * `nFrames × width × height × 3` RGB bytes row-major.
  *
  * Features are the standard codec-free video signals:
  *  - per-frame mean luminance (ITU-R 601 integer weights 299/587/114),
  *  - motion energy = RMS of the per-pixel luminance delta between
  *    consecutive frames (the shot-boundary statistic),
  *  - scene cuts = transitions whose QUANTIZED motion energy exceeds a
  *    threshold (quantize-then-compare so the engine verdict and a SQL
  *    replay over the quantized longs agree bit-for-bit),
  *  - a 64-bit delta-coded luminance-profile hash (bit t set iff frame t
  *    is brighter than frame t-1 — the temporal analog of
  *    [[Audio.energyHash64]], feeding the SAME Hamming near-dup join as
  *    text SimHash, image aHash, and audio energy hashes),
  *  - 8 time-band mean luminances (the drift features, mirroring
  *    [[Audio.bandRms]]'s sample boxes as frame boxes).
  *
  * All decode/feature work is narrow `mapPartitions` over the payload
  * column — payloads never shuffle; near-dup joins move (id, hash, chunk)
  * rows only. Scale posture identical to the image/audio legs.
  */
object Video {

  case class VideoClip(media_ref: String, payload: Array[Byte])
  case class VideoInfo(width: Int, height: Int, fps: Int, nFrames: Int)
  case class VideoFeatures(media_ref: String, width: Int, height: Int,
                           fps: Int, n_frames: Int, dur_ms: Long,
                           luma_q: Long, motion_q: Long, cut_count: Int,
                           lhash: Long, band_luma: Seq[Double])

  val Magic = "GVID"
  val HeaderBytes = 20
  /** Scene-cut threshold in milli-units of motion RMS: synthetic-pattern
    * motion sits near 4, a hard cut near 64 — 32 splits them decisively. */
  val CutThresholdQ = 32000L

  // ===== container =====

  /** Canonical GVID writer: magic, then width/height/fps/nFrames as
    * big-endian ints, then the frames verbatim. Every frame must be
    * exactly `width*height*3` bytes. */
  def encodeRawVideo(frames: Array[Array[Byte]], width: Int, height: Int,
                     fps: Int): Array[Byte] = {
    require(width > 0 && height > 0, s"gvid: bad dims ${width}x$height")
    require(fps > 0, s"gvid: fps must be > 0, got $fps")
    val fb = width * height * 3
    frames.zipWithIndex.foreach { case (f, i) =>
      require(f.length == fb, s"gvid: frame $i has ${f.length} bytes, want $fb") }
    val total = HeaderBytes.toLong + frames.length.toLong * fb
    require(total <= Int.MaxValue,
      s"gvid: payload would exceed a 2 GiB byte array ($total bytes) — " +
        "split the clip before encoding")
    val buf = java.nio.ByteBuffer.allocate(total.toInt)
    buf.put(Magic.getBytes("US-ASCII"))
    buf.putInt(width).putInt(height).putInt(fps).putInt(frames.length)
    frames.foreach(buf.put)
    buf.array()
  }

  /** Header parse with loud failure on anything malformed — truncation,
    * bad magic, absurd dims, length/frame-count disagreement. */
  def parseHeader(payload: Array[Byte]): VideoInfo = {
    def fail(msg: String) = throw new IllegalArgumentException(s"gvid: $msg")
    if (payload.length < HeaderBytes) fail(s"truncated header (${payload.length} bytes)")
    val buf = java.nio.ByteBuffer.wrap(payload)
    val magic = new Array[Byte](4); buf.get(magic)
    if (new String(magic, "US-ASCII") != Magic)
      fail(s"bad magic '${new String(magic, "US-ASCII")}'")
    val w = buf.getInt; val h = buf.getInt; val fps = buf.getInt; val n = buf.getInt
    if (w <= 0 || w > 4096 || h <= 0 || h > 4096) fail(s"bad dims ${w}x$h")
    if (fps <= 0 || fps > 1000) fail(s"bad fps $fps")
    if (n < 0) fail(s"negative frame count $n")
    val want = HeaderBytes.toLong + n.toLong * w * h * 3
    if (payload.length.toLong != want)
      fail(s"length ${payload.length} != header-implied $want")
    VideoInfo(w, h, fps, n)
  }

  /** Full decode: header + frame slices (no copy-free tricks — frames are
    * small relative to the executor and the slices feed integer math). */
  def decodeFrames(payload: Array[Byte]): (VideoInfo, Array[Array[Byte]]) = {
    val info = parseHeader(payload)
    val fb = info.width * info.height * 3
    val frames = Array.tabulate(info.nFrames) { t =>
      java.util.Arrays.copyOfRange(payload, HeaderBytes + t * fb,
        HeaderBytes + (t + 1) * fb)
    }
    (info, frames)
  }

  // ===== frame math =====

  /** Integer luma sum of one RGB frame (299r + 587g + 114b, /1000 deferred
    * to the caller so the accumulation stays exact in Long). */
  private def lumaSumMilli(frame: Array[Byte]): Long = {
    var s = 0L
    var i = 0
    while (i < frame.length) {
      s += 299L * (frame(i) & 0xff) + 587L * (frame(i + 1) & 0xff) +
        114L * (frame(i + 2) & 0xff)
      i += 3
    }
    s
  }

  /** Mean luminance of one frame in [0, 255]. */
  def frameLumaMean(frame: Array[Byte]): Double =
    if (frame.isEmpty) 0.0
    else lumaSumMilli(frame) / 1000.0 / (frame.length / 3)

  /** Motion energy between two equal-size frames: RMS of the per-pixel
    * luminance delta (the shot-boundary statistic). */
  def motionEnergy(prev: Array[Byte], cur: Array[Byte]): Double = {
    require(prev.length == cur.length,
      s"motion: frame sizes differ (${prev.length} vs ${cur.length})")
    if (prev.isEmpty) return 0.0
    var s = 0.0
    var i = 0
    while (i < prev.length) {
      val d = (299L * ((cur(i) & 0xff) - (prev(i) & 0xff)) +
        587L * ((cur(i + 1) & 0xff) - (prev(i + 1) & 0xff)) +
        114L * ((cur(i + 2) & 0xff) - (prev(i + 2) & 0xff))) / 1000.0
      s += d * d
      i += 3
    }
    math.sqrt(s / (prev.length / 3))
  }

  /** Per-frame mean lumas of a decoded clip. */
  def lumaProfile(frames: Array[Array[Byte]]): Array[Double] =
    frames.map(frameLumaMean)

  /** Per-transition quantized motion energies (length nFrames-1, empty for
    * < 2 frames): `floor(rms·1000 + 0.5)` — the exact longs the scene-cut
    * verdict AND its SQL replay both consume. */
  def motionProfileQ(frames: Array[Array[Byte]]): Array[Long] =
    if (frames.length < 2) Array.empty
    else Array.tabulate(frames.length - 1) { t =>
      math.floor(motionEnergy(frames(t), frames(t + 1)) * 1000 + 0.5).toLong
    }

  /** Scene-cut count from the QUANTIZED motion profile (strict >): the
    * engine verdict is defined in quantized space so a SQL replay over the
    * same longs cannot disagree at a float boundary. */
  def sceneCutCount(motionQ: Array[Long], thresholdQ: Long = CutThresholdQ): Int =
    motionQ.count(_ > thresholdQ)

  /** 64-bit DELTA-CODED luminance-profile hash: bit t set iff frame t's
    * mean luma strictly EXCEEDS frame t-1's (bit 0 always clear; a constant
    * clip hashes to 0L — the hand-checkable anchor shared with
    * [[Audio.energyHash64]] and image aHash). Delta coding, not
    * global-mean thresholding, because a hard scene cut dominates a
    * global mean: every same-length cut clip would share one
    * bits-after-the-cut hash, colliding clips that look nothing alike —
    * the inter-frame CONTRAST sequence is what's clip-unique. Frames past
    * 63 don't contribute. */
  def lumaHash64(frames: Array[Array[Byte]]): Long = {
    if (frames.length < 2) return 0L
    val profile = lumaProfile(frames)
    var h = 0L
    var t = 1
    val n = math.min(profile.length, 64)
    while (t < n) {
      if (profile(t) > profile(t - 1)) h |= (1L << t)
      t += 1
    }
    h
  }

  /** Mean luma per `bands` equal frame-boxes (box b = frames
    * [⌊b·n/B⌋, ⌊(b+1)·n/B⌋)) — the temporal analog of [[Audio.bandRms]];
    * empty boxes (n < B) read 0. */
  def bandLuma(frames: Array[Array[Byte]], bands: Int = 8): Array[Double] =
    Array.tabulate(bands) { b =>
      val i0 = (b.toLong * frames.length / bands).toInt
      val i1 = ((b + 1).toLong * frames.length / bands).toInt
      if (i1 <= i0) 0.0
      else {
        var s = 0.0
        var i = i0
        while (i < i1) { s += frameLumaMean(frames(i)); i += 1 }
        s / (i1 - i0)
      }
    }

  // ===== distributed surfaces =====

  /** Deterministic synthetic raw-video corpus — REAL encoded GVID payloads,
    * no external data: per-id gray gradient patterns that scroll one step
    * per frame (small constant motion), a per-frame id-seeded brightness
    * wobble in {-4,-2,0,2,4} (each clip's luminance PROFILE is a unique
    * deterministic sequence — what makes [[lumaHash64]] distinctive across
    * clips yet stable under ±1-LSB twin dither), a hard +64 brightness cut
    * at the half-way frame for 3 of every 4 clips (the planted shot
    * boundary), and SplitMix64 pixel dither. Frame counts are multiples of
    * 8 so the half-way cut lands exactly on a time-band boundary. Gray
    * frames (r = g = b) make the 299/587/114 luma exactly the pixel value,
    * so every feature is integer-derivable and the drift oracle replays
    * from quantized longs with no float ambiguity. `gain` scales pixel
    * values pre-clamp (the brightness-shift drift cohort — gain 1 never
    * clamps by construction, max value 64+96+15+5+64+1 = 245); `idOffset`
    * draws a disjoint cohort from the same distribution. */
  def syntheticVideos(spark: SparkSession, count: Long, width: Int = 16,
                      height: Int = 16, fps: Int = 12, gain: Double = 1.0,
                      idOffset: Long = 0L): Dataset[VideoClip] = {
    import spark.implicits._
    spark.range(count).as[Long].mapPartitions { ids =>
      ids.map { raw =>
        val id = raw + idOffset
        val n = 24 + (id % 4).toInt * 8 // 24 | 32 | 40 | 48, all ≡ 0 mod 8
        val b0 = 64 + (id % 5).toInt * 24 // 64 … 160
        val hasCut = id % 4 != 3
        val cutAt = n / 2
        val rng = new graft.stats.StatMath.SplitMix64(id * 0x9E3779B97F4A7C15L + 17L)
        val frames = Array.tabulate(n) { t =>
          val wr = new graft.stats.StatMath.SplitMix64(
            id * 0xD1B54A32D192ED03L + t * 0x632BE59BD9B4E019L + 23L)
          // even-valued id-seeded wobble plus an odd-frame +1: consecutive
          // frame-mean deltas are (even ± 1) = always ODD, never zero, so
          // every delta-hash bit carries ≥ 1 luma unit of margin against
          // the ±1-LSB twin dither (~0.01 luma on a frame mean)
          val w = (Math.floorMod(wr.nextLong(), 5L).toInt - 2) * 2 + (t & 1) // -4…5
          val f = new Array[Byte](width * height * 3)
          val cut = if (hasCut && t >= cutAt) 64 else 0
          var p = 0
          var y = 0
          while (y < height) {
            var x = 0
            while (x < width) {
              val d = (Math.floorMod(rng.nextLong(), 3L) - 1L).toInt // -1|0|1
              val v0 = b0 + (x + y + t) % 16 + w + cut + d
              val v = math.max(0L, math.min(255L, math.rint(v0 * gain).toLong)).toByte
              f(p) = v; f(p + 1) = v; f(p + 2) = v
              p += 3; x += 1
            }
            y += 1
          }
          f
        }
        VideoClip(f"vid-$id%08d", encodeRawVideo(frames, width, height, fps))
      }
    }
  }

  /** Decode + feature-extract a GVID corpus — narrow, shuffle-free,
    * per-partition batches (the [[Audio.audioFeatures]] shape). `luma_q` /
    * `motion_q` are clip means quantized to 1e-3 grain as exact longs;
    * `band_luma` carries the raw per-band doubles for the drift path. */
  def videoFeatures(clips: Dataset[VideoClip]): Dataset[VideoFeatures] = {
    import clips.sparkSession.implicits._
    clips.mapPartitions { rows =>
      rows.map { c =>
        val (info, frames) = decodeFrames(c.payload)
        val profile = lumaProfile(frames)
        val motionQ = motionProfileQ(frames)
        val meanLuma = if (profile.isEmpty) 0.0 else profile.sum / profile.length
        val meanMotion =
          if (motionQ.isEmpty) 0.0 else motionQ.map(_ / 1000.0).sum / motionQ.length
        VideoFeatures(c.media_ref, info.width, info.height, info.fps,
          info.nFrames, info.nFrames.toLong * 1000L / info.fps,
          math.floor(meanLuma * 1000 + 0.5).toLong,
          math.floor(meanMotion * 1000 + 0.5).toLong,
          sceneCutCount(motionQ), lumaHash64(frames), bandLuma(frames).toSeq)
      }
    }
  }

  /** Per-frame features — (media_ref, frame_idx, n_frames, luma_q,
    * motion_q) with `motion_q` the quantized motion of the (t-1 → t)
    * transition (0 at t = 0 by the fixed-frame convention). These exact
    * longs are both the scene-cut oracle input and the decoded-stream
    * analog of [[Multimodal.frameSample]]'s opaque slicing. */
  def videoFrameFeatures(clips: Dataset[VideoClip]): DataFrame = {
    import clips.sparkSession.implicits._
    clips.mapPartitions { rows =>
      rows.flatMap { c =>
        val (info, frames) = decodeFrames(c.payload)
        val motionQ = motionProfileQ(frames)
        (0 until info.nFrames).iterator.map { t =>
          (c.media_ref, t, info.nFrames,
            math.floor(frameLumaMean(frames(t)) * 1000 + 0.5).toLong,
            if (t == 0) 0L else motionQ(t - 1))
        }
      }
    }.toDF("media_ref", "frame_idx", "n_frames", "luma_q", "motion_q")
  }

  /** Planted near-dup truth (the [[Audio.withPerturbedCopies]] analog):
    * every `dupEvery`-th clip gains a twin re-encoded after ±1 pixel-value
    * dither on ~1 % of bytes — byte-different GVID, perceptually identical,
    * so its luma-profile hash sits within a couple of Hamming bits. Twin
    * ref = original + "-dup". */
  def withPerturbedCopies(clips: Dataset[VideoClip],
                          dupEvery: Int = 10): Dataset[VideoClip] = {
    require(dupEvery >= 1, s"withPerturbedCopies: dupEvery must be >= 1, got $dupEvery")
    import clips.sparkSession.implicits._
    val dups = clips.mapPartitions { rows =>
      rows.flatMap { c =>
        val keep = (scala.util.hashing.MurmurHash3.stringHash(c.media_ref)
          % dupEvery + dupEvery) % dupEvery == 0
        if (!keep) None
        else {
          val (info, frames) = decodeFrames(c.payload)
          val rng = new graft.stats.StatMath.SplitMix64(
            scala.util.hashing.MurmurHash3.stringHash(c.media_ref).toLong * 0x6C8E9CF570932BD5L + 7L)
          frames.foreach { f =>
            val n = math.max(1, f.length / 100)
            var k = 0
            while (k < n) {
              val i = Math.floorMod(rng.nextLong(), f.length.toLong).toInt
              val d = if ((rng.nextLong() & 1L) == 0L) 1 else -1
              f(i) = math.max(0, math.min(255, (f(i) & 0xff) + d)).toByte
              k += 1
            }
          }
          Some(VideoClip(c.media_ref + "-dup",
            encodeRawVideo(frames, info.width, info.height, info.fps)))
        }
      }
    }
    clips.unionByName(dups)
  }

  /** Perceptual near-duplicate video pairs: real decode → [[lumaHash64]] →
    * the Hamming-chunk pigeonhole candidate join shared with text SimHash,
    * image aHash, and audio energy hashes ([[Dedup.hammingPairs64]]) →
    * exact Hamming verify. Slim (id, hash, chunk) rows only — video bytes
    * never shuffle. */
  def videoNearDupPairs(clips: Dataset[VideoClip], maxHamming: Int = 2,
                        chunks: Int = 4): DataFrame = {
    import clips.sparkSession.implicits._
    Dedup.hammingPairs64(
      clips.mapPartitions { rows =>
        rows.map(c => (c.media_ref, lumaHash64(decodeFrames(c.payload)._2)))
      }.toDF("id", "sim"),
      maxHamming, chunks)
  }
}
