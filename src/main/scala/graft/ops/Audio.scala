package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Real audio leg of the multimodal posture (the analog of
  * [[Multimodal.decodeImageFeatures]]'s PNG path): RIFF/WAVE PCM16 payloads
  * are REAL encoded audio — hand-rolled canonical 44-byte header writer and
  * a chunk-walking parser (no codec jar; WAV is a container + raw PCM, so a
  * header parse IS the decode) — and the feature extractor computes the
  * standard first-pass audio descriptors a training-data pipeline gates on:
  * RMS energy, zero-crossing rate, fixed-window band energies, and a 64-bit
  * energy-profile hash feeding the SAME Hamming near-dup machinery as text
  * SimHash and image aHash ([[Dedup.hammingPairs64]]).
  *
  * Scale shape: synthesis, decode, and feature extraction are all
  * mapPartitions over the payload column — narrow, shuffle-free, codec
  * state amortized per task; the near-dup join moves only slim
  * (id, hash, chunk) rows, never audio bytes. Reference tie: the reference
  * treats media as tensors fed to its encoder (ml/training.py:210-221);
  * the engine's contract is the same decode → fixed-size feature vector →
  * downstream drift/dedup, with WAV as the honestly-decodable modality in
  * this environment (PNG covers images; video stays opaque-payload). */
object Audio {

  case class AudioClip(media_ref: String, payload: Array[Byte])
  case class WavInfo(sampleRate: Int, channels: Int, bitsPerSample: Int,
                     dataOffset: Int, dataBytes: Int)
  case class AudioFeatures(media_ref: String, sample_rate: Int,
                           n_samples: Int, dur_ms: Long, rms_q: Long,
                           zcr_q: Long, ehash: Long, band_rms: Seq[Double])

  // ===== WAV container =====

  /** Canonical 44-byte PCM16 mono WAV around raw samples (little-endian
    * throughout, as RIFF mandates). */
  def encodeWavPcm16(samples: Array[Short], sampleRate: Int): Array[Byte] = {
    require(sampleRate > 0, s"encodeWav: sampleRate must be > 0, got $sampleRate")
    val dataBytes = samples.length * 2
    val bb = java.nio.ByteBuffer.allocate(44 + dataBytes)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put("RIFF".getBytes("US-ASCII")).putInt(36 + dataBytes)
      .put("WAVE".getBytes("US-ASCII"))
      .put("fmt ".getBytes("US-ASCII")).putInt(16)
      .putShort(1) // PCM
      .putShort(1) // mono
      .putInt(sampleRate)
      .putInt(sampleRate * 2) // byte rate
      .putShort(2) // block align
      .putShort(16) // bits per sample
      .put("data".getBytes("US-ASCII")).putInt(dataBytes)
    samples.foreach(bb.putShort)
    bb.array()
  }

  /** Chunk-walking RIFF/WAVE header parse: validates the RIFF/WAVE magic,
    * walks chunks (skipping unknown ones with RIFF's even-byte padding)
    * until both `fmt ` and `data` are seen. Fails loud on truncation,
    * non-PCM encodings, and anything but 16-bit mono — the supported
    * contract is explicit, not silently wrong. */
  def parseWavHeader(payload: Array[Byte]): WavInfo = {
    def fail(msg: String) = throw new IllegalArgumentException(s"wav: $msg")
    val bb = java.nio.ByteBuffer.wrap(payload)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    def ascii(n: Int): String = {
      val b = new Array[Byte](n); bb.get(b); new String(b, "US-ASCII")
    }
    if (payload.length < 12) fail(s"truncated header (${payload.length} B)")
    if (ascii(4) != "RIFF") fail("missing RIFF magic")
    bb.getInt // riff size (trust the chunk walk, not this)
    if (ascii(4) != "WAVE") fail("missing WAVE form type")
    var fmt: Option[(Int, Int, Int)] = None // (channels, rate, bits)
    var data: Option[(Int, Int)] = None // (offset, bytes)
    while (data.isEmpty || fmt.isEmpty) {
      if (bb.remaining() < 8)
        fail(s"ran out of chunks (fmt=${fmt.isDefined}, data=${data.isDefined})")
      val id = ascii(4)
      val size = bb.getInt
      if (size < 0 || size > bb.remaining()) fail(s"chunk '$id' overruns payload")
      id match {
        case "fmt " =>
          if (size < 16) fail(s"fmt chunk too small ($size B)")
          val p0 = bb.position()
          val audioFormat = bb.getShort.toInt
          val channels = bb.getShort.toInt
          val rate = bb.getInt
          bb.getInt; bb.getShort // byte rate, block align
          val bits = bb.getShort.toInt
          if (audioFormat != 1) fail(s"unsupported encoding $audioFormat (PCM=1 only)")
          fmt = Some((channels, rate, bits))
          bb.position(p0 + size + (size & 1))
        case "data" =>
          data = Some((bb.position(), size))
          bb.position(bb.position() + size + (size & 1))
        case _ =>
          bb.position(bb.position() + size + (size & 1)) // RIFF pads to even
      }
    }
    val (channels, rate, bits) = fmt.get
    if (bits != 16) fail(s"unsupported sample width $bits (PCM16 only)")
    if (channels != 1) fail(s"unsupported channel count $channels (mono only)")
    val (off, bytes) = data.get
    WavInfo(rate, channels, bits, off, bytes)
  }

  /** Full decode: header parse + the PCM16 sample array. */
  def decodeWavPcm16(payload: Array[Byte]): (WavInfo, Array[Short]) = {
    val info = parseWavHeader(payload)
    val n = info.dataBytes / 2
    val out = new Array[Short](n)
    val bb = java.nio.ByteBuffer.wrap(payload, info.dataOffset, info.dataBytes)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    var i = 0
    while (i < n) { out(i) = bb.getShort; i += 1 }
    (info, out)
  }

  // ===== feature math (normalized to [-1, 1] full scale) =====

  /** Root-mean-square amplitude over full-scale-normalized samples. */
  def rms(samples: Array[Short]): Double = {
    if (samples.isEmpty) return 0.0
    var s = 0.0
    var i = 0
    while (i < samples.length) {
      val v = samples(i) / 32768.0
      s += v * v
      i += 1
    }
    math.sqrt(s / samples.length)
  }

  /** Zero-crossing rate: sign changes per adjacent-sample pair (zeros carry
    * the previous sign, the usual convention). 0 for < 2 samples. */
  def zcr(samples: Array[Short]): Double = {
    if (samples.length < 2) return 0.0
    var crossings = 0
    var prev = Integer.signum(samples(0).toInt)
    var i = 1
    while (i < samples.length) {
      val s = Integer.signum(samples(i).toInt)
      if (s != 0 && prev != 0 && s != prev) crossings += 1
      if (s != 0) prev = s
      i += 1
    }
    crossings.toDouble / (samples.length - 1)
  }

  /** RMS per `bands` equal sample-boxes (box b = samples
    * [⌊b·n/B⌋, ⌊(b+1)·n/B⌋)) — the audio analog of
    * [[Multimodal.bandMeans]]'s horizontal bands. Empty boxes (n < B)
    * read 0. */
  def bandRms(samples: Array[Short], bands: Int = 8): Array[Double] =
    Array.tabulate(bands) { b =>
      val i0 = (b.toLong * samples.length / bands).toInt
      val i1 = ((b + 1).toLong * samples.length / bands).toInt
      if (i1 <= i0) 0.0
      else {
        var s = 0.0
        var i = i0
        while (i < i1) { val v = samples(i) / 32768.0; s += v * v; i += 1 }
        math.sqrt(s / (i1 - i0))
      }
    }

  /** 64-bit energy-profile hash: RMS over 64 equal sample-boxes, bit b set
    * iff box b's RMS EXCEEDS the 64-box mean (strict >, so silence hashes
    * to 0L — the hand-checkable anchor, mirroring [[Multimodal.aHash64]]).
    * Stable under sample-level dither (±1 LSB moves a box RMS by ~1/32768)
    * so near-identical clips land within a few Hamming bits — the
    * perceptual fingerprint feeding [[Dedup.hammingPairs64]]. */
  def energyHash64(samples: Array[Short]): Long = {
    val boxes = bandRms(samples, 64)
    val mean = boxes.sum / 64.0
    var h = 0L
    var i = 0
    while (i < 64) {
      if (boxes(i) > mean) h |= (1L << i)
      i += 1
    }
    h
  }

  // ===== distributed surfaces =====

  /** Deterministic synthetic WAV corpus — REAL encoded PCM16 payloads, no
    * external data: per-id tone mixes (two sines at id-derived frequencies)
    * with SplitMix64 dither, varying duration, all synthesized inside
    * mapPartitions like [[Multimodal.syntheticImages]]. `gain` scales every
    * clip's amplitude (the drift-cohort knob: a production capture chain
    * whose level shifted); `idOffset` shifts the id space so two cohorts
    * are disjoint clips drawn from the SAME distribution. */
  def syntheticWavs(spark: SparkSession, count: Long,
                    sampleRate: Int = 8000, gain: Double = 1.0,
                    idOffset: Long = 0L): Dataset[AudioClip] = {
    import spark.implicits._
    spark.range(count).as[Long].mapPartitions { ids =>
      ids.map { raw =>
        val id = raw + idOffset
        val n = 2000 + (id % 2000).toInt
        val f1 = 150.0 + (id % 37) * 20.0
        val f2 = 400.0 + (id % 23) * 35.0
        val amp = (0.35 + (id % 5) * 0.1) * gain
        val rng = new graft.stats.StatMath.SplitMix64(id * 0x9E3779B97F4A7C15L + 11L)
        val samples = new Array[Short](n)
        var i = 0
        while (i < n) {
          val t = i.toDouble / sampleRate
          val dither = ((rng.nextLong() & 0xff) - 127.5) / (127.5 * 256.0)
          val v = amp * (0.7 * math.sin(2 * math.Pi * f1 * t) +
            0.3 * math.sin(2 * math.Pi * f2 * t)) + dither
          samples(i) = math.max(-32768.0, math.min(32767.0,
            math.rint(v * 32767.0))).toShort
          i += 1
        }
        AudioClip(f"wav-$id%08d", encodeWavPcm16(samples, sampleRate))
      }
    }
  }

  /** Decode + feature-extract a WAV corpus — narrow, shuffle-free,
    * per-partition batches (the [[Multimodal.decodeImageFeatures]] shape).
    * `rms_q`/`zcr_q` are the features quantized to 1e-6 grain as exact
    * longs (the display/compare form; `band_rms` carries the raw doubles
    * for downstream cosine machinery). */
  def audioFeatures(clips: Dataset[AudioClip]): Dataset[AudioFeatures] = {
    import clips.sparkSession.implicits._
    clips.mapPartitions { rows =>
      rows.map { c =>
        val (info, samples) = decodeWavPcm16(c.payload)
        AudioFeatures(c.media_ref, info.sampleRate, samples.length,
          samples.length.toLong * 1000L / info.sampleRate,
          math.floor(rms(samples) * 1e6 + 0.5).toLong,
          math.floor(zcr(samples) * 1e6 + 0.5).toLong,
          energyHash64(samples), bandRms(samples).toSeq)
      }
    }
  }

  /** Fixed-window frame features — the frame-sampling composition over the
    * DECODED stream: every `everyK`-th window of `windowSamples` samples
    * (from `offsetWin`) emits (media_ref, win_idx, n_win, rms_q, zcr_q).
    * The decoded analog of [[Multimodal.frameSample]]'s opaque byte
    * slicing: same fixed-frame/stride semantics, but the frames are real
    * samples so the per-frame features are meaningful. Trailing partial
    * windows drop, like any fixed-frame reader. */
  def audioWindowFeatures(clips: Dataset[AudioClip], windowSamples: Int,
                          everyK: Int = 1, offsetWin: Int = 0): DataFrame = {
    require(windowSamples > 0,
      s"audioWindowFeatures: windowSamples must be > 0, got $windowSamples")
    require(everyK > 0, s"audioWindowFeatures: everyK must be > 0, got $everyK")
    require(offsetWin >= 0, s"audioWindowFeatures: offset must be >= 0, got $offsetWin")
    import clips.sparkSession.implicits._
    clips.mapPartitions { rows =>
      rows.flatMap { c =>
        val (_, samples) = decodeWavPcm16(c.payload)
        val nWin = samples.length / windowSamples
        (offsetWin until nWin by everyK).iterator.map { w =>
          val win = java.util.Arrays.copyOfRange(
            samples, w * windowSamples, (w + 1) * windowSamples)
          (c.media_ref, w, nWin,
            math.floor(rms(win) * 1e6 + 0.5).toLong,
            math.floor(zcr(win) * 1e6 + 0.5).toLong)
        }
      }
    }.toDF("media_ref", "win_idx", "n_win", "rms_q", "zcr_q")
  }

  /** Planted near-dup truth (the [[Multimodal.withPerturbedCopies]]
    * analog): every `dupEvery`-th clip gains a twin re-encoded after ±1
    * LSB dither on ~1 % of samples — byte-different WAV, perceptually
    * identical, so its energy hash sits within a couple of Hamming bits.
    * Twin ref = original + "-dup". */
  def withPerturbedCopies(clips: Dataset[AudioClip],
                          dupEvery: Int = 10): Dataset[AudioClip] = {
    require(dupEvery >= 1, s"withPerturbedCopies: dupEvery must be >= 1, got $dupEvery")
    import clips.sparkSession.implicits._
    val dups = clips.mapPartitions { rows =>
      rows.flatMap { c =>
        val keep = (scala.util.hashing.MurmurHash3.stringHash(c.media_ref)
          % dupEvery + dupEvery) % dupEvery == 0
        if (!keep) None
        else {
          val (info, samples) = decodeWavPcm16(c.payload)
          val rng = new graft.stats.StatMath.SplitMix64(
            scala.util.hashing.MurmurHash3.stringHash(c.media_ref).toLong * 0x6C8E9CF570932BD5L + 5L)
          val n = math.max(1, samples.length / 100)
          var k = 0
          while (k < n) {
            val i = Math.floorMod(rng.nextLong(), samples.length.toLong).toInt
            val d = if ((rng.nextLong() & 1L) == 0L) 1 else -1
            samples(i) = math.max(-32768, math.min(32767, samples(i) + d)).toShort
            k += 1
          }
          Some(AudioClip(c.media_ref + "-dup",
            encodeWavPcm16(samples, info.sampleRate)))
        }
      }
    }
    clips.unionByName(dups)
  }

  /** Perceptual near-duplicate audio pairs: real decode → [[energyHash64]]
    * → the Hamming-chunk pigeonhole candidate join shared with text
    * SimHash and image aHash ([[Dedup.hammingPairs64]]) → exact Hamming
    * verify. Slim (id, hash, chunk) rows only — audio bytes never
    * shuffle. */
  def audioNearDupPairs(clips: Dataset[AudioClip], maxHamming: Int = 3,
                        chunks: Int = 4): DataFrame = {
    import clips.sparkSession.implicits._
    Dedup.hammingPairs64(
      clips.mapPartitions { rows =>
        rows.map(c => (c.media_ref, energyHash64(decodeWavPcm16(c.payload)._2)))
      }.toDF("id", "sim"),
      maxHamming, chunks)
  }
}
