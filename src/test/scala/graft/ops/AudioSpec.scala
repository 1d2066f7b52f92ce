package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Real audio leg: WAV container round-trip, hand-valued feature math,
  * loud failure on malformed payloads, planted near-dup recovery, and the
  * frame-window composition. */
class AudioSpec extends AnyFunSuite {
  lazy val spark = graft.SparkTestBase.spark
  import spark.implicits._

  test("WAV round-trip: encode → parse → decode reproduces samples exactly") {
    val samples = Array.tabulate(4321)(i =>
      (math.sin(2 * math.Pi * 440.0 * i / 8000.0) * 20000).toShort)
    val wav = Audio.encodeWavPcm16(samples, 8000)
    assert(wav.length == 44 + samples.length * 2)
    // canonical header fields land where RIFF says they do
    assert(new String(wav, 0, 4, "US-ASCII") == "RIFF")
    assert(new String(wav, 8, 4, "US-ASCII") == "WAVE")
    val (info, back) = Audio.decodeWavPcm16(wav)
    assert(info.sampleRate == 8000 && info.channels == 1 && info.bitsPerSample == 16)
    assert(info.dataOffset == 44 && info.dataBytes == samples.length * 2)
    assert(back.toSeq == samples.toSeq)
  }

  test("chunk walk: parser skips unknown chunks (with RIFF even-padding) before data") {
    val samples = Array.tabulate(100)(i => (i * 7).toShort)
    val base = Audio.encodeWavPcm16(samples, 8000)
    // splice an unknown odd-sized 'LIST' chunk between 'fmt ' and 'data'
    val junk = Array[Byte]('L', 'I', 'S', 'T', 5, 0, 0, 0, 1, 2, 3, 4, 5, 0) // 5B + pad
    val spliced = base.slice(0, 36) ++ junk ++ base.slice(36, base.length)
    // fix the RIFF size field (not verified by the walk, but keep it honest)
    val (info, back) = Audio.decodeWavPcm16(spliced)
    assert(info.sampleRate == 8000 && back.toSeq == samples.toSeq)
  }

  test("feature math: hand values for silence, alternating, and half-scale square") {
    val silence = Array.fill(1000)(0.toShort)
    assert(Audio.rms(silence) == 0.0 && Audio.zcr(silence) == 0.0)
    assert(Audio.energyHash64(silence) == 0L) // strict > means silence hashes to 0

    // full-scale alternating signal: every adjacent pair crosses zero
    val alt = Array.tabulate(1000)(i => if (i % 2 == 0) 16384 else -16384).map(_.toShort)
    assert(math.abs(Audio.zcr(alt) - 1.0) < 1e-12)
    assert(math.abs(Audio.rms(alt) - 0.5) < 1e-12) // |16384|/32768 = 0.5 throughout

    // square wave, period 10 over 1000 samples: one crossing per 5-sample
    // block boundary — boundaries at 5, 10, …, 995 → 199 crossings
    val sq = Array.tabulate(1000)(i => if ((i / 5) % 2 == 0) 16384 else -16384).map(_.toShort)
    assert(math.abs(Audio.zcr(sq) - 199.0 / 999.0) < 1e-12)

    // band RMS: first half silent, second half half-scale → bands 0-3 read 0,
    // bands 4-7 read 0.5
    val halves = (Array.fill(500)(0.toShort) ++ Array.fill(500)(16384.toShort))
    val bands = Audio.bandRms(halves)
    assert(bands.take(4).forall(_ == 0.0) && bands.drop(4).forall(b => math.abs(b - 0.5) < 1e-12))
    // energy hash: exactly the loud half's 32 boxes set
    val h = Audio.energyHash64(halves)
    assert(java.lang.Long.bitCount(h) == 32 && (h >>> 32) == 0xFFFFFFFFL)
  }

  test("malformed payloads fail loud: truncation, bad magic, non-PCM, stereo") {
    val good = Audio.encodeWavPcm16(Array.tabulate(64)(_.toShort), 8000)
    def msg(bytes: Array[Byte]): String =
      intercept[IllegalArgumentException](Audio.parseWavHeader(bytes)).getMessage
    assert(msg(good.take(8)).contains("truncated"))
    assert(msg("JUNK".getBytes ++ good.drop(4)).contains("RIFF"))
    assert(msg(good.take(20)).contains("overruns") || msg(good.take(20)).contains("ran out"))
    val nonPcm = good.clone; nonPcm(20) = 3 // audioFormat = IEEE float
    assert(msg(nonPcm).contains("encoding"))
    val stereo = good.clone; stereo(22) = 2
    assert(msg(stereo).contains("channel"))
  }

  test("synthetic corpus: distributed decode features are sane and deterministic") {
    val clips = Audio.syntheticWavs(spark, 60)
    val f = Audio.audioFeatures(clips).collect().sortBy(_.media_ref)
    assert(f.length == 60)
    assert(f.forall(_.sample_rate == 8000))
    assert(f.forall(x => x.n_samples >= 2000 && x.n_samples < 4000))
    assert(f.forall(x => x.dur_ms == x.n_samples.toLong * 1000 / 8000))
    // tone mixes are loud (rms well above dither floor) and oscillating
    assert(f.forall(x => x.rms_q > 100000L && x.zcr_q > 10000L))
    assert(f.forall(_.band_rms.length == 8))
    // determinism: a second run reproduces byte-identical features
    val f2 = Audio.audioFeatures(Audio.syntheticWavs(spark, 60))
      .collect().sortBy(_.media_ref)
    assert(f.toSeq == f2.toSeq)
  }

  test("planted ±1-LSB twins: energy hash within 3 bits; near-dup join finds all, only them") {
    val clips = Audio.syntheticWavs(spark, 50)
    val withDups = Audio.withPerturbedCopies(clips, dupEvery = 5)
    val planted = withDups.collect().map(_.media_ref).filter(_.endsWith("-dup")).toSet
    assert(planted.nonEmpty)
    val pairs = Audio.audioNearDupPairs(withDups, maxHamming = 3, chunks = 4)
      .select($"id_a", $"id_b").as[(String, String)].collect()
    // every planted twin pairs with its original
    planted.foreach { d =>
      val orig = d.stripSuffix("-dup")
      assert(pairs.exists(p => Set(p._1, p._2) == Set(orig, d)), s"missing pair for $d")
    }
    // no cross-clip pair (different tone mixes have distant energy profiles)
    pairs.foreach { case (a, b) =>
      assert(a.stripSuffix("-dup") == b.stripSuffix("-dup"), s"false pair $a / $b")
    }
  }

  test("windowed frame features compose: every-k stride, offset, partial window dropped") {
    val clips = Audio.syntheticWavs(spark, 10)
    val w = Audio.audioWindowFeatures(clips, windowSamples = 512, everyK = 2, offsetWin = 1)
      .collect()
    val byRef = w.groupBy(_.getString(0))
    val lens = Audio.audioFeatures(clips).collect().map(f => f.media_ref -> f.n_samples).toMap
    byRef.foreach { case (ref, rows) =>
      val nWin = lens(ref) / 512
      val wantIdx = (1 until nWin by 2).toSet
      assert(rows.map(_.getInt(1)).toSet == wantIdx, s"$ref window indices")
      assert(rows.forall(_.getInt(2) == nWin))
    }
    // per-window values agree with a driver-side replay on one clip
    val one = clips.filter($"media_ref" === "wav-00000003").collect().head
    val (_, samples) = Audio.decodeWavPcm16(one.payload)
    val win1 = java.util.Arrays.copyOfRange(samples, 512, 1024)
    val row = w.filter(r => r.getString(0) == "wav-00000003" && r.getInt(1) == 1).head
    assert(row.getLong(3) == math.floor(Audio.rms(win1) * 1e6 + 0.5).toLong)
    assert(row.getLong(4) == math.floor(Audio.zcr(win1) * 1e6 + 0.5).toLong)
  }

  test("cohort knobs: gain scales amplitude, idOffset draws disjoint clips") {
    val base = Audio.syntheticWavs(spark, 5).collect().sortBy(_.media_ref)
    val louder = Audio.syntheticWavs(spark, 5, gain = 1.25).collect().sortBy(_.media_ref)
    val offset = Audio.syntheticWavs(spark, 5, idOffset = 1000).collect()
    // same refs, ~1.25× RMS (dither is additive noise, so approximate)
    assert(base.map(_.media_ref).toSeq == louder.map(_.media_ref).toSeq)
    base.zip(louder).foreach { case (a, b) =>
      val ra = Audio.rms(Audio.decodeWavPcm16(a.payload)._2)
      val rb = Audio.rms(Audio.decodeWavPcm16(b.payload)._2)
      assert(math.abs(rb / ra - 1.25) < 0.01, s"${a.media_ref}: $rb / $ra")
    }
    // offset cohort: disjoint refs, default gain unchanged for id ≡ id' mod cycle
    assert(offset.map(_.media_ref).toSet.intersect(base.map(_.media_ref).toSet).isEmpty)
    assert(offset.forall(_.media_ref >= "wav-00001000"))
    // defaults reproduce the original generator exactly (no spec drift)
    val again = Audio.syntheticWavs(spark, 5).collect().sortBy(_.media_ref)
    base.zip(again).foreach { case (a, b) =>
      assert(java.util.Arrays.equals(a.payload, b.payload)) }
  }

  test("audio_drift verdicts: gain-shift drifts on every band, same-dist cohort on none") {
    val rows = OpsQueries.audioDrift(spark, "unused").collect()
    assert(rows.length == 16) // 2 scenarios × 8 bands
    val (shift, same) = rows.partition(_.getString(0) == "shift")
    assert(shift.length == 8 && same.length == 8)
    assert(shift.forall(_.getBoolean(3)),
      s"shift PSIs: ${shift.map(_.getDouble(2)).mkString(",")}")
    assert(same.forall(!_.getBoolean(3)),
      s"same PSIs: ${same.map(_.getDouble(2)).mkString(",")}")
    // the 'same' cohort is a DIFFERENT draw (disjoint ids), so PSI is small
    // but need not be exactly 0; the shift must be decisively larger
    assert(shift.map(_.getDouble(2)).min > 4 * same.map(_.getDouble(2)).max)
  }
}
