package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Real video leg: GVID container round-trip, hand-valued luminance /
  * motion / scene-cut math, loud failure on malformed payloads, planted
  * near-dup recovery, cohort knobs, and the drift-verdict composition. */
class VideoSpec extends AnyFunSuite {
  lazy val spark = graft.SparkTestBase.spark
  import spark.implicits._

  private def gray(v: Int, w: Int = 4, h: Int = 4): Array[Byte] =
    Array.fill(w * h * 3)(v.toByte)

  test("GVID round-trip: encode → parse → decode reproduces frames exactly") {
    val frames = Array.tabulate(6)(t => gray(40 + t * 10))
    val payload = Video.encodeRawVideo(frames, 4, 4, 12)
    assert(payload.length == Video.HeaderBytes + 6 * 48)
    val (info, out) = Video.decodeFrames(payload)
    assert(info == Video.VideoInfo(4, 4, 12, 6))
    frames.zip(out).foreach { case (a, b) =>
      assert(java.util.Arrays.equals(a, b)) }
  }

  test("malformed payloads fail loud: truncation, bad magic, dims, length") {
    val ok = Video.encodeRawVideo(Array(gray(10)), 4, 4, 12)
    intercept[IllegalArgumentException](Video.parseHeader(ok.take(10)))
    val badMagic = ok.clone(); badMagic(0) = 'X'.toByte
    intercept[IllegalArgumentException](Video.parseHeader(badMagic))
    intercept[IllegalArgumentException](Video.parseHeader(ok.dropRight(1)))
    intercept[IllegalArgumentException](
      Video.encodeRawVideo(Array(gray(10)), 5, 4, 12)) // frame size mismatch
    intercept[IllegalArgumentException](
      Video.encodeRawVideo(Array(gray(10)), 4, 4, 0)) // fps
  }

  test("feature math: hand values for constant, step, and cut clips") {
    // constant gray 100: luma mean exactly 100, zero motion, hash 0
    val const = Array.fill(4)(gray(100))
    assert(Video.frameLumaMean(const(0)) == 100.0)
    assert(Video.motionEnergy(const(0), const(1)) == 0.0)
    assert(Video.lumaHash64(const) == 0L)
    assert(Video.sceneCutCount(Video.motionProfileQ(const)) == 0)
    // uniform step of +d on every pixel: motion RMS is exactly d
    assert(Video.motionEnergy(gray(100), gray(140)) == 40.0)
    // a hard cut: one transition over threshold, counted once
    val cutClip = Array(gray(80), gray(80), gray(180), gray(180))
    val mq = Video.motionProfileQ(cutClip)
    assert(mq.toSeq == Seq(0L, 100000L, 0L))
    assert(Video.sceneCutCount(mq) == 1)
    // delta-coded luma hash: only the brightening transition sets a bit
    assert(Video.lumaHash64(cutClip) == (1L << 2))
    // and a descending ramp sets none
    assert(Video.lumaHash64(Array(gray(90), gray(70), gray(50))) == 0L)
    // band means over 8 bands of a 8-frame ramp
    val ramp = Array.tabulate(8)(t => gray(10 + t * 10))
    assert(Video.bandLuma(ramp).toSeq == (0 until 8).map(t => 10.0 + t * 10))
  }

  test("luma uses 299/587/114 integer weights (non-gray pixel)") {
    val f = new Array[Byte](3)
    f(0) = 255.toByte; f(1) = 0; f(2) = 0 // pure red, 1×1 frame
    assert(Video.frameLumaMean(f) == 255 * 299 / 1000.0)
  }

  test("synthetic corpus: distributed decode features are sane and deterministic") {
    val feats = Video.videoFeatures(Video.syntheticVideos(spark, 40)).collect()
    assert(feats.length == 40)
    feats.foreach { f =>
      assert(f.width == 16 && f.height == 16 && f.fps == 12)
      assert(Set(24, 32, 40, 48).contains(f.n_frames))
      assert(f.luma_q > 60000L && f.luma_q < 250000L, s"${f.media_ref}: ${f.luma_q}")
      // planted truth: exactly one hard cut for 3 of 4 clips, none otherwise
      val id = f.media_ref.stripPrefix("vid-").toLong
      assert(f.cut_count == (if (id % 4 != 3) 1 else 0), s"${f.media_ref}")
    }
    // determinism: a second generation is byte-identical
    val again = Video.videoFeatures(Video.syntheticVideos(spark, 40)).collect()
    assert(feats.sortBy(_.media_ref).zip(again.sortBy(_.media_ref))
      .forall { case (a, b) => a == b })
  }

  test("planted ±1-value twins: luma hash within 3 bits; near-dup join finds all, only them") {
    val clips = Video.withPerturbedCopies(Video.syntheticVideos(spark, 60), dupEvery = 5)
    val pairs = Video.videoNearDupPairs(clips).collect()
      .map(r => (r.getString(0), r.getString(1)))
    val dups = clips.filter($"media_ref".endsWith("-dup"))
      .select("media_ref").as[String].collect()
    assert(dups.nonEmpty)
    dups.foreach { d =>
      val orig = d.stripSuffix("-dup")
      assert(pairs.exists(p => Set(p._1, p._2) == Set(orig, d)), s"missing pair for $d")
    }
    pairs.foreach { case (a, b) =>
      assert(a.stripSuffix("-dup") == b.stripSuffix("-dup"), s"false pair $a / $b")
    }
  }

  test("cohort knobs: gain scales luminance, idOffset draws disjoint clips") {
    val base = Video.videoFeatures(Video.syntheticVideos(spark, 10)).collect()
      .sortBy(_.media_ref)
    val brighter = Video.videoFeatures(Video.syntheticVideos(spark, 10, gain = 1.2))
      .collect().sortBy(_.media_ref)
    base.zip(brighter).foreach { case (a, b) =>
      assert(a.media_ref == b.media_ref)
      // gain 1.2 clamps post-cut pixels of the brightest clips at 255 (the
      // honest saturation a real exposure shift suffers), which caps the
      // worst-case mean rise near 1.13× — assert ≥ 1.10 everywhere
      assert(b.luma_q > a.luma_q * 1.10, s"${a.media_ref}: ${b.luma_q} vs ${a.luma_q}")
    }
    val offset = Video.syntheticVideos(spark, 10, idOffset = 1000)
      .select("media_ref").as[String].collect()
    assert(offset.forall(_ >= "vid-00001000"))
  }

  test("video_drift verdicts: gain-shift drifts on every band, same-dist cohort on none") {
    val rows = OpsQueries.videoDrift(spark, "unused").collect()
    assert(rows.length == 16)
    val (shift, same) = rows.partition(_.getString(0) == "shift")
    assert(shift.forall(_.getBoolean(3)),
      s"shift PSIs: ${shift.map(_.getDouble(2)).mkString(",")}")
    assert(same.forall(!_.getBoolean(3)),
      s"same PSIs: ${same.map(_.getDouble(2)).mkString(",")}")
    assert(shift.map(_.getDouble(2)).min > 4 * math.max(0.05, same.map(_.getDouble(2)).max))
  }
}
