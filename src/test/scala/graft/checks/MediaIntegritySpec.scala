package graft.checks

import org.scalatest.funsuite.AnyFunSuite

import graft.ops.{Audio, Video}

/** Payload decode-verify constraint: the reason-classification ladder per
  * kind (truncated → bad_magic → undecodable → clean), planted-corruption
  * recovery over the distributed probe, and the one-scan report. */
class MediaIntegritySpec extends AnyFunSuite {
  lazy val spark = graft.SparkTestBase.spark
  import spark.implicits._

  private def png(w: Int = 4, h: Int = 4): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    bos.toByteArray
  }
  private def wav(): Array[Byte] =
    Audio.encodeWavPcm16(Array.tabulate(100)(i => (i * 100).toShort), 8000)
  private def gvid(): Array[Byte] =
    Video.encodeRawVideo(Array(new Array[Byte](48)), 4, 4, 8)

  test("classification ladder per kind: clean, truncated, bad_magic, undecodable") {
    for ((kind, good) <- Seq(("image", png()), ("audio", wav()), ("video", gvid()))) {
      assert(MediaIntegrity.probeReason(kind, good).isEmpty, kind)
      assert(MediaIntegrity.probeReason(kind, good.take(4)) == Some("truncated"), kind)
      val badMagic = good.clone(); badMagic(0) = 'X'.toByte
      assert(MediaIntegrity.probeReason(kind, badMagic) == Some("bad_magic"), kind)
    }
    // signature intact, body broken → undecodable
    val brokenPng = png(); java.util.Arrays.fill(brokenPng, 8,
      brokenPng.length, 0.toByte)
    assert(MediaIntegrity.probeReason("image", brokenPng) == Some("undecodable"))
    val lyingWav = wav().take(30) // RIFF/WAVE magic intact, chunks truncated
    assert(MediaIntegrity.probeReason("audio", lyingWav) == Some("undecodable"))
    val lyingVid = gvid().dropRight(1) // GVID magic intact, length mismatch
    assert(MediaIntegrity.probeReason("video", lyingVid) == Some("undecodable"))
    // a kind the prober does not know is itself a violation, not a pass
    assert(MediaIntegrity.probeReason("hologram", png())
      == Some("unknown_kind:hologram"))
  }

  test("kind mismatch is caught: a WAV labeled image, a PNG labeled video") {
    assert(MediaIntegrity.probeReason("image", wav()) == Some("bad_magic"))
    assert(MediaIntegrity.probeReason("video", png()) == Some("bad_magic"))
    assert(MediaIntegrity.probeReason("audio", gvid()) == Some("bad_magic"))
  }

  test("planted corruption found exactly: every 97th ref, reason truncated") {
    val media = MediaIntegrity.syntheticPayloadMedia(spark, 300, corruptEvery = 97)
    val v = MediaIntegrity.violations(media).collect()
      .map(r => (r.getString(0), r.getString(2))).sorted
    assert(v.toSeq == Seq(("m-00000000", "truncated"), ("m-00000097", "truncated"),
      ("m-00000194", "truncated"), ("m-00000291", "truncated")))
    // a clean corpus yields zero violations — every generator emits a
    // payload its own kind's parser accepts
    assert(MediaIntegrity.violations(
      MediaIntegrity.syntheticPayloadMedia(spark, 90, corruptEvery = 0)).isEmpty)
  }

  test("report: per-kind totals and bad counts in one scan") {
    val rows = MediaIntegrity.report(
        MediaIntegrity.syntheticPayloadMedia(spark, 300, corruptEvery = 97))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(rows("image") == (100L, 2L)) // ids 0, 194 ≡ 0 mod 3? 0%3=0, 194%3=2
    assert(rows.values.map(_._1).sum == 300L)
    assert(rows.values.map(_._2).sum == 4L)
  }
}
