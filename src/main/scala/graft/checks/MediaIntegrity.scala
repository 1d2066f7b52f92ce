package graft.checks

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

import graft.ops.{Audio, Multimodal, Video}

/** Media INTEGRITY constraint over interleaved documents — the payload
  * analog of the referential check: `ref_media` proves every span's
  * `media_ref` points at a catalog row; this check proves the catalog
  * row's PAYLOAD actually decodes as its declared kind. At 10^12-doc
  * scale a corpus always carries some truncated uploads and mislabeled
  * containers, and a validation pass that only joins ids calls such a
  * table clean while every downstream decode job crashes — payload
  * decode-verify is the constraint that catches it.
  *
  * Shape: one narrow `mapPartitions` decode-probe per payload (the real
  * parsers from the image/audio/video legs — ImageIO PNG,
  * [[Audio.parseWavHeader]], [[Video.parseHeader]]); only slim
  * `(media_ref, media_kind, reason)` violation rows and O(kinds) verdict
  * counts ever leave the scan — payload bytes never shuffle. Reasons are
  * classified by payload INSPECTION (length ladder → magic compare →
  * full parse), not by exception-message matching, so the taxonomy is
  * deterministic across parser versions:
  *  - `truncated`  — too short to even carry the container's header
  *  - `bad_magic`  — header present but the signature is not the kind's
  *  - `undecodable` — signature ok, body does not parse
  */
object MediaIntegrity {

  case class MediaPayloadRow(media_ref: String, media_kind: String,
                             payload: Array[Byte])

  private val PngSignature: Array[Byte] =
    Array(0x89.toByte, 'P'.toByte, 'N'.toByte, 'G'.toByte,
      0x0d.toByte, 0x0a.toByte, 0x1a.toByte, 0x0a.toByte)

  /** None = payload decodes as `kind`; Some(reason) = violation. */
  def probeReason(kind: String, payload: Array[Byte]): Option[String] = kind match {
    case "image" =>
      if (payload.length < PngSignature.length) Some("truncated")
      else if (!PngSignature.indices.forall(i => payload(i) == PngSignature(i)))
        Some("bad_magic")
      else {
        try {
          val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(payload))
          if (img == null || img.getWidth <= 0 || img.getHeight <= 0)
            Some("undecodable")
          else None
        } catch { case _: Exception => Some("undecodable") }
      }
    case "audio" =>
      if (payload.length < 12) Some("truncated")
      else if (new String(payload, 0, 4, "US-ASCII") != "RIFF" ||
        new String(payload, 8, 4, "US-ASCII") != "WAVE") Some("bad_magic")
      else {
        try { Audio.parseWavHeader(payload); None }
        catch { case _: Exception => Some("undecodable") }
      }
    case "video" =>
      if (payload.length < Video.HeaderBytes) Some("truncated")
      else if (new String(payload, 0, 4, "US-ASCII") != Video.Magic)
        Some("bad_magic")
      else {
        try { Video.parseHeader(payload); None }
        catch { case _: Exception => Some("undecodable") }
      }
    case other => Some(s"unknown_kind:$other")
  }

  /** Violation rows only — `(media_ref, media_kind, reason)`. */
  def violations(media: Dataset[MediaPayloadRow]): DataFrame = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      rows.flatMap(m => probeReason(m.media_kind, m.payload)
        .map(r => (m.media_ref, m.media_kind, r)))
    }.toDF("media_ref", "media_kind", "reason")
  }

  /** Per-kind verdict counts in ONE probe scan — `(media_kind, n, n_bad)`,
    * map-side combined, O(kinds) result rows. */
  def report(media: Dataset[MediaPayloadRow]): DataFrame = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      rows.map(m => (m.media_kind,
        if (probeReason(m.media_kind, m.payload).isDefined) 1L else 0L))
    }.toDF("media_kind", "bad")
      .groupBy(col("media_kind"))
      .agg(count(lit(1)).as("n"), sum(col("bad")).as("n_bad"))
  }

  /** Deterministic payload-bearing media catalog with PLANTED corruption:
    * kind cycles image/audio/video by id, payloads come from the three
    * REAL generators, and every `corruptEvery`-th id (0 disables) is
    * truncated to 4 bytes — below every container's header, so the
    * planted violations all classify `truncated` and the expected
    * violation set is a pure function of the id rule (what the DuckDB
    * oracle replays). */
  def syntheticPayloadMedia(spark: SparkSession, count: Long,
                            corruptEvery: Int = 97): Dataset[MediaPayloadRow] = {
    import spark.implicits._
    require(corruptEvery >= 0,
      s"mediaIntegrity: corruptEvery must be >= 0, got $corruptEvery")
    spark.range(count).as[Long].mapPartitions { ids =>
      ids.map { id =>
        val kind = Seq("image", "audio", "video")((id % 3).toInt)
        val payload = kind match {
          case "image" =>
            val w = 8 + (id % 9).toInt
            val h = 8 + (id % 7).toInt
            val img = new java.awt.image.BufferedImage(w, h,
              java.awt.image.BufferedImage.TYPE_INT_RGB)
            val rng = new graft.stats.StatMath.SplitMix64(id * 0x9E3779B97F4A7C15L + 29L)
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
            bos.toByteArray
          case "audio" =>
            val n = 400 + (id % 200).toInt
            val samples = Array.tabulate(n)(i =>
              (math.sin(2 * math.Pi * (200.0 + (id % 20) * 30.0) * i / 8000.0) * 12000).toShort)
            Audio.encodeWavPcm16(samples, 8000)
          case _ =>
            val frames = Array.tabulate(8 + (id % 5).toInt) { t =>
              val f = new Array[Byte](4 * 4 * 3)
              java.util.Arrays.fill(f, ((id + t * 10) % 200 + 20).toByte)
              f
            }
            Video.encodeRawVideo(frames, 4, 4, 8)
        }
        val out =
          if (corruptEvery > 0 && id % corruptEvery == 0) payload.take(4)
          else payload
        MediaPayloadRow(f"m-$id%08d", kind, out)
      }
    }
  }
}
