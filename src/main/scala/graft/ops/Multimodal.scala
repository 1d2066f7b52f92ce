package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing: image/audio/video payloads as opaque `binary`
  * columns with typed metadata, processed batch-wise per partition.
  *
  * The actual media codecs are NOT available in this environment, so the
  * decode step is a clearly-marked DETERMINISTIC STUB (`decodeStub`) — it
  * derives a fake feature vector from the payload bytes. Everything around it
  * is real and load-bearing: the schema, the binary column handling, the
  * per-partition batch iteration (the Scala analog of `mapInPandas` batch
  * processing), and the partitioning behavior.
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

  /** ===== STUB ===== Deterministic fake decoder: real decode would call an
    * image/audio codec here (unavailable in this container). Produces an
    * 8-dim "embedding" from payload bytes so downstream plumbing (schema,
    * batching, joins) is fully exercised and testable. */
  private def decodeStub(payload: Array[Byte], dims: Int = 8): Array[Double] = {
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
          decodeStub(r.payload).toSeq)
      }
    }
  }

  /** Frame/sample subselection stub: keeps every `stride`-th byte as a
    * 1-byte "frame" — the plumbing for video frame-sampling (a real impl
    * would seek keyframes; the slicing/array shape is what's exercised). */
  def frameSample(media: Dataset[MediaRow], stride: Int): DataFrame = {
    media.toDF().select(col("media_ref"),
      transform(sequence(lit(0), ((length(col("payload")) - 1) / stride).cast("int")),
        k => col("payload").substr((k * stride + 1).cast("int"), lit(1)))
        .as("sampled_frames"))
  }
}
