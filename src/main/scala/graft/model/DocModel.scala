package graft.model

import org.apache.spark.sql.types._

/** Data model per BASELINE.json `input_hint`: an Iceberg-shaped table of
  * interleaved text+media documents.
  *
  * The `spans` array is ORDER-SIGNIFICANT — the per-row invariant vs the
  * reference is span-sequence equality on (kind, text, media_ref, order),
  * mirroring the reference's order-preserving tensor concat
  * (reference ml/utils/autoencoder.py:243-244, shuffle=False loaders at
  * ml/testing.py:61-67).
  */
case class Span(kind: String, text: String, media_ref: String, offset: Int)

case class Doc(doc_id: String, spans: Seq[Span], part: Int)

case class Media(media_ref: String, media_kind: String, bytes_len: Int)

object DocModel {
  val spanType: StructType = StructType(Seq(
    StructField("kind", StringType),
    StructField("text", StringType),
    StructField("media_ref", StringType),
    StructField("offset", IntegerType)))

  val docSchema: StructType = StructType(Seq(
    StructField("doc_id", StringType, nullable = false),
    StructField("spans", ArrayType(spanType), nullable = false),
    StructField("part", IntegerType, nullable = false)))

  val mediaSchema: StructType = StructType(Seq(
    StructField("media_ref", StringType, nullable = false),
    StructField("media_kind", StringType, nullable = false),
    StructField("bytes_len", IntegerType, nullable = false)))

  val kinds: Seq[String] = Seq("text", "image", "audio", "table")
}
