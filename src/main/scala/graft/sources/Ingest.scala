package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** Schema-ON-INGEST for landing-zone text formats (JSONL, CSV) — the
  * Spark-first analog of the reference's pydantic boundary
  * (detector_api/app/schemas/drift.py:7-23: malformed input is rejected AT
  * THE EDGE, never deep inside the pipeline). Contracts:
  *
  *   - the schema is EXPLICIT, never inferred: at 100 TB inference is an
  *     extra full pass, and a day's odd file silently type-drifts every
  *     downstream consumer;
  *   - malformed rows are QUARANTINED with their raw line preserved (the
  *     audit trail), not dropped silently and not fatal — one bad line in
  *     a trillion-doc load must cost one row, not the job;
  *   - rows that parse but miss a required field are quarantined too
  *     (pydantic's required-field semantics).
  *
  * Shape: one `spark.read.text` scan, `from_json`/`from_csv` projection,
  * and a null-struct split — narrow, shuffle-free, whole-stage-codegen
  * friendly, and deliberately NOT the DataFrameReader corrupt-column path
  * (querying only `_corrupt_record` is disallowed and the documented
  * workaround is caching the parsed frame — a non-starter at corpus
  * scale). */
object Ingest {

  /** `good`: rows matching the schema (required fields present).
    * `bad`: quarantined raw lines, column `raw` — route to a dead-letter
    * sink and alert; the validation engine's constraint checks take over
    * from `good`. */
  final case class IngestResult(good: DataFrame, bad: DataFrame)

  private def split(lines: DataFrame, parsed: org.apache.spark.sql.Column,
                    required: Seq[String]): IngestResult = {
    val withR = lines.select(col("value"), parsed.as("r"))
    val present = required.foldLeft(col("r").isNotNull) {
      (acc, f) => acc && col(s"r.$f").isNotNull
    }
    IngestResult(
      good = withR.filter(present).select(col("r.*")),
      bad = withR.filter(!present && length(trim(col("value"))) > 0)
        .select(col("value").as("raw")))
  }

  /** JSON-lines ingest: unparseable lines → `bad` (from_json yields a NULL
    * struct), parseable-but-missing-required-field rows → `bad`, blank
    * lines ignored. */
  def readJsonl(spark: SparkSession, path: String, schema: StructType,
                required: Seq[String] = Seq.empty): IngestResult =
    splitJsonl(spark.read.text(path), schema, required)

  /** The JSONL gate on an existing single-column `value: string` frame —
    * batch OR STREAMING (the split is pure column expressions, so
    * `readStream.text(landingZone)` flows through unchanged: good side to
    * the pipeline sink, bad side to the dead-letter sink as two queries
    * over one source). */
  def splitJsonl(lines: DataFrame, schema: StructType,
                 required: Seq[String] = Seq.empty): IngestResult =
    split(lines, from_json(col("value"), schema), required)

  /** CSV ingest (no header; pass `options` for delimiter etc.). Malformed
    * lines yield a null struct under FAILFAST-per-row semantics: from_csv
    * PERMISSIVE would null-fill short rows, so a `_corrupt` sentinel column
    * routes them to quarantine instead. */
  def readCsv(spark: SparkSession, path: String, schema: StructType,
              required: Seq[String] = Seq.empty,
              options: Map[String, String] = Map.empty): IngestResult = {
    val withCorrupt = schema.add("_corrupt", "string")
    val opts = options ++ Map(
      "mode" -> "PERMISSIVE", "columnNameOfCorruptRecord" -> "_corrupt")
    val parsed = from_csv(col("value"), withCorrupt, opts)
    val lines = spark.read.text(path)
    val withR = lines.select(col("value"), parsed.as("r"))
    val present = required.foldLeft(
      col("r").isNotNull && col("r._corrupt").isNull) {
      (acc, f) => acc && col(s"r.$f").isNotNull
    }
    IngestResult(
      good = withR.filter(present).select(col("r.*")).drop("_corrupt"),
      bad = withR.filter(!present && length(trim(col("value"))) > 0)
        .select(col("value").as("raw")))
  }
}
