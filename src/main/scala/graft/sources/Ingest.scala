package graft.sources

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
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
  * Shape: one `spark.read.text` scan, `from_json`/`from_csv` projection
  * with a `_corrupt` sentinel (on Spark 4 an unparseable line yields a
  * non-null struct of null FIELDS — struct nullness alone cannot detect a
  * parse failure, the sentinel can), and a column-predicate split —
  * narrow, shuffle-free, whole-stage-codegen friendly, and deliberately
  * NOT the DataFrameReader corrupt-column path (querying only
  * `_corrupt_record` is disallowed there and the documented workaround is
  * caching the parsed frame — a non-starter at corpus scale). */
object Ingest {

  /** `good`: rows matching the schema (parsed clean, required fields
    * present). `bad`: quarantined raw lines, column `raw` — route to a
    * dead-letter sink and alert; the validation engine's constraint checks
    * take over from `good`. */
  final case class IngestResult(good: DataFrame, bad: DataFrame)

  private val Corrupt = "_graft_corrupt"

  private def parseOpts(options: Map[String, String]): Map[String, String] =
    options ++ Map("mode" -> "PERMISSIVE", "columnNameOfCorruptRecord" -> Corrupt)

  /** One routing body for every format: `parsed` must be a struct column
    * of `schema` + the [[Corrupt]] sentinel field. */
  private def split(lines: DataFrame, parsed: Column,
                    required: Seq[String]): IngestResult = {
    val withR = lines.select(col("value"), parsed.as("r"))
    val present = required.foldLeft(
      col("r").isNotNull && col(s"r.$Corrupt").isNull) {
      (acc, f) => acc && col(s"r.$f").isNotNull
    }
    IngestResult(
      good = withR.filter(present).select(col("r.*")).drop(Corrupt),
      bad = withR.filter(!present && length(trim(col("value"))) > 0)
        .select(col("value").as("raw")))
  }

  /** JSON-lines ingest: unparseable lines → `bad` (corrupt sentinel set),
    * parseable-but-missing-required-field rows → `bad`, blank lines
    * ignored. */
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
    split(lines,
      from_json(col("value"), schema.add(Corrupt, "string"),
        parseOpts(Map.empty)),
      required)

  /** CSV ingest (no header; pass `options` for delimiter etc.): malformed
    * lines set the corrupt sentinel → `bad`; short rows null-fill, so
    * required-field checks catch them. */
  def readCsv(spark: SparkSession, path: String, schema: StructType,
              required: Seq[String] = Seq.empty,
              options: Map[String, String] = Map.empty): IngestResult =
    split(spark.read.text(path),
      from_csv(col("value"), schema.add(Corrupt, "string"),
        parseOpts(options)),
      required)
}
