package graft.checks

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** The reference's user-facing response contract — its API consumers parse
  * exactly this JSON (detector_api/app/schemas/drift.py:26-51
  * `DistanceBasedResponse`, assembled at app/detector.py:62-69): fields
  * {alpha, datetime, is_drift, p_value, values, distance} in pydantic
  * declaration order, `values` explicitly null unless the request set
  * `return_input_values`. A reference user switching engines can point
  * their existing parser at these rows unchanged. */
object ResponseJson {

  /** One response object per verdict, keyed by (part, check_id) so a
    * consumer can address the reference's "one response per API call" at
    * the engine's many-checks-per-pass grain. Null fields are EMITTED
    * (pydantic serializes `values: null`; Spark's default would omit it
    * and break strict parsers). */
  def distanceBasedResponses(verdicts: Dataset[Verdict]): DataFrame =
    verdicts.toDF().select(
      col("part"), col("check_id"),
      to_json(
        struct(
          col("alpha"), col("datetime"), col("is_drift"), col("p_value"),
          col("input_values").as("values"), col("distance")),
        Map("ignoreNullFields" -> "false")).as("response"))
}
