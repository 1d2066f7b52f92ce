package graft.checks

import org.scalatest.funsuite.AnyFunSuite

class ResponseJsonSpec extends AnyFunSuite {
  lazy val spark = graft.SparkTestBase.spark
  import spark.implicits._

  private def verdict(values: Option[Seq[Seq[Double]]]) = Verdict(
    run_id = "r", part = 3, check_id = "mmd_features", alpha = 0.05,
    datetime = "01/02/2024 10:20:30.123456",
    ts = java.sql.Timestamp.valueOf("2024-02-01 10:20:30.123456"),
    distance = 0.5, p_value = 0.01, is_drift = true, passed = false,
    metrics = Map.empty, snapshot_id = 7L, input_values = values)

  test("exact reference field shape and order; values explicitly null without echo") {
    val out = ResponseJson.distanceBasedResponses(
        spark.createDataset(Seq(verdict(None))))
      .collect().head
    assert(out.getInt(0) == 3 && out.getString(1) == "mmd_features")
    // pydantic declaration order (schemas/drift.py:26-51), null EMITTED
    assert(out.getString(2) ==
      """{"alpha":0.05,"datetime":"01/02/2024 10:20:30.123456",""" +
        """"is_drift":true,"p_value":0.01,"values":null,"distance":0.5}""")
  }

  test("echoed input values serialize as the reference's list-of-lists") {
    val out = ResponseJson.distanceBasedResponses(
        spark.createDataset(Seq(verdict(Some(Seq(Seq(1.0, 2.0), Seq(3.0, 4.0)))))))
      .collect().head.getString(2)
    assert(out.contains(""""values":[[1.0,2.0],[3.0,4.0]]"""), out)
    assert(out.indexOf("\"p_value\"") < out.indexOf("\"values\"") &&
      out.indexOf("\"values\"") < out.indexOf("\"distance\""))
  }
}
