package graft.checks

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types._

/** Schema validation — the contract the reference enforces implicitly
  * through its pydantic request models (detector_api/app/schemas/drift.py:
  * a request whose fields are missing or mistyped never reaches the
  * detector) lifted to table grain: validate an observed snapshot schema
  * against a declared column contract, and diff two snapshots' schemas to
  * attribute evolution.
  *
  * All of this is DRIVER METADATA work — `df.schema` is O(columns)
  * regardless of table size, so schema validation costs zero executor
  * time and zero scan at any scale; it is the one check that is free at
  * 100 TB. Nested structs flatten to dotted leaf paths (`spans.element
  * .kind`) so a retyped field inside an array-of-struct is attributed to
  * the field, not the whole column.
  *
  * Type names are Spark SQL strings (`dataType.sql`: BIGINT, STRING,
  * DOUBLE, TIMESTAMP, …) — the DuckDB oracle replays them from DESCRIBE
  * output with the one documented mapping VARCHAR→STRING.
  */
object SchemaCheck {

  /** One expected leaf column: dotted path + Spark SQL type string
    * (case-insensitive compare; `STRING`, `BIGINT`, `ARRAY<DOUBLE>`, …). */
  case class FieldContract(path: String, expectedType: String)

  /** Flatten a schema to (dotted leaf path, SQL type). Structs recurse;
    * arrays of structs recurse through an `element` segment (non-struct
    * arrays/maps stay leaves with their full SQL type) — so adding a field
    * to the span struct surfaces as ONE new leaf path, not a retype of the
    * whole `spans` column. */
  def flatten(schema: StructType, prefix: String = ""): Seq[(String, String)] =
    schema.fields.toSeq.flatMap { f =>
      val path = if (prefix.isEmpty) f.name else s"$prefix.${f.name}"
      f.dataType match {
        case s: StructType => flatten(s, path)
        case ArrayType(s: StructType, _) => flatten(s, s"$path.element")
        case dt => Seq(path -> dt.sql)
      }
    }

  private val resultSchema = StructType(Seq(
    StructField("path", StringType, nullable = false),
    StructField("expected_type", StringType, nullable = true),
    StructField("observed_type", StringType, nullable = true),
    StructField("status", StringType, nullable = false)))

  /** One (path, status, expected, observed) row per union path — the single
    * status-rule implementation [[contractCheck]] and [[verdictOf]] share. */
  private def statusRows(observed: StructType, contract: Seq[FieldContract])
      : Seq[(String, String, Option[String], Option[String])] = {
    val dupes = contract.groupBy(_.path).collect { case (p, fs) if fs.size > 1 => p }
    require(dupes.isEmpty, s"schema contract lists paths twice: ${dupes.take(5).mkString(", ")}")
    val obs = flatten(observed).toMap
    val exp = contract.map(f => f.path -> f.expectedType).toMap
    (obs.keySet ++ exp.keySet).toSeq.sorted.map { path =>
      val status = (exp.get(path), obs.get(path)) match {
        case (Some(et), Some(ot)) =>
          if (et.equalsIgnoreCase(ot)) "ok" else "type_mismatch"
        case (Some(_), None) => "missing"
        case _ => "unexpected"
      }
      (path, status, exp.get(path), obs.get(path))
    }
  }

  /** Observed schema vs declared contract → one row per path:
    * `ok` (present, type equal), `type_mismatch`, `missing` (in the
    * contract, absent from the table), `unexpected` (in the table, absent
    * from the contract). Compare is case-insensitive on the type string
    * and exact on the path. */
  def contractCheck(spark: SparkSession, observed: StructType,
                    contract: Seq[FieldContract]): DataFrame = {
    val rows = statusRows(observed, contract).map { case (path, status, e, o) =>
      Row(path, e.map(_.toUpperCase).orNull, o.orNull, status)
    }
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 1), resultSchema)
  }

  private val diffSchema = StructType(Seq(
    StructField("path", StringType, nullable = false),
    StructField("before_type", StringType, nullable = true),
    StructField("after_type", StringType, nullable = true),
    StructField("change", StringType, nullable = false)))

  /** Snapshot-to-snapshot schema drift: one row per CHANGED leaf path —
    * `added`, `removed`, or `retyped`; unchanged paths are omitted (the
    * report is O(changes), empty means evolution-free). */
  def schemaDiff(spark: SparkSession, before: StructType,
                 after: StructType): DataFrame = {
    val b = flatten(before).toMap
    val a = flatten(after).toMap
    val rows = (b.keySet ++ a.keySet).toSeq.sorted.flatMap { path =>
      (b.get(path), a.get(path)) match {
        case (Some(bt), Some(at)) if bt.equalsIgnoreCase(at) => None
        case (Some(bt), Some(at)) => Some(Row(path, bt, at, "retyped"))
        case (Some(bt), None) => Some(Row(path, bt, null, "removed"))
        case (None, Some(at)) => Some(Row(path, null, at, "added"))
        case (None, None) => None
      }
    }
    spark.createDataFrame(spark.sparkContext.parallelize(rows, 1), diffSchema)
  }

  /** The contract check as an engine verdict + violation rows (the shape
    * every other check emits): passed ⟺ every path is `ok`; metrics carry
    * the per-status counts; one Violation per non-ok path. Constraint
    * check, not a statistical test — distance/p_value are the pass
    * indicator like the other constraint verdicts. */
  def verdictOf(runId: String, observed: StructType,
                contract: Seq[FieldContract], snapshotId: Long,
                alpha: Double): (Verdict, Seq[Violation]) = {
    val statuses = statusRows(observed, contract)
    val counts = statuses.groupBy(_._2).map { case (s, xs) => s -> xs.size.toLong }
    val bad = statuses.filter(_._2 != "ok")
    val verdict = Verdict.now(runId, part = -1, checkId = "schema_contract",
      alpha = alpha,
      distance = bad.size.toDouble,
      pValue = if (bad.isEmpty) 1.0 else 0.0,
      passedConstraint = Some(bad.isEmpty),
      metrics = Map(
        "paths_ok" -> counts.getOrElse("ok", 0L).toDouble,
        "paths_missing" -> counts.getOrElse("missing", 0L).toDouble,
        "paths_unexpected" -> counts.getOrElse("unexpected", 0L).toDouble,
        "paths_type_mismatch" -> counts.getOrElse("type_mismatch", 0L).toDouble),
      snapshotId = snapshotId)
    val violations = bad.map { case (path, status, e, o) =>
      Violation(runId, part = -1, check_id = "schema_contract", doc_id = path,
        detail = s"$status: expected=${e.getOrElse("-")} observed=${o.getOrElse("-")}")
    }
    (verdict, violations)
  }
}
