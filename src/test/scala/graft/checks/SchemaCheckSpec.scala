package graft.checks

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite
import graft.checks.SchemaCheck.FieldContract

class SchemaCheckSpec extends AnyFunSuite {
  lazy val spark = graft.SparkTestBase.spark
  import spark.implicits._

  private val docsSchema = StructType(Seq(
    StructField("doc_id", StringType),
    StructField("spans", ArrayType(StructType(Seq(
      StructField("kind", StringType),
      StructField("text", StringType),
      StructField("media_ref", StringType),
      StructField("offset", IntegerType))))),
    StructField("scores", ArrayType(DoubleType)),
    StructField("meta", StructType(Seq(
      StructField("lang", StringType),
      StructField("n_chars", LongType))))))

  test("flatten: structs and arrays-of-struct recurse to dotted leaves; plain arrays stay leaves") {
    val flat = SchemaCheck.flatten(docsSchema).toMap
    assert(flat == Map(
      "doc_id" -> "STRING",
      "spans.element.kind" -> "STRING",
      "spans.element.text" -> "STRING",
      "spans.element.media_ref" -> "STRING",
      "spans.element.offset" -> "INT",
      "scores" -> "ARRAY<DOUBLE>",
      "meta.lang" -> "STRING",
      "meta.n_chars" -> "BIGINT"))
  }

  test("contractCheck: all four statuses, case-insensitive types, loud duplicate paths") {
    val contract = Seq(
      FieldContract("doc_id", "string"), // case-insensitive ok
      FieldContract("spans.element.kind", "STRING"),
      FieldContract("spans.element.offset", "BIGINT"), // observed INT
      FieldContract("meta.missing_field", "DOUBLE")) // absent
    val r = SchemaCheck.contractCheck(spark, docsSchema, contract)
      .collect().map(x => x.getString(0) -> x.getString(3)).toMap
    assert(r("doc_id") == "ok")
    assert(r("spans.element.kind") == "ok")
    assert(r("spans.element.offset") == "type_mismatch")
    assert(r("meta.missing_field") == "missing")
    assert(r("scores") == "unexpected" && r("meta.lang") == "unexpected")
    // every observed-or-expected path appears exactly once
    assert(r.size == SchemaCheck.flatten(docsSchema).size + 1)
    assert(intercept[IllegalArgumentException](SchemaCheck.contractCheck(
      spark, docsSchema, Seq(FieldContract("a", "INT"), FieldContract("a", "BIGINT"))))
      .getMessage.contains("twice"))
  }

  test("schemaDiff: added/removed/retyped changes only; identical schemas diff empty") {
    val after = StructType(Seq(
      StructField("doc_id", StringType),
      StructField("spans", ArrayType(StructType(Seq(
        StructField("kind", StringType),
        StructField("text", StringType),
        StructField("media_ref", StringType),
        StructField("offset", LongType), // retyped INT -> BIGINT
        StructField("lang_conf", DoubleType))))), // added inside the struct
      StructField("meta", StructType(Seq( // scores removed
        StructField("lang", StringType),
        StructField("n_chars", LongType))))))
    val d = SchemaCheck.schemaDiff(spark, docsSchema, after)
      .collect().map(x => x.getString(0) -> x.getString(3)).toMap
    assert(d == Map(
      "spans.element.offset" -> "retyped",
      "spans.element.lang_conf" -> "added",
      "scores" -> "removed"))
    assert(SchemaCheck.schemaDiff(spark, docsSchema, docsSchema).count() == 0)
  }

  test("verdictOf: pass on full match; fail with per-status metrics and one violation per bad path") {
    val full = SchemaCheck.flatten(docsSchema).map { case (p, t) => FieldContract(p, t) }
    val (ok, okViol) = SchemaCheck.verdictOf("r", docsSchema, full, 5L, 0.01)
    assert(ok.passed && ok.check_id == "schema_contract" && ok.part == -1)
    assert(ok.metrics("paths_ok") == full.size.toDouble && okViol.isEmpty)

    val bad = full.filterNot(_.path == "scores")
      .map(f => if (f.path == "doc_id") f.copy(expectedType = "BIGINT") else f) :+
      FieldContract("ghost", "INT")
    val (v, viol) = SchemaCheck.verdictOf("r", docsSchema, bad, 5L, 0.01)
    assert(!v.passed && v.distance == 3.0)
    assert(v.metrics("paths_type_mismatch") == 1.0 &&
      v.metrics("paths_missing") == 1.0 && v.metrics("paths_unexpected") == 1.0)
    assert(viol.map(_.doc_id).toSet == Set("doc_id", "ghost", "scores"))
    assert(viol.forall(_.check_id == "schema_contract"))
  }

  test("engine integration: run() emits the schema verdict first and its violations; absent without a contract") {
    import graft.engine.{RunConfig, ValidationRun}
    val docs = graft.model.DocsGen.docs(spark, 600,
      graft.model.DocsGen.cleanScenario(2)).cache()
    val media = graft.model.DocsGen.media(spark)
    val ref = Fit.fit(docs.filter($"part" === 0), snapshotId = 3L, maxSample = 200)
    val contract = SchemaCheck.flatten(docs.schema)
      .map { case (p, t) => FieldContract(p, t) } :+
      FieldContract("license", "STRING") // the snapshot lacks it
    val cfg = RunConfig(runId = "sg", maxSample = 200, numPermutations = 10,
      schemaContract = Some(contract))
    val res = ValidationRun.run(docs, media, ref, cfg)
    val sv = res.verdicts.filter(_.check_id == "schema_contract").collect()
    assert(sv.length == 1 && !sv.head.passed && sv.head.metrics("paths_missing") == 1.0)
    val viol = res.violations.filter($"check_id" === "schema_contract").collect()
    assert(viol.map(_.doc_id).toSeq == Seq("license"))
    // and other checks still ran (the gate records, never aborts)
    assert(res.verdicts.filter(_.check_id == "unique_doc_id").count() > 0)

    val without = ValidationRun.run(docs, media, ref,
      cfg.copy(runId = "sg2", schemaContract = None))
    assert(without.verdicts.filter(_.check_id == "schema_contract").isEmpty)
  }
}
