package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + TESTDATA.md.
  * `queries` exposes one entry per implemented operator; every SQL-expressible
  * entry has a matching DuckDB oracle in `oracleSql` with IDENTICAL column
  * names (the driver's compare hashes values under sorted column names). */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * The full constraint+drift validation pass over a golden-scenario docs
    * table — the engine's raison d'être. */
  def entry(spark: SparkSession): DataFrame =
    entry_docs_validation(spark, "/root/testdata/sf0.001")

  /** Full validation pass over a deterministically generated docs table
    * (size scaled off the sf dir name), returning the verdict table. */
  def entry_docs_validation(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    import graft.model.DocsGen
    val sf = "sf([0-9.]+)".r.findFirstMatchIn(dir).map(_.group(1).toDouble).getOrElse(0.001)
    val nDocs = math.max(1800L, (1800000 * sf).toLong)
    val docs = DocsGen.docs(spark, nDocs, DocsGen.goldenScenario)
    val media = DocsGen.media(spark)
    val ref = graft.checks.Fit.fit(docs.filter($"part" === 0), snapshotId = 1L,
      maxSample = 1000)
    val res = graft.engine.ValidationRun.run(docs, media, ref,
      graft.engine.RunConfig(runId = "driver", alpha = 0.01, maxSample = 1000))
    res.verdicts.toDF()
      .select($"part", $"check_id", $"alpha", $"distance", $"p_value",
        $"is_drift", $"passed", $"snapshot_id")
      .orderBy($"part", $"check_id")
  }

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    graft.entry.TpchQueries.queries ++
      graft.ops.OpsQueries.queries ++
      Map("docs_validation" -> (entry_docs_validation _))

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops
    * (docs_validation and the sketch/LSH operators) → rows-only check. */
  def oracleSql: Map[String, String] =
    graft.entry.TpchQueries.oracleSql ++ graft.ops.OpsQueries.oracleSql
}
