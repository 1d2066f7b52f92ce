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

  /** Fixed path shared between the Spark query and the DuckDB oracle: the
    * query WRITES the golden-scenario docs here, the oracle re-reads them
    * with read_parquet. The driver runs Verify first, then the oracles, so
    * the files exist when DuckDB looks. */
  private val DriftInputsPath = "/tmp/graft_drift_inputs"

  /** DuckDB-oracled drift INPUTS of the flagship validation pass: the
    * golden-scenario docs table is materialized to parquet, then the exact
    * frames the χ²/PSI/KS checks consume — per-(part, kind) span counts and
    * per-(part, offset-bucket) counts — are emitted as one tidy
    * (part, key, cnt) frame. The verdict pass itself stays rows-only (the
    * p-value math is spec-tested), but its INPUT distributions over the doc
    * table are now hash-checked end to end, not only on TPC-H columns. */
  def entry_docs_drift_inputs(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.functions._
    import graft.model.DocsGen
    val sf = "sf([0-9.]+)".r.findFirstMatchIn(dir).map(_.group(1).toDouble).getOrElse(0.001)
    val nDocs = math.max(1800L, (1800000 * sf).toLong)
    DocsGen.docs(spark, nDocs, DocsGen.goldenScenario)
      .write.mode("overwrite").parquet(DriftInputsPath)
    val flat = spark.read.parquet(DriftInputsPath)
      .select(col("part"), explode(col("spans")).as("s"))
      .select(col("part"), col("s.kind").as("kind"), col("s.offset").as("offset"))
    val kindCounts = flat.groupBy(col("part"),
        concat(lit("kind:"), coalesce(col("kind"), lit("NULL"))).as("key"))
      .agg(count(lit(1)).as("cnt"))
    val offCounts = flat.groupBy(col("part"),
        format_string("off:%02d",
          least(floor(col("offset") / lit(20.0)), lit(19.0)).cast("int")).as("key"))
      .agg(count(lit(1)).as("cnt"))
    kindCounts.union(offCounts).orderBy(col("part"), col("key"))
  }

  private val driftInputsOracleSql: String =
    s"""WITH flat AS (
          SELECT part, u.kind AS kind, u."offset" AS off
          FROM (SELECT part, unnest(spans) AS u
                FROM read_parquet('$DriftInputsPath/*.parquet'))),
        k AS (
          SELECT part, 'kind:' || coalesce(kind, 'NULL') AS key, count(*) AS cnt
          FROM flat GROUP BY 1, 2),
        o AS (
          SELECT part, printf('off:%02d', CAST(least(floor(off / 20.0), 19) AS INT)) AS key,
            count(*) AS cnt
          FROM flat GROUP BY 1, 2)
        SELECT part, key, cnt FROM k
        UNION ALL SELECT part, key, cnt FROM o
        ORDER BY part, key"""

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    graft.entry.TpchQueries.queries ++
      graft.ops.OpsQueries.queries ++
      Map("docs_validation" -> (entry_docs_validation _),
        "docs_drift_inputs" -> (entry_docs_drift_inputs _))

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops
    * (docs_validation and the sketch/LSH operators) → rows-only check. */
  def oracleSql: Map[String, String] =
    graft.entry.TpchQueries.oracleSql ++ graft.ops.OpsQueries.oracleSql ++
      Map("docs_drift_inputs" -> driftInputsOracleSql)
}
