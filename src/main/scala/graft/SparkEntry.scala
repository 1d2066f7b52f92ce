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

  /** Path shared between the Spark query and the DuckDB oracle: the query
    * WRITES the golden-scenario docs here, the oracle re-reads them with
    * read_parquet. The driver runs Verify first, then the oracles, so the
    * files exist when DuckDB looks. Suffixed with this JVM's pid: the
    * oracle SQL is emitted by the SAME Verify process (oracle_sql.json), so
    * the paths always agree, while two concurrent/interleaved sessions
    * (e.g. two scale factors) can no longer overwrite each other's oracle
    * inputs between one session's write and its DuckDB read. */
  private val pathToken: Long = graft.util.PidPaths.pid
  private val DriftInputsPath = s"/tmp/graft_drift_inputs_$pathToken"

  /** Bounded /tmp growth: sibling oracle-input dirs from PREVIOUS runs are
    * deleted only when their writing process is provably DEAD (liveness via
    * /proc/<pid>) plus a grace period for the post-exit DuckDB read — a
    * session running longer than any fixed age cutoff can no longer lose
    * its oracle inputs mid-run (see graft.util.PidPaths). Own-pid dirs are
    * never touched; within one JVM, interleaved sessions share a pid and
    * the overwrite race remains — one Verify per process is the contract. */
  private def cleanStaleSiblings(prefix: String): Unit =
    graft.util.PidPaths.cleanStaleSiblings(prefix)

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
    cleanStaleSiblings("graft_drift_inputs_")
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

  private val ConstraintDocsPath = s"/tmp/graft_constraint_docs_$pathToken"
  private val ConstraintMediaPath = s"/tmp/graft_constraint_media_$pathToken"

  /** DuckDB-oracled CONSTRAINT verdicts of the flagship validation pass:
    * the golden-scenario docs + media catalog are materialized to parquet,
    * the REAL `ValidationRun.run` executes over them, and the four
    * constraint checks' verdict counts (uniqueness dup keys attributed to
    * the key's min part, dangling media_ref span rows, non-monotone-offset
    * docs, null-kind docs) are emitted per (part, check). The oracle
    * recomputes all four from the same parquet — so the engine's uniqueness
    * shuffle, referential anti-join, and span-integrity scan are
    * hash-checked end to end on the doc table (the drift p-value legs stay
    * spec-tested; their INPUT distributions are oracled by
    * `docs_drift_inputs`). */
  def entry_docs_constraints(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    import graft.model.DocsGen
    val sf = "sf([0-9.]+)".r.findFirstMatchIn(dir).map(_.group(1).toDouble).getOrElse(0.001)
    val nDocs = math.max(1800L, (1800000 * sf).toLong)
    cleanStaleSiblings("graft_constraint_")
    DocsGen.docs(spark, nDocs, DocsGen.goldenScenario)
      .write.mode("overwrite").parquet(ConstraintDocsPath)
    DocsGen.media(spark)
      .write.mode("overwrite").parquet(ConstraintMediaPath)
    val docs = spark.read.parquet(ConstraintDocsPath)
    val media = spark.read.parquet(ConstraintMediaPath)
    val ref = graft.checks.Fit.fit(docs.filter($"part" === 0), snapshotId = 1L,
      maxSample = 100)
    val res = graft.engine.ValidationRun.run(docs, media, ref,
      graft.engine.RunConfig(runId = "constraints", alpha = 0.01, maxSample = 100))
    res.verdicts.toDF()
      .filter($"check_id".isin("unique_doc_id", "ref_media", "span_order", "null_kind"))
      .select($"part", $"check_id", $"distance".cast("long").as("violations"))
      .orderBy($"part", $"check_id")
  }

  private val constraintsOracleSql: String =
    s"""WITH docs AS (SELECT * FROM read_parquet('$ConstraintDocsPath/*.parquet')),
        media AS (SELECT media_ref FROM read_parquet('$ConstraintMediaPath/*.parquet')),
        parts AS (SELECT DISTINCT part FROM docs),
        checks AS (SELECT unnest(['null_kind','ref_media','span_order','unique_doc_id']) AS check_id),
        dup AS (
          SELECT min_part AS part, count(*) AS v FROM (
            SELECT doc_id, min(part) AS min_part FROM docs
            GROUP BY doc_id HAVING count(*) > 1)
          GROUP BY 1),
        refs AS (
          SELECT part, count(*) AS v FROM (
            SELECT part, u.media_ref AS mr
            FROM (SELECT part, unnest(spans) AS u FROM docs)
            WHERE u.media_ref IS NOT NULL)
          WHERE mr NOT IN (SELECT media_ref FROM media)
          GROUP BY part),
        flags AS (
          SELECT part, doc_id,
            len(list_filter(range(len(offs)), i ->
              i > 0 AND offs[CAST(i AS INT) + 1] <= offs[CAST(i AS INT)])) > 0 AS ordv,
            len(list_filter(kinds, k -> k IS NULL)) > 0 AS nkv
          FROM (SELECT part, doc_id,
                  list_transform(spans, s -> s."offset") AS offs,
                  list_transform(spans, s -> s.kind) AS kinds
                FROM docs)),
        so AS (SELECT part, count(*) AS v FROM flags WHERE ordv GROUP BY part),
        nk AS (SELECT part, count(*) AS v FROM flags WHERE nkv GROUP BY part)
        SELECT p.part, c.check_id,
          CAST(coalesce(CASE c.check_id
            WHEN 'unique_doc_id' THEN dup.v
            WHEN 'ref_media' THEN refs.v
            WHEN 'span_order' THEN so.v
            ELSE nk.v END, 0) AS BIGINT) AS violations
        FROM parts p CROSS JOIN checks c
        LEFT JOIN dup ON c.check_id = 'unique_doc_id' AND dup.part = p.part
        LEFT JOIN refs ON c.check_id = 'ref_media' AND refs.part = p.part
        LEFT JOIN so ON c.check_id = 'span_order' AND so.part = p.part
        LEFT JOIN nk ON c.check_id = 'null_kind' AND nk.part = p.part
        ORDER BY p.part, c.check_id"""

  private val VerdictDocsPath = s"/tmp/graft_verdict_docs_$pathToken"
  private val VerdictMediaPath = s"/tmp/graft_verdict_media_$pathToken"

  /** DuckDB-oracled FLAGSHIP verdict table (E11 — the engine's headline
    * output, previously rows-only): the golden docs + media are
    * materialized to parquet, the REAL `ValidationRun.run` executes, and
    * every SQL-replayable verdict row is hash-compared —
    *  - the four constraint checks as exact violation counts + the
    *    `passed` boolean,
    *  - χ²/KS/PSI/JSD/EMD distances rounded to 4 dp (the oracle replays
    *    the fitted reference's EXACT integer quantile grid — the same
    *    `cum·g ≥ i·n` long arithmetic as `Fit.exactOffsetEdges` — then the
    *    identical statistic formulas over it),
    *  - PSI/JSD/novel-kind `is_drift` via the engine's own index-gate
    *    arithmetic replayed verbatim.
    * p-values stay out (incomplete-gamma/Kolmogorov SF are not
    * SQL-expressible — the spec suite owns them, the `lm_score`/`ppl`
    * split), as do the MMD rows (the permutation test is its own
    * distributed machinery, verdict-equality spec'd) and stats/volume
    * (stats is a carrier row; volume is oracled on events). */
  def entry_docs_verdicts(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    import graft.model.DocsGen
    val sf = "sf([0-9.]+)".r.findFirstMatchIn(dir).map(_.group(1).toDouble).getOrElse(0.001)
    val nDocs = math.max(1800L, (1800000 * sf).toLong)
    cleanStaleSiblings("graft_verdict_")
    DocsGen.docs(spark, nDocs, DocsGen.goldenScenario)
      .write.mode("overwrite").parquet(VerdictDocsPath)
    DocsGen.media(spark)
      .write.mode("overwrite").parquet(VerdictMediaPath)
    val docs = spark.read.parquet(VerdictDocsPath)
    val media = spark.read.parquet(VerdictMediaPath)
    val ref = graft.checks.Fit.fit(docs.filter($"part" === 0), snapshotId = 1L,
      maxSample = 100)
    val res = graft.engine.ValidationRun.run(docs, media, ref,
      graft.engine.RunConfig(runId = "verdicts", alpha = 0.01, maxSample = 100))
    val v = res.verdicts.toDF()
    val constraint = col("check_id")
      .isin("unique_doc_id", "ref_media", "span_order", "null_kind")
    val rounded = col("check_id")
      .isin("chi2_kind", "ks_offset", "psi_offset", "jsd_kind", "emd_offset")
    v.filter(constraint || rounded || col("check_id") === "novel_kind")
      .select(col("part"), col("check_id"),
        when(rounded, round(col("distance"), 4))
          .when(col("check_id") === "novel_kind", round(col("distance"), 6))
          .as("dist"),
        when(constraint, col("distance").cast("long")).as("viol"),
        when(constraint, col("passed"))
          .when(col("check_id").isin("psi_offset", "jsd_kind", "novel_kind"),
            col("is_drift"))
          .as("flag"))
      .orderBy(col("part"), col("check_id"))
  }

  private val verdictsOracleSql: String =
    s"""WITH docs AS (SELECT * FROM read_parquet('$VerdictDocsPath/*.parquet')),
        media AS (SELECT media_ref FROM read_parquet('$VerdictMediaPath/*.parquet')),
        parts AS (SELECT DISTINCT part FROM docs),
        flat AS (SELECT part, u.kind AS kind, u.media_ref AS mr, u."offset" AS off
                 FROM (SELECT part, unnest(spans) AS u FROM docs)),
        dup AS (SELECT min_part AS part, count(*) AS v FROM (
                  SELECT doc_id, min(part) AS min_part FROM docs
                  GROUP BY doc_id HAVING count(*) > 1) GROUP BY 1),
        refs AS (SELECT part, count(*) AS v FROM flat
                 WHERE mr IS NOT NULL AND mr NOT IN (SELECT media_ref FROM media)
                 GROUP BY part),
        oflags AS (SELECT part, doc_id,
                     len(list_filter(range(len(offs)), i ->
                       i > 0 AND offs[CAST(i AS INT) + 1] <= offs[CAST(i AS INT)])) > 0 AS ordv,
                     len(list_filter(kinds, k -> k IS NULL)) > 0 AS nkv
                   FROM (SELECT part, doc_id,
                           list_transform(spans, s -> s."offset") AS offs,
                           list_transform(spans, s -> s.kind) AS kinds FROM docs)),
        so AS (SELECT part, count(*) AS v FROM oflags WHERE ordv GROUP BY part),
        nk AS (SELECT part, count(*) AS v FROM oflags WHERE nkv GROUP BY part),
        cons AS (
          SELECT p.part, c.check_id, CAST(NULL AS DOUBLE) AS dist,
            CAST(coalesce(CASE c.check_id
              WHEN 'unique_doc_id' THEN dup.v WHEN 'ref_media' THEN refs.v
              WHEN 'span_order' THEN so.v ELSE nk.v END, 0) AS BIGINT) AS viol,
            coalesce(CASE c.check_id
              WHEN 'unique_doc_id' THEN dup.v WHEN 'ref_media' THEN refs.v
              WHEN 'span_order' THEN so.v ELSE nk.v END, 0) = 0 AS flag
          FROM parts p CROSS JOIN (SELECT unnest(
              ['null_kind','ref_media','span_order','unique_doc_id']) AS check_id) c
          LEFT JOIN dup ON c.check_id = 'unique_doc_id' AND dup.part = p.part
          LEFT JOIN refs ON c.check_id = 'ref_media' AND refs.part = p.part
          LEFT JOIN so ON c.check_id = 'span_order' AND so.part = p.part
          LEFT JOIN nk ON c.check_id = 'null_kind' AND nk.part = p.part),
        kc AS (SELECT part, kind, count(*) AS c FROM flat
               WHERE kind IS NOT NULL GROUP BY part, kind),
        cats AS (SELECT DISTINCT kind FROM kc),
        rkc AS (SELECT kind, c FROM kc WHERE part = 0),
        kk AS (SELECT p.part, ct.kind,
                 CAST(coalesce(r.c, 0) AS DOUBLE) AS rc,
                 CAST(coalesce(k.c, 0) AS DOUBLE) AS pc
               FROM parts p CROSS JOIN cats ct
               LEFT JOIN rkc r ON r.kind = ct.kind
               LEFT JOIN kc k ON k.part = p.part AND k.kind = ct.kind),
        ktot AS (SELECT part, sum(rc) AS nr, sum(pc) AS np,
                   count(*) FILTER (WHERE rc + pc > 0) AS kept
                 FROM kk GROUP BY part),
        chi2 AS (SELECT kk.part,
                   CASE WHEN t.kept < 2 OR t.nr = 0 OR t.np = 0 THEN 0.0
                     ELSE sum(CASE WHEN kk.rc + kk.pc > 0 THEN
                       (kk.rc - (kk.rc + kk.pc) / (t.nr + t.np) * t.nr)
                         * (kk.rc - (kk.rc + kk.pc) / (t.nr + t.np) * t.nr)
                         / ((kk.rc + kk.pc) / (t.nr + t.np) * t.nr)
                       + (kk.pc - (kk.rc + kk.pc) / (t.nr + t.np) * t.np)
                         * (kk.pc - (kk.rc + kk.pc) / (t.nr + t.np) * t.np)
                         / ((kk.rc + kk.pc) / (t.nr + t.np) * t.np)
                       ELSE 0 END) END AS stat
                 FROM kk JOIN ktot t USING (part)
                 GROUP BY kk.part, t.kept, t.nr, t.np),
        jsd AS (SELECT kk.part,
                  CASE WHEN t.nr = 0 AND t.np = 0 THEN 0.0
                       WHEN t.nr = 0 OR t.np = 0 THEN 1.0
                    ELSE greatest(0.0, sum(
                      CASE WHEN kk.rc > 0 THEN 0.5 * (kk.rc / t.nr) *
                        ln((kk.rc / t.nr) / (0.5 * (kk.rc / t.nr + kk.pc / t.np)))
                        ELSE 0 END +
                      CASE WHEN kk.pc > 0 THEN 0.5 * (kk.pc / t.np) *
                        ln((kk.pc / t.np) / (0.5 * (kk.rc / t.nr + kk.pc / t.np)))
                        ELSE 0 END) / ln(2.0)) END AS v
                FROM kk JOIN ktot t USING (part)
                GROUP BY kk.part, t.nr, t.np),
        novel AS (SELECT p.part,
                    CAST(coalesce(sum(k.c) FILTER (WHERE r.kind IS NULL), 0) AS BIGINT) AS novel_spans,
                    CAST(coalesce(sum(k.c), 0) AS BIGINT) AS np
                  FROM parts p LEFT JOIN kc k ON k.part = p.part
                  LEFT JOIN rkc r ON r.kind = k.kind
                  GROUP BY p.part),
        roc AS (SELECT off, count(*) AS c FROM flat WHERE part = 0 GROUP BY off),
        rn AS (SELECT CAST(sum(c) AS BIGINT) AS n FROM roc),
        rcum AS (SELECT off, CAST(sum(c) OVER (ORDER BY off) AS BIGINT) AS cum FROM roc),
        grid AS (SELECT off AS edge, cum AS refcum,
                   row_number() OVER (ORDER BY off) AS gi
                 FROM (SELECT off, cum,
                         coalesce(lag(cum) OVER (ORDER BY off), 0) AS pcm0
                       FROM rcum), rn
                 WHERE (cum * 200) // rn.n > (pcm0 * 200) // rn.n
                   AND (cum * 200) // rn.n >= 1),
        pn AS (SELECT part, CAST(count(*) AS BIGINT) AS nprod FROM flat GROUP BY part),
        ga AS (SELECT list(edge ORDER BY gi) AS ea FROM grid),
        sb AS (SELECT f.part, len(list_filter(ga.ea, e -> e < f.off)) + 1 AS gi
               FROM flat f, ga),
        hist AS (SELECT part, gi, count(*) AS c FROM sb GROUP BY part, gi),
        pg AS (SELECT p.part, g.gi, g.edge, g.refcum FROM parts p CROSS JOIN grid g),
        pcm AS (SELECT pg.part, pg.gi, pg.edge, pg.refcum,
                  CAST(coalesce(sum(h.c) OVER (
                    PARTITION BY pg.part ORDER BY pg.gi), 0) AS BIGINT) AS pcum
                FROM pg LEFT JOIN hist h ON h.part = pg.part AND h.gi = pg.gi),
        ks AS (SELECT pcm.part,
                 max(abs(pcm.refcum * 1.0 / rn.n -
                   CASE WHEN pn.nprod = 0 THEN 0.0
                        ELSE pcm.pcum * 1.0 / pn.nprod END)) AS d
               FROM pcm CROSS JOIN rn JOIN pn ON pn.part = pcm.part
               GROUP BY pcm.part),
        emd AS (SELECT q.part,
                  coalesce(sum(CASE WHEN q.nxt IS NULL THEN 0
                    ELSE abs(q.refcum * 1.0 / rn.n -
                      CASE WHEN pn.nprod = 0 THEN 0.0
                           ELSE q.pcum * 1.0 / pn.nprod END) * (q.nxt - q.edge)
                    END), 0) AS d
                FROM (SELECT *, lead(edge) OVER (
                        PARTITION BY part ORDER BY gi) AS nxt FROM pcm) q
                CROSS JOIN rn JOIN pn ON pn.part = q.part
                GROUP BY q.part),
        dec AS (SELECT DISTINCT (SELECT min(g.gi) FROM grid g, rn
                  WHERE g.refcum * 10 >= i.i * rn.n) AS gi
                FROM range(1, 10) AS i(i)),
        decb AS (SELECT gi, row_number() OVER (ORDER BY gi) AS di FROM dec),
        selx AS (SELECT pcm.part, d.di, pcm.refcum, pcm.pcum
                 FROM pcm JOIN decb d USING (gi)
                 UNION ALL
                 SELECT p.part, (SELECT count(*) FROM decb) + 1, rn.n, pn.nprod
                 FROM parts p JOIN pn ON pn.part = p.part CROSS JOIN rn),
        props AS (SELECT s.part, s.di,
                    (s.refcum - coalesce(lag(s.refcum) OVER (
                      PARTITION BY s.part ORDER BY s.di), 0)) * 1.0 / rn.n AS rp,
                    CASE WHEN pn.nprod = 0 THEN 0.0
                      ELSE (s.pcum - coalesce(lag(s.pcum) OVER (
                        PARTITION BY s.part ORDER BY s.di), 0)) * 1.0 / pn.nprod
                      END AS pp
                  FROM selx s CROSS JOIN rn JOIN pn ON pn.part = s.part),
        psi AS (SELECT part, sum((greatest(pp, 1e-6) - greatest(rp, 1e-6)) *
                  ln(greatest(pp, 1e-6) / greatest(rp, 1e-6))) AS v
                FROM props GROUP BY part),
        drift AS (
          SELECT part, 'chi2_kind' AS check_id, round(stat, 4) AS dist,
            CAST(NULL AS BIGINT) AS viol, CAST(NULL AS BOOLEAN) AS flag FROM chi2
          UNION ALL SELECT part, 'ks_offset', round(d, 4), NULL, NULL FROM ks
          UNION ALL SELECT part, 'emd_offset', round(d, 4), NULL, NULL FROM emd
          UNION ALL SELECT part, 'psi_offset', round(v, 4), NULL,
            (1.0 - least(v / 0.2, 1.0)) <= 0.01 FROM psi
          UNION ALL SELECT part, 'jsd_kind', round(v, 4), NULL,
            (1.0 - least(v / 0.1, 1.0)) <= 0.01 FROM jsd
          UNION ALL SELECT part, 'novel_kind',
            round(CASE WHEN np = 0 THEN 0.0
                       ELSE novel_spans * 1.0 / np END, 6), NULL,
            novel_spans > 0 FROM novel)
        SELECT part, check_id, dist, viol, flag FROM cons
        UNION ALL SELECT part, check_id, dist, viol, flag FROM drift
        ORDER BY part, check_id"""

  private val SpanSeqAPath = s"/tmp/graft_spanseq_a_$pathToken"
  private val SpanSeqBPath = s"/tmp/graft_spanseq_b_$pathToken"

  /** DuckDB-oracled span-sequence equality (E14 — the order-significance
    * invariant): golden docs (violation-fixture parts excluded so doc_id
    * joins stay 1:1) are written to parquet, a deterministically MUTATED
    * copy (first span's offset bumped for every ~50th doc) is written
    * beside them, and the engine's order-sensitive array-equality join
    * reports exactly the mutated doc_ids; the oracle re-compares the spans
    * lists of the same two parquet tables. */
  def entry_docs_span_seq(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    import graft.model.DocsGen
    val sf = "sf([0-9.]+)".r.findFirstMatchIn(dir).map(_.group(1).toDouble).getOrElse(0.001)
    val nDocs = math.max(1800L, (1800000 * sf).toLong)
    cleanStaleSiblings("graft_spanseq_")
    DocsGen.docs(spark, nDocs, DocsGen.goldenScenario)
      .filter($"part" < 15)
      .write.mode("overwrite").parquet(SpanSeqAPath)
    val a = spark.read.parquet(SpanSeqAPath)
    a.withColumn("spans",
        when(pmod(xxhash64($"doc_id", lit("spanmut")), lit(50L)) === 0,
          transform($"spans", (s, i) =>
            when(i === 0, struct(
                s.getField("kind").as("kind"),
                s.getField("text").as("text"),
                s.getField("media_ref").as("media_ref"),
                (s.getField("offset") + 1).as("offset")))
              .otherwise(s)))
          .otherwise($"spans"))
      .write.mode("overwrite").parquet(SpanSeqBPath)
    graft.checks.ConstraintChecks.spanSequenceEquality(
        spark.read.parquet(SpanSeqAPath), spark.read.parquet(SpanSeqBPath), "driver")
      .toDF().select($"part", $"doc_id")
      .orderBy($"part", $"doc_id")
  }

  private val spanSeqOracleSql: String =
    s"""SELECT a.part, a.doc_id
        FROM read_parquet('$SpanSeqAPath/*.parquet') a
        JOIN read_parquet('$SpanSeqBPath/*.parquet') b USING (doc_id)
        WHERE a.spans <> b.spans
        ORDER BY a.part, a.doc_id"""

  private val CrossBasePath = s"/tmp/graft_cross_base_$pathToken"
  private val CrossNewPath = s"/tmp/graft_cross_new_$pathToken"

  /** DuckDB-oracled CROSS-SNAPSHOT uniqueness (E5 incremental, the check
    * behind ValidationRun.runIncremental): a base corpus and an appended
    * snapshot's partitions — every 10th doc of the last new part remapped
    * onto a base doc_id — are materialized to parquet; the engine's
    * broadcast-into-base-scan semi-join reports exactly the colliding
    * (new part, doc_id) rows; the oracle replays the membership join. */
  def entry_uniq_cross_snapshot(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    import graft.model.{DocsGen, PartSpec}
    val sf = "sf([0-9.]+)".r.findFirstMatchIn(dir).map(_.group(1).toDouble).getOrElse(0.001)
    val nBase = math.max(1800L, (1800000 * sf).toLong)
    cleanStaleSiblings("graft_cross_")
    DocsGen.docs(spark, nBase, DocsGen.cleanScenario(3))
      .write.mode("overwrite").parquet(CrossBasePath)
    // new parts 3,4 sized so every remapped lid exists in base part 0
    val raw = DocsGen.docs(spark, nBase / 2, Seq(PartSpec(3), PartSpec(4)))
    raw.withColumn("doc_id",
        when($"part" === 4 &&
            pmod(substring($"doc_id", 9, 9).cast("long"), lit(10L)) === 0,
          concat(lit("doc-000-"), substring($"doc_id", 9, 9)))
          .otherwise($"doc_id"))
      .write.mode("overwrite").parquet(CrossNewPath)
    val (viol, _) = graft.checks.ConstraintChecks.uniquenessCross(
      spark.read.parquet(CrossNewPath), spark.read.parquet(CrossBasePath), "driver")
    viol.toDF().select($"part", $"doc_id").orderBy($"part", $"doc_id")
  }

  private val uniqCrossOracleSql: String =
    s"""SELECT n.part, n.doc_id
        FROM read_parquet('$CrossNewPath/*.parquet') n
        WHERE n.doc_id IN (SELECT doc_id FROM read_parquet('$CrossBasePath/*.parquet'))
        ORDER BY n.part, n.doc_id"""

  private val AttribPath = s"/tmp/graft_attrib_$pathToken"

  /** DuckDB-oracled chi² root-cause ATTRIBUTION (E30): the golden docs are
    * materialized to parquet, the REAL engine path runs (Fit over part 0 →
    * fused stats scan → DriftChecks.chi2Attribution), and every per-(part,
    * kind) contribution to the chi2_kind statistic is emitted. The oracle
    * replays the pooled-expectation decomposition from the raw span counts —
    * so the category-universe rule, the drop rule, and the contribution
    * arithmetic are hash-checked end to end (the PSI attribution twin rides
    * the same spec-pinned sum law; its quantile grid is not SQL-replayable). */
  def entry_docs_drift_attrib(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    import graft.model.DocsGen
    val sf = "sf([0-9.]+)".r.findFirstMatchIn(dir).map(_.group(1).toDouble).getOrElse(0.001)
    val nDocs = math.max(1800L, (1800000 * sf).toLong)
    cleanStaleSiblings("graft_attrib_")
    DocsGen.docs(spark, nDocs, DocsGen.goldenScenario)
      .write.mode("overwrite").parquet(AttribPath)
    val docs = spark.read.parquet(AttribPath)
    val ref = graft.checks.Fit.fit(docs.filter($"part" === 0),
      snapshotId = 1L, maxSample = 100)
    val (summaries, _) = graft.checks.PartStats.computeFused(docs,
      maxSample = 8, mode = graft.sketch.DocStatsAgg.ModeStats,
      edges = ref.offsetEdges.toSeq)
    val rows = graft.checks.DriftChecks.chi2Attribution(ref, summaries)
    spark.createDataFrame(rows)
      .select($"part", $"kind", $"ref_n", $"prod_n",
        round($"e_prod", 6).as("e_prod"),
        round($"contribution", 6).as("contribution"),
        round($"share", 6).as("share"))
      .orderBy($"part", $"kind")
  }

  private val attribOracleSql: String =
    s"""WITH flat AS (
          SELECT part, u.kind AS kind
          FROM (SELECT part, unnest(spans) AS u
                FROM read_parquet('$AttribPath/*.parquet'))
          WHERE u.kind IS NOT NULL),
        prod AS (SELECT part, kind, count(*) AS o FROM flat GROUP BY 1, 2),
        ref AS (SELECT kind, count(*) AS r FROM flat WHERE part = 0 GROUP BY 1),
        parts AS (SELECT DISTINCT part FROM flat),
        cats AS (SELECT DISTINCT kind FROM flat),
        grid AS (
          SELECT p.part, c.kind, coalesce(r.r, 0) AS r, coalesce(o.o, 0) AS o
          FROM parts p CROSS JOIN cats c
          LEFT JOIN ref r ON r.kind = c.kind
          LEFT JOIN prod o ON o.part = p.part AND o.kind = c.kind),
        tot AS (SELECT part, sum(r) AS nref, sum(o) AS nprod,
                  count(*) FILTER (WHERE r + o > 0) AS kept
                FROM grid GROUP BY 1),
        keep AS (
          SELECT g.part, g.kind, g.r, g.o, t.nref, t.nprod,
            (g.r + g.o) * 1.0 / (t.nref + t.nprod) AS pooled
          FROM grid g JOIN tot t USING (part)
          WHERE g.r + g.o > 0 AND t.kept >= 2 AND t.nref > 0 AND t.nprod > 0),
        c AS (
          SELECT part, kind, r, o, pooled * nprod AS eprod,
            (r - pooled * nref) * (r - pooled * nref) / (pooled * nref)
            + (o - pooled * nprod) * (o - pooled * nprod) / (pooled * nprod)
              AS contrib
          FROM keep),
        s AS (SELECT part, sum(contrib) AS stat FROM c GROUP BY 1)
        SELECT c.part, c.kind,
          CAST(c.r AS BIGINT) AS ref_n, CAST(c.o AS BIGINT) AS prod_n,
          round(c.eprod, 6) AS e_prod, round(c.contrib, 6) AS contribution,
          round(CASE WHEN s.stat > 0 THEN c.contrib / s.stat ELSE 0 END, 6)
            AS share
        FROM c JOIN s USING (part) ORDER BY c.part, c.kind"""

  private val NovelDocsPath = s"/tmp/graft_novel_$pathToken"

  /** DuckDB-oracled novel/lost-category check (E33): a four-part fixture —
    * two controls, one part emitting a 'chart' kind the reference never saw
    * (novelKindRate), one part with its 'audio' spans removed (coverage
    * loss) — is materialized to parquet; the REAL engine path runs (Fit
    * over part 0 → fused stats scan → DriftChecks.novelKind) and emits the
    * verdict fields per part. The oracle recomputes novel/lost category
    * counts, novel span mass, the fraction, and the existence-graded
    * is_drift from the same parquet — so the reference-kind-set rule, the
    * null-kind exclusion, and the alarm semantics are hash-checked end to
    * end. */
  def entry_novel_kinds(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    import graft.model.{DocsGen, PartSpec}
    val sf = "sf([0-9.]+)".r.findFirstMatchIn(dir).map(_.group(1).toDouble).getOrElse(0.001)
    val nDocs = math.max(1200L, (1200000 * sf).toLong)
    cleanStaleSiblings("graft_novel_")
    val specs = Seq(PartSpec(0), PartSpec(1),
      PartSpec(2, novelKindRate = 0.02), PartSpec(3))
    DocsGen.docs(spark, nDocs, specs)
      // part 3 loses the 'audio' category entirely (lost-kind fixture)
      .withColumn("spans",
        when($"part" === 3,
          filter($"spans", s => s.getField("kind").isNull ||
            s.getField("kind") =!= "audio"))
          .otherwise($"spans"))
      .write.mode("overwrite").parquet(NovelDocsPath)
    val docs = spark.read.parquet(NovelDocsPath)
    val ref = graft.checks.Fit.fit(docs.filter($"part" === 0),
      snapshotId = 1L, maxSample = 100)
    val (summaries, _) = graft.checks.PartStats.computeFused(docs,
      maxSample = 8, mode = graft.sketch.DocStatsAgg.ModeStats,
      edges = ref.offsetEdges.toSeq)
    val rows = graft.checks.DriftChecks.novelKind("driver", 0.05, ref, summaries)
      .map(v => (v.part, v.metrics("novel_kinds").toLong,
        v.metrics("novel_spans").toLong, v.metrics("lost_kinds").toLong,
        v.distance, v.is_drift))
    rows.toDF("part", "novel_kinds", "novel_spans", "lost_kinds",
        "novel_frac", "is_drift")
      .select($"part", $"novel_kinds", $"novel_spans", $"lost_kinds",
        round($"novel_frac", 6).as("novel_frac"), $"is_drift")
      .orderBy($"part")
  }

  private val novelKindsOracleSql: String =
    s"""WITH flat AS (
          SELECT part, u.kind AS kind
          FROM (SELECT part, unnest(spans) AS u
                FROM read_parquet('$NovelDocsPath/*.parquet'))
          WHERE u.kind IS NOT NULL),
        agg AS (SELECT part, kind, count(*) AS n FROM flat GROUP BY 1, 2),
        ref AS (SELECT DISTINCT kind FROM flat WHERE part = 0),
        parts AS (SELECT part, sum(n) AS n_tot FROM agg GROUP BY 1),
        nov AS (
          SELECT a.part,
            count(*) FILTER (WHERE r.kind IS NULL) AS novel_kinds,
            coalesce(sum(a.n) FILTER (WHERE r.kind IS NULL), 0) AS novel_spans
          FROM agg a LEFT JOIN ref r ON a.kind = r.kind GROUP BY 1),
        lost AS (
          SELECT p.part, count(*) AS lost_kinds
          FROM parts p CROSS JOIN ref r
          WHERE NOT EXISTS (SELECT 1 FROM agg a
                            WHERE a.part = p.part AND a.kind = r.kind)
          GROUP BY 1)
        SELECT p.part,
          CAST(coalesce(n.novel_kinds, 0) AS BIGINT) AS novel_kinds,
          CAST(coalesce(n.novel_spans, 0) AS BIGINT) AS novel_spans,
          CAST(coalesce(l.lost_kinds, 0) AS BIGINT) AS lost_kinds,
          round(coalesce(n.novel_spans, 0) * 1.0 / p.n_tot, 6) AS novel_frac,
          coalesce(n.novel_spans, 0) > 0 AS is_drift
        FROM parts p
        LEFT JOIN nov n ON n.part = p.part
        LEFT JOIN lost l ON l.part = p.part
        ORDER BY p.part"""

  private val MergeBasePath = s"/tmp/graft_merge_base_$pathToken"
  private val MergeSrcPath = s"/tmp/graft_merge_src_$pathToken"
  private val MergeDelPath = s"/tmp/graft_merge_del_$pathToken"
  private val MergeTablePath = s"/tmp/graft_merge_table_$pathToken"

  /** DuckDB-oracled copy-on-write MERGE (E29): the pre-merge docs, the
    * upsert source (every ~20th doc with its spans replaced + 1% new docs),
    * and the delete keys (every ~30th doc) are materialized to parquet; the
    * engine commits the docs as a snapshot table, runs Merge.merge (only
    * affected parts rewritten, fresh part ids, manifest swap), and emits
    * per-doc span aggregates of the MERGED snapshot; the oracle replays
    * delete-then-insert over the same three inputs. */
  def entry_docs_merge(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    import graft.model.DocsGen
    val sf = "sf([0-9.]+)".r.findFirstMatchIn(dir).map(_.group(1).toDouble).getOrElse(0.001)
    val nDocs = math.max(1800L, (1800000 * sf).toLong)
    cleanStaleSiblings("graft_merge_")
    // violation-fixture parts excluded so doc_id is unique (1:1 upserts)
    val base = DocsGen.docs(spark, nDocs, DocsGen.goldenScenario)
      .filter($"part" < 15)
    base.write.mode("overwrite").parquet(MergeBasePath)
    val baseP = spark.read.parquet(MergeBasePath)
    val marker = (tag: org.apache.spark.sql.Column) => array(struct(
      lit("text").as("kind"), concat(lit("merged-"), tag).as("text"),
      lit(null: String).as("media_ref"), lit(0).as("offset")))
    val updates = baseP.filter(pmod(xxhash64($"doc_id", lit("mu")), lit(20L)) === 0)
      .select($"doc_id", marker($"doc_id").as("spans"))
    val inserts = spark.range(math.max(10L, nDocs / 100)).select(
      format_string("new-%09d", $"id").as("doc_id"),
      marker(format_string("new-%09d", $"id")).as("spans"))
    updates.unionByName(inserts).write.mode("overwrite").parquet(MergeSrcPath)
    // delete set disjoint from the update set (upsert+delete on one key is
    // the guarded ambiguous case)
    baseP.filter(pmod(xxhash64($"doc_id", lit("md")), lit(30L)) === 0 &&
        pmod(xxhash64($"doc_id", lit("mu")), lit(20L)) =!= 0)
      .select("doc_id").write.mode("overwrite").parquet(MergeDelPath)

    // fresh catalog table per invocation (overwrite semantics via rm)
    graft.util.PidPaths.deleteRecursively(MergeTablePath)
    graft.engine.SnapshotCatalog.commit(MergeTablePath, baseP)
    val r = graft.engine.Merge.merge(spark, MergeTablePath,
      spark.read.parquet(MergeSrcPath),
      spark.read.parquet(MergeDelPath))
    graft.engine.SnapshotCatalog.read(spark, MergeTablePath, r.snapshot.snapshotId)
      .select($"doc_id",
        size($"spans").cast("long").as("n_spans"),
        aggregate($"spans", lit(0L), (acc, s) =>
          acc + s.getField("offset").cast("long")).as("off_sum"),
        aggregate($"spans", lit(0L), (acc, s) =>
          acc + coalesce(length(s.getField("text")).cast("long"), lit(0L)))
          .as("txt_chars"))
      .orderBy($"doc_id")
  }

  private val MorBasePath = s"/tmp/graft_mor_base_$pathToken"
  private val MorDelPath = s"/tmp/graft_mor_del_$pathToken"
  private val MorTablePath = s"/tmp/graft_mor_table_$pathToken"

  /** DuckDB-oracled MERGE-ON-READ deletes (Iceberg v2 equality-delete
    * semantics): the base docs and a delete-key set (~1 in 25) are
    * materialized; the engine commits the docs as a snapshot table, cuts a
    * delete-set snapshot with NO data rewrite, and reads it back through
    * the MOR anti-join path. The query then ALSO runs
    * [[graft.engine.SnapshotCatalog.materializeDeletes]] and REQUIRES the
    * physical rewrite to agree with the logical read row-for-row (and the
    * delete list to come back empty) — so one driver query gates the
    * logical path, the COW fold, and their equivalence; the oracle replays
    * base-minus-deletes over the same parquet. */
  def entry_docs_mor_deletes(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    import graft.model.DocsGen
    val sf = "sf([0-9.]+)".r.findFirstMatchIn(dir).map(_.group(1).toDouble).getOrElse(0.001)
    val nDocs = math.max(1800L, (1800000 * sf).toLong)
    cleanStaleSiblings("graft_mor_")
    val base = DocsGen.docs(spark, nDocs, DocsGen.goldenScenario)
      .filter($"part" < 15) // violation-fixture parts excluded: unique doc_id
    base.write.mode("overwrite").parquet(MorBasePath)
    val baseP = spark.read.parquet(MorBasePath)
    baseP.filter(pmod(xxhash64($"doc_id", lit("morD")), lit(25L)) === 0)
      .select("doc_id").write.mode("overwrite").parquet(MorDelPath)
    graft.util.PidPaths.deleteRecursively(MorTablePath)
    graft.engine.SnapshotCatalog.commit(MorTablePath, baseP)
    val s = graft.engine.SnapshotCatalog.commitDeletes(MorTablePath,
      spark.read.parquet(MorDelPath), "doc_id")
    val mor = graft.engine.SnapshotCatalog.read(spark, MorTablePath, s.snapshotId)
    val mat = graft.engine.SnapshotCatalog.materializeDeletes(spark, MorTablePath)
    require(mat.deleteFiles.isEmpty,
      "mor_deletes: materializeDeletes left delete files pending")
    val matRead = graft.engine.SnapshotCatalog.read(spark, MorTablePath,
      mat.snapshotId)
    val disagree = mor.select("doc_id").except(matRead.select("doc_id")).count() +
      matRead.select("doc_id").except(mor.select("doc_id")).count()
    require(disagree == 0L,
      s"mor_deletes: logical MOR read and materialized read disagree on " +
        s"$disagree doc_ids")
    mor.select($"doc_id",
        size($"spans").cast("long").as("n_spans"),
        aggregate($"spans", lit(0L), (acc, sp) =>
          acc + sp.getField("offset").cast("long")).as("off_sum"))
      .orderBy($"doc_id")
  }

  private val WapGoodPath = s"/tmp/graft_wap_good_$pathToken"
  private val WapBadPath = s"/tmp/graft_wap_bad_$pathToken"
  private val WapTablePath = s"/tmp/graft_wap_table_$pathToken"

  /** DuckDB-oracled WRITE-AUDIT-PUBLISH gate: a clean batch (constraint-
    * clean golden parts 0-4) and a dirty batch (parts 5-6 plus a
    * deterministic re-emission of ~1/20 of part 5's docs — planted
    * duplicate keys) are materialized; the engine runs two
    * [[graft.engine.Wap.validateAndPublish]] rounds on a fresh snapshot
    * table and REQUIRES publish-then-reject; the query emits the CURRENT
    * table content, and the oracle is the GOOD batch alone — any leaked
    * dirty row (a gate that failed to fire, a rollback that failed to
    * land) breaks rows/hash. */
  def entry_docs_wap(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    import graft.model.DocsGen
    val sf = "sf([0-9.]+)".r.findFirstMatchIn(dir).map(_.group(1).toDouble).getOrElse(0.001)
    val nDocs = math.max(1800L, (1800000 * sf).toLong)
    cleanStaleSiblings("graft_wap_")
    val golden = DocsGen.docs(spark, nDocs, DocsGen.goldenScenario)
    golden.filter($"part" <= 4).write.mode("overwrite").parquet(WapGoodPath)
    val goodP = spark.read.parquet(WapGoodPath)
    golden.filter($"part" === 5 || $"part" === 6)
      .unionByName(golden.filter($"part" === 5 &&
        pmod(xxhash64($"doc_id", lit("wapdup")), lit(20L)) === 0))
      .write.mode("overwrite").parquet(WapBadPath)
    graft.util.PidPaths.deleteRecursively(WapTablePath)
    val media = DocsGen.media(spark)
    val ref = graft.checks.Fit.fit(goodP.filter($"part" === 0),
      snapshotId = 0L, maxSample = 100)
    val cfg = graft.engine.RunConfig(runId = "wap", maxSample = 100,
      numPermutations = 10)
    val r1 = graft.engine.Wap.validateAndPublish(spark, WapTablePath, goodP,
      media, ref, cfg)
    require(r1.published, s"docs_wap: the clean batch was rejected: " +
      r1.failing.map(v => s"${v.part}/${v.check_id}").mkString(","))
    val r2 = graft.engine.Wap.validateAndPublish(spark, WapTablePath,
      spark.read.parquet(WapBadPath), media, ref, cfg)
    require(!r2.published,
      "docs_wap: the dirty batch (planted duplicate keys) was published")
    require(r2.failing.exists(_.check_id == "unique_doc_id"),
      s"docs_wap: expected a unique_doc_id gate failure, got " +
        r2.failing.map(_.check_id).distinct.mkString(","))
    val cur = graft.engine.SnapshotCatalog.currentSnapshotId(WapTablePath).get
    graft.engine.SnapshotCatalog.read(spark, WapTablePath, cur)
      .select($"doc_id",
        size($"spans").cast("long").as("n_spans"),
        aggregate($"spans", lit(0L), (acc, sp) =>
          acc + sp.getField("offset").cast("long")).as("off_sum"))
      .orderBy($"doc_id")
  }

  private val wapOracleSql: String =
    s"""SELECT doc_id,
          CAST(len(spans) AS BIGINT) AS n_spans,
          CAST(coalesce(list_sum(list_transform(spans, s -> s."offset")), 0)
            AS BIGINT) AS off_sum
        FROM read_parquet('$WapGoodPath/*.parquet')
        ORDER BY doc_id"""

  private val morDeletesOracleSql: String =
    s"""WITH base AS (SELECT * FROM read_parquet('$MorBasePath/*.parquet')),
        del AS (SELECT doc_id FROM read_parquet('$MorDelPath/*.parquet'))
        SELECT doc_id,
          CAST(len(spans) AS BIGINT) AS n_spans,
          CAST(coalesce(list_sum(list_transform(spans, s -> s."offset")), 0)
            AS BIGINT) AS off_sum
        FROM base WHERE doc_id NOT IN (SELECT doc_id FROM del)
        ORDER BY doc_id"""

  private val mergeOracleSql: String =
    s"""WITH base AS (SELECT * FROM read_parquet('$MergeBasePath/*.parquet')),
        src AS (SELECT * FROM read_parquet('$MergeSrcPath/*.parquet')),
        del AS (SELECT doc_id FROM read_parquet('$MergeDelPath/*.parquet')),
        ks AS (SELECT doc_id FROM src UNION SELECT doc_id FROM del),
        merged AS (
          SELECT doc_id, spans FROM base
          WHERE doc_id NOT IN (SELECT doc_id FROM ks)
          UNION ALL SELECT doc_id, spans FROM src)
        SELECT doc_id,
          CAST(len(spans) AS BIGINT) AS n_spans,
          CAST(coalesce(list_sum(list_transform(spans, s -> s."offset")), 0)
            AS BIGINT) AS off_sum,
          CAST(coalesce(list_sum(list_transform(spans,
            s -> coalesce(length(s.text), 0))), 0) AS BIGINT) AS txt_chars
        FROM merged ORDER BY doc_id"""

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    graft.entry.TpchQueries.queries ++
      graft.ops.OpsQueries.queries ++
      Map("docs_validation" -> (entry_docs_validation _),
        "docs_verdicts" -> (entry_docs_verdicts _),
        "docs_drift_inputs" -> (entry_docs_drift_inputs _),
        "docs_constraints" -> (entry_docs_constraints _),
        "docs_span_seq" -> (entry_docs_span_seq _),
        "uniq_cross_snapshot" -> (entry_uniq_cross_snapshot _),
        "docs_merge" -> (entry_docs_merge _),
        "docs_mor_deletes" -> (entry_docs_mor_deletes _),
        "docs_wap" -> (entry_docs_wap _),
        "docs_drift_attrib" -> (entry_docs_drift_attrib _),
        "novel_kinds" -> (entry_novel_kinds _))

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops
    * (docs_validation and the sketch/LSH operators) → rows-only check. */
  def oracleSql: Map[String, String] =
    graft.entry.TpchQueries.oracleSql ++ graft.ops.OpsQueries.oracleSql ++
      Map("docs_drift_inputs" -> driftInputsOracleSql,
        "docs_verdicts" -> verdictsOracleSql,
        "docs_constraints" -> constraintsOracleSql,
        "docs_span_seq" -> spanSeqOracleSql,
        "uniq_cross_snapshot" -> uniqCrossOracleSql,
        "docs_merge" -> mergeOracleSql,
        "docs_mor_deletes" -> morDeletesOracleSql,
        "docs_wap" -> wapOracleSql,
        "docs_drift_attrib" -> attribOracleSql,
        "novel_kinds" -> novelKindsOracleSql)
}
