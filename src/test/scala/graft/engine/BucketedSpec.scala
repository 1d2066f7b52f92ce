package graft.engine

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Bucketed-layout co-location: key-grain aggregation and self-join over a
  * table bucketed by that key must plan NO shuffle exchange — the layout
  * lever that amortizes the corpus shuffle into the ingest write. */
class BucketedSpec extends AnyFunSuite {
  lazy val spark = graft.SparkTestBase.spark
  import spark.implicits._

  lazy val table: String = {
    // duplicate ids so the dup-group query has real output
    val docs = (0 until 2000).map(i => (f"doc-${i % 1500}%06d", i))
      .toDF("doc_id", "payload")
    BucketedTables.commit(spark, "bucketed_docs_spec", docs, "doc_id", 8)
    "bucketed_docs_spec"
  }

  test("groupBy on the bucket key plans no shuffle and counts correctly") {
    val docs = BucketedTables.read(spark, table)
    val dups = BucketedTables.dupGroupsZeroShuffle(docs)
    assert(BucketedTables.hasNoShuffle(dups),
      dups.queryExecution.executedPlan.toString.take(2000))
    // 500 ids appear twice
    assert(dups.count() == 500)
    assert(dups.agg(sum($"cnt")).as[Long].head() == 1000)
  }

  test("self-join on the bucket key plans no shuffle on either side") {
    val docs = BucketedTables.read(spark, table)
    val joined = docs.as("a").join(docs.as("b"), "doc_id")
      .groupBy().count()
    assert(BucketedTables.hasNoShuffle(joined),
      joined.queryExecution.executedPlan.toString.take(2000))
    // each duplicated id contributes 2x2 pairs, unique ids 1
    assert(joined.as[Long].head() == 500L * 4 + 1000L)
  }

  test("commit rejects qualified / hostile table names (path-safety guard)") {
    val df = Seq(("a", 1)).toDF("doc_id", "v")
    for (bad <- Seq("db.tbl", "../escape", "tbl;DROP TABLE x", "we ird", ""))
      assertThrows[IllegalArgumentException](
        BucketedTables.commit(spark, bad, df, "doc_id", 2))
  }

  test("external re-registration (CREATE TABLE ... CLUSTERED BY ... LOCATION) " +
    "keeps the zero-exchange plan — the bench's cross-session path") {
    val meta = spark.sessionState.catalog.getTableMetadata(
      org.apache.spark.sql.catalyst.TableIdentifier(table))
    // copy the bucket-named files to a fresh location and register them as
    // an EXTERNAL bucketed table — exactly what each bench level session
    // does after the committing session (and its in-memory catalog) died
    val src = java.nio.file.Paths.get(new java.net.URI(meta.location.toString))
    val dst = java.nio.file.Files.createTempDirectory("bucketed-reattach")
    import scala.jdk.CollectionConverters._
    java.nio.file.Files.walk(src).iterator().asScala.filter(p =>
        java.nio.file.Files.isRegularFile(p)).foreach { p =>
      java.nio.file.Files.copy(p, dst.resolve(p.getFileName.toString))
    }
    spark.sql("DROP TABLE IF EXISTS bucketed_reattach_spec")
    spark.sql(s"CREATE TABLE bucketed_reattach_spec (${meta.schema.toDDL}) " +
      s"USING PARQUET CLUSTERED BY (doc_id) SORTED BY (doc_id) INTO 8 BUCKETS " +
      s"LOCATION '$dst'")
    val docs = spark.table("bucketed_reattach_spec")
    val dups = BucketedTables.dupGroupsZeroShuffle(docs)
    assert(BucketedTables.hasNoShuffle(dups),
      dups.queryExecution.executedPlan.toString.take(2000))
    assert(dups.count() == 500)
    spark.sql("DROP TABLE bucketed_reattach_spec")
  }

  test("unbucketed twin of the same aggregation DOES shuffle (control)") {
    val plain = (0 until 2000).map(i => (f"doc-${i % 1500}%06d", i))
      .toDF("doc_id", "payload")
    val dups = BucketedTables.dupGroupsZeroShuffle(plain)
    assert(!BucketedTables.hasNoShuffle(dups))
  }

  // ---- P20 wired into the flagship pass (E5) ----

  lazy val goldenDocs = graft.model.DocsGen
    .docs(spark, 3200, graft.model.DocsGen.goldenScenario.take(16)).cache()
  lazy val bucketedDocs = {
    BucketedTables.commit(spark, "bucketed_golden_docs", goldenDocs, "doc_id", 8)
    BucketedTables.read(spark, "bucketed_golden_docs")
  }

  test("uniquenessAuto selects the zero-exchange path on a bucketed snapshot " +
    "and matches the hash-pair path exactly (stats + violation rows)") {
    import graft.checks.ConstraintChecks
    assert(ConstraintChecks.docIdGroupingIsShuffleFree(bucketedDocs))
    assert(!ConstraintChecks.docIdGroupingIsShuffleFree(goldenDocs),
      "plain generator frame must NOT read as shuffle-free (control)")
    // the bucketed path's key-grain aggregation itself plans no Exchange
    val perKey = bucketedDocs.select($"part", $"doc_id")
      .groupBy($"doc_id")
      .agg(count(lit(1)).as("n"), min($"part").as("part"))
    assert(BucketedTables.hasNoShuffle(perKey),
      perKey.queryExecution.executedPlan.toString.take(2000))
    val (vB, sB) = ConstraintChecks.uniquenessBucketed(bucketedDocs, "r")
    val (vH, sH) = ConstraintChecks.uniqueness(goldenDocs, "r")
    assert(sB == sH, s"per-part stats differ: $sB vs $sH")
    assert(sB.values.exists(_.dupKeys > 0), "fixture must contain duplicates")
    val rowsB = vB.collect().map(v => (v.part, v.doc_id, v.detail)).sorted.toSeq
    val rowsH = vH.collect().map(v => (v.part, v.doc_id, v.detail)).sorted.toSeq
    assert(rowsB == rowsH && rowsB.nonEmpty)
  }

  test("full validation pass over the bucketed snapshot equals the plain run " +
    "(auto layout selection is semantics-free)") {
    import graft.checks.Fit
    val ref = Fit.fit(goldenDocs.filter($"part" === 0), snapshotId = 21L, maxSample = 200)
    val media = graft.model.DocsGen.media(spark)
    val cfg = RunConfig(runId = "bk", maxSample = 200, numPermutations = 10)
    def strip(r: ValidationRun.Results) = r.verdicts.collect()
      .map(v => (v.part, v.check_id, v.distance, v.p_value, v.is_drift, v.passed))
      .sortBy(t => (t._1, t._2)).toSeq
    val plain = strip(ValidationRun.run(goldenDocs, media, ref, cfg))
    val bucketed = strip(ValidationRun.run(bucketedDocs, media, ref, cfg))
    assert(plain == bucketed && plain.nonEmpty)
  }
}
