package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.checks.Fit
import graft.engine.{RunConfig, SnapshotCatalog, ValidationRun}
import graft.model.DocsGen

/** End-to-end engine drive: generate the golden scenario, commit it to a
  * snapshot-catalog table, fit the detector on the control partition, run the
  * full resumable constraint+drift pass, print the verdict table. */
object RunValidation {
  def main(args: Array[String]): Unit = {
    val nDocs = if (args.nonEmpty) args(0).toLong else 18000L
    val workDir = if (args.length > 1) args(1)
      else java.nio.file.Files.createTempDirectory("graft-run").toString
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")}]")
      .appName("graft-validation")
      .config("spark.sql.shuffle.partitions", sys.env.getOrElse("SPARK_GRAFT_CPUS", "8"))
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    val table = s"$workDir/docs"
    // idempotent: reuse the existing snapshot on rerun (true resume)
    val snap = SnapshotCatalog.currentSnapshotId(table) match {
      case Some(id) => SnapshotCatalog.readManifest(table, id)
      case None => SnapshotCatalog.commit(table, DocsGen.docs(spark, nDocs, DocsGen.goldenScenario))
    }
    println(s"snapshot ${snap.snapshotId} parts=${snap.parts.mkString(",")} at $table")

    val docs = SnapshotCatalog.read(spark, table, snap.snapshotId)
    val media = DocsGen.media(spark)
    val ref = Fit.fit(docs.filter($"part" === 0), snapshotId = snap.snapshotId)
    Fit.save(spark, ref, s"$workDir/ref_state")
    println(f"fitted ref: sigma=${ref.sigma}%.4f nDocs=${ref.nDocs} sample=${ref.refSample.length}")

    val cfg = RunConfig(runId = s"run-${snap.snapshotId}")
    val validated = ValidationRun.runResumable(spark, docs, media, ref, cfg,
      s"$workDir/results", s"$workDir/violations",
      knownParts = Some(snap.parts)) // from the manifest — no planning scan
    println(s"validated partitions: ${validated.mkString(",")}")

    val results = spark.read.parquet(s"$workDir/results")
    results.orderBy("part", "check_id")
      .select("part", "check_id", "distance", "p_value", "is_drift", "passed")
      .show(200, truncate = false)
    println("violations per (part, check):")
    spark.read.parquet(s"$workDir/violations")
      .groupBy("part", "check_id").count().orderBy("part").show(50, truncate = false)
    println(s"workDir: $workDir")
    spark.stop()
  }
}
