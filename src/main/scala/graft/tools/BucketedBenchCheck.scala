package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.engine.BucketedTables

/** Sanity probe for the bench's bucketed layout: commit a doc_id-bucketed
  * table, re-register it as an EXTERNAL clustered table the way each bench
  * level session does, and print whether uniquenessAuto's plan walk sees
  * the zero-exchange aggregation under the bench's session configs (AQE
  * on, tuned split sizes). */
object BucketedBenchCheck {
  def main(args: Array[String]): Unit = {
    val wh = java.nio.file.Files.createTempDirectory("bbc-wh").toString
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.files.openCostInBytes", (64 * 1024).toString)
      .config("spark.sql.files.maxPartitionBytes", (4 * 1024 * 1024).toString)
      .config("spark.sql.warehouse.dir", wh)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val docs = graft.model.DocsGenFast.docs(spark, 50000,
      graft.model.DocsGen.goldenScenario)
    BucketedTables.commit(spark, "bbc_docs", docs, "doc_id", 8)
    val meta = spark.sessionState.catalog.getTableMetadata(
      org.apache.spark.sql.catalyst.TableIdentifier("bbc_docs"))
    println(s"direct table shuffle-free: " +
      graft.checks.ConstraintChecks.docIdGroupingIsShuffleFree(spark.table("bbc_docs")))
    // the bench's re-register path
    spark.sql("DROP TABLE IF EXISTS bbc_docs2")
    spark.sql(s"CREATE TABLE bbc_docs2 (${meta.schema.toDDL}) USING PARQUET " +
      s"CLUSTERED BY (doc_id) SORTED BY (doc_id) INTO 8 BUCKETS " +
      s"LOCATION '${meta.location}'")
    println(s"re-registered table shuffle-free: " +
      graft.checks.ConstraintChecks.docIdGroupingIsShuffleFree(spark.table("bbc_docs2")))
    spark.stop()
  }
}
