package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.engine.SnapshotCatalog

/** Volume evidence for merge-on-read deletes (E44): build an `n`-doc
  * snapshot table, commit a `k`-key delete set, and measure the three
  * costs the design trades between:
  *   - commitDeletes wall (the O(delete batch) promise — no data rewrite),
  *   - the read-time MOR tax while deletes are pending (scan+anti-join vs
  *     a clean scan of the same snapshot),
  *   - materializeDeletes wall (the key-stats-pruned COW fold) and the
  *     post-materialize read returning to clean-scan cost.
  * Correctness is asserted inline (counts drop by exactly the matched
  * keys; logical ≡ physical).
  *
  * `runMain graft.tools.MorProbe [nDocs] [nDeletes]` (default 10,000,000
  * and 100,000).
  */
object MorProbe {
  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toLong).getOrElse(10000000L)
    val k = args.drop(1).headOption.map(_.toLong).getOrElse(100000L)
    val cores = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cores]")
      .appName("graft-mor-probe")
      .config("spark.sql.shuffle.partitions", cores)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def timed[T](what: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"[mor-probe] $what: ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }

    val table = java.nio.file.Files.createTempDirectory("mor-probe").toString
    val parts = 64
    val docs = spark.range(n).select(
      format_string("d-%012d", col("id")).as("doc_id"),
      concat(lit("text of doc "), col("id")).as("text"),
      (col("id") % parts).cast("int").as("part"))
    val s1 = timed(s"commit $n docs / $parts parts")(
      SnapshotCatalog.commit(table, docs))
    val clean = timed("clean read count")(
      SnapshotCatalog.read(spark, table, s1.snapshotId).count())
    require(clean == n)

    // delete every (n/k)-th key — spread across the whole table, so every
    // part is affected (worst case for materialize's pruning)
    val delKeys = spark.range(k).select(
      format_string("d-%012d", col("id") * (n / k)).as("doc_id"))
    val s2 = timed(s"commitDeletes ($k keys)")(
      SnapshotCatalog.commitDeletes(table, delKeys, "doc_id"))
    val morCount = timed("MOR read count (pending deletes)")(
      SnapshotCatalog.read(spark, table, s2.snapshotId).count())
    require(morCount == n - k, s"mor count $morCount != ${n - k}")

    val s3 = timed("materializeDeletes")(
      SnapshotCatalog.materializeDeletes(spark, table))
    require(s3.deleteFiles.isEmpty)
    val matCount = timed("post-materialize read count")(
      SnapshotCatalog.read(spark, table, s3.snapshotId).count())
    require(matCount == n - k, s"materialized count $matCount != ${n - k}")

    println(s"[mor-probe] ok: n=$n k=$k parts=$parts " +
      s"snapshots=${s1.snapshotId}->${s3.snapshotId}")
    spark.stop()
  }
}
