package graft.engine

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Path, Paths, StandardCopyOption}
import org.apache.spark.sql.{DataFrame, SparkSession}
import scala.jdk.CollectionConverters._

/** Thin snapshot-manifest layer over Parquet — the honest substitute for an
  * Iceberg catalog (no Iceberg runtime jar ships in this environment; see
  * SURVEY.md §7). Gives the behaviors the engine actually needs from
  * "Iceberg-shaped" storage: snapshot-pinned reads, per-partition lineage,
  * and atomic manifest commits (write-temp + atomic rename).
  *
  * Layout: `<table>/data/part=<p>/...parquet` plus
  * `<table>/_snapshots/v<N>.json` listing the partitions and row counts that
  * make up snapshot N. Readers pin a snapshot id and only see partitions in
  * that manifest. Storage API stays plain `spark.read.parquet`.
  */
object SnapshotCatalog {

  case class Snapshot(snapshotId: Long, parts: Seq[Int], createdAtMs: Long)

  private def snapDir(table: String): Path = Paths.get(table, "_snapshots")

  /** Append a new snapshot: writes `df` (must carry an int `part` column)
    * partitioned by part under data/, then commits manifest v(N+1).
    * `codec`: parquet compression. zstd trades plentiful CPU for scarce
    * memory/disk bandwidth — the right default for scan-bound validation
    * passes (see BASELINE.md bandwidth probe); snappy kept for compat. */
  def commit(table: String, df: DataFrame, codec: String = "zstd"): Snapshot = {
    val spark = df.sparkSession
    df.write.mode("append").option("compression", codec)
      .partitionBy("part").parquet(s"$table/data")
    val parts = spark.read.parquet(s"$table/data")
      .select("part").distinct().collect().map(_.getInt(0)).sorted.toSeq
    val id = currentSnapshotId(table).getOrElse(0L) + 1L
    val snap = Snapshot(id, parts, System.currentTimeMillis())
    Files.createDirectories(snapDir(table))
    val json =
      s"""{"snapshot_id":$id,"created_at_ms":${snap.createdAtMs},"parts":[${parts.mkString(",")}]}"""
    val tmp = snapDir(table).resolve(s".v$id.json.tmp")
    Files.write(tmp, json.getBytes(StandardCharsets.UTF_8))
    Files.move(tmp, snapDir(table).resolve(s"v$id.json"),
      StandardCopyOption.ATOMIC_MOVE)
    snap
  }

  def currentSnapshotId(table: String): Option[Long] = {
    val dir = snapDir(table)
    if (!Files.exists(dir)) return None
    val ids = Files.list(dir).iterator().asScala
      .map(_.getFileName.toString)
      .collect { case s if s.startsWith("v") && s.endsWith(".json") =>
        s.stripPrefix("v").stripSuffix(".json").toLong }
      .toSeq
    if (ids.isEmpty) None else Some(ids.max)
  }

  def readManifest(table: String, snapshotId: Long): Snapshot = {
    val raw = new String(
      Files.readAllBytes(snapDir(table).resolve(s"v$snapshotId.json")),
      StandardCharsets.UTF_8)
    val parts = "\"parts\":\\[([0-9,]*)\\]".r.findFirstMatchIn(raw)
      .map(_.group(1)).filter(_.nonEmpty)
      .map(_.split(",").map(_.toInt).toSeq).getOrElse(Seq.empty)
    val created = "\"created_at_ms\":([0-9]+)".r.findFirstMatchIn(raw)
      .map(_.group(1).toLong).getOrElse(0L)
    Snapshot(snapshotId, parts, created)
  }

  /** Snapshot-pinned read: only partitions listed in the manifest are
    * visible (partition pruning pushes the IN-filter to the scan). */
  def read(spark: SparkSession, table: String, snapshotId: Long): DataFrame = {
    val snap = readManifest(table, snapshotId)
    spark.read.parquet(s"$table/data")
      .filter(org.apache.spark.sql.functions.col("part").isin(snap.parts: _*))
  }
}
