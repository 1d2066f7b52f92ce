package graft.engine

import java.nio.file.{Files, Path, Paths}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import scala.jdk.CollectionConverters._

/** Small-file COMPACTION over [[SnapshotCatalog]] tables (E24) — the
  * Iceberg `rewriteDataFiles`-shaped maintenance pass a 100 TB table
  * cannot live without: a streaming or incremental writer leaves
  * thousands of KB-scale parquet files per partition, and every
  * downstream scan then pays per-file open/footer costs that dwarf the
  * data read.
  *
  * Two layers, split exactly like Iceberg's:
  *   - [[plan]] is PURE and declarative — file metadata in, bin
  *     assignments out, one window over (part, file) with a running-sum
  *     start-offset binning (a file lands in the bin its cumulative start
  *     offset falls in, so every bin except a part's last holds ≥
  *     `targetBytes`). Deterministic under any partitioning (explicit
  *     (part, file) ordering), DuckDB-replayable to the byte.
  *   - [[compactParts]] EXECUTES: parts whose rewrite-plan bin count is
  *     below their current small-file count are rewritten part-at-a-time
  *     (read part → coalesce(bins) → write temp → atomic directory swap)
  *     and a new snapshot manifest is committed. Part-grain rewrite is
  *     the honest unit for this catalog — its manifests track PARTS, not
  *     files, so swapping a whole part directory is exactly as atomic as
  *     the catalog's own commit (Iceberg file-grain manifests would allow
  *     file-grain swaps; SURVEY.md §7 records the substitution).
  *
  * Scale shape: planning reads only file METADATA (driver-side listing —
  * the same driver-grain work as Iceberg's manifest scan; bounded by file
  * count, never rows). Rewrites scan each part once, shuffle-free
  * (`coalesce` narrows, never exchanges), and independent parts are
  * independent jobs — a cluster runs them concurrently; rewrite work is
  * proportional to the small-file mass being fixed, not table size. */
object Compaction {

  /** File metadata of a pinned snapshot: (part, file, bytes), one row per
    * data file. Driver-side NIO listing — manifest-grain, not row-grain. */
  def fileMetadata(spark: SparkSession, table: String, snapshotId: Long): DataFrame = {
    val snap = SnapshotCatalog.readManifest(table, snapshotId)
    val rows = snap.parts.flatMap { p =>
      val dir = Paths.get(table, "data", s"part=$p")
      if (!Files.isDirectory(dir)) Seq.empty
      else {
        // close the stream (it holds the directory fd until closed)
        val ls = Files.list(dir)
        try ls.iterator().asScala
          .filter(f => f.getFileName.toString.endsWith(".parquet"))
          .map(f => (p, f.getFileName.toString, Files.size(f)))
          .toList.sortBy(_._2)
        finally ls.close()
      }
    }
    import spark.implicits._
    rows.toDF("part", "file", "bytes")
  }

  /** The compaction plan over (part, file, bytes) metadata: adds
    *   action — 'rewrite' for small files (bytes < smallBytes), 'keep'
    *   bin    — 0-based bin id within the part for rewrites; -1 for keeps
    * Rewrite files bin by running-sum start offset within their part in
    * deterministic (file ASC) order: bin = floor((cumBytes − bytes) /
    * targetBytes). A file larger than targetBytes still lands in one bin
    * (bins can exceed target by < max small-file size — the standard
    * overflow rule; it never splits a file). */
  def plan(files: DataFrame, targetBytes: Long, smallBytes: Long): DataFrame = {
    require(targetBytes >= 1, s"compaction: targetBytes must be >= 1, got $targetBytes")
    require(smallBytes >= 1, s"compaction: smallBytes must be >= 1, got $smallBytes")
    val w = Window.partitionBy(col("part")).orderBy(col("file"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val small = col("bytes") < smallBytes
    files.select(col("part"), col("file"), col("bytes"))
      .withColumn("__cum", sum(when(small, col("bytes")).otherwise(0L)).over(w))
      .select(col("part"), col("file"), col("bytes"),
        when(small, lit("rewrite")).otherwise(lit("keep")).as("action"),
        when(small, floor((col("__cum") - col("bytes")) / targetBytes).cast("int"))
          .otherwise(lit(-1)).as("bin"))
  }

  /** Execute the plan: every part whose rewrite bin count is LOWER than
    * its rewrite file count is read once, coalesced to that bin count,
    * written to a temp dir, atomically swapped in, and a new manifest
    * committed (same part set, snapshotId+1). Returns
    * (newSnapshotId, partsRewritten, filesBefore, filesAfter). */
  def compactParts(spark: SparkSession, table: String, snapshotId: Long,
                   targetBytes: Long, smallBytes: Long): (Long, Int, Long, Long) = {
    val meta = fileMetadata(spark, table, snapshotId)
    val p = plan(meta, targetBytes, smallBytes)
    val perPart = p.groupBy(col("part")).agg(
      sum(when(col("action") === "rewrite", 1L).otherwise(0L)).as("n_rewrite"),
      (max(when(col("action") === "rewrite", col("bin"))) + 1)
        .cast("long").as("n_bins"),
      count(lit(1)).as("n_files"))
      .collect() // part-grain, manifest-bounded
    val filesBefore = perPart.map(_.getLong(3)).sum
    val toCompact = perPart.filter(r =>
      !r.isNullAt(2) && r.getLong(1) > 0 && r.getLong(2) < r.getLong(1))
    toCompact.foreach { r =>
      val part = r.getInt(0)
      val bins = r.getLong(2).toInt
      val partDir = Paths.get(table, "data", s"part=$part")
      val tmpDir = Paths.get(table, "data", s".part=$part.compact.tmp")
      val oldDir = Paths.get(table, "data", s".part=$part.compact.old")
      deleteRecursive(tmpDir); deleteRecursive(oldDir)
      // keep-files pass through untouched only if the whole part rewrites;
      // part-grain swap rewrites them too — correct, just not minimal, and
      // bounded by the part's own size.
      spark.read.parquet(partDir.toString)
        .coalesce(math.max(bins, 1))
        .write.option("compression", "zstd").parquet(tmpDir.toString)
      // two renames; the catalog's own commit() is the atomicity boundary
      Files.move(partDir, oldDir)
      Files.move(tmpDir, partDir)
      deleteRecursive(oldDir)
    }
    val snap = SnapshotCatalog.readManifest(table, snapshotId)
    val id = snapshotId + 1
    val json = s"""{"snapshot_id":$id,"created_at_ms":${System.currentTimeMillis()},""" +
      s""""parts":[${snap.parts.mkString(",")}]}"""
    val snapDir = Paths.get(table, "_snapshots")
    Files.createDirectories(snapDir)
    val tmp = snapDir.resolve(s".v$id.json.tmp")
    Files.write(tmp, json.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    Files.move(tmp, snapDir.resolve(s"v$id.json"),
      java.nio.file.StandardCopyOption.ATOMIC_MOVE)
    val filesAfter = fileMetadata(spark, table, id).count()
    (id, toCompact.length, filesBefore, filesAfter)
  }

  private def deleteRecursive(p: Path): Unit = {
    if (Files.exists(p)) {
      Files.walk(p).iterator().asScala.toSeq.reverse.foreach(Files.deleteIfExists(_))
    }
  }
}
