package graft.ops

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Maintenance for the persisted, partitioned ANN / dedup indexes.
  *
  * Every incremental append path — [[Similarity.lshIndexAppend]] (bucket=),
  * [[IvfAnn.indexAppend]] / [[Pq.indexAppend]] (list=, under `/lists`), and
  * the streaming near-dup stores ([[StreamingOps.nearDupDedupBatch]], pb=/
  * sp=) — adds a fresh set of files to each touched partition directory per
  * append. After thousands of appends the data is unchanged but the FILE
  * COUNT is O(appends × tasks): listing dominates planning, scans open
  * thousands of tiny files, and partition pruning saves I/O but not
  * metadata work. Compaction is the standard answer (Iceberg's
  * rewriteDataFiles; this repo's plain-parquet analog).
  */
object IndexMaintenance {

  /** Rewrite a `partitionBy(partCols…)` parquet directory so each partition
    * path holds ONE file (hash-distributing rows by the FINEST partition
    * column routes each of its values to exactly one task; the partitioned
    * write then splits per directory). Pass every level of a nested layout
    * in order — e.g. `("batch", "pb")` for the batch-scoped streaming
    * stores — so the rewrite preserves the directory shape later writes
    * expect. Underscore-prefixed sidecar children (e.g. the LSH
    * `_graft_lsh_meta` config) are carried over, so readers and
    * append-guards see an unchanged index. Returns (filesBefore,
    * filesAfter) data-file counts.
    *
    * Cost is one full shuffle of the index — inherent to compaction and
    * amortized over every later read; run it offline or, for the streaming
    * stores, between micro-batches (foreachBatch is serial, so nothing
    * reads mid-swap). The swap is move-aside (rename old → .compacted-old,
    * rename tmp in, delete the old tree): a crash at any point leaves a
    * recoverable tree on disk, never a silently-missing store — but it is
    * still NOT atomic against concurrent readers; a deployment on object
    * storage would publish via a catalog/manifest (Iceberg snapshot
    * commit) instead of renames. */
  def compactPartitionedIndex(spark: SparkSession, dir: String,
                              partCols: String*): (Long, Long) = {
    import java.nio.file.{Files, Path, Paths}
    require(partCols.nonEmpty, "compactPartitionedIndex: no partition columns")
    val root = Paths.get(dir)
    require(Files.isDirectory(root), s"compactPartitionedIndex: no index at $dir")

    def dataFiles(p: Path): Long = {
      val s = Files.walk(p)
      try s.filter(f => Files.isRegularFile(f) &&
          f.getFileName.toString.endsWith(".parquet") &&
          !f.getFileName.toString.startsWith("_") &&
          !f.getFileName.toString.startsWith("."))
        .count()
      finally s.close()
    }
    val before = dataFiles(root)

    // derive from the NORMALIZED root: a trailing slash on `dir` must not
    // nest the temp dir inside the tree we are about to delete
    val tmp = root.resolveSibling(root.getFileName.toString + ".compacting")
    try { import scala.sys.process._; Seq("rm", "-rf", tmp.toString).! }
    catch { case _: Throwable => }
    spark.read.parquet(dir)
      .repartition(col(partCols.last))
      .write.mode("overwrite").partitionBy(partCols: _*).parquet(tmp.toString)

    // carry sidecars the parquet read is blind to (_-prefixed children)
    val ls = Files.list(root)
    try ls.filter(_.getFileName.toString.startsWith("_"))
      .forEach { side =>
        val dst = tmp.resolve(side.getFileName)
        try { import scala.sys.process._
          Seq("cp", "-r", side.toString, dst.toString).!
        } catch { case _: Throwable => }
      }
    finally ls.close()

    // move-aside swap: two renames, never a window with the data deleted —
    // a crash leaves either the old tree at `dir` or at `dir`.compacted-old
    // (recoverable by hand), never a missing store that a streaming reader
    // would silently treat as "no history"
    val old = root.resolveSibling(root.getFileName.toString + ".compacted-old")
    try { import scala.sys.process._; Seq("rm", "-rf", old.toString).! }
    catch { case _: Throwable => }
    Files.move(root, old)
    Files.move(tmp, root)
    try { import scala.sys.process._; Seq("rm", "-rf", old.toString).! }
    catch { case _: Throwable => }
    (before, dataFiles(root))
  }

  /** Append-time id-field guard shared by every incremental index family
    * (LSH bucket=, IVF/PQ lists): the stored id field — looked up by NAME
    * when the layout fixes one ("id" for LSH), else the first data column
    * (IVF/PQ lists store the caller's id first) — must match the incoming
    * id's type, or mixed int32/int64 files under one layout kill later
    * scans on schema merge. One copy so the check cannot drift per
    * family. */
  private[ops] def requireSameIdType(spark: SparkSession, dataPath: String,
      storedIdName: Option[String],
      incoming: org.apache.spark.sql.types.DataType, what: String): Unit = {
    val sch = spark.read.parquet(dataPath).schema
    val field = storedIdName.flatMap(n => sch.find(_.name == n)).getOrElse(sch.head)
    require(field.dataType == incoming,
      s"$what: index at $dataPath stores ids as ${field.dataType}, append " +
        s"brings $incoming — mixed id types would corrupt the layout")
  }

  /** Recency-bound a batch-SCOPED store (`batch=<id>` subtrees, as written
    * by [[StreamingOps.nearDupDedupBatch]] with a real batchId): delete
    * every subtree with id < `keepFromBatchId`. Expired docs no longer
    * suppress future near-dups — retention-window dedup semantics — and
    * the per-micro-batch posting scan stays O(retained history), not
    * O(forever). Apply to the posting AND shingle stores together (a
    * posting whose shingles expired would verify against nothing). Run
    * while the stream is quiescent; config sidecars are siblings and
    * untouched. Returns the number of subtrees dropped. */
  def expireScopedBatches(dir: String, keepFromBatchId: Long): Int = {
    import java.nio.file.{Files, Paths}
    val root = Paths.get(dir)
    if (!Files.isDirectory(root)) return 0
    val Part = "batch=(-?\\d+)".r
    var dropped = 0
    val ls = Files.list(root)
    try ls.forEach { child =>
      child.getFileName.toString match {
        case Part(id) if id.toLong < keepFromBatchId =>
          try { import scala.sys.process._
            Seq("rm", "-rf", child.toString).!
            dropped += 1
          } catch { case _: Throwable => }
        case _ => ()
      }
    } finally ls.close()
    dropped
  }
}
