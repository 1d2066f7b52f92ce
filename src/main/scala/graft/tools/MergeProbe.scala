package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.engine.{Merge, SnapshotCatalog}

/** Copy-on-write MERGE at volume (E29 × E31): commits a base snapshot, then
  * runs a POINT merge (keys confined to one part) and measures
  *   a) manifest key-stats pruning — detection-scan wall and rows touched
  *      with the stats-carrying manifest vs the same merge on a manifest
  *      stripped of stats (the sound-but-coarse fallback), and
  *   b) the rewrite itself — wall proportional to the AFFECTED mass, not
  *      the table.
  * The claims being measured: a point merge plans against O(1) parts from
  * the manifest alone, and total merge cost is O(affected + source).
  *
  * Usage: MergeProbe [nDocs] [parts] [cores]  (default 10M, 20, 32)
  */
object MergeProbe {
  def main(args: Array[String]): Unit = {
    val nDocs = args.headOption.map(_.toLong).getOrElse(10000000L)
    val nParts = if (args.length > 1) args(1).toInt else 20
    val cores = if (args.length > 2) args(2).toInt else 32
    val spark = SparkSession.builder()
      .master(s"local[$cores]")
      .appName("graft-merge-probe")
      .config("spark.sql.shuffle.partitions", cores.toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    val meter = new ProbeUtil.ShuffleMeter
    spark.sparkContext.addSparkListener(meter)
    // scan-input meter: the pruning claim is about BYTES READ by the
    // detection scan (wall is flat at local scale where the scan is cheap)
    val inputBytes = new java.util.concurrent.atomic.AtomicLong
    spark.sparkContext.addSparkListener(
      new org.apache.spark.scheduler.SparkListener {
        override def onStageCompleted(
            s: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
          val m = s.stageInfo.taskMetrics
          if (m != null) inputBytes.addAndGet(m.inputMetrics.bytesRead)
        }
      })

    def freshTable(suffix: String): (String, SnapshotCatalog.Snapshot, Double) = {
      val base = java.nio.file.Files.createTempDirectory(s"merge_probe_$suffix")
      val table = s"$base/table"
      val (snap, t) = ProbeUtil.time(SnapshotCatalog.commit(table,
        graft.model.DocsGen.docs(spark, nDocs,
          graft.model.DocsGen.cleanScenario(nParts))))
      (table, snap, t)
    }

    def pointMerge(table: String, snap: SnapshotCatalog.Snapshot)
        : (Merge.MergeResult, Double) = {
      val docs = SnapshotCatalog.read(spark, table, snap.snapshotId)
      // keys confined to ONE part: 1% of part 3's docs updated, 0.5% deleted
      val upd = docs.filter($"part" === 3 &&
          pmod(xxhash64($"doc_id", lit("mp-u")), lit(100L)) === 0)
        .select(docs.columns.filterNot(_ == "part").map(col): _*)
      val del = docs.filter($"part" === 3 &&
          pmod(xxhash64($"doc_id", lit("mp-u")), lit(100L)) =!= 0 &&
          pmod(xxhash64($"doc_id", lit("mp-d")), lit(200L)) === 0)
        .select("doc_id")
      ProbeUtil.time(Merge.merge(spark, table, upd, del))
    }

    // ---- warm-up: a tiny throwaway merge so JIT/footer-cache effects
    // don't bias whichever measured run goes first ----
    {
      val (tw, sw, _) = {
        val base = java.nio.file.Files.createTempDirectory("merge_probe_w")
        val table = s"$base/table"
        val (snap, t) = ProbeUtil.time(SnapshotCatalog.commit(table,
          graft.model.DocsGen.docs(spark, 50000,
            graft.model.DocsGen.cleanScenario(nParts))))
        (table, snap, t)
      }
      pointMerge(tw, sw)
    }

    // ---- run A: stats-carrying manifest (commit default) ----
    val (tableA, snapA, commitT) = freshTable("a")
    println(f"commit: $nDocs docs / $nParts parts in $commitT%.1f s " +
      s"(stats for ${snapA.partStats.size} parts)")
    val s0 = meter.snapshot
    val in0 = inputBytes.get
    val (rA, tA) = pointMerge(tableA, snapA)
    val s1 = meter.snapshot
    val inA = inputBytes.get - in0
    println(f"A stats-pruned merge: $tA%.1f s; candidates=${rA.candidateParts.mkString(",")} " +
      f"rewritten=${rA.rewrittenParts.keySet.mkString(",")} " +
      f"shuffleR=${(s1._1 - s0._1) / 1e6}%.1f MB inputR=${inA / 1e6}%.1f MB")

    // ---- run B: same merge against a manifest stripped of stats ----
    val (tableB, snapB, _) = freshTable("b")
    // strip the stats by hand-writing a stat-less manifest as the next id
    val dir = java.nio.file.Paths.get(tableB, "_snapshots")
    java.nio.file.Files.write(dir.resolve(s"v${snapB.snapshotId + 1}.json"),
      s"""{"snapshot_id":${snapB.snapshotId + 1},"created_at_ms":0,"parts":[${snapB.parts.mkString(",")}]}"""
        .getBytes)
    val snapB2 = SnapshotCatalog.readManifest(tableB, snapB.snapshotId + 1)
    require(snapB2.partStats.isEmpty, "strip failed")
    val s2 = meter.snapshot
    val in1 = inputBytes.get
    val (rB, tB) = pointMerge(tableB, snapB2)
    val s3 = meter.snapshot
    val inB = inputBytes.get - in1
    println(f"B stat-less merge:    $tB%.1f s; candidates=${rB.candidateParts.size} parts " +
      f"rewritten=${rB.rewrittenParts.keySet.mkString(",")} " +
      f"shuffleR=${(s3._1 - s2._1) / 1e6}%.1f MB inputR=${inB / 1e6}%.1f MB")

    // survivors identical regardless of pruning
    val a = SnapshotCatalog.read(spark, tableA, rA.snapshot.snapshotId)
    val b = SnapshotCatalog.read(spark, tableB, rB.snapshot.snapshotId)
    val (ca, cb) = (a.count(), b.count())
    println(s"row counts: A=$ca B=$cb identical=${ca == cb}")
    require(ca == cb, "pruned and unpruned merges disagree")
    println(f"pruning effect: candidates ${rA.candidateParts.size} vs " +
      f"${rB.candidateParts.size} parts, detection+rewrite wall $tA%.1f vs $tB%.1f s")
    spark.stop()
  }
}
