package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Volume probe for the STREAMING near-dup dedup transaction
  * (`StreamingOps.nearDupDedupBatch`): feed B micro-batches of the
  * deterministic ProbeCorpus and measure the per-batch wall + shuffle as
  * the persisted posting/shingle index GROWS — the evidence behind the
  * operator's scale claims (batch-side broadcast join, narrow posting
  * scan, candidate-pruned shingle fetch). The operator is DuckDB-oracled
  * at sf0.01 (`stream_near_dup_dedup`); this is the volume leg.
  *
  * Batch k carries base slice k PLUS one-word-perturbed copies of every
  * `dupEvery`-th doc of slice k-1 — so every injected near-dup must be
  * dropped via the PERSISTED index (cross-batch), never within-batch.
  * Expected: survivors == nDocs (every base doc kept), drops == injected
  * count (zero false pairs at volume — same generator finding as
  * CurateProbe), and per-batch wall roughly flat while the index grows
  * linearly (the growing term is the narrow posting scan).
  *
  * `runMain graft.tools.StreamNddProbe [nDocs] [batches]`
  * (default 2,000,000 docs in 8 batches). */
object StreamNddProbe {
  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toLong).getOrElse(2000000L)
    val batches = args.lift(1).map(_.toInt).getOrElse(8)
    val dupEvery = 20
    val cores = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cores]")
      .appName("graft-stream-ndd-probe")
      .config("spark.sql.shuffle.partitions", cores)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val meter = new ProbeUtil.ShuffleMeter
    spark.sparkContext.addSparkListener(meter)

    val dir = java.nio.file.Files.createTempDirectory("stream-ndd-probe").toString
    val (base, tGen) = ProbeUtil.time(ProbeCorpus.writeBase(spark, n, dir))
    val slice = n / batches
    println(f"generated $n base docs in $tGen%.1f s ($batches batches of $slice)")

    val postingDir = s"$dir/posting"
    val shingleDir = s"$dir/shingles"
    val survivorsDir = s"$dir/survivors"
    val bands = 8 // nearDupDedupBatch default: postings per doc
    var injected = 0L
    var fedSoFar = 0L
    (0 until batches).foreach { k =>
      val lo = k * slice
      val hi = if (k == batches - 1) n else (k + 1) * slice
      val cur = base.filter(col("doc_id") >= lo && col("doc_id") < hi)
      // near-dups of the PREVIOUS slice: cross-batch drops only
      val batch =
        if (k == 0) cur
        else cur.unionByName(
          base.filter(col("doc_id") >= (k - 1) * slice &&
              col("doc_id") < lo && col("doc_id") % dupEvery === 0)
            .select((col("doc_id") + n).as("doc_id"),
              concat(col("text"), lit(" perturbed")).as("text")))
      // exact count of ids ≡ 0 (mod dupEvery) in [(k-1)·slice, lo)
      val dups =
        if (k == 0) 0L
        else {
          val a = (k - 1) * slice
          (lo - 1) / dupEvery - (if (a == 0) -1L else (a - 1) / dupEvery)
        }
      injected += dups
      val s0 = meter.snapshot
      val (_, t) = ProbeUtil.time { // batchId = the production batch-scoped write path
        graft.ops.StreamingOps.nearDupDedupBatch(batch, "doc_id", "text",
          postingDir, shingleDir, survivorsDir, batchId = k.toLong)
      }
      val s1 = meter.snapshot
      fedSoFar += hi - lo + dups // dropped docs' postings are indexed too
      println(f"batch $k%2d: ${hi - lo + dups}%8d docs ($dups%6d injected dups) " +
        f"in $t%6.1f s, index ${fedSoFar * bands}%,d postings, " +
        f"shuffle r/w ${(s1._1 - s0._1) / 1e9}%.2f/${(s1._2 - s0._2) / 1e9}%.2f GB")
    }

    val survivors = spark.read.parquet(survivorsDir).count()
    val fed = n + injected
    println(f"survivors $survivors of $fed fed (expected $n base, " +
      f"$injected injected dups all dropped cross-batch): " +
      (if (survivors == n) "OK" else "MISMATCH"))

    try { import scala.sys.process._; Seq("rm", "-rf", dir).! }
    catch { case _: Throwable => }
    spark.stop()
  }
}
