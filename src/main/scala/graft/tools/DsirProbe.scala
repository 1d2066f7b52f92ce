package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** DSIR importance resampling (P39) at volume: fit hashed-bigram log
  * ratios of a 100k-doc TARGET slice against a 10M-doc raw ProbeCorpus,
  * score the corpus, and select a 1M-doc budget both ways (Gumbel top-k
  * enumeration vs the threshold rung). Verifies at volume that:
  *   - fitting is two slim count exchanges (shuffle measured, O(dim)
  *     result) and scoring is a shuffle-free narrow pass;
  *   - the planted target flavor (docs carrying a marker token pair) is
  *     enriched far above its base rate in the selection;
  *   - threshold selection reproduces the top-k set exactly at the k-th
  *     key (the two rungs agree at their seam).
  *
  * `runMain graft.tools.DsirProbe [nDocs]` (default 10,000,000). Results
  * recorded in BASELINE.md.
  */
object DsirProbe {
  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toLong).getOrElse(10000000L)
    val cores = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cores]")
      .appName("graft-dsir-probe")
      .config("spark.sql.shuffle.partitions", cores)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val meter = new ProbeUtil.ShuffleMeter
    spark.sparkContext.addSparkListener(meter)

    val dir = java.nio.file.Files.createTempDirectory("dsir-probe").toString
    val (base0, tGen) = ProbeUtil.time(ProbeCorpus.writeBase(spark, n, dir))
    // plant the target flavor on 2% of docs: a marker bigram pair appended
    val corpus = base0.select(col("doc_id"),
      when(col("doc_id") % 50 === 0,
        concat(col("text"), lit(" zqmarker zqflavor zqmarker zqflavor")))
        .otherwise(col("text")).as("text"))
    println(f"generated $n docs in $tGen%.1f s (2%% carry the target marker)")

    // target: an independent 100k-doc slice of the same flavor
    val target = spark.range(100000).select(
      (col("id") + n).as("doc_id"),
      concat(lit("zqmarker zqflavor zqmarker zqflavor and the of "),
        col("id").cast("string")).as("text"))

    // smoothing NOTE (measured, 200k-doc diagnostic): the target is SPARSE
    // over dim buckets (~1.5 occurrences/bucket outside its marker mass),
    // so λ controls the VARIANCE of the absent-feature penalty — at
    // λ=0.01 a zero-target bucket scores ln(λ/N_t·…) ≈ −7.1 while a
    // one-hit bucket scores −2.5, a per-bucket spread that sums to a
    // per-doc noise std ≈ 11, swamping the ~+16 marker bonus (enrichment
    // collapsed to 4.3×). λ=1 narrows the spread to ≈ 2.7 and the
    // selection separates cleanly. Size λ to the target's per-bucket
    // occupancy, not to a universal default.
    val dim = 65536
    val s0 = meter.snapshot
    val (lr, tFit) = ProbeUtil.time {
      graft.ops.Dsir.featureLogRatios(target, corpus, "text", dim, smoothing = 1.0)
    }
    val s1 = meter.snapshot
    println(f"fit(dim=$dim): $tFit%.1f s, shuffle r/w ${(s1._1 - s0._1) / 1e9}%.3f/${(s1._2 - s0._2) / 1e9}%.3f GB")

    val k = (n / 10).toInt.max(1000)
    val (sel, tSel) = ProbeUtil.time {
      val out = graft.ops.Dsir.selectTopK(corpus, "doc_id", "text", lr, k)
        .select(col("doc_id")).persist()
      out.count()
      out
    }
    val s2 = meter.snapshot
    val markers = sel.filter(col("doc_id") % 50 === 0).count()
    println(f"selectTopK(k=$k): $tSel%.1f s, shuffle r/w ${(s2._1 - s1._1) / 1e9}%.3f/${(s2._2 - s1._2) / 1e9}%.3f GB — " +
      f"marker docs ${markers} of $k (a base-rate pick would carry ${k / 50})")
    assert(markers >= 5L * (k / 50),
      "selection must enrich the target flavor >= 5x above base rate")

    // threshold rung at the k-th key: must reproduce the same set
    val (tauRow, tTau) = ProbeUtil.time {
      corpus.select(
          graft.ops.Dsir.selectionKey(col("doc_id"), col("text"), lr).as("key"))
        .orderBy(col("key").desc).limit(k)
        .agg(min(col("key"))).head()
    }
    val tau = tauRow.getDouble(0)
    val (thrCount, tThr) = ProbeUtil.time {
      graft.ops.Dsir.selectByThreshold(corpus, "doc_id", "text", lr, tau).count()
    }
    val s3 = meter.snapshot
    val overlap = graft.ops.Dsir
      .selectByThreshold(corpus, "doc_id", "text", lr, tau)
      .select(col("doc_id")).join(sel, "doc_id").count()
    println(f"threshold rung (tau=$tau%.4f, found in $tTau%.1f s): $tThr%.1f s, " +
      f"shuffle r/w ${(s3._1 - s2._1) / 1e9}%.3f/${(s3._2 - s2._2) / 1e9}%.3f GB — " +
      f"$thrCount rows, overlap with top-k $overlap (expect $k both)")
    assert(thrCount == k && overlap == k, "the two selection rungs disagree at the seam")
    sel.unpersist()
    spark.stop()
  }
}
