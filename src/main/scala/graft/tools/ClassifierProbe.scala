package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Classifier inference (P27) at volume: the production three-reference
  * formulation vs the single-reference struct-accumulator fold. Measured
  * 2M-doc result (BASELINE.md): PARITY within noise — the fold's saved
  * tokenizations are spent on per-token CreateNamedStruct allocation, so
  * the interpreted-HOF lesson (BigramPairs, 9.4×) does NOT generalize to
  * a constant number of extra linear passes. Outputs asserted
  * bit-identical at volume.
  *
  * `runMain graft.tools.ClassifierProbe [nDocs]` (default 2,000,000). */
object ClassifierProbe {
  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toLong).getOrElse(2000000L)
    val cores = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cores]")
      .appName("graft-classifier-probe")
      .config("spark.sql.shuffle.partitions", cores)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val dir = java.nio.file.Files.createTempDirectory("clf-probe").toString
    val base = ProbeCorpus.writeBase(spark, n, dir)
    val w = graft.ops.Classifier.syntheticWeights(1 << 16, seed = 17L)

    // interleaved min-of-3 (the bench lesson: first-run JIT + page-cache
    // effects of several seconds would otherwise counterfeit a winner —
    // single-shot A/B runs of THIS probe flipped 15.2/7.0 then 7.8/5.4)
    val paths = Seq(
      "three-reference" -> graft.ops.Classifier.scoreCol(col("text"), w),
      "struct-fold" -> graft.ops.Classifier.scoreColStructFold(col("text"), w))
    paths.foreach { case (_, c) => base.limit(10000).select(sum(c)).head() }
    val times = scala.collection.mutable.Map.empty[String, List[Double]]
    val sums = scala.collection.mutable.Map.empty[String, Double]
    for (_ <- 1 to 3; (label, c) <- paths) {
      val (s, t) = ProbeUtil.time(base.select(sum(c)).head.getDouble(0))
      times(label) = t :: times.getOrElse(label, Nil)
      sums(label) = s
    }
    paths.foreach { case (label, _) =>
      val best = times(label).min
      println(f"$label: min ${best}%.1f s (${n / best / 1e6}%.2f M docs/s), " +
        f"runs ${times(label).reverse.map(x => f"$x%.1f").mkString("/")} — checksum ${sums(label)}%.6f")
    }
    assert(sums.values.toSet.size == 1, "paths diverged at volume")
    spark.stop()
  }
}
