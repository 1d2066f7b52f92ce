package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.ops.Bpe

/** Measures Bpe.train's per-merge cost curve over long horizons — the
  * evidence that the parquet lineage truncation (train's truncateEvery)
  * kills the exponential plan blowup the raw project-over-cache chain
  * exhibited. Pre-truncation measurement (this probe's earlier per-round
  * loop): ~0.2 s/round through round 8, 46 s by round 18, then heap OOM
  * inside AQE's explainString over the exponentially-duplicated plan.
  * Pass criterion now: s/merge stays flat as the horizon doubles. */
object BpeLineageProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val docs = spark.read.parquet("/root/testdata/sf0.01/documents.parquet")
      .select(col("doc_id"), col("text"))
    for (m <- Seq(15, 30, 60, 120)) {
      val (out, t) = ProbeUtil.time(
        Bpe.train(docs, "text", numMerges = m, batchK = 8).collect())
      println(f"merges=$m%-4d got=${out.length}%-4d wall=$t%.1fs (${t / out.length}%.3f s/merge)")
    }
    spark.stop()
  }
}
