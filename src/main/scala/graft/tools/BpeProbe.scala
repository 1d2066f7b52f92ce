package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.ops.Bpe

/** Measured round-cost curve for BPE training (P37): a 32k-merge
  * vocabulary cannot pay one driver round-trip per merge, so `train`
  * grows a `batchK` that amortizes each pair-count job over up to K
  * symbol-disjoint merges (stop-at-conflict keeps the canonical order —
  * BpeSpec pins batched ≡ sequential). This probe replicates the sf0.1
  * documents table to ~10M docs and times ≥100-merge training at
  * batchK ∈ {1, 8, 32}: the corpus-grain word count is paid once, after
  * which per-merge cost is (rounds/merges) × vocab-grain job — the
  * sub-linear curve the batch buys.
  *
  * Run: sbt "runMain graft.tools.BpeProbe [replicate] [merges]" */
object BpeProbe {
  def main(args: Array[String]): Unit = {
    val replicate = if (args.length > 0) args(0).toInt else 2000
    val merges = if (args.length > 1) args(1).toInt else 100
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.driver.memory", "16g")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val base = spark.read.parquet("/root/testdata/sf0.1/documents.parquet")
      .select(col("doc_id"), col("text"))
    val docs = base
      .withColumn("__r", explode(sequence(lit(1), lit(replicate))))
      .drop("__r")
    val n = docs.count()
    println(s"corpus: $n docs (${base.count()} x $replicate)")
    // sequential baseline at a SHORT horizon (paying 100 one-merge rounds
    // at 10M docs is exactly the cost the batch exists to avoid — 16
    // rounds suffice to price s/merge); batched runs the full horizon
    for ((k, m) <- Seq((1, math.min(16, merges)), (8, merges), (32, merges))) {
      val (out, t) = ProbeUtil.time(
        Bpe.train(docs, "text", numMerges = m, batchK = k).collect())
      println(f"batchK=$k%-3d merges=${out.length}%-4d wall=${t}%.1fs " +
        f"(${out.length / t}%.1f merges/s, ${t / out.length}%.3f s/merge)")
    }
    spark.stop()
  }
}
