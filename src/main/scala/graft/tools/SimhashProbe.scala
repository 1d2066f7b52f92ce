package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.ops.Dedup

/** One-off probe: verified-pair counts for candidate configs. */
object SimhashProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val d = spark.read.parquet("/root/testdata/sf0.01/documents.parquet")
    val dups = d.filter(col("doc_id") % 25 === 0)
      .select((col("doc_id") + 1000000L).as("doc_id"),
        concat(col("text"), lit(" perturbed")).as("text"))
    val corpus = d.select(col("doc_id"), col("text")).union(dups)
    for ((ch, mh) <- Seq((8, 10), (8, 12), (8, 16), (16, 12))) {
      val n = Dedup.simhashJaccardPairs(corpus, "doc_id", "text",
        threshold = 0.5, maxHamming = mh, chunks = ch).count()
      println(s"chunks=$ch maxHamming=$mh -> $n verified pairs (want 46)")
    }
    spark.stop()
  }
}
