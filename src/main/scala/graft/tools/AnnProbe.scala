package graft.tools

import org.apache.spark.sql.SparkSession

/** Corpus-scale probe for the ANN/dedup family: generates N deterministic
  * 64-dim embeddings (compiled SplitMix64 per row — no interpreted HOFs),
  * persists them, and measures the per-row kNN join and the
  * embedding-cosine dedup at real volume, reporting wall, output size, and
  * the per-bucket candidate arithmetic. Evidence that the bucketed shapes
  * hold at millions of vectors, not just the 500-row testdata.
  *
  * `runMain graft.tools.AnnProbe [nVecs] [planes]` (defaults 5,000,000 × 16
  * → ~76 rows per bucket → ~0.8G candidate pairs for the kNN join at
  * probes=2). Results recorded in BASELINE.md.
  */
object AnnProbe {
  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toLong).getOrElse(5000000L)
    val planes = args.drop(1).headOption.map(_.toInt).getOrElse(16)
    val cores = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cores]")
      .appName("graft-ann-probe")
      .config("spark.sql.shuffle.partitions", cores)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    val dir = java.nio.file.Files.createTempDirectory("ann-probe").toString
    val (_, tGen) = ProbeUtil.time {
      spark.range(n).mapPartitions(_.map { id =>
        // NOT id * golden-gamma: SplitMix64 advances by that constant per
        // draw, so gamma-multiplied seeds make vec id+1's stream vec id's
        // shifted by one dim (correlated embeddings, artificial bucket skew)
        val rng = new graft.stats.StatMath.SplitMix64(id * 0x6C8E9CF570932BD5L + 7L)
        (id, Seq.fill(64)(rng.nextDouble() * 2 - 1))
      }).toDF("vec_id", "embedding")
        .write.mode("overwrite").parquet(dir)
    }
    val embs = spark.read.parquet(dir)
    println(f"generated $n vecs x 64 dims in $tGen%.1f s -> $dir")

    // bucket census (diagnostic): candidate volume = sum over buckets of
    // |b| * probes per query row
    val stats = embs.select(graft.ops.Similarity.hyperplaneBucket(
        org.apache.spark.sql.functions.col("embedding"), planes).as("b"))
      .groupBy("b").count()
      .agg(org.apache.spark.sql.functions.count("*"),
        org.apache.spark.sql.functions.max("count"),
        org.apache.spark.sql.functions.avg("count")).head()
    println(f"buckets=${stats.getLong(0)} maxPop=${stats.getLong(1)} avgPop=${stats.getDouble(2)}%.1f")

    val (knnRows, tKnn) = ProbeUtil.time {
      graft.ops.Similarity.knnJoin(embs, "vec_id", "embedding", k = 5,
        planes = planes, probes = 2).count()
    }
    println(f"knnJoin k=5 planes=$planes probes=2: $tKnn%8.1f s, $knnRows rows " +
      f"(${n / tKnn}%.0f rows/s)")

    val (dupRows, tDup) = ProbeUtil.time {
      graft.ops.Dedup.embeddingCosineDups(embs, "vec_id", "embedding",
        threshold = 0.99, planes = planes, censusFrac = 0.01).count()
    }
    println(f"embeddingCosineDups t=0.99 planes=$planes (1%% census): $tDup%8.1f s, $dupRows pairs")

    try { import scala.sys.process._; Seq("rm", "-rf", dir).! }
    catch { case _: Throwable => }
    spark.stop()
  }
}
