package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Volume probe for P29 dimensionality reduction. Generates N 64-dim
  * background embeddings plus 100 PLANTED true neighbors of a known query
  * (cosine 0.85–0.99, separated from the ~0.5 background band — the shape
  * real retrieval/near-dup corpora exhibit), persists a latent index, and
  * measures per stage:
  *   - stage 1: latent-space candidate generation (reads only (id, latent)
  *     — the 8× narrower scan that is the 100 TB claim)
  *   - stage 2: exact re-rank of the k×oversample candidates via broadcast
  *     join, and recall@10 vs the full-width brute force.
  * The `uniform` mode drops the planted neighbors — the adversarial
  * no-structure case where the top-10 of N random vectors are separated by
  * ~1e-3 cosine, BELOW JL resolution at small outDim, and recall
  * collapses. Documented, not hidden: a latent cut can rank well-separated
  * neighbor bands, not ties inside JL noise (σ ≈ (1−cos²)/√outDim).
  *
  * The oversample sweep (C = 40 / 400 / 4000) quantifies the recall↔cost
  * knob: stage-2 stays far below the brute scan while C grows 100×.
  *
  * `runMain graft.tools.DimRedProbe [nVecs] [outDim] [uniform|structured] [reuseDir]`
  * (defaults 5,000,000 × 16, structured). Results in BASELINE.md.
  */
object DimRedProbe {
  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toLong).getOrElse(5000000L)
    val outDim = args.drop(1).headOption.map(_.toInt).getOrElse(16)
    val uniform = args.drop(2).headOption.contains("uniform")
    val reuse = args.drop(3).headOption
    val cores = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cores]")
      .appName("graft-dimred-probe")
      .config("spark.sql.shuffle.partitions", cores)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    // fixed query direction; structured corpus blends each random vector
    // toward it with per-row weight w^4 (so only ~1/16 of rows are strongly
    // query-like — a planted neighborhood, not a degenerate corpus)
    val qDir = {
      val rng = new graft.stats.StatMath.SplitMix64(0x9E3779B97F4A7C15L)
      Array.fill(64)(rng.nextDouble() * 2 - 1)
    }
    val qB = spark.sparkContext.broadcast(qDir)
    val dir = reuse.getOrElse(
      java.nio.file.Files.createTempDirectory("dimred-probe").toString)
    if (reuse.isEmpty) {
      val (_, tGen) = ProbeUtil.time {
        spark.range(n).mapPartitions { it =>
          val q = qB.value
          it.map { id =>
            val rng = new graft.stats.StatMath.SplitMix64(id * 0x6C8E9CF570932BD5L + 7L)
            val base = Array.fill(64)(rng.nextDouble() * 2 - 1)
            // first 100 ids: planted neighbors, blend weight 0.70..0.997 →
            // cosine ~0.85..0.999, a band separated from the background
            val w = if (!uniform && id < 100) 0.7 + 0.3 * (id / 100.0) else 0.0
            (id, (0 until 64).map(i => w * q(i) + (1 - w) * base(i)))
          }
        }.toDF("vec_id", "embedding")
          .write.mode("overwrite").parquet(s"$dir/embs")
      }
      println(f"generated $n vecs x 64 dims (uniform=$uniform) in $tGen%.1f s -> $dir")
    }
    val embs = spark.read.parquet(s"$dir/embs")

    if (reuse.isEmpty) {
      val (_, tIndex) = ProbeUtil.time {
        graft.ops.DimRed.latentIndexWrite(embs, "vec_id", "embedding",
          s"$dir/latent", outDim = outDim, seed = 7)
      }
      println(f"latentIndexWrite outDim=$outDim: $tIndex%.1f s (one-time, at ingest)")
    }

    val idx = spark.read.parquet(s"$dir/latent")
    val qLat = graft.ops.DimRed.projectVec(qDir, outDim, 7)

    val (exact, tBrute) = ProbeUtil.time {
      graft.ops.Similarity.bruteForceTopK(embs, "vec_id", "embedding", qDir, 10)
        .collect().map(_.getLong(0)).toSet
    }
    println(f"bruteForceTopK 64-dim (cold-ish): $tBrute%6.1f s")
    for (c <- Seq(40, 400, 4000)) {
      // stage 1 alone (narrow (id, latent) scan) for the timing split ...
      val (_, tStage1) = ProbeUtil.time {
        idx.select(col("id"),
            round(graft.ops.Similarity.cosine(col("latent"),
              typedlit(qLat.toSeq)), 6).as("lat_cos"))
          .orderBy(col("lat_cos").desc, col("id"))
          .limit(c).select(col("id")).collect()
      }
      // ... then the production call end to end (stage 1 + broadcast-join
      // re-rank in ONE declarative plan, no driver collect)
      val (approx, tFull) = ProbeUtil.time {
        graft.ops.DimRed.projectedTopKIndexed(spark, s"$dir/latent", qDir,
          k = 10, oversample = c / 10)
          .collect().map(_.getLong(0)).toSet
      }
      val recall = (exact & approx).size / 10.0
      println(f"C=$c%5d: stage1 $tStage1%6.1f s | indexed end-to-end $tFull%6.1f s " +
        f"| recall@10 $recall%.2f")
    }
    spark.stop()
  }
}
