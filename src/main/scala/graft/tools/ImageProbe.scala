package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Perceptual image-dedup volume probe (P32): N real PNGs (encoded with
  * javax.imageio, 16–32 px) plus a perturbed twin for every `dupEvery`-th
  * ref, then `Multimodal.imageNearDupPairs` end to end — decode + aHash
  * throughput, pair-join wall, shuffle bytes, and planted-twin exactness
  * at volume. The decode scan is the dominant cost and is narrow
  * (image bytes never shuffle; only slim (id, hash, chunk) rows do) — the
  * probe's shuffle number is the evidence.
  *
  * `runMain graft.tools.ImageProbe [nImages] [dupEvery]`
  * (defaults 1,000,000 / 20). Results recorded in BASELINE.md.
  */
object ImageProbe {
  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toLong).getOrElse(1000000L)
    val dupEvery = args.drop(1).headOption.map(_.toInt).getOrElse(20)
    val cores = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cores]")
      .appName("graft-image-probe")
      .config("spark.sql.shuffle.partitions", cores)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    val meter = new ProbeUtil.ShuffleMeter
    spark.sparkContext.addSparkListener(meter)

    val dir = java.nio.file.Files.createTempDirectory("image-probe").toString
    val (_, tGen) = ProbeUtil.time {
      graft.ops.Multimodal.withPerturbedCopies(
          graft.ops.Multimodal.syntheticImages(spark, n)
            .repartition(cores.toInt * 4),
          dupEvery)
        .write.mode("overwrite").parquet(dir)
    }
    val corpus = spark.read.parquet(dir).as[graft.ops.Multimodal.ImageRow]
    val total = corpus.count()
    println(f"generated+encoded $total PNGs (base $n, twins every $dupEvery) in $tGen%.1f s")

    val s0 = meter.snapshot
    val (hashes, tHash) = ProbeUtil.time {
      graft.ops.Multimodal.imageHashes(corpus).count()
    }
    println(f"decode+aHash: $tHash%8.1f s  (${hashes / tHash}%.0f imgs/s)")

    val s1 = meter.snapshot
    val (pairs, tPairs) = ProbeUtil.time {
      graft.ops.Multimodal.imageNearDupPairs(corpus).count()
    }
    val s2 = meter.snapshot
    println(f"imageNearDupPairs: $tPairs%8.1f s, $pairs pairs, " +
      f"shuffle r/w ${(s2._1 - s1._1) / 1e9}%.3f/${(s2._2 - s1._2) / 1e9}%.3f GB")

    // planted truth: every twin must pair with its original; random-image
    // pairs at radius 6 of 64 bits are vanishing, so expect pairs == twins
    val twins = total - n
    require(pairs >= twins,
      s"missed planted twins: $pairs pairs < $twins twins")
    println(f"planted twins $twins, pairs $pairs " +
      f"(${if (pairs == twins) "exact" else s"${pairs - twins} extra"})")
    spark.stop()
  }
}
