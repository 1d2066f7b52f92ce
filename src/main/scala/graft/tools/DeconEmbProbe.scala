package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Embedding-decontamination-at-volume probe: `Decontaminate
  * .embeddingReportLsh` measured at millions of corpus vectors against a
  * thousands-strong eval set — wall, shuffle bytes, flagged counts. The
  * operator is DuckDB-oracled at sf0.01 (`decon_embedding`, exact rung);
  * this probe is the VOLUME evidence for the scale rung's shape: the
  * multi-probed eval side broadcasts, the corpus never shuffles before the
  * match-only aggregate, and per-row verify work is the probed buckets'
  * population, not |eval|.
  *
  * Eval = every `evalEvery`-th corpus vector, so every eval member is a
  * verbatim leak (cos 1.0, always bucket-co-located → LSH recall 1 on
  * them) and the expected flagged count is exactly n / evalEvery: two
  * independent random 64-dim directions land at cos ≥ 0.99 with
  * probability ~10⁻²³ (the spherical cap mass), so accidental extras are
  * impossible at any corpus size this VM can hold.
  *
  * A second leg runs the exact BNLJ rung on a 1/`sliceDiv` corpus slice
  * against the SAME eval set and requires flag-set equality with the LSH
  * rung on that slice — rung equivalence at volume, plus a measured
  * per-row work ratio (|eval| cosines vs probed-bucket population).
  *
  * `runMain graft.tools.DeconEmbProbe [nVecs] [evalEvery] [planes] [sliceDiv]`
  * (defaults 5,000,000 / 1000 / 16 / 10). Results recorded in BASELINE.md.
  */
object DeconEmbProbe {
  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toLong).getOrElse(5000000L)
    val evalEvery = args.drop(1).headOption.map(_.toLong).getOrElse(1000L)
    val planes = args.drop(2).headOption.map(_.toInt).getOrElse(16)
    val sliceDiv = args.drop(3).headOption.map(_.toLong).getOrElse(10L)
    val cores = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cores]")
      .appName("graft-decon-emb-probe")
      .config("spark.sql.shuffle.partitions", cores)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    val meter = new ProbeUtil.ShuffleMeter
    spark.sparkContext.addSparkListener(meter)

    val dir = java.nio.file.Files.createTempDirectory("decon-emb-probe").toString
    val (_, tGen) = ProbeUtil.time {
      spark.range(n).mapPartitions(_.map { id =>
        // decorrelated per-id seed (NOT golden-gamma-multiplied; see AnnProbe)
        val rng = new graft.stats.StatMath.SplitMix64(id * 0x6C8E9CF570932BD5L + 7L)
        (id, Seq.fill(64)(rng.nextDouble() * 2 - 1))
      }).toDF("vec_id", "embedding")
        .write.mode("overwrite").parquet(dir)
    }
    val corpus = spark.read.parquet(dir)
    val eval = corpus.filter(col("vec_id") % evalEvery === 0)
      .select(col("embedding"))
    val nEval = n / evalEvery + (if (n % evalEvery != 0) 1L else 0L)
    println(f"generated $n vecs x 64 dims in $tGen%.1f s; eval set $nEval vecs")

    val s0 = meter.snapshot
    val (flagged, tLsh) = ProbeUtil.time {
      graft.ops.Decontaminate.embeddingReportLsh(
        corpus, "vec_id", "embedding", eval, "embedding",
        threshold = 0.99, planes = planes, probes = 2).count()
    }
    val s1 = meter.snapshot
    println(f"embeddingReportLsh planes=$planes probes=2: $tLsh%8.1f s, " +
      f"$flagged flagged, shuffle r/w ${(s1._1 - s0._1) / 1e9}%.3f/${(s1._2 - s0._2) / 1e9}%.3f GB")
    require(flagged == nEval, s"LSH rung flagged $flagged, expected $nEval self-leaks")

    // exact-rung slice: same eval set, 1/sliceDiv of the corpus — rung
    // equivalence + the measured cost of |eval| cosines per corpus row
    val slice = corpus.filter(col("vec_id") % sliceDiv === 0)
    val nSlice = n / sliceDiv + (if (n % sliceDiv != 0) 1L else 0L)
    val (exactFlags, tExact) = ProbeUtil.time {
      graft.ops.Decontaminate.embeddingReport(
        slice, "vec_id", "embedding", eval, "embedding", threshold = 0.99)
        .select($"vec_id").as[Long].collect().toSet
    }
    val s2 = meter.snapshot
    println(f"embeddingReport (exact BNLJ) on $nSlice-row slice: $tExact%8.1f s, " +
      f"${exactFlags.size} flagged, shuffle r/w ${(s2._1 - s1._1) / 1e9}%.3f/${(s2._2 - s1._2) / 1e9}%.3f GB")
    val (lshFlags, tLshSlice) = ProbeUtil.time {
      graft.ops.Decontaminate.embeddingReportLsh(
        slice, "vec_id", "embedding", eval, "embedding",
        threshold = 0.99, planes = planes, probes = 2)
        .select($"vec_id").as[Long].collect().toSet
    }
    println(f"embeddingReportLsh on the same slice: $tLshSlice%8.1f s, ${lshFlags.size} flagged")
    require(lshFlags == exactFlags,
      s"rung mismatch on slice: lsh-only=${(lshFlags -- exactFlags).take(5)} " +
        s"exact-only=${(exactFlags -- lshFlags).take(5)}")
    println(f"rungs identical on the slice; exact/LSH wall ratio ${tExact / tLshSlice}%.1fx")
    spark.stop()
  }
}
