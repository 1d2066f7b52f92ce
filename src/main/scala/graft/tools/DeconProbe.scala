package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Decontamination-at-volume probe: `Decontaminate.contaminationReport` /
  * `dropContaminated` measured at ≥10M docs against a 10k-doc eval set —
  * wall, shuffle bytes, flagged/survivor counts. The operator is
  * DuckDB-oracled at sf0.01 (`decontaminate_report`/`_drop`); this probe is
  * the VOLUME evidence for its scale shape: the eval shingle union
  * broadcasts, the corpus explode pipelines into the broadcast join, and
  * the only exchanged rows are MATCHES — so shuffle volume tracks
  * contamination mass, not corpus size. The optional `shuffled` leg forces
  * the fallback join (maxBroadcastShingles=1) to measure exactly what the
  * broadcast path avoids.
  *
  * Corpus: ProbeCorpus (4k vocabulary, ~30 tokens/doc); the eval set is
  * every `benchEvery`-th doc, so contamination is dominated by eval
  * self-membership (cross-doc trigram collisions are ~(1/4096)^2-rare) and
  * the expected flagged count is n / benchEvery.
  *
  * `runMain graft.tools.DeconProbe [nDocs] [benchEvery] [shuffled]`
  * (defaults 10,000,000 and 1000).
  */
object DeconProbe {
  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toLong).getOrElse(10000000L)
    val benchEvery = args.drop(1).headOption.map(_.toLong).getOrElse(1000L)
    val runShuffled = args.contains("shuffled")
    val cores = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cores]")
      .appName("graft-decon-probe")
      .config("spark.sql.shuffle.partitions", cores)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val meter = new ProbeUtil.ShuffleMeter
    spark.sparkContext.addSparkListener(meter)

    val dir = java.nio.file.Files.createTempDirectory("decon-probe").toString
    val (corpus, tGen) = ProbeUtil.time(ProbeCorpus.writeBase(spark, n, dir))
    val bench = corpus.filter(col("doc_id") % benchEvery === 0)
    println(f"generated $n docs in $tGen%.1f s; eval set ${n / benchEvery} docs")

    val s0 = meter.snapshot
    val (flagged, tRep) = ProbeUtil.time {
      graft.ops.Decontaminate.contaminationReport(
        corpus, "doc_id", "text", bench, "text", n = 3).count()
    }
    val s1 = meter.snapshot
    println(f"contaminationReport (broadcast): $tRep%8.1f s, $flagged flagged, " +
      f"shuffle r/w ${(s1._1 - s0._1) / 1e9}%.3f/${(s1._2 - s0._2) / 1e9}%.3f GB")

    val (survivors, tDrop) = ProbeUtil.time {
      graft.ops.Decontaminate.dropContaminated(
        corpus, "doc_id", "text", bench, "text", n = 3).count()
    }
    val s2 = meter.snapshot
    println(f"dropContaminated: $tDrop%8.1f s, $survivors survivors of $n, " +
      f"shuffle r/w ${(s2._1 - s1._1) / 1e9}%.3f/${(s2._2 - s1._2) / 1e9}%.3f GB")
    require(survivors + flagged == n,
      s"survivors($survivors) + flagged($flagged) != corpus($n)")

    if (runShuffled) {
      val s3 = meter.snapshot
      val (flaggedS, tS) = ProbeUtil.time {
        graft.ops.Decontaminate.contaminationReport(
          corpus, "doc_id", "text", bench, "text", n = 3,
          maxBroadcastShingles = 1L).count()
      }
      val s4 = meter.snapshot
      println(f"contaminationReport (forced shuffled): $tS%8.1f s, $flaggedS flagged, " +
        f"shuffle r/w ${(s4._1 - s3._1) / 1e9}%.3f/${(s4._2 - s3._2) / 1e9}%.3f GB")
      require(flaggedS == flagged, s"shuffled($flaggedS) != broadcast($flagged)")
    }
    spark.stop()
  }
}
