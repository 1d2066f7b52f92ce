package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Exact duplicate-substring dedup at volume (P33): ProbeCorpus base docs
  * (~30 tokens each) plus a one-word-appended copy of every `dupEvery`-th
  * doc, then `SubstringDedup.duplicateSpans` over the union — wall,
  * shuffle bytes, and span-set EXACTNESS. With the probe vocabulary an
  * 8-gram carries ≥5 random tokens of 4096, so accidental cross-doc gram
  * collisions are ~4096⁻⁵-rare and the expected output is exactly two
  * full-width spans per injected pair (original [0,30), copy [0,30) — its
  * appended token is the one position outside any duplicated gram).
  *
  * `runMain graft.tools.SubstringProbe [nDocs] [dupEvery]`
  * (defaults 10,000,000 / 20). Results recorded in BASELINE.md.
  */
object SubstringProbe {
  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toLong).getOrElse(10000000L)
    val dupEvery = args.drop(1).headOption.map(_.toInt).getOrElse(20)
    val cores = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cores]")
      .appName("graft-substring-probe")
      .config("spark.sql.shuffle.partitions", cores)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val meter = new ProbeUtil.ShuffleMeter
    spark.sparkContext.addSparkListener(meter)

    val dir = java.nio.file.Files.createTempDirectory("substring-probe").toString
    val (base, tGen) = ProbeUtil.time(ProbeCorpus.writeBase(spark, n, dir))
    val corpus = ProbeCorpus.withNearDups(base, n, dupEvery)
    val nDups = (n + dupEvery - 1) / dupEvery
    println(f"generated $n docs (+$nDups appended copies) in $tGen%.1f s")

    val s0 = meter.snapshot
    val (stats, tSpans) = ProbeUtil.time {
      graft.ops.SubstringDedup.duplicateSpans(corpus, "doc_id", "text")
        .agg(count(lit(1)), sum(col("end_tok") - col("start_tok"))).head()
    }
    val s1 = meter.snapshot
    val spans = stats.getLong(0)
    println(f"duplicateSpans: $tSpans%8.1f s, $spans spans / ${stats.getLong(1)} " +
      f"spanned tokens, shuffle r/w ${(s1._1 - s0._1) / 1e9}%.3f/${(s1._2 - s0._2) / 1e9}%.3f GB")
    require(spans == 2 * nDups,
      s"expected ${2 * nDups} spans (2 per injected pair), got $spans")

    try { import scala.sys.process._; Seq("rm", "-rf", dir).! }
    catch { case _: Throwable => }
    spark.stop()
  }
}
