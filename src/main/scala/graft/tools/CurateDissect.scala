package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Stage-by-stage dissection of the staged curation pipeline — the probe
  * that found the REAL curation bottleneck (BASELINE.md round-4): the
  * quality/language gates at ~40 µs/doc each (three Java-regex passes +
  * repeated tokenization + a when-fold duplicating stopword subtrees per
  * row), not the dedup-subplan re-execution the first CurateProbe note
  * blamed. After the TextProfile single-pass rewrite the gates drop ~25×
  * and the composed pipeline ~2.4×.
  *
  * `runMain graft.tools.CurateDissect [nDocs]` (default 1,000,000): prints
  * wall per stage — dedup write, pairs, dropped ids, anti-join, gates, each
  * gate expression alone, then the full staged pipeline.
  */
object CurateDissect {
  private def time[T](tag: String)(f: => T): T = {
    val t0 = System.nanoTime()
    val r = f
    println(f"$tag%-24s ${(System.nanoTime() - t0) / 1e9}%8.1f s")
    r
  }

  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toLong).getOrElse(1000000L)
    val cores = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cores]")
      .appName("graft-curate-dissect")
      .config("spark.sql.shuffle.partitions", cores)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    val dir = java.nio.file.Files.createTempDirectory("curate-dissect").toString
    val base = time("gen")(ProbeCorpus.writeBase(spark, n, dir))
    val corpus = ProbeCorpus.withNearDups(base, n)

    time("dedup.write") {
      graft.ops.Dedup.dropExact(corpus, Seq("text"), "doc_id")
        .select($"doc_id", $"text")
        .write.mode("overwrite").parquet(s"$dir/dedup")
    }
    val deduped = spark.read.parquet(s"$dir/dedup")

    val pairs = graft.ops.Dedup.minhashLshPairs(deduped, "doc_id", "text", threshold = 0.5)
    time("pairs")(pairs.count())
    val dropped = pairs.select($"id_b".as("doc_id")).distinct()
    time("dropped")(dropped.count())
    time("anti-join")(deduped.join(dropped, Seq("doc_id"), "left_anti").count())

    time("gates (3 passes)") {
      deduped.select($"doc_id",
          graft.ops.TextOps.langId($"text").as("lang"),
          floor(graft.ops.TextOps.qualityScore($"text") * 1e6).cast("long").as("q"),
          size(graft.ops.TextOps.tokens($"text")).as("t"))
        .filter($"q" >= 500000L && $"lang".isin(Seq("en", "es", "de", "fr", "zh"): _*))
        .count()
    }
    time("gates (shared profile)") {
      val (lang, q, t) = graft.ops.TextOps.gateColumns($"text")
      deduped.select($"doc_id", lang.as("lang"), q.as("q"), t.as("t"))
        .filter($"q" >= 500000L && $"lang".isin(Seq("en", "es", "de", "fr", "zh"): _*))
        .count()
    }
    time("langId alone") {
      deduped.select(graft.ops.TextOps.langId($"text").as("l"))
        .groupBy($"l").count().collect()
    }
    time("qualityScore alone") {
      deduped.select(floor(graft.ops.TextOps.qualityScore($"text") * 1e6).as("q"))
        .agg(sum($"q")).collect()
    }
    time("tokens alone") {
      deduped.select(size(graft.ops.TextOps.tokens($"text")).as("t"))
        .agg(sum($"t")).collect()
    }
    time("full staged") {
      graft.ops.Curate.curateWithNearDupStaged(corpus, s"$dir/staged").count()
    }

    import scala.sys.process._
    Seq("rm", "-rf", dir).!
    spark.stop()
  }
}
