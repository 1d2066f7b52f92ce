package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The deterministic probe corpus shared by CurateProbe and CurateDissect
  * (one generator — the two probes must measure the SAME corpus shape):
  * ~30-token docs from a 4k vocabulary, stopword-rich so they pass the
  * quality/language gates, plus an injected near-dup mass (every `dupEvery`
  * docs gains a one-word-perturbed copy at doc_id + n). */
object ProbeCorpus {

  /** Stopword-rich vocabulary so generated docs clear the quality gate. */
  val Stop: Array[String] =
    Array("the", "a", "of", "and", "to", "in", "is", "it", "that", "for")

  /** Stopword index from a draw: `.toInt.abs % len` like the original
    * probes, with the Int.MinValue hole closed (abs(MinValue) == MinValue →
    * negative index → ArrayIndexOutOfBounds ~2 % of 10M-doc runs). All
    * non-MinValue draws are unchanged, so corpora stay comparable with the
    * recorded BASELINE.md runs (which, having completed, drew no MinValue). */
  private def stopIdx(draw: Long, len: Int): Int = {
    val t = (draw >>> 8).toInt
    (if (t == Int.MinValue) 0 else t.abs) % len
  }

  /** Generate the base docs and write them to `$dir/base`; returns the read
    * frame. Seeding note: NOT id × golden-gamma — SplitMix64 advances by
    * that constant per draw, so gamma-multiplied seeds make doc id+1's
    * stream doc id's shifted by one (every consecutive doc a near-dup). */
  def writeBase(spark: SparkSession, n: Long, dir: String): DataFrame = {
    import spark.implicits._
    spark.range(n).mapPartitions { it =>
      val sb = new StringBuilder(256)
      it.map { id =>
        val rng = new graft.stats.StatMath.SplitMix64(id * 0x6C8E9CF570932BD5L + 13L)
        sb.setLength(0)
        var w = 0
        while (w < 30) {
          if (w % 3 == 0) sb.append(Stop(stopIdx(rng.nextLong(), Stop.length)))
          else { sb.append("word"); sb.append((rng.nextLong() >>> 8) % 4096) }
          sb.append(' ')
          w += 1
        }
        (id, sb.toString.trim)
      }
    }.toDF("doc_id", "text")
      .write.mode("overwrite").parquet(s"$dir/base")
    spark.read.parquet(s"$dir/base")
  }

  /** base ∪ one-word-perturbed copies of every `dupEvery`-th doc. */
  def withNearDups(base: DataFrame, n: Long, dupEvery: Int = 20): DataFrame =
    base.union(
      base.filter(col("doc_id") % dupEvery === 0)
        .select((col("doc_id") + n).as("doc_id"),
          concat(col("text"), lit(" perturbed")).as("text")))
}
