package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.ops.{LatentDrift, Video}

/** Edge-placement probe for the video drift query: print the quantized
  * band-luma distribution of the three cohorts (reference / disjoint
  * same-distribution / gain-shifted), then the per-band PSI at the
  * candidate integer edges — the measurement that fixes
  * `OpsQueries.videoLumaEdges`. Generation is fully deterministic, so a
  * verdict margin observed here holds forever.
  *
  * `runMain graft.tools.VideoProbe [nClips]` (default 200).
  */
object VideoProbe {
  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toLong).getOrElse(200L)
    val spark = SparkSession.builder()
      .master("local[8]")
      .appName("graft-video-probe")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def bands(gain: Double, idOffset: Long, cohort: String) =
      Video.videoFeatures(Video.syntheticVideos(spark, n, gain = gain,
          idOffset = idOffset)).toDF()
        .select(lit(cohort).as("cohort"), posexplode(col("band_luma")).as(Seq("band", "v")))
        .select(col("cohort"), col("band"),
          floor(col("v") * 1000 + 0.5).cast("long").as("lq"))

    val f = bands(1.0, 0, "ref").unionByName(bands(1.0, 1000, "same"))
      .unionByName(bands(1.2, 1000, "shift")).cache()

    println("== lq percentiles per cohort ==")
    f.groupBy("cohort").agg(min("lq"), expr("percentile(lq, 0.25)"),
      expr("percentile(lq, 0.5)"), expr("percentile(lq, 0.75)"), max("lq"))
      .orderBy("cohort").show(false)

    println("== lq histogram (4k-unit grid), ref vs shift ==")
    f.groupBy((col("lq") / 4000).cast("int").as("bin"))
      .agg(sum(when(col("cohort") === "ref", 1).otherwise(0)).as("ref"),
        sum(when(col("cohort") === "same", 1).otherwise(0)).as("same"),
        sum(when(col("cohort") === "shift", 1).otherwise(0)).as("shift"))
      .orderBy("bin").show(100, false)

    val edges = Seq(82000L, 107000L, 127000L, 151000L, 176000L, 196000L, 220000L)
    def pts(cohort: String) =
      f.filter(col("cohort").isin("ref", cohort))
        .select(lit(cohort).as("scenario"), col("band"),
          edges.zipWithIndex.foldRight(lit(edges.length): org.apache.spark.sql.Column) {
            case ((e, i), acc) => when(col("lq") < lit(e), lit(i)).otherwise(acc)
          }.as("bucket"),
          when(col("cohort") === "ref", 0).otherwise(1).as("side"))
    println("== per-band PSI at candidate edges ==")
    LatentDrift.psiFromBinnedKeys(pts("same").unionByName(pts("shift")),
        nb = edges.length + 1, keyCols = Seq("scenario", "band"))
      .orderBy("scenario", "band").show(32, false)

    spark.stop()
  }
}
