package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Volume evidence for the round-4 relational additions: the sliced chi²
  * drift check (E37) and the generic column profiler (E35) at tens of
  * millions of rows — wall time, output grain, and the planted-drift
  * detection check. Usage: SlicedProbe [rows] [cores] (default 50M, 32). */
object SlicedProbe {
  def main(args: Array[String]): Unit = {
    val rows = args.headOption.map(_.toLong).getOrElse(50000000L)
    val cores = args.drop(1).headOption.map(_.toInt).getOrElse(32)
    val spark = SparkSession.builder().master(s"local[$cores]")
      .appName("graft-sliced-probe")
      .config("spark.sql.shuffle.partitions", cores.toString)
      .config("spark.driver.memory", "24g")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val nSlices = 1000
    val nWindows = 20
    // planted drift: slices ending in 7 tilt category mass toward 'c3' in
    // windows >= 10; everything is hash-deterministic, zero-shuffle to build
    val h = xxhash64(col("id"), lit(31))
    val df = spark.range(rows)
      .withColumn("w", pmod(col("id"), lit(nWindows.toLong)).cast("int"))
      .withColumn("s", pmod(shiftright(h, 8), lit(nSlices.toLong)).cast("int"))
      .withColumn("u", (pmod(shiftright(h, 24), lit(1000L)).cast("double") + 0.5) / 1000.0)
      .withColumn("drifted", col("s") % 10 === 7 && col("w") >= 10)
      .withColumn("k",
        when(col("u") < when(col("drifted"), 0.25).otherwise(0.40), "c0")
          .when(col("u") < when(col("drifted"), 0.50).otherwise(0.70), "c1")
          .when(col("u") < when(col("drifted"), 0.65).otherwise(0.90), "c2")
          .otherwise("c3"))
      .select("id", "w", "s", "k")

    var t0 = System.nanoTime()
    val (rel, release) = graft.checks.DriftChecks.chi2Sliced(df, "w", "s", "k", 0)
    val stats = rel.select(col("w"), col("s"), col("stat")).collect()
    val chi2Wall = (System.nanoTime() - t0) / 1e9
    release()
    val drifted = stats.filter(r => r.getInt(1) % 10 == 7 && r.getInt(0) >= 10)
    val clean = stats.filter(r => !(r.getInt(1) % 10 == 7 && r.getInt(0) >= 10))
    val medDrift = drifted.map(_.getDouble(2)).sorted.apply(drifted.length / 2)
    val maxClean = clean.map(_.getDouble(2)).max
    require(medDrift > maxClean,
      s"planted drift must dominate: median drifted stat $medDrift vs max clean $maxClean")

    // numeric twin over a 100-point discrete value domain derived from the
    // same hash (drifted slices shift the value distribution up)
    val vdf = df.withColumn("v",
      (pmod(xxhash64(col("id"), lit(77)), lit(100L)) +
        when(col("s") % 10 === 7 && col("w") >= 10, 20L).otherwise(0L)).cast("int"))
    t0 = System.nanoTime()
    val (ksRel, ksRelease) = graft.checks.DriftChecks.ksSliced(vdf, "w", "s", "v", 0)
    val ksStats = ksRel.select(col("w"), col("s"), col("ks_d")).collect()
    val ksWall = (System.nanoTime() - t0) / 1e9
    ksRelease()
    val ksDrift = ksStats.filter(r => r.getInt(1) % 10 == 7 && r.getInt(0) >= 10)
      .map(_.getDouble(2))
    val ksCleanMax = ksStats.filter(r => !(r.getInt(1) % 10 == 7 && r.getInt(0) >= 10))
      .map(_.getDouble(2)).max
    require(ksDrift.min > ksCleanMax,
      s"planted numeric drift must dominate: min drifted D ${ksDrift.min} vs max clean $ksCleanMax")

    t0 = System.nanoTime()
    val prof = graft.checks.Profiler.profile(df)
    val nProf = prof.count()
    val profWall = (System.nanoTime() - t0) / 1e9

    println(f"""{"rows":$rows,"cores":$cores,"chi2_sliced_wall_s":$chi2Wall%.1f,""" +
      f""""grains":${stats.length},"median_drifted_stat":$medDrift%.1f,""" +
      f""""max_clean_stat":$maxClean%.1f,"ks_sliced_wall_s":$ksWall%.1f,""" +
      f""""min_drifted_d":${ksDrift.min}%.3f,"max_clean_d":$ksCleanMax%.3f,""" +
      f""""profile_wall_s":$profWall%.1f,"profile_cols":$nProf}""")
    spark.stop()
  }
}
