package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Volume evidence for the deterministic quota sampler: the bounded-agg
  * path (`Sample.quotaPerGroup`, TopKPairsAgg partial top-k BEFORE the
  * exchange + broadcast semi-join back) vs the window row_number twin, on
  * the same corpus — identical output (asserted), measured wall + shuffle.
  * Spark 4's window gets a Partial WindowGroupLimit (map-side ≤cap per
  * group), so this is a fair fight: the twin's residual costs are the
  * full per-map-partition SORT feeding the limit and the ≤cap FULL rows
  * per group per task on the wire; the agg path sorts nothing and ships
  * slim pairs, paying a second scan for the join back. This probe's
  * narrow two-column corpus flatters the window (nothing wide to ship);
  * kilobyte text rows widen the gap toward the agg.
  *
  * `runMain graft.tools.SampleProbe [nDocs] [cap]` (default 10M, 1000). */
object SampleProbe {
  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toLong).getOrElse(10000000L)
    val cap = args.lift(1).map(_.toInt).getOrElse(1000)
    // "wide": add a ~1 KB payload column — the regime the quota docs claim
    // favors the agg path (window sorts/ships full rows; the agg's
    // candidate scan prunes to (group, id) and the semi-join broadcasts)
    val wide = args.contains("wide")
    val cores = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cores]")
      .appName("graft-sample-probe")
      .config("spark.sql.shuffle.partitions", cores)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    val meter = new ProbeUtil.ShuffleMeter
    spark.sparkContext.addSparkListener(meter)

    val dir = java.nio.file.Files.createTempDirectory("sample-probe").toString
    val langs = Array("en", "de", "fr", "es", "ja")
    val (_, tGen) = ProbeUtil.time {
      val base = spark.range(n)
        .select($"id".as("doc_id"),
          element_at(typedlit(langs.toSeq), (pmod($"id", lit(5)) + 1).cast("int"))
            .as("lang"))
      // high-entropy payload (concatenated md5 hex, ~2x compressible like
      // real text) — an all-'x' filler compresses ~250x under zstd and
      // silently erases the very shuffle volume the wide mode measures
      (if (wide) base.withColumn("payload", concat_ws("",
          (0 until 31).map(i =>
            md5(concat($"doc_id".cast("string"), lit(s"_$i")))): _*))
       else base)
        .write.mode("overwrite").parquet(s"$dir/docs")
    }
    val docs = spark.read.parquet(s"$dir/docs")
    println(f"generated $n docs over ${langs.length} langs" +
      (if (wide) " (+1 KB payload col)" else "") + f" in $tGen%.1f s")

    val s0 = meter.snapshot
    val (aggIds, tAgg) = ProbeUtil.time {
      graft.ops.Sample.quotaPerGroup(docs, "doc_id", "lang", cap)
        .select($"doc_id").as[Long].collect().sorted.toSeq
    }
    val s1 = meter.snapshot
    println(f"quotaPerGroup (bounded agg): $tAgg%6.1f s, ${aggIds.size} kept, " +
      f"shuffle r/w ${(s1._1 - s0._1) / 1e6}%.1f/${(s1._2 - s0._2) / 1e6}%.1f MB")

    val (winIds, tWin) = ProbeUtil.time {
      val w = Window.partitionBy($"lang")
        .orderBy(graft.ops.Sample.md5Rank32($"doc_id").asc, $"doc_id".asc)
      docs.withColumn("rn", row_number().over(w)).filter($"rn" <= cap)
        .select($"doc_id").as[Long].collect().sorted.toSeq
    }
    val s2 = meter.snapshot
    println(f"window row_number twin:      $tWin%6.1f s, ${winIds.size} kept, " +
      f"shuffle r/w ${(s2._1 - s1._1) / 1e6}%.1f/${(s2._2 - s1._2) / 1e6}%.1f MB")
    println(if (aggIds == winIds) "outputs IDENTICAL"
            else "MISMATCH between agg and window paths")

    if (wide) {
      // return the PAYLOAD through each plan (a real quota sample keeps the
      // docs): the window must sort/ship full rows, the agg path reads the
      // payload only on the post-join scan
      val w = Window.partitionBy($"lang")
        .orderBy(graft.ops.Sample.md5Rank32($"doc_id").asc, $"doc_id".asc)
      val s3 = meter.snapshot
      val (aggSum, tAggW) = ProbeUtil.time {
        graft.ops.Sample.quotaPerGroup(docs, "doc_id", "lang", cap)
          .select(sum(length($"payload"))).as[Long].head()
      }
      val s4 = meter.snapshot
      println(f"quota agg, payload returned:  $tAggW%6.1f s, " +
        f"shuffle r/w ${(s4._1 - s3._1) / 1e6}%.1f/${(s4._2 - s3._2) / 1e6}%.1f MB")
      val (winSum, tWinW) = ProbeUtil.time {
        docs.withColumn("rn", row_number().over(w)).filter($"rn" <= cap)
          .select(sum(length($"payload"))).as[Long].head()
      }
      val s5 = meter.snapshot
      println(f"window,    payload returned:  $tWinW%6.1f s, " +
        f"shuffle r/w ${(s5._1 - s4._1) / 1e6}%.1f/${(s5._2 - s4._2) / 1e6}%.1f MB")
      println(if (aggSum == winSum) "payload sums IDENTICAL" else "MISMATCH")
    }

    try { import scala.sys.process._; Seq("rm", "-rf", dir).! }
    catch { case _: Throwable => }
    spark.stop()
  }
}
