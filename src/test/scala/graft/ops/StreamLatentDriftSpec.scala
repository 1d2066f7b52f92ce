package graft.ops

import java.nio.file.Files
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class StreamLatentDriftSpec extends AnyFunSuite {
  lazy val spark = graft.SparkTestBase.spark
  import spark.implicits._

  // synthetic latents: 400 ids × 8 dims; ref = even ids; the "shift" window
  // adds +0.8 per dim — the latent_drift scenario at spec scale
  private def latents = {
    val r = new scala.util.Random(11)
    (0L until 400L).map(id => (id, Seq.fill(8)(r.nextGaussian())))
      .toDF("id", "latent")
  }

  private val base = java.sql.Timestamp.valueOf("2024-01-01 00:00:00")
  private val hour1 = new java.sql.Timestamp(base.getTime + 3600000L)

  /** Stage (ts, latent) rows into `slices` parquet files per window so the
    * file stream replays them as that many micro-batches. */
  private def stage(cur: org.apache.spark.sql.DataFrame, slices: Int): String = {
    val dir = Files.createTempDirectory("latent-stage")
    val windows = Seq(
      base -> cur.select(col("latent")),
      hour1 -> cur.select(transform(col("latent"), x => x + lit(0.8)).as("latent")))
    var i = 0
    windows.foreach { case (ts, df) =>
      (0 until slices).foreach { s =>
        val tmp = Files.createTempDirectory("latent-slice")
        df.filter(pmod(xxhash64(col("latent").cast("string")), lit(slices)) === s)
          .select(lit(ts).as("ts"), col("latent"))
          .coalesce(1).write.mode("overwrite").parquet(tmp.toString)
        val ls = Files.list(tmp)
        val part = try ls.filter(_.toString.endsWith(".parquet")).findFirst()
          finally ls.close()
        if (part.isPresent)
          Files.copy(part.get(), dir.resolve(f"f$i%03d.parquet"))
        i += 1
      }
    }
    dir.toString
  }

  test("streaming finals equal the batch per-dim PSI for both windows") {
    val lat = latents.cache()
    val ref = lat.filter($"id" % 2 === 0).select("latent")
    val cur = lat.filter($"id" % 2 =!= 0)
    val refCounts = LatentDrift.binCounts(ref, "latent", outDim = 8)
    val streamed = StreamingOps.runLatentDriftStream(spark, stage(cur, 1),
        refCounts, queryName = s"sl_${System.nanoTime()}")
      .select($"window_start", $"dim", $"psi", $"is_drift")
      .collect().map(r => (r.getTimestamp(0), r.getInt(1)) -> (r.getDouble(2), r.getBoolean(3)))
      .toMap
    assert(streamed.size == 16) // 2 windows × 8 dims, one FINAL each

    def batchOf(w: org.apache.spark.sql.DataFrame) =
      LatentDrift.psiPerDimLatent(ref, w, "latent")
        .collect().map(r => r.getInt(0) -> (r.getDouble(1), r.getBoolean(2))).toMap
    val same = batchOf(cur.select("latent"))
    val shift = batchOf(cur.select(transform($"latent", x => x + lit(0.8)).as("latent")))
    (0 until 8).foreach { d =>
      assert(streamed((base, d)) == same(d), s"same dim $d")
      assert(streamed((hour1, d)) == shift(d), s"shift dim $d")
    }
    // the scenario separates: no drift on the identical window, drift on the shift
    assert((0 until 8).forall(d => !streamed((base, d))._2))
    assert((0 until 8).forall(d => streamed((hour1, d))._2))
  }

  test("micro-batch-boundary invariance: 3 slices per window == 1 slice") {
    val lat = latents.cache()
    val ref = lat.filter($"id" % 2 === 0).select("latent")
    val cur = lat.filter($"id" % 2 =!= 0)
    val refCounts = LatentDrift.binCounts(ref, "latent", outDim = 8)
    def finals(slices: Int) =
      StreamingOps.runLatentDriftStream(spark, stage(cur, slices), refCounts,
          queryName = s"sl_${System.nanoTime()}")
        .select($"window_start", $"dim", $"psi", $"is_drift")
        .collect().map(_.toSeq).sortBy(_.mkString("|"))
    val (a, b) = (finals(3), finals(1))
    assert(a.length == 16, s"expected 16 finals, got ${a.length}") // never vacuous
    assert(a.sameElements(b))
  }

  test("guards are loud: empty refCounts, bucket-width mismatch, bad threshold") {
    val rows = Seq((base, Seq(0.0))).toDF("ts", "latent")
    assert(intercept[IllegalArgumentException](StreamingOps.latentDriftPerWindow(
      rows, "latent", Array.empty)).getMessage.contains("non-empty"))
    assert(intercept[IllegalArgumentException](StreamingOps.latentDriftPerWindow(
      rows, "latent", Array(Array(1L, 2L)))).getMessage.contains("buckets"))
    assert(intercept[IllegalArgumentException](StreamingOps.latentDriftPerWindow(
      rows, "latent", Array(Array.fill(8)(1L)), threshold = 0.0))
      .getMessage.contains("threshold"))
    assert(intercept[IllegalArgumentException](LatentDrift.psiFromCounts(
      Array(1L), Array(1L, 2L))).getMessage.contains("equal-length"))
  }
}
