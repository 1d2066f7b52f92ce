package graft.checks

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Accuracy ↔ drift anti-correlation — the reference's offline-eval joint
  * contract (ml/testing.py:128-149 evaluates CNN accuracy per corruption
  * variant; ml/utils/cnn.py:134-144 computes the accuracy; the drift
  * detector scores the same variants): as input corruption grows, model
  * accuracy must FALL while the detector's distance RISES — the detector is
  * useful precisely because its signal predicts model degradation.
  *
  * Mirror here: a severity ladder of deterministically-noised embedding
  * variants; "the model" is the S8/S17 argmax head (`model_accuracy`'s
  * exact Spark expression); the drift score is the engine's MMD distance
  * between the clean variant and each rung. Asserts strict Spearman
  * anti-correlation across rungs plus the endpoint inequalities. */
class AccuracyDriftSpec extends AnyFunSuite {
  lazy val spark = graft.SparkTestBase.spark
  import spark.implicits._

  // deterministic standard-normal-ish noise from a hash (sum of 4 uniforms,
  // Irwin-Hall centered/scaled) — no RNG state, stable across runs
  private def noise(vecId: Long, dim: Int, rung: Int): Double = {
    var acc = 0.0
    var j = 0
    while (j < 4) {
      var h = vecId * 0x9E3779B97F4A7C15L + dim * 0xC2B2AE3D27D4EB4FL +
        rung * 0x165667B19E3779F9L + j * 0x27D4EB2F165667C5L
      h ^= h >>> 33; h *= 0xFF51AFD7ED558CCDL; h ^= h >>> 33
      acc += (h >>> 11).toDouble / (1L << 53).toDouble
      j += 1
    }
    (acc - 2.0) * math.sqrt(3.0) // var 1
  }

  test("argmax accuracy falls as MMD drift distance rises over the severity ladder") {
    // label := the model's own CLEAN prediction — the analog of the
    // reference's CNN being TRAINED on the clean distribution (accuracy 1.0
    // at severity 0, degraded only by the corruption ladder; testing.py
    // measures exactly that curve)
    val base = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
      .select($"vec_id", $"embedding".cast("array<double>").as("emb"))
      .as[(Long, Seq[Double])].collect()
      .map { case (id, emb) => (id, emb, emb.indexOf(emb.max)) }
    assert(base.length > 100, s"fixture too small: ${base.length}")
    val sigmas = Seq(0.0, 0.1, 0.3, 0.6, 1.2)

    val results = sigmas.zipWithIndex.map { case (s, rung) =>
      val variant = base.map { case (id, emb, label) =>
        (id, emb.toArray.zipWithIndex.map { case (x, d) =>
          x + s * noise(id, d, rung) }, label)
      }
      // accuracy via the SAME Spark expression as the oracled model_accuracy
      // query (S8 argmax head + S17 accuracy)
      val df = spark.createDataset(variant.toSeq.map(v => (v._1, v._2.toSeq, v._3)))
        .toDF("vec_id", "embedding", "label")
      val acc = df.select(
          ((array_position(col("embedding"), array_max(col("embedding"))) - 1)
            .cast("int") === col("label")).as("hit"))
        .agg(avg(when(col("hit"), 1.0).otherwise(0.0)))
        .head().getDouble(0)
      // drift score: the engine's MMD estimator, clean vs variant features
      val x = base.map(_._2.toArray)
      val y = variant.map(_._2)
      val sigma = graft.stats.Mmd.medianHeuristicSigma(x)
      val mmd = graft.stats.Mmd.distance(x, y, sigma)
      (s, acc, mmd)
    }
    info(results.map { case (s, a, d) => f"sigma=$s%.2f acc=$a%.3f mmd=$d%.4f" }
      .mkString(" | "))
    val accs = results.map(_._2)
    val mmds = results.map(_._3)
    // clean rung: the "trained" model is perfect, drift is zero
    assert(accs.head == 1.0 && mmds.head == 0.0)
    // drift distance non-decreasing, strictly rising once above the
    // estimator's clipped-at-zero floor, and clearly positive at the top
    mmds.sliding(2).foreach { case Seq(a, b) => assert(b >= a, s"mmd fell: $mmds") }
    assert(mmds.last > 0.1, s"strong corruption must register drift: $mmds")
    // accuracy non-increasing, with real degradation by the strong rungs
    accs.sliding(2).foreach { case Seq(a, b) => assert(b <= a + 1e-12, s"acc rose: $accs") }
    assert(accs.last < accs.head, s"strong corruption must hurt accuracy: $accs")
    // Spearman rank correlation between accuracy and drift < 0
    def ranks(v: Seq[Double]): Seq[Double] =
      v.map(x => v.count(_ < x) + (v.count(_ == x) - 1) / 2.0)
    val (ra, rd) = (ranks(accs), ranks(mmds))
    val (ma, md) = (ra.sum / ra.length, rd.sum / rd.length)
    val cov = ra.zip(rd).map { case (a, d) => (a - ma) * (d - md) }.sum
    val sa = math.sqrt(ra.map(a => (a - ma) * (a - ma)).sum)
    val sd = math.sqrt(rd.map(d => (d - md) * (d - md)).sum)
    val spearman = cov / (sa * sd)
    assert(spearman < -0.8, f"accuracy↔drift Spearman $spearman%.3f not strongly negative")
  }
}
