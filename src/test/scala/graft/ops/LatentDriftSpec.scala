package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Latent-space drift — per-dim PSI on JL projections (P30). */
class LatentDriftSpec extends AnyFunSuite {
  lazy val spark = graft.SparkTestBase.spark
  import spark.implicits._

  private def latFrame(rows: Seq[Seq[Double]]) = rows.toDF("latent")

  test("psi matches an independent Scala replay on a hand fixture") {
    // 1-dim latents, edges [-2,-1,-0.5,0,0.5,1,2] -> 8 buckets
    val ref = latFrame(Seq.fill(6)(Seq(0.1)) ++ Seq.fill(4)(Seq(0.7)))
    val cur = latFrame(Seq.fill(2)(Seq(0.1)) ++ Seq.fill(8)(Seq(1.5)))
    val got = LatentDrift.psiPerDimLatent(ref, cur, "latent")
      .as[(Int, Double, Boolean)].collect()
    // independent replay of the documented formula
    val rc = Array(0, 0, 0, 0, 6, 4, 0, 0); val cc = Array(0, 0, 0, 0, 2, 0, 8, 0)
    val psi = (0 until 8).map { b =>
      val p = (rc(b) + 1.0) / (10 + 8); val q = (cc(b) + 1.0) / (10 + 8)
      (p - q) * math.log(p / q)
    }.sum
    assert(got.length == 1)
    assert(got(0)._1 == 0)
    assert(math.abs(got(0)._2 - BigDecimal(psi).setScale(4,
      BigDecimal.RoundingMode.HALF_UP).toDouble) < 1e-9)
    assert(got(0)._3 == (got(0)._2 > 0.2))
  }

  test("identical windows: no drift on any dim; shifted window: drift on every dim") {
    val r = new scala.util.Random(11)
    def vecs(n: Int) = Seq.fill(n)(Array.fill(64)(r.nextDouble() * 2 - 1).toSeq)
    val ref = vecs(2000).toDF("emb")
    val cur = vecs(2000).toDF("emb")
    val none = LatentDrift.psiOnEmbeddings(ref, cur, "emb", outDim = 8)
      .as[(Int, Double, Boolean)].collect()
    assert(none.length == 8 && none.forall(!_._3),
      s"false drift: ${none.filter(_._3).toSeq}")
    val shifted = cur.select(transform(
      DimRed.projectCol(col("emb"), 8, 7), x => x + lit(1.0)).as("latent"))
    val refLat = ref.select(DimRed.projectCol(col("emb"), 8, 7).as("latent"))
    val hit = LatentDrift.psiPerDimLatent(refLat, shifted, "latent")
      .as[(Int, Double, Boolean)].collect()
    assert(hit.length == 8 && hit.forall(_._3),
      s"missed drift: ${hit.filterNot(_._3).toSeq}")
  }

  test("partitioning-invariant; wrapper == manual projection; guards are loud") {
    val r = new scala.util.Random(3)
    def vecs(n: Int) = Seq.fill(n)(Array.fill(32)(r.nextDouble() * 2 - 1).toSeq)
    val ref = vecs(500).toDF("emb"); val cur = vecs(500).toDF("emb")
    val a = LatentDrift.psiOnEmbeddings(ref.repartition(7), cur.coalesce(1), "emb")
      .collect().map(_.toSeq)
    val b = LatentDrift.psiOnEmbeddings(ref.coalesce(1), cur.repartition(5), "emb")
      .collect().map(_.toSeq)
    assert(a.sameElements(b))
    val manual = LatentDrift.psiPerDimLatent(
      ref.select(DimRed.projectCol(col("emb"), 8, 7).as("latent")),
      cur.select(DimRed.projectCol(col("emb"), 8, 7).as("latent")), "latent")
      .collect().map(_.toSeq)
    assert(a.sameElements(manual))
    assert(intercept[IllegalArgumentException](
      LatentDrift.psiPerDimLatent(ref, cur, "latent", edges = Seq(1.0, -1.0)))
      .getMessage.contains("ascending"))
    assert(intercept[IllegalArgumentException](
      LatentDrift.psiPerDimLatent(ref, cur, "latent", threshold = 0.0))
      .getMessage.contains("threshold"))
  }
}
