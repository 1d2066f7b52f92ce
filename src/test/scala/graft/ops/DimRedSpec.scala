package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.RandomProject

/** Dimensionality reduction — JL sign-matrix random projection (P29). */
class DimRedSpec extends AnyFunSuite {
  lazy val spark = graft.SparkTestBase.spark
  import spark.implicits._

  private def rng(seed: Long) = new scala.util.Random(seed)
  private def randVec(r: scala.util.Random, d: Int): Array[Double] =
    Array.fill(d)(r.nextGaussian())
  private def cos(a: Array[Double], b: Array[Double]): Double = {
    val dot = a.zip(b).map { case (x, y) => x * y }.sum
    dot / (math.sqrt(a.map(x => x * x).sum) * math.sqrt(b.map(x => x * x).sum))
  }

  test("sign matrix replays an independent md5 derivation; projection is linear") {
    // independent replay of the documented recipe (not the cached matrix)
    def signIndep(seed: Int, i: Int, j: Int): Double = {
      val hex = java.security.MessageDigest.getInstance("MD5")
        .digest(s"rp-$seed-$i-$j".getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
      if ("02468ace".contains(hex.head)) 1.0 else -1.0
    }
    val d = 16; val out = 4; val seed = 7
    val r = rng(1)
    val v = randVec(r, d)
    val got = RandomProject.projectVec(v, out, seed)
    val want = (0 until out).map { j =>
      (0 until d).map(i => v(i) * signIndep(seed, i, j)).sum / math.sqrt(out.toDouble)
    }
    got.zip(want).foreach { case (g, w) => assert(math.abs(g - w) < 1e-12) }
    // linearity: P(a + b) == P(a) + P(b)
    val a = randVec(r, d); val b = randVec(r, d)
    val pa = RandomProject.projectVec(a, out, seed)
    val pb = RandomProject.projectVec(b, out, seed)
    val pab = RandomProject.projectVec(a.zip(b).map { case (x, y) => x + y }, out, seed)
    pab.indices.foreach(j => assert(math.abs(pab(j) - (pa(j) + pb(j))) < 1e-9))
  }

  test("JL property: latent cosine tracks full-space cosine on random pairs") {
    val r = rng(42)
    val pairs = Seq.fill(200) {
      val base = randVec(r, 64)
      // mixed similarity levels: blend a fresh vector in at random weight
      val w = r.nextDouble()
      val other = randVec(r, 64).zip(base).map { case (n, b) => w * b + (1 - w) * n }
      (base, other)
    }
    val (full, lat) = pairs.map { case (a, b) =>
      (cos(a, b), cos(RandomProject.projectVec(a, 16, 7), RandomProject.projectVec(b, 16, 7)))
    }.unzip
    val mad = full.zip(lat).map { case (f, l) => math.abs(f - l) }.sum / full.size
    assert(mad < 0.20, f"mean |cos_full - cos_latent| = $mad%.3f too large for outDim=16")
    // Pearson correlation of the two similarity orders is strong
    val mf = full.sum / full.size; val ml = lat.sum / lat.size
    val cov = full.zip(lat).map { case (f, l) => (f - mf) * (l - ml) }.sum
    val sf = math.sqrt(full.map(f => (f - mf) * (f - mf)).sum)
    val sl = math.sqrt(lat.map(l => (l - ml) * (l - ml)).sum)
    assert(cov / (sf * sl) > 0.9, f"full-vs-latent cosine correlation ${cov / (sf * sl)}%.3f")
  }

  test("column path == driver path; float input widens like double; SQL surface agrees") {
    val r = rng(3)
    val rows = (1L to 50L).map(id => (id, randVec(r, 32)))
    val df = rows.toDF("id", "emb")
    val got = DimRed.project(df, "emb", outDim = 8, seed = 11)
      .select($"id", $"latent").as[(Long, Seq[Double])].collect().toMap
    rows.foreach { case (id, v) =>
      val want = RandomProject.projectVec(v, 8, 11)
      got(id).zip(want).foreach { case (g, w) => assert(math.abs(g - w) < 1e-12, s"id $id") }
    }
    // float input: widened per element, same matrix
    val fdf = rows.map { case (id, v) => (id, v.map(_.toFloat)) }.toDF("id", "emb")
    val gotF = DimRed.project(fdf, "emb", outDim = 8, seed = 11)
      .select($"id", $"latent").as[(Long, Seq[Double])].collect().toMap
    rows.foreach { case (id, v) =>
      val want = RandomProject.projectVec(v.map(_.toFloat.toDouble), 8, 11)
      gotF(id).zip(want).foreach { case (g, w) => assert(math.abs(g - w) < 1e-12) }
    }
    graft.functions.GraftExtensions.register(spark)
    df.createOrReplaceTempView("dimred_in")
    val sqlGot = spark.sql(
      "SELECT id, random_project(emb, 8, 11) AS latent FROM dimred_in")
      .as[(Long, Seq[Double])].collect().toMap
    assert(sqlGot == got)
  }

  test("quantized twin: exact integer replay, inDim/2 envelope vs float projection") {
    val r = rng(9)
    val rows = (1L to 80L).map(id => (id, Array.fill(64)(r.nextGaussian().toFloat)))
    val df = rows.toDF("id", "emb")
    val scale = 1000
    val got = df.select($"id",
        RandomProject.random_project_q($"emb", 8, 7, scale).as("latq"),
        RandomProject.random_project($"emb", 8, 7).as("lat"))
      .as[(Long, Seq[Long], Seq[Double])].collect()
    assert(got.length == rows.size)
    val byId = rows.toMap
    got.foreach { case (id, latq, lat) =>
      // independent replay: quantize each float exactly as the expression
      // documents, sign-sum in BigInt (so a Long-overflow bug would show)
      val v = byId(id)
      val want = (0 until 8).map { j =>
        (0 until 64).map { i =>
          val q = math.floor(v(i).toDouble * scale + 0.5).toLong
          val hex = java.security.MessageDigest.getInstance("MD5")
            .digest(s"rp-7-$i-$j".getBytes("UTF-8")).map("%02x".format(_)).mkString
          if ("02468ace".contains(hex.head)) q else -q
        }.sum
      }
      assert(latq == want, s"id $id quantized replay mismatch")
      // envelope: |lat * sqrt(8) * scale - latq| <= inDim/2 (64 * 0.5)
      lat.zip(latq).foreach { case (l, lq) =>
        assert(math.abs(l * math.sqrt(8.0) * scale - lq) <= 32.001, s"id $id envelope")
      }
    }
    // SQL surface
    graft.functions.GraftExtensions.register(spark)
    df.createOrReplaceTempView("dimredq_in")
    val sqlGot = spark.sql(
      "SELECT id, random_project_q(emb, 8, 7, 1000) AS latq FROM dimredq_in")
      .as[(Long, Seq[Long])].collect().toMap
    got.foreach { case (id, latq, _) => assert(sqlGot(id) == latq) }
  }

  test("projection is narrow (no Exchange) and partitioning-invariant") {
    val r = rng(5)
    val df = (1L to 100L).map(id => (id, randVec(r, 16))).toDF("id", "emb")
    val plan = DimRed.project(df, "emb", 4).queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), plan)
    val a = DimRed.project(df.repartition(7), "emb", 4).select($"id", $"latent")
      .collect().map(row => row.getLong(0) -> row.getSeq[Double](1)).toMap
    val b = DimRed.project(df.coalesce(1), "emb", 4).select($"id", $"latent")
      .collect().map(row => row.getLong(0) -> row.getSeq[Double](1)).toMap
    assert(a == b)
  }

  test("projectedTopK: high recall vs brute force at oversample 4; loud guards") {
    val r = rng(9)
    val q = randVec(r, 64)
    // corpus with a planted similarity gradient toward the query
    val rows = (1L to 400L).map { id =>
      val w = r.nextDouble()
      (id, randVec(r, 64).zip(q).map { case (n, b) => w * b + (1 - w) * n })
    }
    val df = rows.toDF("id", "emb")
    val exact = Similarity.bruteForceTopK(df, "id", "emb", q, 10)
      .select($"id").as[Long].collect().toSet
    val approx = DimRed.projectedTopK(df, "id", "emb", q, k = 10, outDim = 16)
      .select($"id").as[Long].collect().toSet
    val recall = (exact & approx).size / 10.0
    assert(recall >= 0.8, s"recall@10 = $recall via 16-dim latent, oversample 4")
    // exhaustive oversample == brute force exactly
    val all = DimRed.projectedTopK(df, "id", "emb", q, k = 10, outDim = 16,
      oversample = 40).select($"id").as[Long].collect().toSet
    assert(all == exact)
    val clash = df.withColumn("latent", lit(1))
    assert(intercept[IllegalArgumentException](DimRed.project(clash, "emb", 4))
      .getMessage.contains("latent"))
    assert(intercept[IllegalArgumentException](
      DimRed.projectedTopK(df, "id", "emb", q, k = 0)).getMessage.contains("k"))
  }

  test("latent index: indexed == unindexed; append is found; missing sidecar fails loud") {
    val r = rng(13)
    val q = randVec(r, 64)
    val mk = (ids: Seq[Long]) => ids.map { id =>
      val w = r.nextDouble()
      (id, randVec(r, 64).zip(q).map { case (n, b) => w * b + (1 - w) * n })
    }
    val first = mk(1L to 300L); val extra = mk(301L to 400L)
    val dir = java.nio.file.Files.createTempDirectory("dimred-idx").toString
    DimRed.latentIndexWrite(first.toDF("id", "emb"), "id", "emb", dir,
      outDim = 16, seed = 7)
    val viaIndex = DimRed.projectedTopKIndexed(spark, dir, q, k = 10)
      .collect().map(row => (row.getLong(0), row.getDouble(1))).toSeq
    val direct = DimRed.projectedTopK(first.toDF("id", "emb"), "id", "emb", q,
      k = 10, outDim = 16).collect().map(row => (row.getLong(0), row.getDouble(1))).toSeq
    assert(viaIndex == direct)
    // append: new vectors are projected through the RECORDED config and found
    DimRed.latentIndexAppend(extra.toDF("id", "emb"), "id", "emb", dir)
    val afterAppend = DimRed.projectedTopKIndexed(spark, dir, q, k = 10)
      .collect().map(row => (row.getLong(0), row.getDouble(1))).toSeq
    val directAll = DimRed.projectedTopK((first ++ extra).toDF("id", "emb"),
      "id", "emb", q, k = 10, outDim = 16)
      .collect().map(row => (row.getLong(0), row.getDouble(1))).toSeq
    assert(afterAppend == directAll)
    // not-an-index paths fail loud, and mixed id types are refused
    val bare = java.nio.file.Files.createTempDirectory("dimred-bare").toString
    first.toDF("id", "emb").write.mode("overwrite").parquet(bare)
    assert(intercept[IllegalArgumentException](
      DimRed.latentIndexAppend(extra.toDF("id", "emb"), "id", "emb", bare))
      .getMessage.contains("sidecar"))
    assert(intercept[IllegalArgumentException](
      DimRed.projectedTopKIndexed(spark, bare, q, k = 10))
      .getMessage.contains("sidecar"))
    val strIds = extra.map { case (id, v) => (s"d$id", v) }.toDF("id", "emb")
    assert(intercept[IllegalArgumentException](
      DimRed.latentIndexAppend(strIds, "id", "emb", dir))
      .getMessage.contains("id types"))
    // a different embedding width means a DIFFERENT sign matrix — refused
    val narrow = extra.map { case (id, v) => (id, v.take(32)) }.toDF("id", "emb")
    assert(intercept[IllegalArgumentException](
      DimRed.latentIndexAppend(narrow, "id", "emb", dir))
      .getMessage.contains("64-dim"))
  }
}
