package graft.ops

import org.scalatest.funsuite.AnyFunSuite

class PqSpec extends AnyFunSuite {
  lazy val spark = graft.SparkTestBase.spark
  import spark.implicits._

  lazy val embs = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
  /** ≤256 distinct subvectors per subspace → the distinct-set codebook path
    * is taken and quantization is LOSSLESS (the oracle-gate regime). */
  lazy val smallCorpus = embs.filter($"vec_id" > 0 && $"vec_id" < 200)
  lazy val query: Array[Double] = embs.filter($"vec_id" === 0)
    .select($"embedding".cast("array<double>")).head().getSeq[Double](0).toArray

  /** Clustered corpus (16 dims, 20 clusters) — the lossy-recall regime. */
  private lazy val clustered = {
    val rng = new graft.stats.StatMath.SplitMix64(1024L)
    val centers = Array.fill(20, 16)(rng.nextDouble() * 2 - 1)
    (0 until 300).map { i =>
      val c = centers(i / 15)
      (i.toLong, c.map(_ + (rng.nextDouble() * 2 - 1) * 0.05).toSeq)
    }.toDF("vec_id", "embedding")
  }

  test("training is deterministic; ≤k distinct subvectors takes the lossless path") {
    val cb1 = Pq.train(smallCorpus, "vec_id", "embedding", m = 8, sampleN = 500)
    val cb2 = Pq.train(smallCorpus, "vec_id", "embedding", m = 8, sampleN = 500)
    assert(cb1.m == 8 && cb1.dsub == 8)
    assert(cb1.lossless.forall(identity), "199 distinct subvectors ≤ k=256 must be lossless")
    cb1.books.zip(cb2.books).foreach { case (a, b) =>
      assert(a.length == b.length)
      a.zip(b).foreach { case (x, y) => assert(x.sameElements(y)) }
    }
  }

  test("codes are m bytes (the 64x memory compression claim is structural)") {
    val cb = Pq.train(smallCorpus, "vec_id", "embedding", m = 8, sampleN = 500)
    val enc = Pq.encode(smallCorpus, "vec_id", "embedding", cb)
    assert(enc.schema("code").dataType == org.apache.spark.sql.types.BinaryType)
    val lens = enc.select($"code").as[Array[Byte]].collect().map(_.length).toSet
    assert(lens == Set(8), s"every code must be m=8 bytes, got lengths $lens")
  }

  test("lossless config: ADC top-k equals brute-force exact top-k (values and order)") {
    val cb = Pq.train(smallCorpus, "vec_id", "embedding", m = 8, sampleN = 500)
    val enc = Pq.encode(smallCorpus, "vec_id", "embedding", cb)
    val got = Pq.adcTopK(enc, cb, query, k = 10)
      .as[(Long, Double)].collect().toSeq
    val want = Similarity.bruteForceTopK(smallCorpus, "vec_id", "embedding", query, 10)
      .as[(Long, Double)].collect().toSeq
    assert(got == want, s"got=$got want=$want")
  }

  test("lossy config: ADC top-10 stays inside the query's true cluster, recall ≥ 0.5") {
    val q = clustered.filter($"vec_id" === 0)
      .select($"embedding".cast("array<double>")).head().getSeq[Double](0).toArray
    val rest = clustered.filter($"vec_id" =!= 0)
    val cb = Pq.train(rest, "vec_id", "embedding", m = 8, k = 16, sampleN = 500)
    assert(!cb.lossless.forall(identity), "fixture must exercise the kmeans path")
    val enc = Pq.encode(rest, "vec_id", "embedding", cb)
    val got = Pq.adcTopK(enc, cb, q, k = 10).as[(Long, Double)].collect().map(_._1).toSet
    // coarse codebooks (k=16 per 2-dim subspace) collapse WITHIN-cluster
    // ranking — cluster-mates share codes, so exact top-10 membership is not
    // the contract; returning only true cluster-mates (ids 1..14) is
    assert(got.forall(id => id >= 1 && id <= 14),
      s"ADC returned vectors outside the query's cluster: $got")
    val want = Similarity.bruteForceTopK(rest, "vec_id", "embedding", q, 10)
      .as[(Long, Double)].collect().map(_._1).toSet
    val recall = want.intersect(got).size.toDouble / want.size
    assert(recall >= 0.5, s"recall@10 = $recall")
  }

  test("dims not divisible by m fails loud") {
    val e = intercept[IllegalArgumentException](
      Pq.train(clustered, "vec_id", "embedding", m = 5, sampleN = 100))
    assert(e.getMessage.contains("divisible"))
  }

  test("IVF-PQ append: frozen centroids + frozen codebooks; appended vectors " +
    "served without rebuild, append ≡ encode-then-write") {
    val half1 = smallCorpus.filter($"vec_id" % 2 === 0)
    val half2 = smallCorpus.filter($"vec_id" % 2 === 1)
    val dir = java.nio.file.Files.createTempDirectory("ivfpq-append").toString
    // codebooks are trained from half1 only, so half2 quantizes LOSSY —
    // the append contract is not exactness but (a) appended ids are served
    // from the index without a rebuild, and (b) their indexed ADC cosines
    // equal encoding half2 directly with the same frozen codebooks
    Pq.indexWrite(half1, "vec_id", "embedding", dir, nLists = 4, m = 8, sampleN = 500)
    Pq.indexAppend(half2, "vec_id", "embedding", dir)
    val got = Pq.topKIndexed(spark, dir, query, k = 50, nprobe = 4)
      .as[(Long, Double)].collect()
    assert(got.exists(_._1 % 2 == 1),
      "no appended (odd) vector served from the IVF-PQ index")
    // every APPENDED id's ADC cosine must match encoding half2 directly
    // with the same frozen codebooks (append ≡ encode-then-write)
    val cb = Pq.readCodebooks(spark, dir)
    val direct = Pq.adcTopK(Pq.encode(half2, "vec_id", "embedding", cb), cb, query, 50)
      .as[(Long, Double)].collect().toMap
    got.filter(_._1 % 2 == 1).foreach { case (id, c) =>
      direct.get(id).foreach(d => assert(d == c, s"id $id: indexed $c != direct $d"))
    }
  }

  test("PQ append onto a raw IVF index fails loud (no codebook sidecar)") {
    val dir = java.nio.file.Files.createTempDirectory("rawivf-guard").toString
    IvfAnn.indexWrite(smallCorpus, "vec_id", "embedding", dir, nLists = 2)
    val e = intercept[Exception](
      Pq.indexAppend(smallCorpus, "vec_id", "embedding", dir))
    assert(e.getMessage.contains("codebook") ||
      e.isInstanceOf[org.apache.spark.sql.AnalysisException], e.getMessage)
  }

  test("IVF-PQ index: probed lists are partition filters; total-probe + " +
    "lossless equals brute force") {
    val dir = java.nio.file.Files.createTempDirectory("ivfpq").toString
    Pq.indexWrite(smallCorpus, "vec_id", "embedding", dir,
      nLists = 4, m = 8, sampleN = 500)
    val probe = Pq.topKIndexed(spark, dir, query, k = 10, nprobe = 2)
    val plan = probe.queryExecution.executedPlan.toString
    val pf = "PartitionFilters: \\[[^\\]]*\\]".r.findAllIn(plan)
      .find(_.contains("list#")).getOrElse(fail(plan.take(1500)))
    assert(pf.contains("IN") || pf.contains("in("), pf)
    val got = Pq.topKIndexed(spark, dir, query, k = 10, nprobe = 4)
      .as[(Long, Double)].collect().toSeq
    val want = Similarity.bruteForceTopK(smallCorpus, "vec_id", "embedding", query, 10)
      .as[(Long, Double)].collect().toSeq
    assert(got == want, s"got=$got want=$want")
  }
}
