package graft.ops

import org.scalatest.funsuite.AnyFunSuite

class VocabSpec extends AnyFunSuite {
  lazy val spark = graft.SparkTestBase.spark
  import spark.implicits._

  // token counts: the=5, cat=3, dog=3, sat=2, mat=1, ran=1
  private def fixture = Seq(
    (1L, "the cat sat"),
    (2L, "the cat sat the mat"),
    (3L, "the dog ran the dog"),
    (4L, "cat dog")
  ).toDF("doc_id", "text")

  test("build: counts, deterministic tie-break (cnt desc, token asc), minCount floor") {
    val v = Vocab.build(fixture, "text", topN = 4)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getInt(2)))
    assert(v.toSeq == Seq(("the", 5L, 1), ("cat", 3L, 2), ("dog", 3L, 3), ("sat", 2L, 4)))
    val floored = Vocab.build(fixture, "text", topN = 10, minCount = 2)
      .collect().map(_.getString(0)).toSet
    assert(floored == Set("the", "cat", "dog", "sat"))
  }

  test("coverage: exact integer counts including distinct OOV") {
    val vocab = Vocab.build(fixture, "text", topN = 2) // the, cat
    val cov = Vocab.coverage(Seq((9L, "the cat mat zebra zebra")).toDF("doc_id", "text"),
      "text", vocab).collect().head
    assert(cov.getLong(0) == 5L) // total
    assert(cov.getLong(1) == 2L) // in-vocab: the, cat
    assert(cov.getLong(2) == 3L) // oov: mat, zebra, zebra
    assert(cov.getLong(3) == 2L) // distinct oov: mat, zebra
  }

  test("tokenDrift: identical windows score no drift; injected mass drifts") {
    val same = Vocab.tokenDrift(fixture, fixture, "text", topN = 4)
    val sameRow = same.select("psi", "is_drift").distinct().collect()
    assert(sameRow.length == 1 && sameRow.head.getDouble(0) == 0.0 &&
      !sameRow.head.getBoolean(1))
    // production window is pure injected vocabulary -> mass shifts hard
    val prod = Seq((1L, "zzz zzz zzz zzz zzz zzz zzz zzz")).toDF("doc_id", "text")
    val drifted = Vocab.tokenDrift(fixture, prod, "text", topN = 4)
    val d = drifted.select("psi", "is_drift").distinct().collect().head
    assert(d.getDouble(0) > 0.2 && d.getBoolean(1))
    // the OOV bucket (rank 0) carries all production tokens
    val oov = drifted.filter("rank = 0").collect().head
    assert(oov.getString(1) == "<oov>" && oov.getLong(3) == 8L)
  }

  test("tokenDrift verdict is parallelism-invariant (exact integer counts + scalar math)") {
    val prod = fixture.select($"doc_id", org.apache.spark.sql.functions.concat(
      $"text", org.apache.spark.sql.functions.lit(" zzz zzz")).as("text"))
    val a = Vocab.tokenDrift(fixture, prod, "text", topN = 4).collect().map(_.toSeq)
    val b = Vocab.tokenDrift(fixture.repartition(7), prod.repartition(5),
      "text", topN = 4).collect().map(_.toSeq)
    assert(a.toSeq == b.toSeq)
  }

  test("chi2 leg matches StatMath on the bucket counts") {
    val prod = Seq((1L, "the the cat zzz")).toDF("doc_id", "text")
    val out = Vocab.tokenDrift(fixture, prod, "text", topN = 4)
      .orderBy("rank").collect()
    val refC = out.map(_.getLong(2))
    val prodC = out.map(_.getLong(3))
    val (stat, p) = graft.stats.StatMath.chi2TwoSample(refC, prodC)
    assert(out.head.getDouble(5) ==
      BigDecimal(stat).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble)
    assert(out.head.getDouble(6) ==
      BigDecimal(p).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
  }

  test("normalizeText: accent fold, case, control chars, whitespace collapse, trim") {
    val out = Seq((1L, "  Café ÜBER\tnaïve \n l'ÉLÈVE  "))
      .toDF("doc_id", "text")
      .select(TextOps.normalizeText($"text")).collect().head.getString(0)
    assert(out == "cafe uber naive l'eleve", s"got '$out'")
  }

  test("guards are loud") {
    assert(intercept[IllegalArgumentException](
      Vocab.build(fixture, "text", topN = 0)).getMessage.contains("topN"))
  }


  test("tfIdfTopTerms: hand values (smoothed idf, minDf prune, " +
    "rounded-rank ties by term); partitioning-invariant; guards") {
    // df: the=3 cat=3 sat=2 dog=2 (mat, ran pruned at minDf=2); N=4
    // idf = ln(5/(df+1))+1: df3 -> 1.223144, df2 -> 1.510826 (6 dp)
    val got = Vocab.tfIdfTopTerms(fixture, "doc_id", "text", k = 5, minDf = 2)
      .orderBy($"doc_id", $"rnk")
      .as[(Long, Long, String, Double)].collect().toSeq
    val want = Seq(
      (1L, 1L, "sat", 1.510826), (1L, 2L, "cat", 1.223144), (1L, 3L, "the", 1.223144),
      (2L, 1L, "the", 2.446287), (2L, 2L, "sat", 1.510826), (2L, 3L, "cat", 1.223144),
      (3L, 1L, "dog", 3.021651), (3L, 2L, "the", 2.446287),
      (4L, 1L, "dog", 1.510826), (4L, 2L, "cat", 1.223144))
    assert(got == want, got.toString)
    val rep = Vocab.tfIdfTopTerms(fixture.repartition(7), "doc_id", "text", 5, 2)
      .orderBy($"doc_id", $"rnk").as[(Long, Long, String, Double)].collect().toSeq
    assert(rep == want)
    val k1 = Vocab.tfIdfTopTerms(fixture, "doc_id", "text", k = 1, minDf = 2)
      .as[(Long, Long, String, Double)].collect()
    assert(k1.length == 4 && k1.forall(_._2 == 1L))
    assert(intercept[IllegalArgumentException](
      Vocab.tfIdfTopTerms(fixture, "doc_id", "text", 0))
      .getMessage.contains("k must"))
    assert(intercept[IllegalArgumentException](
      Vocab.tfIdfTopTerms(fixture, "doc_id", "text", 1, 0))
      .getMessage.contains("minDf"))
  }
}
