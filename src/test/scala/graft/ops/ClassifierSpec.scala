package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Hashed-bag-of-words linear classifier inference. */
class ClassifierSpec extends AnyFunSuite {
  lazy val spark = graft.SparkTestBase.spark
  import spark.implicits._

  private def sigmoid(x: Double) = 1.0 / (1.0 + math.exp(-x))

  /** Scala replay of the engine's md5 bucket (first 8 hex chars as u32). */
  private def bucketOf(token: String, dim: Int): Int = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(token.getBytes("UTF-8"))
    val hex = d.take(4).map(b => f"$b%02x").mkString
    (java.lang.Long.parseLong(hex, 16) % dim).toInt
  }

  test("score replays exactly: per-token hashing, mean, sigmoid, empty text") {
    val w = Classifier.syntheticWeights(64, seed = 5L)
    val df = Seq(
      (1L, "alpha beta gamma"),
      (2L, "Alpha  ALPHA alpha"), // case-folds + multi-space
      (3L, ""),
      (4L, "solo")).toDF("doc_id", "text")
    val got = Classifier.scoreDocs(df, "text", w)
      .select($"doc_id", $"score").as[(Long, Double)].collect().toMap
    def expected(tokens: Seq[String]) =
      if (tokens.isEmpty) sigmoid(0.0)
      else sigmoid(tokens.map(t => w(bucketOf(t, 64))).sum / tokens.size)
    assert(math.abs(got(1L) - expected(Seq("alpha", "beta", "gamma"))) < 1e-12)
    assert(math.abs(got(2L) - expected(Seq("alpha", "alpha", "alpha"))) < 1e-12)
    assert(got(3L) == 0.5)
    assert(math.abs(got(4L) - expected(Seq("solo"))) < 1e-12)
  }

  test("scoreCol == the struct-fold twin, bit-exact (the measured-slower single-reference form)") {
    val w = Classifier.syntheticWeights(512, seed = 9L)
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select($"text")
      .union(Seq("", " ", "solo", "这是 mixed 内容", "Ünïcode ß").toDF("text"))
    val diff = docs.select(Classifier.scoreCol($"text", w, bias = 0.25).as("n"),
        Classifier.scoreColStructFold($"text", w, bias = 0.25).as("h"))
      .filter(!($"n" <=> $"h")).count()
    assert(diff == 0, "struct-fold twin diverged from the production score")
  }

  test("gate keeps exactly the at-or-above-threshold docs; scores partitioning-invariant") {
    val w = Classifier.syntheticWeights(256)
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val scored = Classifier.scoreDocs(docs, "text", w)
    val thr = 0.5
    val kept = Classifier.gate(docs, "text", w, threshold = thr)
      .select("doc_id").as[Long].collect().sorted
    val expected = scored.filter($"score" >= thr)
      .select("doc_id").as[Long].collect().sorted
    assert(kept.sameElements(expected))
    assert(kept.nonEmpty && kept.length < docs.count())
    val a = scored.select($"doc_id", $"score").as[(Long, Double)].collect().sortBy(_._1)
    val b = Classifier.scoreDocs(docs.repartition(7), "text", w)
      .select($"doc_id", $"score").as[(Long, Double)].collect().sortBy(_._1)
    assert(a.sameElements(b))
  }

  test("guards: empty weights and clobbered output column fail loud") {
    val df = Seq((1L, "x")).toDF("doc_id", "text")
    assert(intercept[IllegalArgumentException] {
      Classifier.scoreDocs(df, "text", Array.empty[Double])
    }.getMessage.contains("non-empty"))
    assert(intercept[IllegalArgumentException] {
      Classifier.scoreDocs(df.withColumn("score", lit(1)), "text", Array(0.1))
    }.getMessage.contains("already exists"))
  }
}
