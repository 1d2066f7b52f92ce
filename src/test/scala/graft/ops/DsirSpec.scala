package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class DsirSpec extends AnyFunSuite {
  lazy val spark = graft.SparkTestBase.spark
  import spark.implicits._

  // raw corpus: 40 "alpha"-flavored docs (the target's flavor) and 160
  // "noise"-flavored docs with per-doc-unique bigrams
  private def raw = spark.range(200).selectExpr("id AS doc_id",
    "CASE WHEN id % 5 = 0 THEN 'alpha beta gamma alpha beta' " +
      "ELSE concat('n', id, ' m', id, ' k', id) END AS text")
  // target: the alpha flavor, large enough that Laplace smoothing over
  // dim buckets does not swamp its counts (the real-DSIR regime)
  private def target = spark.range(1000, 1010).selectExpr("id AS doc_id",
    "'alpha beta gamma alpha beta' AS text")
  private val Lam = 0.01

  test("featureLogRatios: hand replay on a collision-free fixture") {
    val dim = 4096
    val lr = Dsir.featureLogRatios(target, raw, "text", dim, smoothing = Lam)
    assert(lr.length == dim)
    // independent replay: bucket each distinct bigram via the same md5
    // primitive (ClassifierSpec replays THAT against java MD5), then
    // recompute the smoothed ratios in plain Scala
    def feats(df: org.apache.spark.sql.DataFrame): Map[Int, Long] =
      df.select(explode(graft.functions.TextNative.bigram_pairs($"text")).as("p"))
        .filter($"p.w1".isNotNull)
        .select(Classifier.bucketOf(concat_ws(" ", $"p.w1", $"p.w2"), dim).as("b"))
        .groupBy($"b").count().collect()
        .map(r => r.getLong(0).toInt -> r.getLong(1)).toMap
    val tf = feats(target)
    val rf = feats(raw)
    val tn = tf.values.sum.toDouble + Lam * dim
    val rn = rf.values.sum.toDouble + Lam * dim
    for (b <- (tf.keySet ++ rf.keySet) ++ Seq(0, 1, dim - 1)) {
      val expect = math.log((tf.getOrElse(b, 0L) + Lam) / tn) -
        math.log((rf.getOrElse(b, 0L) + Lam) / rn)
      assert(math.abs(lr(b) - expect) < 1e-12, s"bucket $b")
    }
    // the target's repeated bigrams must carry positive weight
    assert(lr(feats(target).keysIterator.next()) > 0.0)
  }

  test("scoreDocs: per-doc weight is the fold of its feature ratios; weights favor target-like docs") {
    val dim = 4096
    val lr = Dsir.featureLogRatios(target, raw, "text", dim, smoothing = Lam)
    val scored = Dsir.scoreDocs(raw, "text", lr)
      .select($"doc_id", $"dsir_logw").collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    // every alpha-flavored doc outranks every noise doc
    val alphaMin = scored.filter(_._1 % 5 == 0).values.min
    val noiseMax = scored.filter(_._1 % 5 != 0).values.max
    assert(alphaMin > noiseMax,
      s"alpha-flavored min $alphaMin must exceed noise max $noiseMax")
    // hand fold for one doc: 'alpha beta gamma alpha beta' has bigrams
    // (alpha,beta)x2, (beta,gamma), (gamma,alpha)
    val one = raw.filter($"doc_id" === 0L)
    val buckets = one
      .select(explode(graft.functions.TextNative.bigram_pairs($"text")).as("p"))
      .filter($"p.w1".isNotNull)
      .select(Classifier.bucketOf(concat_ws(" ", $"p.w1", $"p.w2"), dim).as("b"))
      .collect().map(_.getLong(0).toInt)
    assert(buckets.length == 4)
    val expect = buckets.map(lr(_)).sum
    assert(math.abs(scored(0L) - expect) < 1e-12)
    // a doc with < 2 tokens has no features and scores exactly 0
    val zero = Dsir.scoreDocs(Seq((9L, "single")).toDF("doc_id", "text"), "text", lr)
      .select($"dsir_logw").head.getDouble(0)
    assert(zero == 0.0)
  }

  test("selectTopK: deterministic across partitionings, nests in k, enriches the target flavor") {
    val dim = 4096
    val lr = Dsir.featureLogRatios(target, raw, "text", dim, smoothing = Lam)
    def sel(df: org.apache.spark.sql.DataFrame, k: Int): Set[Long] =
      Dsir.selectTopK(df, "doc_id", "text", lr, k)
        .select($"doc_id").collect().map(_.getLong(0)).toSet
    val a = sel(raw.repartition(2), 20)
    val b = sel(raw.repartition(32).orderBy(rand(11)), 20)
    assert(a == b, "selection must be partitioning/order invariant")
    assert(a.size == 20)
    val k10 = sel(raw, 10)
    assert(k10.subsetOf(a), "Gumbel-top-k selections must nest in k")
    // softmax sampling: the 20% alpha flavor should dominate the pick
    val alphaShare = a.count(_ % 5 == 0).toDouble / a.size
    assert(alphaShare >= 0.8, s"alpha share $alphaShare — importance weights not biting")
    // gumbel=false is greedy: exactly the top-30 by raw weight = all alpha
    val greedy = Dsir.selectTopK(raw, "doc_id", "text", lr, 30, gumbel = false)
      .select($"doc_id").collect().map(_.getLong(0))
    assert(greedy.forall(_ % 5 == 0))
  }

  test("selectByThreshold == selectTopK at the k-th key; null ids dropped; guards loud") {
    val dim = 4096
    val lr = Dsir.featureLogRatios(target, raw, "text", dim, smoothing = Lam)
    val keys = raw
      .select($"doc_id", Dsir.selectionKey($"doc_id", $"text", lr).as("key"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).sortBy(-_._2)
    val k = 25
    val tau = keys(k - 1)._2
    val viaThr = Dsir.selectByThreshold(raw, "doc_id", "text", lr, tau)
      .select($"doc_id").collect().map(_.getLong(0)).toSet
    val viaTop = Dsir.selectTopK(raw, "doc_id", "text", lr, k)
      .select($"doc_id").collect().map(_.getLong(0)).toSet
    assert(viaThr == viaTop)

    val withNull = raw.unionByName(
      spark.sql("SELECT CAST(NULL AS BIGINT) AS doc_id, 'alpha beta' AS text"))
    assert(Dsir.selectTopK(withNull, "doc_id", "text", lr, 300)
      .filter($"doc_id".isNull).count() == 0)

    intercept[IllegalArgumentException] {
      Dsir.selectTopK(raw, "doc_id", "text", lr, 0)
    }
    intercept[IllegalArgumentException] {
      Dsir.featureLogRatios(target, raw, "text", dim = 1)
    }
    intercept[IllegalArgumentException] {
      Dsir.featureLogRatios(target, raw, "text", dim = 128, smoothing = 0.0)
    }
    intercept[IllegalArgumentException] {
      Dsir.scoreDocs(raw.withColumn("dsir_logw", lit(1)), "text", lr)
    }
  }

  test("scoring plan is narrow: no exchange, one bigram_pairs evaluation") {
    val lr = Array.fill(64)(0.1)
    val plan = Dsir.scoreDocs(raw, "text", lr).queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), plan)
    assert("bigram_pairs".r.findAllIn(plan).size == 1,
      "the feature array must be computed once per row:\n" + plan)
  }
}
