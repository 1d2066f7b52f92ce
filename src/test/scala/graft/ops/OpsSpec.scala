package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.functions.RollingHash

class TextOpsSpec extends AnyFunSuite {
  lazy val spark = graft.SparkTestBase.spark
  import spark.implicits._

  test("tokens and counts") {
    val df = Seq("Hello  world foo", "", "one").toDF("t")
    val got = df.select(size(TextOps.tokens($"t"))).as[Int].collect()
    assert(got.sameElements(Array(3, 0, 1)))
  }

  test("langId on natural sentences") {
    val df = Seq(
      ("en", "the cat sat on the mat and it was happy with the sun"),
      ("es", "el perro corre en la casa y los gatos duermen por la noche"),
      ("de", "der hund und die katze sind mit dem kind im haus und das ist gut"),
      ("fr", "le chien et le chat sont dans la maison avec les enfants du village"),
      ("zh", "这是一个中文句子用来测试语言识别"),
      ("und", "xqz blorp fnargle wibble")).toDF("truth", "t")
    val got = df.select($"truth", TextOps.langId($"t").as("got")).collect()
    got.foreach(r => assert(r.getString(0) == r.getString(1),
      s"expected ${r.getString(0)} got ${r.getString(1)}"))
  }

  test("qualityScore: natural text beats garbage") {
    val df = Seq(
      "the quick brown fox jumps over the lazy dog and it is a fine day for running in the park",
      "!!!! #### $$$$ %%%% ^^^^ &&&&").toDF("t")
    val s = df.select(TextOps.qualityScore($"t")).as[Double].collect()
    assert(s(0) > s(1) + 0.3, s"natural=${s(0)} garbage=${s(1)}")
  }

  test("shingles: 3-grams of a 5-token doc") {
    val got = Seq("a b c d e").toDF("t")
      .select(TextOps.shingles($"t", 3)).as[Seq[String]].head()
    assert(got == Seq("a b c", "b c d", "c d e"))
  }

  test("rolling hash expression: correct value, codegen path, null safety") {
    // hand value: "ab" = 97*B + 98
    val expected = 97L * RollingHash.B + 98L
    val got = Seq("ab").toDF("t")
      .select(RollingHash.rolling_hash($"t")).as[Long].head()
    assert(got == expected)
    // equal strings hash equal, different differ; nulls propagate
    val df = Seq(Some("hello world"), Some("hello worlD"), None).toDF("t")
      .select(RollingHash.rolling_hash($"t").as("h"))
    val rows = df.collect()
    assert(rows(0).getLong(0) != rows(1).getLong(0))
    assert(rows(2).isNullAt(0))
    // survives a filter+agg pipeline (i.e. inside wholestage codegen)
    val n = Seq.fill(100)("same text").toDF("t")
      .select(RollingHash.rolling_hash($"t").as("h"))
      .groupBy($"h").count().collect()
    assert(n.length == 1 && n(0).getLong(1) == 100)
  }
}

class DedupSpec extends AnyFunSuite {
  lazy val spark = graft.SparkTestBase.spark
  import spark.implicits._

  val base = Seq(
    (1L, "the quick brown fox jumps over the lazy dog near the old river bank today"),
    (2L, "the quick brown fox jumps over the lazy dog near the old river bank tonight"), // near-dup of 1
    (3L, "completely different text about spark catalyst optimizer rules and physical plans"),
    (4L, "the quick brown fox jumps over the lazy dog near the old river bank today"), // exact dup of 1
    (5L, "another unrelated document mentioning quantile sketches and hyperloglog counters"))

  test("exact dedup: drops exact duplicates only") {
    val df = base.toDF("id", "text")
    val out = Dedup.dropExact(df, Seq("text"), "id")
    assert(out.count() == 4)
    assert(out.select("id").as[Long].collect().sorted.sameElements(Array(1L, 2L, 3L, 5L)))
    val groups = Dedup.exactDupGroups(df, Seq("text")).collect()
    assert(groups.length == 1 && groups(0).getAs[Long]("cnt") == 2)
  }

  test("ngram jaccard: finds the near-dup pair, not unrelated docs") {
    val pairs = Dedup.ngramJaccardPairs(base.toDF("id", "text"), "id", "text", threshold = 0.5)
      .as[(Long, Long, Double)].collect().toSet
    assert(pairs.map(p => (p._1, p._2)) == Set((1L, 2L), (1L, 4L), (2L, 4L)))
    assert(pairs.find(p => p._1 == 1 && p._2 == 4).get._3 == 1.0) // exact dup
  }

  test("ngram jaccard df-cap: bounds candidates on a stop-shingle corpus, " +
    "identical pairs when nothing exceeds the cap") {
    // default cap (1000) changes nothing on the near-dup corpus
    val withCap = Dedup.ngramJaccardPairs(base.toDF("id", "text"), "id", "text", 0.5)
      .as[(Long, Long, Double)].collect().toSet
    val noCap = Dedup.ngramJaccardPairs(base.toDF("id", "text"), "id", "text", 0.5,
      dfCap = Int.MaxValue).as[(Long, Long, Double)].collect().toSet
    assert(withCap == noCap)
    // adversarial: 60 docs all sharing one stop-shingle prefix, otherwise
    // disjoint -> uncapped generates C(60,2)=1770 candidates from the shared
    // shingle alone; a cap below 60 drops it and yields zero candidate pairs
    val adv = (0 until 60).map(i => (i.toLong, s"the common prefix is w${i}a w${i}b w${i}c w${i}d"))
      .toDF("id", "text")
    val capped = Dedup.ngramJaccardPairs(adv, "id", "text", threshold = 0.01, dfCap = 50)
    assert(capped.count() == 0)
    val uncapped = Dedup.ngramJaccardPairs(adv, "id", "text", threshold = 0.01,
      dfCap = Int.MaxValue)
    assert(uncapped.count() == 1770L)
  }

  test("minhash LSH: full recall of jaccard>=0.7 pairs on this corpus") {
    val exact = Dedup.ngramJaccardPairs(base.toDF("id", "text"), "id", "text", 0.7)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    val lsh = Dedup.minhashLshPairs(base.toDF("id", "text"), "id", "text", 0.7)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(lsh == exact, s"lsh=$lsh exact=$exact")
  }

  test("simhash: exact dups hamming 0; near-dups close; unrelated far") {
    val pairs = Dedup.simhashPairs(base.toDF("id", "text"), "id", "text",
      maxHamming = 64, chunks = 4).as[(Long, Long, Int)].collect()
      .map(p => (p._1, p._2) -> p._3).toMap
    assert(pairs((1L, 4L)) == 0)
    assert(pairs((1L, 2L)) <= 8)
    assert(pairs.getOrElse((1L, 3L), 65) > 8 || !pairs.contains((1L, 3L)))
  }

  test("simhash-blocked jaccard verify: equals the exact ground truth") {
    val exact = Dedup.ngramJaccardPairs(base.toDF("id", "text"), "id", "text", 0.5)
      .as[(Long, Long, Double)].collect().toSet
    // chunks = 16 >= maxHamming + 1: pigeonhole-GUARANTEED candidate recall
    // at radius 12 (the driver-gate config — see OpsQueries.simhashPairs)
    val got = Dedup.simhashJaccardPairs(base.toDF("id", "text"), "id", "text",
      threshold = 0.5, maxHamming = 12, chunks = 16)
      .as[(Long, Long, Double)].collect().toSet
    assert(got == exact, s"got=$got exact=$exact")
  }

  test("embedding cosine dups: finds perturbed copy, skips orthogonal") {
    val e = Seq(
      (1L, Seq(1.0, 0.0, 0.0, 0.0)),
      (2L, Seq(0.999, 0.01, 0.0, 0.0)), // near-dup of 1
      (3L, Seq(0.0, 1.0, 0.0, 0.0)),
      (4L, Seq(0.0, 0.0, 1.0, 0.0))).toDF("id", "emb")
    val pairs = Dedup.embeddingCosineDups(e, "id", "emb", threshold = 0.98, planes = 6)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(pairs == Set((1L, 2L)))
  }

  test("hyperplane buckets are prefix-stable: bucket(e,P+S) >> S == bucket(e,P)") {
    // the property the bucket-split cap builds on: plane j's weights do not
    // depend on the total plane count, and plane 0 packs at the MSB side
    val e = (0 until 50).map { i =>
      val rng = new graft.stats.StatMath.SplitMix64(90 + i)
      (i.toLong, Seq.fill(12)(rng.nextDouble() * 2 - 1))
    }.toDF("id", "emb")
    val rows = e.select(
      Similarity.hyperplaneBucket($"emb", 6).as("coarse"),
      Similarity.hyperplaneBucket($"emb", 6 + 9).as("fine"))
      .as[(Long, Long)].collect()
    rows.foreach { case (coarse, fine) => assert(fine >> 9 == coarse) }
  }

  /** Adversarial clustered corpus for the bucket cap: planes=1 throws ~half
    * of 400 diverse vectors into each of TWO buckets (a dominant-bucket
    * regime), and perturbed copies of every 20th vector are the true dups. */
  private lazy val capCorpus = {
    val rng = new graft.stats.StatMath.SplitMix64(7L)
    val base = (0 until 400).map(i => (i.toLong, Seq.fill(8)(rng.nextDouble() * 2 - 1)))
    val dups = base.filter(_._1 % 20 == 0).map { case (i, v) =>
      (i + 1000L, v.map(_ * 1.001)) }
    (base ++ dups).toDF("id", "emb")
  }

  test("bucket cap: oversized buckets split by extra planes, dup recall kept") {
    val expected = capCorpus.as[(Long, Seq[Double])].collect()
      .filter(_._1 < 1000).filter(_._1 % 20 == 0)
      .map(t => (t._1, t._1 + 1000L)).toSet
    // uncapped ground truth on this corpus is exactly the injected dup pairs
    val uncapped = Dedup.embeddingCosineDups(capCorpus, "id", "emb",
        threshold = 0.999, planes = 1, maxBucket = Int.MaxValue)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(uncapped == expected, s"uncapped=$uncapped")
    // capped: both ~210-row buckets exceed maxBucket=50 and split; a scaled
    // copy keeps every hyperplane sign, so all true pairs survive the split
    val capped = Dedup.embeddingCosineDups(capCorpus, "id", "emb",
        threshold = 0.999, planes = 1, maxBucket = 50, splitPlanes = 10)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(capped == expected, s"capped=$capped")
  }

  test("bucket cap: hash-sampled census detects the same hot buckets") {
    val expected = Dedup.embeddingCosineDups(capCorpus, "id", "emb",
        threshold = 0.999, planes = 1, maxBucket = 50, splitPlanes = 10)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    // 25% sample, threshold 50*0.25=12.5: the ~210-row hot buckets sample
    // ~52 rows each — detected with wide margin; results identical
    val sampled = Dedup.embeddingCosineDups(capCorpus, "id", "emb",
        threshold = 0.999, planes = 1, maxBucket = 50, splitPlanes = 10,
        censusFrac = 0.25)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(sampled == expected)
  }

  test("bucket cap: candidate work per key is bounded on the dominant-bucket corpus") {
    // uncapped: the biggest key holds ~half the corpus -> quadratic work
    val uncappedMax = Dedup.cappedBucketKeys(capCorpus, "id", "emb",
        planes = 1, splitPlanes = 10, maxBucket = Int.MaxValue)
      .groupBy($"key").count().agg(max($"count")).as[Long].head()
    assert(uncappedMax > 150L, s"fixture not adversarial: max bucket $uncappedMax")
    // capped: hot buckets fan out over 2^10 sub-buckets; with 420 rows the
    // biggest surviving key is a handful of rows (true-dup pairs + hash luck)
    val cappedMax = Dedup.cappedBucketKeys(capCorpus, "id", "emb",
        planes = 1, splitPlanes = 10, maxBucket = 50)
      .groupBy($"key").count().agg(max($"count")).as[Long].head()
    assert(cappedMax <= 20L, s"max capped key population $cappedMax")
  }
}

class CurateSpec extends AnyFunSuite {
  lazy val spark = graft.SparkTestBase.spark
  import spark.implicits._

  test("curation pipeline: dedups exact copies, gates quality and language") {
    val docs = Seq(
      (1L, "the cat sat on the mat and it was happy with the sun in the garden today"),
      (2L, "the cat sat on the mat and it was happy with the sun in the garden today"), // exact copy
      (3L, "!!!! #### $$$$ %%%% ^^^^ &&&&"), // garbage -> quality gate
      (4L, "xqz blorp fnargle wibble zorp klaatu barada nikto verada"), // und -> lang gate
      (5L, "el perro corre en la casa y los gatos duermen por la noche con el sol"))
      .toDF("doc_id", "text")
    val out = Curate.curate(docs).orderBy($"doc_id")
      .select($"doc_id", $"lang").as[(Long, String)].collect()
    assert(out.map(_._1).sameElements(Array(1L, 5L)), out.mkString(","))
    assert(out.toMap == Map(1L -> "en", 5L -> "es"))
  }

  test("curation with near-dup stage: exact copy AND near-duplicate both drop, " +
    "gates still apply, smaller id survives") {
    val docs = Seq(
      (1L, "the cat sat on the mat and it was happy with the sun in the garden today"),
      (2L, "the cat sat on the mat and it was happy with the sun in the garden tonight"), // near-dup of 1
      (3L, "the cat sat on the mat and it was happy with the sun in the garden today"), // exact copy of 1
      (4L, "!!!! #### $$$$ %%%% ^^^^ &&&&"), // garbage -> quality gate
      (5L, "el perro corre en la casa y los gatos duermen por la noche con el sol"))
      .toDF("doc_id", "text")
    val out = Curate.curateWithNearDup(docs)
      .select($"doc_id", $"lang").as[(Long, String)].collect().toMap
    assert(out == Map(1L -> "en", 5L -> "es"), out.toString)
  }

  test("gateColumns (one shared profile) == separate langId/qualityScore/tokens, bit-exact") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select($"text")
      .union(Seq("", "   ", "汉字漢字中文测试文本在这里汉字漢字中文",
        "el la de que y en los del", "!!!! ???? ####",
        "the quick brown fox is in the yard and it is fine").toDF("text"))
    val (lang, q, t) = TextOps.gateColumns($"text")
    val diff = docs.select(lang.as("l"), q.as("q"), t.as("t"),
        TextOps.langId($"text").as("l2"),
        floor(TextOps.qualityScore($"text") * 1e6).cast("long").as("q2"),
        size(TextOps.tokens($"text")).as("t2"))
      .filter(!($"l" <=> $"l2") || !($"q" <=> $"q2") || !($"t" <=> $"t2"))
    assert(diff.count() == 0, diff.collect().take(3).mkString("\n"))
  }

  test("staged pipeline (materialized dedup stage) is bit-identical to the one-plan pipeline") {
    val docs = Seq(
      (1L, "the cat sat on the mat and it was happy with the sun in the garden today"),
      (2L, "the cat sat on the mat and it was happy with the sun in the garden tonight"), // near-dup of 1
      (3L, "the cat sat on the mat and it was happy with the sun in the garden today"), // exact copy of 1
      (4L, "!!!! #### $$$$ %%%% ^^^^ &&&&"), // garbage -> quality gate
      (5L, "el perro corre en la casa y los gatos duermen por la noche con el sol"),
      (6L, "a bird flew over the house and the tree while the children played in the yard"))
      .toDF("doc_id", "text").repartition(4)
    val scratch = java.nio.file.Files.createTempDirectory("curate-staged").toString
    try {
      val onePlan = Curate.curateWithNearDup(docs)
        .orderBy($"doc_id").collect().toSeq
      val staged = Curate.curateWithNearDupStaged(docs, scratch)
        .orderBy($"doc_id").collect().toSeq
      assert(staged == onePlan, s"staged=$staged onePlan=$onePlan")
      assert(staged.nonEmpty)
    } finally {
      import scala.sys.process._
      Seq("rm", "-rf", scratch).!
    }
  }

  test("curateFull: decon stage drops an eval leak that passes every other stage") {
    val docs = Seq(
      (1L, "the cat sat on the mat and it was happy with the sun in the garden today"),
      (2L, "the cat sat on the mat and it was happy with the sun in the garden today"), // exact copy
      // gate-passing Spanish doc — shares NO trigram with doc 1 (a shared
      // stopword trigram like "and it was" would flag doc 1 too)
      (3L, "el perro corre en la casa y los gatos duermen por la noche con el sol"),
      (4L, "!!!! #### $$$$ %%%% ^^^^ &&&&")) // garbage -> quality gate
      .toDF("doc_id", "text")
    // doc 3 is a verbatim member of the eval set: it passes dedup, near-dup
    // and both gates — ONLY the decon stage can remove it
    val bench = Seq((100L, "el perro corre en la casa y los gatos duermen por la noche con el sol"))
      .toDF("bench_id", "text")
    val out = Curate.curateFull(docs, bench)
      .select($"doc_id").as[Long].collect().toSet
    assert(out == Set(1L), out.toString)
    // without the eval set, doc 3 survives — the drop above was decon's
    val noBench = Curate.curateFull(docs,
      Seq((100L, "zzz yyy xxx")).toDF("bench_id", "text"))
      .select($"doc_id").as[Long].collect().toSet
    assert(noBench == Set(1L, 3L), noBench.toString)
    // the staged (materialized dedup+near-dup stage) variant is bit-identical
    val scratch = java.nio.file.Files.createTempDirectory("curate-full").toString
    try {
      val staged = Curate.curateFullStaged(docs, bench, scratch)
        .orderBy($"doc_id").collect().toSeq
      val onePlan = Curate.curateFull(docs, bench)
        .orderBy($"doc_id").collect().toSeq
      assert(staged == onePlan, s"staged=$staged onePlan=$onePlan")
    } finally {
      import scala.sys.process._
      Seq("rm", "-rf", scratch).!
    }
  }

  test("curation pipeline: survivor is min doc_id, stable under repartition") {
    val docs = Seq(9L, 7L, 8L).map(i =>
        (i, "the quick brown fox jumps over the lazy dog and it is a fine day for a run"))
      .toDF("doc_id", "text").repartition(5)
    val out = Curate.curate(docs).select($"doc_id").as[Long].collect()
    assert(out.sameElements(Array(7L)))
  }
}

class SimilaritySpec extends AnyFunSuite {
  lazy val spark = graft.SparkTestBase.spark
  import spark.implicits._

  lazy val embs = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")

  test("cosine: hand values") {
    val df = Seq((Seq(1.0, 0.0), Seq(1.0, 0.0)), (Seq(1.0, 0.0), Seq(0.0, 1.0)),
      (Seq(1.0, 1.0), Seq(1.0, 0.0))).toDF("a", "b")
    val got = df.select(round(Similarity.cosine($"a", $"b"), 6)).as[Double].collect()
    assert(got(0) == 1.0 && got(1) == 0.0 && math.abs(got(2) - 0.707107) < 1e-6)
  }

  test("brute-force topk: self-consistent ordering vs manual compute") {
    val q = embs.filter($"vec_id" === 0)
      .select($"embedding".cast("array<double>")).head().getSeq[Double](0).toArray
    val topk = Similarity.bruteForceTopK(embs.filter($"vec_id" =!= 0),
      "vec_id", "embedding", q, 5).as[(Long, Double)].collect()
    assert(topk.length == 5)
    assert(topk.map(_._2).sameElements(topk.map(_._2).sorted.reverse))
    // manual check of the top-1 against a driver-side computation
    val all = embs.filter($"vec_id" =!= 0)
      .select($"vec_id", $"embedding".cast("array<double>"))
      .as[(Long, Seq[Double])].collect()
    def cos(a: Array[Double], b: Array[Double]): Double = {
      val dot = a.zip(b).map(p => p._1 * p._2).sum
      dot / (math.sqrt(a.map(x => x * x).sum) * math.sqrt(b.map(x => x * x).sum))
    }
    val best = all.map { case (id, e) =>
      (id, math.rint(cos(e.toArray, q) * 10000) / 10000) }
      .maxBy(t => (t._2, -t._1))
    assert(topk(0)._1 == best._1, s"top1 ${topk(0)} vs manual $best")
  }

  /** Clustered corpus (what a kNN join is FOR — semantic near-dup groups):
    * 25 clusters × 8 members in 16 dims, member = unit-ish center + small
    * deterministic noise. A row's true top-k are its cluster-mates. */
  private lazy val clustered = {
    val rng = new graft.stats.StatMath.SplitMix64(2024L)
    val centers = Array.fill(25, 16)(rng.nextDouble() * 2 - 1)
    (0 until 200).map { i =>
      val c = centers(i / 8)
      (i.toLong, c.map(_ + (rng.nextDouble() * 2 - 1) * 0.05).toSeq)
    }.toDF("vec_id", "embedding")
  }

  test("knn join: per-row top-k with recall >= 0.9 vs brute-force ground truth") {
    val k = 5
    val exact = Similarity.allPairsTopK(clustered, "vec_id", "embedding", k)
      .select($"id_a", $"id_b").as[(Long, Long)].collect()
      .groupBy(_._1).map { case (a, ps) => a -> ps.map(_._2).toSet }
    val got = Similarity.knnJoin(clustered, "vec_id", "embedding", k, planes = 8, probes = 9)
      .select($"id_a", $"id_b").as[(Long, Long)].collect()
      .groupBy(_._1).map { case (a, ps) => a -> ps.map(_._2).toSet }
    assert(got.nonEmpty && exact.size == 200)
    val hits = exact.toSeq.map { case (a, truth) =>
      truth.intersect(got.getOrElse(a, Set.empty)).size.toDouble / truth.size
    }
    val recall = hits.sum / hits.size
    assert(recall >= 0.9, s"mean recall@$k = $recall")
    // every returned cosine is the true cosine (exact verification on
    // candidates) — checked on the real testdata embeddings too
    val bf = Similarity.allPairsTopK(embs, "vec_id", "embedding", 10000)
      .select($"id_a", $"id_b", round($"cos", 4)).as[(Long, Long, Double)].collect()
      .map(t => (t._1, t._2) -> t._3).toMap
    Similarity.knnJoin(embs, "vec_id", "embedding", k, planes = 4, probes = 5)
      .select($"id_a", $"id_b", round($"cos", 4)).as[(Long, Long, Double)].collect()
      // tolerance: allPairsTopK rounds to 4dp, knnJoin to 6dp — double
      // rounding can differ by one ulp of the coarser grid at .5 boundaries
      .foreach { case (a, b, c) => assert(math.abs(bf((a, b)) - c) <= 1.01e-4) }
  }

  test("knn join: TopKPairsAgg formulation equals the window formulation exactly") {
    def windowKnn(df: org.apache.spark.sql.DataFrame, k: Int,
                  planes: Int, probes: Int): org.apache.spark.sql.DataFrame = {
      val idx = df.select($"vec_id".as("id_b"),
        $"embedding".cast("array<double>").as("emb_b"),
        Similarity.hyperplaneBucket($"embedding", planes).as("bucket"))
      val own = $"b0"
      val probeArr = array(own +: (0 until math.min(probes - 1, planes))
        .map(j => own.bitwiseXOR(1L << j)): _*)
      val q = df.select($"vec_id".as("id_a"),
          $"embedding".cast("array<double>").as("emb_a"),
          Similarity.hyperplaneBucket($"embedding", planes).as("b0"))
        .select($"id_a", $"emb_a", explode(probeArr).as("bucket"))
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy($"id_a").orderBy($"cos".desc, $"id_b")
      q.join(idx, Seq("bucket"))
        .filter($"id_a" =!= $"id_b")
        .select($"id_a", $"id_b", round(Similarity.cosine($"emb_a", $"emb_b"), 6).as("cos"))
        .withColumn("rn", row_number().over(w))
        .filter($"rn" <= k)
        .select($"id_a", $"id_b", $"cos")
    }
    for (corpus <- Seq(clustered, embs.withColumnRenamed("embedding", "embedding"))) {
      val agg = Similarity.knnJoin(corpus, "vec_id", "embedding", 5, planes = 4, probes = 5)
        .orderBy($"id_a", $"cos".desc, $"id_b").collect()
      val win = windowKnn(corpus, 5, planes = 4, probes = 5)
        .orderBy($"id_a", $"cos".desc, $"id_b").collect()
      assert(agg.length == win.length && agg.sameElements(win),
        s"agg=${agg.length} win=${win.length}")
    }
  }

  test("TopKBuffer: ordering, bound, merge, serde") {
    val b = new graft.sketch.TopKBuffer(3)
    Seq((10L, 0.5), (11L, 0.9), (12L, 0.7), (13L, 0.9), (14L, 0.1)).foreach {
      case (i, s) => b.insert(i, s)
    }
    // ties on score prefer smaller id: (11,0.9),(13,0.9),(12,0.7)
    assert(b.size == 3)
    assert(b.ids.take(3).sameElements(Array(11L, 13L, 12L)))
    val b2 = new graft.sketch.TopKBuffer(3)
    b2.insert(20L, 0.95); b2.insert(21L, 0.6)
    b2.mergeIn(graft.sketch.TopKBuffer.fromBytes(b.toBytes))
    assert(b2.ids.take(3).sameElements(Array(20L, 11L, 13L)))
    assert(b2.scores.take(3).sameElements(Array(0.95, 0.9, 0.9)))
  }

  test("indexed LSH topk: equals compute-and-filter path; scan is partition-pruned") {
    val dir = java.nio.file.Files.createTempDirectory("lsh-index").toString
    Similarity.lshIndexWrite(embs, "vec_id", "embedding", dir, planes = 4)
    val q = embs.filter($"vec_id" === 0)
      .select($"embedding".cast("array<double>")).head().getSeq[Double](0).toArray
    val indexed = Similarity.lshTopKIndexed(spark, dir, q, k = 6, planes = 4, probes = 5)
    // partition pruning proof: the bucket predicate must live in the scan's
    // PartitionFilters, and no post-scan Filter node may evaluate it
    val plan = indexed.queryExecution.executedPlan.toString
    val pf = "PartitionFilters: \\[[^\\]]*\\]".r.findFirstIn(plan).getOrElse("")
    assert(pf.contains("bucket#"), plan.take(1500))
    val filterNodes = plan.split("\n").filter(_.trim.matches("[+:\\-\\s*(\\d)]*Filter .*"))
    assert(!filterNodes.exists(_.contains("bucket#")),
      s"bucket predicate leaked into a Filter node: ${filterNodes.mkString(" | ")}")
    // identical results to the compute-and-filter path (vec_id 0 included in
    // the index is fine: its cosine with itself ranks first deterministically
    // in both paths; compare on the common corpus without it)
    val computed = Similarity.lshTopK(embs, "vec_id", "embedding", q,
        k = 6, planes = 4, probes = 5)
      .as[(Long, Double)].collect().filter(_._1 != 0L).take(5)
    val got = indexed.as[(Long, Double)].collect().filter(_._1 != 0L).take(5)
    assert(got.sameElements(computed), s"indexed=${got.toSeq} computed=${computed.toSeq}")
  }

  test("probeMasks: Hamming-ascending multi-probe order, distinct, capped at 2^planes") {
    // full enumeration at probes >= universe: every bucket, exactly once
    val all = Similarity.probeMasks(planes = 4, probes = 100)
    assert(all.length == 16 && all.distinct.length == 16)
    // Hamming distance never decreases along the probe order
    val pops = all.map(java.lang.Long.bitCount)
    assert(pops == pops.sorted, s"probe order not Hamming-ascending: $pops")
    // the H<=1 prefix is the legacy probe set (own bucket, then single-bit
    // flips in ascending bit order) — old (planes+1)-probe configs replay
    assert(Similarity.probeMasks(5, 6) == Seq(0L, 1L, 2L, 4L, 8L, 16L))
    // H2 continues in lexicographic bit-position order: (0,1), (0,2), (0,3)
    assert(Similarity.probeMasks(5, 9).drop(6) == Seq(3L, 5L, 9L))
    // masks stay within the plane bits
    assert(Similarity.probeMasks(3, 8).forall(m => (m & ~7L) == 0L))
  }

  test("lshTopK probes beyond planes+1 reach Hamming-2 buckets (recall grows)") {
    val q = embs.filter($"vec_id" === 0)
      .select($"embedding".cast("array<double>")).head().getSeq[Double](0).toArray
    val planes = 4
    def scanned(probes: Int): Long =
      Similarity.lshTopK(embs, "vec_id", "embedding", q,
        k = 100000, planes = planes, probes = probes).count()
    val h1 = scanned(planes + 1)     // own + all single-bit flips
    val h2 = scanned(planes + 1 + 6) // + all C(4,2) two-bit flips
    val allBuckets = scanned(16)     // the full universe = whole corpus
    assert(h1 < h2 && h2 < allBuckets, s"$h1 / $h2 / $allBuckets")
    assert(allBuckets == embs.count())
  }

  test("driver ANN entries carry the in-row recall gate vs the exact twin") {
    val dir = "/root/testdata/sf0.001"
    for (name <- Seq("ann_lsh_topk", "ann_ivf_topk")) {
      val out = OpsQueries.queries(name)(spark, dir)
      assert(out.columns.contains("recall"), s"$name lacks the recall column")
      val recalls = out.select($"recall").as[Double].collect().distinct
      assert(recalls.length == 1, s"$name recall not constant: ${recalls.toSeq}")
      assert(recalls.head >= 0.25, s"$name recall ${recalls.head}")
    }
    val kj = OpsQueries.queries("knn_join")(spark, dir)
    assert(kj.columns.contains("recall"))
    // per-query recall: mean gated >= 0.4 inside the entry; spot-check range
    val rs = kj.select($"recall").as[Double].collect()
    assert(rs.forall(r => r >= 0.0 && r <= 1.0))
    assert(rs.sum / rs.length >= 0.4)
  }

  test("lshTopK honors the NUMERIC probes value (only probes-1 neighbor buckets)") {
    val q = embs.filter($"vec_id" === 0)
      .select($"embedding".cast("array<double>")).head().getSeq[Double](0).toArray
    val planes = 4
    val qBucket = spark.range(1)
      .select(Similarity.hyperplaneBucket(typedlit(q.toSeq), planes))
      .head().getLong(0)
    for (probes <- Seq(1, 2, 3, 5)) {
      val allowed = (if (probes <= 1) Seq(qBucket)
        else qBucket +: (0 until math.min(probes - 1, planes)).map(b => qBucket ^ (1L << b))).toSet
      val ids = Similarity.lshTopK(embs, "vec_id", "embedding", q,
        k = 1000, planes = planes, probes = probes).as[(Long, Double)].collect().map(_._1)
      val buckets = embs.filter($"vec_id".isin(ids: _*))
        .select(Similarity.hyperplaneBucket($"embedding", planes))
        .as[Long].collect().toSet
      assert(buckets.subsetOf(allowed), s"probes=$probes scanned $buckets ⊄ $allowed")
      // with an unbounded k, the probed buckets' ENTIRE population returns —
      // so result counts must be exactly the allowed buckets' population
      val pop = embs.select(Similarity.hyperplaneBucket($"embedding", planes).as("b"))
        .filter($"b".isin(allowed.toSeq: _*)).count()
      assert(ids.length.toLong == pop, s"probes=$probes got ${ids.length}, bucket pop $pop")
    }
  }

  test("knn join: bucket cap preserves clustered recall") {
    val k = 5
    val exact = Similarity.allPairsTopK(clustered, "vec_id", "embedding", k)
      .select($"id_a", $"id_b").as[(Long, Long)].collect()
      .groupBy(_._1).map { case (a, ps) => a -> ps.map(_._2).toSet }
    // planes=2 -> 4 coarse buckets of ~50 rows; maxBucket=30 forces every
    // bucket to split. Same-bucket cluster-mates keep all signs and stay
    // co-keyed; a mate reached through a FOREIGN hot probe must additionally
    // match the query's splitPlanes ext bits — the cap's documented recall
    // trade (clusters straddling an extra plane lose those probes), so the
    // bound here is looser than the uncapped 0.9 (measured ~0.75).
    val got = Similarity.knnJoin(clustered, "vec_id", "embedding", k,
        planes = 2, probes = 3, maxBucket = 30, splitPlanes = 10)
      .select($"id_a", $"id_b").as[(Long, Long)].collect()
      .groupBy(_._1).map { case (a, ps) => a -> ps.map(_._2).toSet }
    val hits = exact.toSeq.map { case (a, truth) =>
      truth.intersect(got.getOrElse(a, Set.empty)).size.toDouble / truth.size }
    val recall = hits.sum / hits.size
    assert(recall >= 0.7, s"capped mean recall@$k = $recall")
  }

  test("batch ANN vs persisted index: per-query equality with the single-query " +
    "path; index scan partition-prunes to the probed-bucket union") {
    val dir = java.nio.file.Files.createTempDirectory("lsh-index-b").toString
    Similarity.lshIndexWrite(embs, "vec_id", "embedding", dir, planes = 4)
    val queries = embs.filter($"vec_id" < 8)
    val batch = Similarity.lshTopKIndexedBatch(spark, dir, queries,
      "vec_id", "embedding", k = 6, planes = 4, probes = 5)
    // pruning proof: the INDEX scan's bucket predicate lives in its
    // PartitionFilters, and no Filter node re-evaluates that attribute
    // (the query side has its own exploded `bucket` column whose join
    // null-filter is legitimate — scope the check to the scan's attr id)
    val plan = batch.queryExecution.executedPlan.toString
    val pfStr = "PartitionFilters: \\[[^\\]]*\\]".r.findAllIn(plan)
      .find(_.contains("bucket#")).getOrElse(fail(plan.take(1500)))
    val idxBucketAttr = "bucket#\\d+".r.findFirstIn(pfStr).get
    val filterNodes = plan.split("\n").filter(_.trim.matches("[+:\\-\\s*(\\d)]*Filter .*"))
    assert(!filterNodes.exists(_.contains(idxBucketAttr)),
      s"index bucket predicate leaked into a Filter node: ${filterNodes.mkString(" | ")}")
    // per-query equality with lshTopKIndexed (same planes/probes/k)
    val got = batch.as[(Long, Long, Double)].collect()
      .groupBy(_._1).view
      .mapValues(_.map(t => (t._2, t._3)).sortBy(t => (-t._2, t._1)).toSeq).toMap
    val qVecs = queries.select($"vec_id", $"embedding".cast("array<double>"))
      .as[(Long, Seq[Double])].collect()
    assert(qVecs.length == 8 && got.size == 8)
    qVecs.foreach { case (qid, qv) =>
      val single = Similarity.lshTopKIndexed(spark, dir, qv.toArray,
        k = 6, planes = 4, probes = 5).as[(Long, Double)].collect().toSeq
      assert(got(qid) == single, s"query $qid: batch=${got(qid)} single=$single")
    }
  }

  test("guaranteed-total-probe config (planes=1, probes=2): knnJoin equals " +
    "exact per-row top-k — the structural basis of the knn_join_exact oracle") {
    val all = embs.select($"vec_id", $"embedding".cast("array<double>"))
      .as[(Long, Seq[Double])].collect()
    def cos6(a: Seq[Double], b: Seq[Double]): Double = {
      var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
      while (i < a.length) { dot += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i); i += 1 }
      math.rint(dot / (math.sqrt(na) * math.sqrt(nb)) * 1e6) / 1e6
    }
    val expected = all.flatMap { case (qid, qv) =>
      all.filter(_._1 != qid)
        .map { case (oid, ov) => (oid, cos6(qv, ov)) }
        .sortBy(t => (-t._2, t._1)).take(5)
        .map { case (oid, c) => (qid, oid, c) }
    }.sortBy(t => (t._1, -t._3, t._2))
    val got = Similarity.knnJoin(embs, "vec_id", "embedding", k = 5,
        planes = 1, probes = 2, maxBucket = Int.MaxValue)
      .orderBy($"id_a", $"cos".desc, $"id_b")
      .as[(Long, Long, Double)].collect()
    assert(got.length == expected.length)
    got.zip(expected).foreach { case (g, e) => assert(g == e, s"$g != $e") }
  }

  test("LSH topk: results are a subset of correct cosines, ranked correctly") {
    val q = embs.filter($"vec_id" === 0)
      .select($"embedding".cast("array<double>")).head().getSeq[Double](0).toArray
    val lsh = Similarity.lshTopK(embs.filter($"vec_id" =!= 0),
      "vec_id", "embedding", q, k = 5, planes = 4, probes = 5)
      .as[(Long, Double)].collect()
    assert(lsh.nonEmpty)
    assert(lsh.map(_._2).sameElements(lsh.map(_._2).sorted.reverse))
    // every returned cosine must equal the brute-force cosine for that id
    val bf = Similarity.bruteForceTopK(embs.filter($"vec_id" =!= 0),
      "vec_id", "embedding", q, 10000).as[(Long, Double)].collect().toMap
    lsh.foreach { case (id, c) => assert(math.abs(bf(id) - c) < 1e-9) }
  }
}

class IvfAnnSpec extends AnyFunSuite {
  lazy val spark = graft.SparkTestBase.spark
  import spark.implicits._

  /** Clustered corpus — the regime IVF exists for. */
  private lazy val clustered = {
    val rng = new graft.stats.StatMath.SplitMix64(512L)
    val centers = Array.fill(20, 16)(rng.nextDouble() * 2 - 1)
    (0 until 300).map { i =>
      val c = centers(i / 15)
      (i.toLong, c.map(_ + (rng.nextDouble() * 2 - 1) * 0.05).toSeq)
    }.toDF("vec_id", "embedding")
  }

  test("ivf: training is deterministic; assignment covers every row once") {
    val c1 = IvfAnn.trainCentroids(clustered, "vec_id", "embedding", nLists = 8)
    val c2 = IvfAnn.trainCentroids(clustered, "vec_id", "embedding", nLists = 8)
    assert(c1.length == 8)
    c1.zip(c2).foreach { case (a, b) => assert(a.sameElements(b)) }
    val assigned = IvfAnn.assign(clustered, "vec_id", "embedding", c1)
    assert(assigned.count() == 300)
    assert(assigned.select("list").distinct().count() > 1)
  }

  test("ivf indexed topk: nprobe covering all lists equals brute force; " +
    "small nprobe keeps high recall on the clustered corpus; scan partition-prunes") {
    val dir = java.nio.file.Files.createTempDirectory("ivf-index").toString
    IvfAnn.indexWrite(clustered, "vec_id", "embedding", dir, nLists = 8)
    val q = clustered.filter($"vec_id" === 0)
      .select($"embedding").as[Seq[Double]].head().toArray
    // exact config: all lists probed == brute force (basis of the oracle)
    val exact = Similarity.bruteForceTopK(clustered, "vec_id", "embedding", q, 10)
      .as[(Long, Double)].collect().toSeq
    val all = IvfAnn.topKIndexed(spark, dir, q, k = 10, nprobe = 8)
      .as[(Long, Double)].collect().toSeq
    assert(all == exact, s"ivf=$all bf=$exact")
    // approximate config: 2 of 8 lists, query's cluster-mates dominate
    val approx = IvfAnn.topKIndexed(spark, dir, q, k = 10, nprobe = 2)
    val plan = approx.queryExecution.executedPlan.toString
    val pf = "PartitionFilters: \\[[^\\]]*\\]".r.findAllIn(plan).toSeq
    assert(pf.exists(_.contains("list#")), plan.take(1500))
    val got = approx.as[(Long, Double)].collect().map(_._1).toSet
    val truth = exact.map(_._1).toSet
    val recall = truth.intersect(got).size.toDouble / truth.size
    assert(recall >= 0.9, s"recall@10 with nprobe=2/8: $recall")
  }
}

class MultimodalSpec extends AnyFunSuite {
  lazy val spark = graft.SparkTestBase.spark
  import spark.implicits._

  test("synthetic media: binary payloads, deterministic") {
    val m = Multimodal.syntheticMedia(spark, 50).collect()
    assert(m.length == 50)
    assert(m.forall(_.payload.length == 64))
    val m2 = Multimodal.syntheticMedia(spark, 50).collect()
    assert(m.map(_.payload.toSeq).sameElements(m2.map(_.payload.toSeq)))
  }

  test("feature extraction: batch shape and determinism through mapPartitions") {
    val f = Multimodal.extractFeatures(Multimodal.syntheticMedia(spark, 50).repartition(7))
      .collect().sortBy(_.media_ref)
    assert(f.length == 50)
    assert(f.forall(_.features.length == 8))
    assert(f.forall(x => x.features.forall(v => v >= 0.0 && v <= 1.0)))
    val f2 = Multimodal.extractFeatures(Multimodal.syntheticMedia(spark, 50))
      .collect().sortBy(_.media_ref)
    assert(f.map(_.checksum).sameElements(f2.map(_.checksum)))
  }

  test("frame sampling keeps every stride-th byte") {
    val out = Multimodal.frameSample(Multimodal.syntheticMedia(spark, 3), 8)
      .select($"sampled_frames").as[Seq[Array[Byte]]].head()
    assert(out.length == 8) // 64 bytes / stride 8
    assert(out.forall(_.length == 1))
  }

  test("real PNG decode: known pixel values survive encode→decode→grayscale") {
    // solid-color image: every grayscale pixel must equal the exact luminance
    val img = new java.awt.image.BufferedImage(30, 20,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until 20; x <- 0 until 30) img.setRGB(x, y, (100 << 16) | (150 << 8) | 200)
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    val (w, h, gray28) = Multimodal.decodeImage(bos.toByteArray)
    assert(w == 30 && h == 20)
    val expected = (0.299 * 100 + 0.587 * 150 + 0.114 * 200) / 255.0
    assert(gray28.length == 28 * 28)
    gray28.foreach(v => assert(math.abs(v - expected) < 1e-12))
    Multimodal.bandMeans(gray28).foreach(v => assert(math.abs(v - expected) < 1e-12))
  }

  test("box resize: exact means of source boxes") {
    // 2x2 -> 1x1: mean of all four
    assert(Multimodal.resizeBox(Array(0.0, 1.0, 2.0, 3.0), 2, 2, 1, 1).sameElements(Array(1.5)))
    // 4x2 -> 2x1: left box mean (0+1+4+5)/4, right (2+3+6+7)/4
    val r = Multimodal.resizeBox(Array(0.0, 1, 2, 3, 4, 5, 6, 7), 4, 2, 2, 1)
    assert(r.sameElements(Array(2.5, 4.5)))
    // upscale 1x1 -> 2x2 replicates
    assert(Multimodal.resizeBox(Array(7.0), 1, 1, 2, 2).forall(_ == 7.0))
  }

  test("decodeImageFeatures: real decode over synthetic PNG corpus, deterministic") {
    val f = Multimodal.decodeImageFeatures(Multimodal.syntheticImages(spark, 40).repartition(5))
      .collect().sortBy(_.media_ref)
    assert(f.length == 40)
    assert(f.forall(_.features.length == 8))
    assert(f.forall(x => x.features.forall(v => v >= 0.0 && v <= 1.0)))
    assert(f.forall(x => x.width >= 16 && x.height >= 16))
    // random pixels: bands differ (not a constant image)
    assert(f.forall(x => x.features.distinct.length > 1))
    val f2 = Multimodal.decodeImageFeatures(Multimodal.syntheticImages(spark, 40))
      .collect().sortBy(_.media_ref)
    f.zip(f2).foreach { case (a, b) => assert(a == b) }
  }

  test("aHash64 hand values: uniform image is 0L; half-dark/half-bright is the column mask") {
    assert(Multimodal.aHash64(Array.fill(28 * 28)(0.7)) == 0L)
    // left 14 columns dark, right 14 bright: 8x8 cells 0-3 dark, 4-7 bright
    // per row -> byte 0xF0 repeated
    val half = Array.tabulate(28 * 28)(i => if (i % 28 < 14) 0.0 else 1.0)
    assert(Multimodal.aHash64(half) == 0xF0F0F0F0F0F0F0F0L)
    assert(intercept[IllegalArgumentException](Multimodal.aHash64(Array(1.0)))
      .getMessage.contains("784"))
  }

  test("hammingPairs64: radius filter, chunks=1 degenerates to exact equality") {
    val hashed = Seq((1L, 0x00FFL), (2L, 0x00FFL), (3L, 0x00FCL))
      .toDF("id", "sim") // 3 differs from 1/2 in the low 2 bits
    def pairs(maxH: Int, chunks: Int) =
      Dedup.hammingPairs64(hashed, maxH, chunks)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs(0, 8) == Set((1L, 2L)))
    assert(pairs(2, 8) == Set((1L, 2L), (1L, 3L), (2L, 3L)))
    assert(pairs(1, 8) == Set((1L, 2L))) // hamming 2 excluded by the radius
    assert(pairs(0, 1) == Set((1L, 2L))) // full-width chunk: exact-equality join
    assert(intercept[IllegalArgumentException](
      Dedup.hammingPairs64(hashed, 1, 7)).getMessage.contains("divide"))
  }

  test("frameSample: fixed-frame slicing, sampling arithmetic, short-payload drop, guards") {
    val media = Multimodal.syntheticMedia(spark, 20).toDF()
    // 64-byte payloads = 4 16-byte frames; every 2nd from 0 -> frames 0, 2
    val got = Multimodal.frameSample(media, frameBytes = 16, everyK = 2)
      .collect().map(r => (r.getAs[String]("media_ref"), r.getAs[Int]("frame_idx")) ->
        (r.getAs[Int]("n_frames"), r.getAs[String]("frame_hex"))).toMap
    assert(got.size == 40 && got.keys.map(_._2).toSet == Set(0, 2))
    // frame i's bytes ARE md5(id + "-" + i) by construction of the payload
    val md = java.security.MessageDigest.getInstance("MD5")
    def md5hex(s: String) =
      md.digest(s.getBytes("UTF-8")).map("%02X".format(_)).mkString
    for (id <- Seq(0L, 7L, 19L); f <- Seq(0, 2)) {
      val (n, hx) = got((f"m-$id%08d", f))
      assert(n == 4 && hx == md5hex(s"$id-$f"))
    }
    // offset shifts the kept set; everyK=1 keeps all frames
    assert(Multimodal.frameSample(media, 16, 2, offset = 1)
      .select("frame_idx").distinct().collect().map(_.getInt(0)).toSet == Set(1, 3))
    assert(Multimodal.frameSample(media, 16, 1).count() == 80)
    // frames wider than the payload -> zero rows, not a crash
    assert(Multimodal.frameSample(media, 128, 1).count() == 0)
    intercept[IllegalArgumentException](Multimodal.frameSample(media, 0, 1))
    intercept[IllegalArgumentException](Multimodal.frameSample(media, 16, 0))
    intercept[IllegalArgumentException](Multimodal.frameSample(media, 16, 1, -1))
  }

  test("imageNearDupPairs: exactly the planted perturbed twins, partitioning-invariant") {
    val base = Multimodal.syntheticImages(spark, 60)
    val corpus = Multimodal.withPerturbedCopies(base, dupEvery = 5)
    val expected = base.collect().map(_.media_ref)
      .filter(r => (scala.util.hashing.MurmurHash3.stringHash(r) % 5 + 5) % 5 == 0)
      .map(r => (r, r + "-dup")).toSet
    assert(expected.nonEmpty)
    val got = Multimodal.imageNearDupPairs(corpus)
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getInt(2)).toMap
    assert(got.keySet == expected,
      s"missing=${expected -- got.keySet} extra=${got.keySet -- expected}")
    assert(got.values.forall(_ <= 3)) // noise twins live within the radius-3 default
    val reparted = Multimodal.imageNearDupPairs(
        corpus.repartition(7).as[Multimodal.ImageRow])
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
    assert(reparted == expected)
  }
}

class SliceAccuracySpec extends AnyFunSuite {
  lazy val spark = graft.SparkTestBase.spark
  import spark.implicits._

  test("per-slice accuracy: hand values, overall from the same aggregates, threshold gates flagging") {
    val dir = java.nio.file.Files.createTempDirectory("slice").toString
    // label 0: 4/4 correct; label 1: 2/4 correct → overall 6/8 = 0.75
    val rows = (0 until 4).map(i =>
        (i.toLong, Seq(1.0f, 0.0f), 0)) ++
      Seq((4L, Seq(0.0f, 1.0f), 1), (5L, Seq(0.0f, 1.0f), 1),
        (6L, Seq(1.0f, 0.0f), 1), (7L, Seq(1.0f, 0.0f), 1))
    rows.toDF("vec_id", "embedding", "label")
      .write.parquet(s"$dir/embeddings.parquet")
    val got = OpsQueries.sliceAccuracy(spark, dir, threshold = 0.2)
      .as[(Int, Long, Long, Double, Double, Boolean)].collect().toSeq
    assert(got == Seq(
      (0, 4L, 4L, 1.0, 0.25, true),
      (1, 4L, 2L, 0.5, -0.25, true)))
    // a wider threshold un-flags the same deltas
    val loose = OpsQueries.sliceAccuracy(spark, dir, threshold = 0.3)
      .as[(Int, Long, Long, Double, Double, Boolean)].collect().toSeq
    assert(loose.forall(!_._6))
  }
}

class StreamingOpsSpec extends AnyFunSuite {
  lazy val spark = graft.SparkTestBase.spark
  import spark.implicits._

  test("streaming novel-type alarm equals the batch replay; contract types and nulls never alarm") {
    val refTypes = Seq("click", "purchase", "signup", "view")
    val streamed = StreamingOps.runNovelTypesStream(spark,
        "/root/testdata/sf0.001/events.parquet", refTypes, "novel_spec")
      .orderBy($"window_start", $"event_type")
      .as[(java.sql.Timestamp, String, Long)].collect()
    val batch = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
      .filter($"event_type".isNotNull && !$"event_type".isin(refTypes: _*))
      .groupBy(date_trunc("hour", $"ts").as("window_start"), $"event_type")
      .agg(count(lit(1)).as("novel_events"))
      .orderBy($"window_start", $"event_type")
      .as[(java.sql.Timestamp, String, Long)].collect()
    assert(streamed.nonEmpty, "the synthetic feed emits 'error' outside the contract")
    assert(streamed.sameElements(batch))
    assert(streamed.forall(_._2 == "error"), "only the off-contract type alarms")
    // full contract = nothing novel, stream emits zero rows
    val all = StreamingOps.runNovelTypesStream(spark,
      "/root/testdata/sf0.001/events.parquet",
      refTypes :+ "error", "novel_spec_none")
    assert(all.isEmpty)
  }

  test("streaming hourly agg equals the batch equivalent") {
    val streamed = StreamingOps.runFileStream(spark,
        "/root/testdata/sf0.001/events.parquet", "stream_spec")
      .orderBy($"hr", $"event_type")
      .as[(java.sql.Timestamp, String, Long, Double)].collect()
    val batch = graft.entry.TpchQueries.eventsHourlyAgg(spark, "/root/testdata/sf0.001")
      .as[(java.sql.Timestamp, String, Long, Double)].collect()
    assert(streamed.sameElements(batch))
    assert(streamed.nonEmpty)
  }

  test("streaming exact dedup: double-fed corpus collapses to the single-copy aggregate") {
    val streamed = StreamingOps.runDedupStream(spark,
        "/root/testdata/sf0.001/events.parquet", "dedup_spec")
      .orderBy($"event_type")
      .as[(String, Long, Double)].collect()
    val batch = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
      .select($"event_id", $"event_type", $"value").distinct()
      .groupBy($"event_type")
      .agg(count(lit(1)).as("cnt"), round(sum($"value"), 4).as("sum_v"))
      .orderBy($"event_type")
      .as[(String, Long, Double)].collect()
    assert(streamed.nonEmpty)
    assert(streamed.sameElements(batch),
      s"streamed=${streamed.take(3).mkString(",")} batch=${batch.take(3).mkString(",")}")
    // the double-feed really doubled arrivals: without dedup the counts
    // would be 2x — assert the oracle-side total matches the raw table size
    val raw = spark.read.parquet("/root/testdata/sf0.001/events.parquet").count()
    assert(streamed.map(_._2).sum == raw)
  }

  test("bounded-state streaming dedup (withinWatermark): double-fed sliced " +
    "corpus collapses to the single-copy aggregate") {
    val streamed = StreamingOps.runDedupStreamBounded(spark,
        "/root/testdata/sf0.001/events.parquet", "dedup_wm_spec")
      .orderBy($"event_type")
      .as[(String, Long, Double)].collect()
    val batch = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
      .select($"event_id", $"event_type", $"value").distinct()
      .groupBy($"event_type")
      .agg(count(lit(1)).as("cnt"), round(sum($"value"), 4).as("sum_v"))
      .orderBy($"event_type")
      .as[(String, Long, Double)].collect()
    assert(streamed.nonEmpty && streamed.sameElements(batch),
      s"streamed=${streamed.take(3).mkString(",")} batch=${batch.take(3).mkString(",")}")
    assert(streamed.map(_._2).sum ==
      spark.read.parquet("/root/testdata/sf0.001/events.parquet").count())
  }

  test("streaming session_window equals the batch gap-rule twin at the " +
    "session grain; the exact-gap boundary MERGES (same > rule as batch)") {
    val streamed = StreamingOps.runSessionStream(spark,
        "/root/testdata/sf0.001/events.parquet", gap = "6 hours",
        queryName = "sess_spec")
      .orderBy($"user_id", $"first_ts")
      .select($"user_id", $"n_events", $"duration_us")
      .as[(Long, Long, Long)].collect().toSeq
    val batch = Temporal.sessionStats(
        spark.read.parquet("/root/testdata/sf0.001/events.parquet"),
        "user_id", "ts", "event_id", 21600L)
      .orderBy($"user_id", $"first_ts")
      .select($"user_id", $"n_events", $"duration_us")
      .as[(Long, Long, Long)].collect().toSeq
    assert(streamed.nonEmpty && streamed == batch)
    // exact-boundary fixture: events EXACTLY gap apart merge (touching
    // session ranges coalesce) — the same `diff > gap` split rule as the
    // batch index; one microsecond past the gap splits in both
    val t0 = java.sql.Timestamp.valueOf("2024-01-01 00:00:00")
    val atGap = new java.sql.Timestamp(t0.getTime + 21600000L)
    val pastGap = new java.sql.Timestamp(t0.getTime + 21600001L)
    def fixture(t1: java.sql.Timestamp) =
      Seq((1L, t0, 7L, "view", 0.0, ""), (2L, t1, 7L, "view", 0.0, ""))
        .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    def streamSessions(fix: org.apache.spark.sql.DataFrame, qn: String) = {
      val d = java.nio.file.Files.createTempDirectory("graft-sess-fix").toString
      fix.coalesce(1).write.mode("overwrite").parquet(d)
      StreamingOps.runSessionStream(spark, d, gap = "6 hours", queryName = qn).count()
    }
    assert(streamSessions(fixture(atGap), "sess_boundary_at") == 1)
    assert(Temporal.sessionStats(fixture(atGap), "user_id", "ts", "event_id", 21600L).count() == 1)
    assert(streamSessions(fixture(pastGap), "sess_boundary_past") == 2)
    assert(Temporal.sessionStats(fixture(pastGap), "user_id", "ts", "event_id", 21600L).count() == 2)
  }

  test("streaming as-of join: final-only exactly-once matches over the " +
    "sliced out-of-order-within-delay feed equal the batch operator") {
    val streamed = StreamingOps.runAsofStream(spark,
        "/root/testdata/sf0.001/events.parquet", "purchase", "view",
        queryName = "asof_spec")
      .select($"purchase_id", $"view_id", $"gap_us")
      .as[(Long, Long, Long)].collect().sorted.toSeq
    val ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    val batch = Temporal.asofJoin(
        ev.filter($"event_type" === "purchase")
          .select($"event_id", $"ts", $"user_id"),
        ev.filter($"event_type" === "view")
          .select($"event_id", $"ts", $"user_id"),
        "user_id", "ts", "event_id")
      .select($"event_id", $"r_event_id", $"gap_us")
      .as[(Long, Long, Long)].collect().sorted.toSeq
    // sorted-with-duplicates equality also proves exactly-once emission
    assert(streamed.nonEmpty && streamed == batch)
  }

  // uniform reference over 10 value-buckets of width 10
  private val refUniform = Array.fill(10)(0.1)

  test("flatMapGroupsWithState drift: final verdicts equal the batch twin") {
    val streamed = StreamingOps.runDriftStream(spark,
        "/root/testdata/sf0.001/events.parquet", refUniform,
        windowDuration = "1 day", queryName = "drift_spec")
      .select($"event_type", $"window_start", $"n", round($"psi", 9).as("psi"), $"is_drift")
      .orderBy($"event_type", $"window_start")
      .collect()
    val batch = StreamingOps.driftPerWindowBatch(
        spark.read.parquet("/root/testdata/sf0.001/events.parquet"),
        refUniform, windowDuration = "1 day")
      .select($"event_type", $"window_start", $"n", round($"psi", 9).as("psi"), $"is_drift")
      .orderBy($"event_type", $"window_start")
      .collect()
    assert(streamed.nonEmpty)
    assert(streamed.length == batch.length,
      s"streamed ${streamed.length} vs batch ${batch.length}")
    streamed.zip(batch).foreach { case (s, b) => assert(s == b, s"$s != $b") }
  }

  test("flatMapGroupsWithState drift: shifted window flags, matching ref does not") {
    import java.sql.Timestamp
    val base = Timestamp.valueOf("2024-06-01 00:00:00").getTime
    // window A: values matching the uniform reference; window B: all mass in
    // one bucket (severe shift)
    val rows = (0 until 1000).map { i =>
      (i.toLong, new Timestamp(base + i * 1000L), 0L, "ok", (i % 10) * 10.0 + 5.0, "")
    } ++ (0 until 1000).map { i =>
      (1000L + i, new Timestamp(base + 7200000L + i * 1000L), 0L, "shifted", 95.0, "")
    }
    val dir = java.nio.file.Files.createTempDirectory("drift-in").toString
    rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(dir)
    val out = StreamingOps.runDriftStream(spark, dir, refUniform,
        queryName = "drift_spec2")
      .select($"event_type", $"psi", $"is_drift", $"n").collect()
    val ok = out.filter(_.getString(0) == "ok").head
    val shifted = out.filter(_.getString(0) == "shifted").head
    assert(!ok.getBoolean(2), s"uniform window flagged: psi=${ok.getDouble(1)}")
    assert(shifted.getBoolean(2), s"shifted window not flagged: psi=${shifted.getDouble(1)}")
    assert(shifted.getDouble(1) > ok.getDouble(1) * 10)
    assert(ok.getLong(3) == 1000L && shifted.getLong(3) == 1000L)
  }

  // ---- streaming near-dup dedup ----

  /** 40 docs: distinct ~12-token texts, every 10th doc given a one-word-
    * perturbed near-copy at id+100 (lands in LATER slices — exercises the
    * cross-batch index path), plus an empty doc and a punctuation-only doc
    * (no shingles — must always survive). */
  private def nddCorpus = {
    val words = Array("alpha", "bravo", "charlie", "delta", "echo", "foxtrot",
      "golf", "hotel", "india", "juliet", "kilo", "lima")
    val base = (0 until 40).map { i =>
      val toks = (0 until 12).map(j => words((i * 7 + j * 3) % words.length))
      (i.toLong, toks.mkString(" "))
    }
    val dups = base.filter(_._1 % 10 == 0)
      .map { case (id, t) => (id + 100L, t + " perturbed") }
    (base ++ dups :+ (200L, "") :+ (201L, "!!!")).toDF("doc_id", "text")
  }

  /** Ground truth replayed with the BATCH operator: drop ids appearing as
    * the larger side of any verified pair. */
  private def nddGroundTruth(corpus: org.apache.spark.sql.DataFrame): Array[Long] = {
    val droppedIds = Dedup.minhashLshPairs(corpus, "doc_id", "text", threshold = 0.5)
      .select($"id_b").distinct().as[Long].collect().toSet
    corpus.select($"doc_id").as[Long].collect().filterNot(droppedIds).sorted
  }

  test("streaming near-dup dedup: survivors equal the batch-operator replay " +
    "(cross-batch drops exercised; shingle-free docs kept)") {
    val corpus = nddCorpus
    val got = StreamingOps.runNearDupDedupStream(spark, corpus, "doc_id", "text",
        threshold = 0.5, slices = 4, indexParts = 8, tag = "spec-a")
      .select($"doc_id").as[Long].collect().sorted
    val want = nddGroundTruth(corpus)
    assert(got.sameElements(want), s"got=${got.mkString(",")} want=${want.mkString(",")}")
    // the perturbed copies arrive AFTER their originals (later slices) and
    // every one must be dropped via the persisted index, not within-batch
    assert(!got.exists(id => id >= 100L && id < 200L))
    // shingle-free docs can never be near-dups — kept
    assert(got.contains(200L) && got.contains(201L))
    assert(got.contains(0L)) // the earlier side of each pair survives
  }

  test("streaming near-dup dedup: survivor set is micro-batch-boundary " +
    "invariant (slices=2 vs slices=7)") {
    val corpus = nddCorpus
    val a = StreamingOps.runNearDupDedupStream(spark, corpus, "doc_id", "text",
        threshold = 0.5, slices = 2, indexParts = 8, tag = "spec-b2")
      .select($"doc_id").as[Long].collect().sorted
    val b = StreamingOps.runNearDupDedupStream(spark, corpus, "doc_id", "text",
        threshold = 0.5, slices = 7, indexParts = 8, tag = "spec-b7")
      .select($"doc_id").as[Long].collect().sorted
    assert(a.sameElements(b), s"slices=2 ${a.mkString(",")} vs slices=7 ${b.mkString(",")}")
  }

  test("streaming near-dup dedup: index layout is partition-pruned and " +
    "param-guarded across appends") {
    val corpus = nddCorpus
    StreamingOps.runNearDupDedupStream(spark, corpus, "doc_id", "text",
      threshold = 0.5, slices = 3, indexParts = 8, tag = "spec-c")
    val root = graft.util.PidPaths.path("graft_ndd") + "/spec-c"
    // posting store is partitionBy(pb): a probed-bucket read prunes at the
    // PartitionFilters level (only the probed directories are scanned)
    val pruned = spark.read.parquet(s"$root/posting").filter($"pb".isin(0L, 3L))
    val scan = pruned.queryExecution.executedPlan.toString
    assert(scan.contains("PartitionFilters") && scan.contains("pb"),
      s"expected partition-pruned posting scan, got:\n$scan")
    // a later batch with DIFFERENT LSH params must fail loud, not silently
    // mix incomparable band hashes into the same index
    val e = intercept[IllegalArgumentException] {
      StreamingOps.nearDupDedupBatch(corpus.limit(3), "doc_id", "text",
        s"$root/posting", s"$root/shingles", s"$root/survivors",
        threshold = 0.5, numHashes = 16, bands = 4, indexParts = 8)
    }
    assert(e.getMessage.contains("incomparable"))
  }

  test("streaming near-dup dedup: micro-batch RETRY is idempotent " +
    "(batch-scoped overwrite writes; foreachBatch redelivery converges)") {
    val root = java.nio.file.Files.createTempDirectory("ndd-retry").toString
    val posting = s"$root/posting"; val shingles = s"$root/shingles"
    val survivors = s"$root/survivors"
    // per-id-unique tokens: only the injected copies are near-dups
    val mk = (id: Long) => (id, (0 until 10).map(j => s"r${id}y$j").mkString(" "))
    def run(b: org.apache.spark.sql.DataFrame, bid: Long): Unit =
      StreamingOps.nearDupDedupBatch(b, "doc_id", "text", posting, shingles,
        survivors, indexParts = 8, batchId = bid)
    run((0L until 12L).map(mk).toDF("doc_id", "text"), 0L)
    val batch1 = ((12L until 18L).map(mk) ++
      Seq(2L, 7L).map(id => (id + 100L, mk(id)._2 + " perturbed")))
      .toDF("doc_id", "text")
    run(batch1, 1L)
    def kept = spark.read.parquet(survivors)
      .select($"doc_id").as[Long].collect().sorted.toSeq
    val once = kept
    val postRows = spark.read.parquet(posting).count()
    assert(once == (0L until 18L), s"got ${once.mkString(",")}")
    // redelivery of batch 1 (crash before the checkpoint commit): the
    // scoped writes overwrite their own subtrees, the cross-batch probe
    // reads only batch < 1 — bytes converge instead of duplicating, and
    // the retry does NOT self-match its first attempt's postings
    run(batch1, 1L)
    assert(kept == once, "retry changed the survivor set")
    assert(spark.read.parquet(posting).count() == postRows,
      "retry duplicated posting rows")
    // compaction preserves the two-level scoped layout; the history is
    // still probed afterwards (a dup of a batch-0 doc dropped cross-batch)
    val (pb0, pb1) = IndexMaintenance.compactPartitionedIndex(
      spark, posting, "batch", "pb")
    IndexMaintenance.compactPartitionedIndex(spark, shingles, "batch", "sp")
    assert(pb1 <= pb0)
    run(((18L until 21L).map(mk) :+ (300L, mk(0L)._2 + " perturbed"))
      .toDF("doc_id", "text"), 2L)
    assert(kept == (0L until 21L), s"got ${kept.mkString(",")}")
    // one store is one mode: a flat append into a scoped store fails loud
    val e = intercept[IllegalArgumentException](
      run((30L until 33L).map(mk).toDF("doc_id", "text"), -1L))
    assert(e.getMessage.contains("SCOPED"))
  }

  test("streaming near-dup dedup: redelivery survives a crash between the " +
    "posting and shingle writes of the FIRST batch (no store wedge)") {
    val root = java.nio.file.Files.createTempDirectory("ndd-crash").toString
    val posting = s"$root/posting"; val shingles = s"$root/shingles"
    val survivors = s"$root/survivors"
    val mk = (id: Long) => (id, (0 until 10).map(j => s"c${id}w$j").mkString(" "))
    // a within-batch near-dup pair forces non-empty candidates on the
    // retry, which is what used to read the missing shingle store
    val batch0 = ((0L until 10L).map(mk) :+ (50L, mk(1L)._2 + " perturbed"))
      .toDF("doc_id", "text")
    def run(): Unit = StreamingOps.nearDupDedupBatch(batch0, "doc_id", "text",
      posting, shingles, survivors, indexParts = 8, batchId = 0L)
    run()
    // simulate the crash window: the shingle write never happened
    import scala.sys.process._
    Seq("rm", "-rf", shingles).!
    run() // redelivery must converge, not die on shingle schema inference
    val kept = spark.read.parquet(survivors)
      .select($"doc_id").as[Long].collect().sorted.toSeq
    assert(kept == (0L until 10L), s"got ${kept.mkString(",")}")
    assert(java.nio.file.Files.isDirectory(
      java.nio.file.Paths.get(s"$shingles/batch=0")), "shingle store not rebuilt")
  }

  test("streaming near-dup dedup: expiring old batch subtrees gives " +
    "retention-window semantics (expired docs stop suppressing dups)") {
    val root = java.nio.file.Files.createTempDirectory("ndd-expire").toString
    val posting = s"$root/posting"; val shingles = s"$root/shingles"
    val survivors = s"$root/survivors"
    val mk = (id: Long) => (id, (0 until 10).map(j => s"e${id}z$j").mkString(" "))
    def run(rows: Seq[(Long, String)], bid: Long): Unit =
      StreamingOps.nearDupDedupBatch(rows.toDF("doc_id", "text"), "doc_id",
        "text", posting, shingles, survivors, indexParts = 8, batchId = bid)
    def kept = spark.read.parquet(survivors)
      .select($"doc_id").as[Long].collect().sorted.toSeq
    run((0L until 10L).map(mk), 0L)
    run((10L until 20L).map(mk), 1L)
    assert(IndexMaintenance.expireScopedBatches(posting, 1L) == 1)
    assert(IndexMaintenance.expireScopedBatches(shingles, 1L) == 1)
    // dup of an EXPIRED batch-0 doc is KEPT; dup of a retained batch-1
    // doc is still dropped
    run(Seq((100L, mk(3L)._2 + " perturbed"),
            (101L, mk(15L)._2 + " perturbed")), 2L)
    assert(kept == ((0L until 20L) :+ 100L), s"got ${kept.mkString(",")}")
    // expire EVERYTHING: the empty store must read as "no history", and a
    // dup of the just-expired doc 100 is kept
    IndexMaintenance.expireScopedBatches(posting, Long.MaxValue)
    IndexMaintenance.expireScopedBatches(shingles, Long.MaxValue)
    run(Seq((200L, mk(3L)._2 + " perturbed")), 3L)
    assert(kept == (((0L until 20L) :+ 100L) :+ 200L), s"got ${kept.mkString(",")}")
  }
}
