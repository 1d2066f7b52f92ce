package graft.functions

import org.scalatest.funsuite.AnyFunSuite

/** The SQL function surface: every native expression callable from plain
  * `spark.sql`, with shape parameters as literals. */
class GraftExtensionsSpec extends AnyFunSuite {
  lazy val spark = graft.SparkTestBase.spark

  test("all native expressions registered and callable from SQL") {
    GraftExtensions.register(spark)
    val r = spark.sql(
      """SELECT
           round(cosine_sim(array(1.0d, 0.0d), array(1.0d, 0.0d)), 6) AS cs,
           rolling_hash('ab') AS rh,
           simhash64(array('a', 'b')) AS sh,
           hyperplane_bucket(array(0.5d, -0.5d), 4) AS hb,
           span_flags(array('text'), array(5, 3)) AS fl,
           size(whitespace_tokens('Hello  world')) AS wt,
           word_shingles('a b c d', 3) AS ws,
           size(minhash_sig(array('x y z'), 8)) AS ms,
           size(band_hashes(minhash_sig(array('x y z'), 8), 4, 2)) AS bh,
           stopword_count(array('the', 'fox'), array('the', 'a')) AS sc,
           text_profile('the fox!', array('the', 'a'), array('el')) AS tp
         """).head()
    assert(r.getDouble(0) == 1.0)
    assert(r.getLong(1) == 97L * RollingHash.B + 98L)
    assert(!r.isNullAt(2))
    assert(r.getLong(3) >= 0L && r.getLong(3) < 16L)
    assert(r.getInt(4) == SpanFlags.OrdBit) // 3 <= 5: non-monotone
    assert(r.getInt(5) == 2)
    assert(r.getSeq[String](6) == Seq("a b c", "b c d"))
    assert(r.getInt(7) == 8)
    assert(r.getInt(8) == 4)
    assert(r.getInt(9) == 1)
    val tp = r.getStruct(10)
    // "the fox!": 2 tokens, 8 chars, 7 non-space, 1 punct, 0 cjk, hits (1, 0)
    assert(tp.getInt(0) == 2 && tp.getInt(1) == 8 && tp.getInt(2) == 7 &&
      tp.getInt(3) == 1 && tp.getInt(4) == 0 && tp.getSeq[Int](5) == Seq(1, 0))
    // SQL result == Scala-API result for a representative expression
    import spark.implicits._
    val viaSql = spark.sql("SELECT rolling_hash('graft engine')").head().getLong(0)
    val viaApi = Seq("graft engine").toDF("t")
      .select(RollingHash.rolling_hash($"t")).head().getLong(0)
    assert(viaSql == viaApi)
    // shape args must be literals — loud analysis failure otherwise
    val ex = intercept[Exception] {
      spark.sql("SELECT hyperplane_bucket(array(1.0d), CAST(rand()*4 AS INT))").head()
    }
    assert(ex.getMessage.contains("integer literal") ||
      ex.getMessage.contains("hyperplane_bucket"))
    // a foldable NULL must fail loudly too, not unbox to planes=0
    val exNull = intercept[Exception] {
      spark.sql("SELECT hyperplane_bucket(array(1.0d), CAST(NULL AS INT))").head()
    }
    assert(exNull.getMessage.contains("non-null") ||
      exNull.getMessage.contains("hyperplane_bucket"))
    // composed builders: SQL re-expands the library's own column chain
    assert(spark.sql("SELECT extract_html_text('<p>a &amp; b</p>')")
      .head().getString(0) == "a & b")
    assert(spark.sql("SELECT normalize_text('  Café  X ')")
      .head().getString(0) == "cafe x")
  }

  test("sketch aggregates callable from SQL (analyzer wraps AggregateFunction)") {
    GraftExtensions.register(spark)
    spark.range(10000).createOrReplaceTempView("sk_in")
    val r = spark.sql(
      """SELECT kll_sketch_agg(CAST(id % 100 AS DOUBLE)) AS kll,
                tdigest_agg(CAST(id % 100 AS DOUBLE)) AS td,
                tdigest_agg(CAST(id % 100 AS DOUBLE), 50) AS td50,
                theta_sketch_agg(id % 100) AS theta
         FROM sk_in""").head()
    assert(graft.sketch.KllOps.n(r.getAs[Array[Byte]]("kll")) == 10000L)
    assert(graft.sketch.TDigestOps.n(r.getAs[Array[Byte]]("td")) == 10000L)
    assert(graft.sketch.TDigestOps.n(r.getAs[Array[Byte]]("td50")) == 10000L)
    assert(graft.sketch.ThetaOps.estimateLong(r.getAs[Array[Byte]]("theta")) == 100L)
    val med = graft.sketch.TDigestOps.quantiles(r.getAs[Array[Byte]]("td"), Array(0.5))(0)
    assert(math.abs(med - 49.5) < 5.0, med.toString)
  }
}

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The native codegen expressions must be BIT-IDENTICAL to the interpreted
  * higher-order-function formulations they replaced (the HOF twins live here
  * as the executable spec of the semantics). */
class NativeExprSpec extends AnyFunSuite {
  lazy val spark = graft.SparkTestBase.spark
  import spark.implicits._

  /** The previous interpreted simhash formulation (Dedup r1). */
  private def simhashHof(tokensCol: Column): Column = {
    val bitSums = transform(sequence(lit(0), lit(63)), b =>
      aggregate(tokensCol, lit(0L), (acc, t) =>
        acc + when(call_function("shiftright", xxhash64(t), b).bitwiseAND(1L) === 1L, 1L).otherwise(-1L)))
    aggregate(bitSums, lit(0L), (acc, s) =>
      shiftleft(acc, 1) + when(s > 0L, 1L).otherwise(0L))
  }

  /** The previous interpreted hyperplane-bucket formulation (Similarity r1). */
  private def hyperplaneHof(emb: Column, planes: Int): Column = {
    def planeWeight(plane: Column, dim: Column): Column =
      (pmod(xxhash64(plane, dim, lit("hyperplane")), lit(2000000L)).cast("double") - 1000000.0) / 1000000.0
    val dims = size(emb)
    val signs = transform(sequence(lit(0), lit(planes - 1)), p => {
      val dot = aggregate(
        zip_with(emb, sequence(lit(0), dims - 1), (v, i) => v * planeWeight(p, i)),
        lit(0.0), (s, v) => s + v)
      when(dot >= 0.0, 1L).otherwise(0L)
    })
    aggregate(signs, lit(0L), (acc, s) => shiftleft(acc, 1) + s)
  }

  test("simhash64 native == interpreted HOF twin on real text") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .limit(200)
      .select(graft.ops.TextOps.tokens($"text").as("toks"))
    val diff = docs.select(
        SimHash64.simhash64($"toks").as("native"), simhashHof($"toks").as("hof"))
      .filter($"native" =!= $"hof").count()
    assert(diff == 0)
    // edge cases: empty array, single token, null element
    val edge = Seq(Seq.empty[String], Seq("x"), Seq("a", "b", "a")).toDF("toks")
    val rows = edge.select(SimHash64.simhash64($"toks"), simhashHof($"toks")).collect()
    rows.foreach(r => assert(r.getLong(0) == r.getLong(1), r.toString))
  }

  test("hyperplane_bucket native == interpreted HOF twin, double and float arrays") {
    val embD = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
      .limit(200).select($"embedding".cast("array<double>").as("emb"))
    for (planes <- Seq(5, 12)) {
      val diff = embD.select(
          HyperplaneBucket.hyperplane_bucket($"emb", planes).as("native"),
          hyperplaneHof($"emb", planes).as("hof"))
        .filter($"native" =!= $"hof").count()
      assert(diff == 0, s"double path, planes=$planes")
    }
    val embF = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
      .limit(200).select($"embedding".as("emb")) // raw array<float>
    val diffF = embF.select(
        HyperplaneBucket.hyperplane_bucket($"emb", 12).as("native"),
        hyperplaneHof($"emb", 12).as("hof"))
      .filter($"native" =!= $"hof").count()
    assert(diffF == 0, "float path")
  }

  /** The previous HOF text formulations (TextOps/Dedup r1). */
  private def tokensHof(text: Column): Column =
    filter(split(lower(text), "\\s+"), t => length(t) > 0)
  private def shinglesHof(text: Column, n: Int): Column = {
    val toks = tokensHof(text)
    array_distinct(
      when(size(toks) < n, array(concat_ws(" ", toks)))
        .otherwise(transform(sequence(lit(0), size(toks) - n), i =>
          concat_ws(" ", slice(toks, i + 1, lit(n))))))
  }
  private def minhashHof(shinglesCol: Column, numHashes: Int): Column =
    transform(sequence(lit(0), lit(numHashes - 1)), i =>
      array_min(transform(shinglesCol, s => xxhash64(s, i))))

  test("tokens/shingles/minhash natives == interpreted HOF twins on real multilingual text") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select($"text")
      .union(Seq("", " ", "one", "a b", "  tabs\tand\nnewlines  x  ",
        "这是一个中文句子 with mixed  content", "Ünïcode CASE Folding ß").toDF("text"))
    val tokDiff = docs.select(TextNative.whitespace_tokens($"text").as("n"),
        tokensHof($"text").as("h"))
      .filter(!($"n" <=> $"h")).count()
    assert(tokDiff == 0, "tokens")
    for (n <- Seq(1, 2, 3, 5)) {
      val shDiff = docs.select(TextNative.word_shingles($"text", n).as("n"),
          shinglesHof($"text", n).as("h"))
        .filter(!($"n" <=> $"h")).count()
      assert(shDiff == 0, s"shingles n=$n")
    }
    val mhDiff = docs.select(TextNative.word_shingles($"text", 3).as("sh"))
      .select(TextNative.minhash_sig($"sh", 32).as("n"), minhashHof($"sh", 32).as("h"))
      .filter(!($"n" <=> $"h")).count()
    assert(mhDiff == 0, "minhash sig")
    // empty shingle array -> all-null slots, matching array_min over empty
    val r = Seq(Seq.empty[String]).toDF("sh")
      .select(TextNative.minhash_sig($"sh", 4).as("n"), minhashHof($"sh", 4).as("h")).head()
    assert(r.getSeq[Any](0) == r.getSeq[Any](1))
  }

  test("bigram_pairs native == retained HOF twin (LangModel.bigramsOf)") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select($"text")
      .union(Seq("", " ", "one", "a b", "a b c", "  tabs\tand\nnewlines  x  ",
        "这是一个中文句子 with mixed  content", "Ünïcode CASE Folding ß").toDF("text"))
    val diff = docs.select(
        TextNative.bigram_pairs($"text").as("n"),
        graft.ops.LangModel.bigramsOf(graft.ops.TextOps.tokens($"text")).as("h"))
      .filter(!($"n" <=> $"h")).count()
    assert(diff == 0, "bigram pairs")
    // head/order semantics pinned by hand: w1 NULL exactly once, on token 0
    val rows = Seq("x y z").toDF("text")
      .select(explode(TextNative.bigram_pairs($"text")).as("p"))
      .select($"p.w1", $"p.w2").collect()
    assert(rows.map(r => (Option(r.getString(0)), r.getString(1))).toSeq ==
      Seq((None, "x"), (Some("x"), "y"), (Some("y"), "z")))
    // SQL surface
    graft.functions.GraftExtensions.register(spark)
    assert(spark.sql("SELECT size(bigram_pairs('a b c')) AS s").head().getInt(0) == 3)
  }

  /** The previous HOF cosine (Similarity r1). */
  private def cosineHof(a: Column, b: Column): Column = {
    val dot = aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (s, v) => s + v)
    val na = sqrt(aggregate(a, lit(0.0), (s, v) => s + v * v))
    val nb = sqrt(aggregate(b, lit(0.0), (s, v) => s + v * v))
    dot / (na * nb)
  }

  test("cosine_sim native == interpreted HOF twin on real embedding pairs") {
    val e = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val pairs = e.limit(40).select($"vec_id".as("ia"), $"embedding".as("ea"))
      .crossJoin(e.limit(40).select($"vec_id".as("ib"), $"embedding".as("eb")))
    // float path and double path
    val dF = pairs.select(CosineSim.cosine_sim($"ea", $"eb").as("n"),
        cosineHof($"ea", $"eb").as("h"))
      .filter(!($"n" <=> $"h")).count()
    assert(dF == 0, "float arrays")
    val dD = pairs.select(
        CosineSim.cosine_sim($"ea".cast("array<double>"), $"eb".cast("array<double>")).as("n"),
        cosineHof($"ea".cast("array<double>"), $"eb".cast("array<double>")).as("h"))
      .filter(!($"n" <=> $"h")).count()
    assert(dD == 0, "double arrays")
    // unequal lengths -> null, like zip_with's null padding poisoning the sum
    val r = Seq((Seq(1.0, 2.0), Seq(1.0, 2.0, 3.0))).toDF("a", "b")
      .select(CosineSim.cosine_sim($"a", $"b"), cosineHof($"a", $"b")).head()
    assert(r.isNullAt(0) && r.isNullAt(1))
  }

  test("stopword_count native == filter/array_contains HOF twin") {
    val words = Seq("the", "a", "of", "and", "to", "in", "is", "it", "that", "for")
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select(TextNative.whitespace_tokens($"text").as("toks"))
      .union(Seq(Seq.empty[String], Seq("the", "the", "zzz")).toDF("toks"))
    val wl = typedlit(words)
    val diff = docs.select(
        StopwordCount.stopword_count($"toks", words).as("n"),
        size(filter($"toks", t => array_contains(wl, t))).as("h"))
      .filter(!($"n" <=> $"h")).count()
    assert(diff == 0)
  }

  test("text_profile fields == the regexp/tokenize formulations they replace, " +
    "on real docs + adversarial strings") {
    val adversarial = Seq(
      "", "   ", "\t\n\f\r", "!!! ### $$$ ~~~ [](){}`^_|",
      "汉字漢字中文测试文本在这里", "mixed 汉字 and ascii with punct!!",
      "astral 😀 emoji 🌀 pair", // 4-byte UTF-8 sequences
      "THE The the tHe", "abécd über straße", // 2-byte seqs
      "a", "word1 word2 word3").toDF("text")
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select($"text").union(adversarial)
    val words = Seq("the", "a", "of", "and", "to", "in", "is", "it", "that", "for")
    val p = TextProfile.text_profile($"text", Seq(words))
    val diff = docs.select(
        p.getField("n_tok").as("nt"), p.getField("len").as("ln"),
        p.getField("non_space").as("ns"), p.getField("punct").as("pu"),
        p.getField("cjk").as("cj"), element_at(p.getField("hits"), 1).as("hi"),
        size(TextNative.whitespace_tokens($"text")).as("nt2"),
        length($"text").as("ln2"),
        length(regexp_replace($"text", "\\s+", "")).as("ns2"),
        length(regexp_replace($"text", "[^!-/:-@\\[-`{-~]", "")).as("pu2"),
        length(regexp_replace($"text", "[^\\x{4E00}-\\x{9FFF}]", "")).as("cj2"),
        StopwordCount.stopword_count(TextNative.whitespace_tokens($"text"), words).as("hi2"))
      .filter(!($"nt" <=> $"nt2") || !($"ln" <=> $"ln2") || !($"ns" <=> $"ns2") ||
        !($"pu" <=> $"pu2") || !($"cj" <=> $"cj2") || !($"hi" <=> $"hi2"))
    assert(diff.count() == 0, diff.collect().take(3).mkString("\n"))
  }

  test("text_profile never over-reads truncated/malformed UTF-8 (unvalidated binary->string cast)") {
    // 0xE4 is a 3-byte lead with no continuation bytes; 0xE4 0xB8 is cut
    // after one. binary->string casts do NOT validate, so these reach the
    // expression as real (malformed) strings.
    val rows = Seq(
      Array(0xE4.toByte),
      Array(0xE4.toByte, 0xB8.toByte),
      Array('a'.toByte, 0xE4.toByte),
      Array(0xE4.toByte, 0xB8.toByte, 0x80.toByte)) // valid 一 (U+4E00)
      .toDF("b").select($"b".cast("string").as("text"))
    val p = TextProfile.text_profile($"text", Seq(Seq("a")))
    val got = rows.select(p.getField("len").as("l"), p.getField("cjk").as("c"))
      .as[(Int, Int)].collect().toSeq
    // truncated sequences: counted as one char, never CJK; the valid U+4E00 is CJK
    assert(got == Seq((1, 0), (1, 0), (2, 0), (1, 1)), got.toString)
  }

  test("qualityScore/langId over text_profile == their pre-profile twins, bit-exact") {
    val adversarial = Seq(
      "", "   ", "汉字漢字中文测试文本在这里汉字漢字中文", "el la de que y en los del",
      "der die und das von zu mit den", "le la de et les des en un",
      "the quick brown fox is in the yard and it is fine",
      "zzz qqq xxx www", "!!!! ???? ####").toDF("text")
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select($"text").union(adversarial)
    val diff = docs.select(
        graft.ops.TextOps.qualityScore($"text").as("q"),
        graft.ops.TextOps.qualityScoreTwin($"text").as("q2"),
        graft.ops.TextOps.langId($"text").as("l"),
        graft.ops.TextOps.langIdTwin($"text").as("l2"))
      .filter(!($"q" <=> $"q2") || !($"l" <=> $"l2"))
    assert(diff.count() == 0, diff.collect().take(3).mkString("\n"))
  }

  test("null inputs propagate") {
    val r = Seq((null: Seq[String], null: Seq[Double]))
      .toDF("toks", "emb")
      .select(SimHash64.simhash64($"toks"),
        HyperplaneBucket.hyperplane_bucket($"emb".cast("array<double>"), 8))
      .head()
    assert(r.isNullAt(0) && r.isNullAt(1))
  }
}
