package graft.functions

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.FunctionRegistry
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}
import org.apache.spark.sql.types.IntegerType

/** SQL surface for the engine's native expressions — every custom codegen
  * Expression becomes a `spark.sql(...)`-callable function, so the whole
  * operator library is reachable from plain SQL, not only the Scala API
  * (completing the "a reference user can run every query" contract).
  *
  * Two registration paths, same function set:
  *  - `spark.sql.extensions=graft.functions.GraftExtensions` at session
  *    build (the idiomatic SparkSessionExtensions injection), or
  *  - `GraftExtensions.register(spark)` on a LIVE session (tests, REPLs).
  *
  * Shape parameters (planes, bands, n, …) arrive as SQL literal arguments
  * and must be foldable integers — the builders fail analysis loudly
  * otherwise (the expressions specialize codegen on these constants).
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    GraftExtensions.functions.foreach { case (name, info, builder) =>
      ext.injectFunction((FunctionIdentifier(name), info, builder))
    }
}

object GraftExtensions {

  private def intLit(e: Expression, fn: String, arg: String): Int = e match {
    case Literal(v: Int, IntegerType) => v
    case other if other.foldable && other.dataType == IntegerType =>
      other.eval() match {
        // a foldable NULL (e.g. CAST(NULL AS INT)) must fail loudly, not
        // unbox to 0 and silently degenerate the expression's shape
        case null => throw new IllegalArgumentException(
          s"$fn: argument '$arg' must be a non-null integer literal, got NULL")
        case v => v.asInstanceOf[Int]
      }
    case other =>
      throw new IllegalArgumentException(
        s"$fn: argument '$arg' must be an integer literal, got $other")
  }

  private def strLits(e: Expression, fn: String, arg: String): Seq[String] = e match {
    case other if other.foldable =>
      other.eval() match {
        case a: org.apache.spark.sql.catalyst.util.ArrayData =>
          a.toObjectArray(org.apache.spark.sql.types.StringType).map {
            // a NULL element (e.g. array('the', NULL)) must fail loudly like
            // the foldable-NULL path in intLit, not NPE in the cast below
            case null => throw new IllegalArgumentException(
              s"$fn: argument '$arg' must be a non-null string-array literal " +
                "(contains a NULL element)")
            case u => u.asInstanceOf[org.apache.spark.unsafe.types.UTF8String].toString
          }.toSeq
        case _ => throw new IllegalArgumentException(
          s"$fn: argument '$arg' must be a non-null string-array literal")
      }
    case other => throw new IllegalArgumentException(
      s"$fn: argument '$arg' must be a string-array literal, got $other")
  }

  private def arity(fn: String, args: Seq[Expression], n: Int): Unit =
    require(args.length == n, s"$fn takes $n arguments, got ${args.length}")

  /** Foldable integral literal widened to long (INT or BIGINT argument). */
  private def longLit(e: Expression, fn: String, arg: String): Long = e match {
    case other if other.foldable &&
        (other.dataType == IntegerType || other.dataType == org.apache.spark.sql.types.LongType) =>
      other.eval() match {
        case null => throw new IllegalArgumentException(
          s"$fn: argument '$arg' must be a non-null integral literal, got NULL")
        case v: Int => v.toLong
        case v: Long => v
        case v => throw new IllegalArgumentException(
          s"$fn: argument '$arg' must be an integral literal, got $v")
      }
    case other => throw new IllegalArgumentException(
      s"$fn: argument '$arg' must be an integral literal, got $other")
  }

  /** Foldable numeric literal as double (for rates like fpp). */
  private def doubleLit(e: Expression, fn: String, arg: String): Double = e match {
    case other if other.foldable =>
      other.eval() match {
        case null => throw new IllegalArgumentException(
          s"$fn: argument '$arg' must be a non-null numeric literal, got NULL")
        case v: Double => v
        case v: Float => v.toDouble
        case v: Int => v.toDouble
        case v: Long => v.toDouble
        case v: org.apache.spark.sql.types.Decimal => v.toDouble
        case v => throw new IllegalArgumentException(
          s"$fn: argument '$arg' must be a numeric literal, got $v")
      }
    case other => throw new IllegalArgumentException(
      s"$fn: argument '$arg' must be a numeric literal, got $other")
  }

  /** (name, info, builder) for every native expression. */
  val functions: Seq[(String, ExpressionInfo, Seq[Expression] => Expression)] = Seq(
    ("cosine_sim", "cosine similarity of two numeric arrays",
      (args: Seq[Expression]) => { arity("cosine_sim", args, 2); CosineSim(args(0), args(1)) }),
    ("rolling_hash", "polynomial rolling hash of a string's UTF-8 bytes",
      (args: Seq[Expression]) => { arity("rolling_hash", args, 1); RollingHash(args(0)) }),
    ("simhash64", "64-bit SimHash of a token array",
      (args: Seq[Expression]) => { arity("simhash64", args, 1); SimHash64(args(0)) }),
    ("hyperplane_bucket", "random-hyperplane LSH bucket id (planes sign bits)",
      (args: Seq[Expression]) => {
        arity("hyperplane_bucket", args, 2)
        HyperplaneBucket(args(0), intLit(args(1), "hyperplane_bucket", "planes"))
      }),
    ("random_project", "seeded JL sign-matrix random projection to outDim latent dims",
      (args: Seq[Expression]) => {
        arity("random_project", args, 3)
        RandomProject(args(0), intLit(args(1), "random_project", "outDim"),
          intLit(args(2), "random_project", "seed"))
      }),
    ("random_project_q", "integer-exact quantized JL projection (hash-oracle twin)",
      (args: Seq[Expression]) => {
        arity("random_project_q", args, 4)
        RandomProjectQ(args(0), intLit(args(1), "random_project_q", "outDim"),
          intLit(args(2), "random_project_q", "seed"),
          intLit(args(3), "random_project_q", "scale"))
      }),
    ("span_flags", "span-integrity flags: bit0 non-monotone offsets, bit1 null kind",
      (args: Seq[Expression]) => { arity("span_flags", args, 2); SpanFlags(args(0), args(1)) }),
    ("whitespace_tokens", "lowercase whitespace tokens of a string",
      (args: Seq[Expression]) => { arity("whitespace_tokens", args, 1); WhitespaceTokens(args(0)) }),
    ("bigram_pairs", "adjacent-token (w1, w2) bigram structs, w1 NULL at the head",
      (args: Seq[Expression]) => { arity("bigram_pairs", args, 1); BigramPairs(args(0)) }),
    ("word_shingles", "distinct n-gram word shingles of a string",
      (args: Seq[Expression]) => {
        arity("word_shingles", args, 2)
        WordShingles(args(0), intLit(args(1), "word_shingles", "n"))
      }),
    ("minhash_sig", "MinHash signature (k slots) of a shingle array",
      (args: Seq[Expression]) => {
        arity("minhash_sig", args, 2)
        MinHashSig(args(0), intLit(args(1), "minhash_sig", "numHashes"))
      }),
    ("band_hashes", "LSH band hashes of a MinHash signature",
      (args: Seq[Expression]) => {
        arity("band_hashes", args, 3)
        BandHashes(args(0), intLit(args(1), "band_hashes", "bands"),
          intLit(args(2), "band_hashes", "rows"))
      }),
    ("stopword_count", "count of tokens contained in a literal stopword list",
      (args: Seq[Expression]) => {
        arity("stopword_count", args, 2)
        StopwordCount(args(0), strLits(args(1), "stopword_count", "words"))
      }),
    // aggregates register like scalars: the analyzer wraps an
    // AggregateFunction returned by a registry builder in its
    // AggregateExpression during UnresolvedFunction resolution
    ("kll_sketch_agg", "mergeable KLL quantile sketch (serialized, binary)",
      (args: Seq[Expression]) => {
        require(args.length == 1 || args.length == 2,
          s"kll_sketch_agg takes (value[, k]), got ${args.length} arguments")
        graft.sketch.KllSketchAgg(args(0),
          if (args.length == 2) intLit(args(1), "kll_sketch_agg", "k") else 200)
      }),
    ("tdigest_agg", "mergeable t-digest quantile sketch (serialized, binary)",
      (args: Seq[Expression]) => {
        require(args.length == 1 || args.length == 2,
          s"tdigest_agg takes (value[, k]), got ${args.length} arguments")
        graft.sketch.TDigestAgg(args(0),
          if (args.length == 2) {
            val k = intLit(args(1), "tdigest_agg", "k")
            require(k >= 10 && k <= Short.MaxValue,
              s"tdigest_agg: k must be in [10, ${Short.MaxValue}], got $k")
            k.toShort
          } else org.apache.datasketches.tdigest.TDigestDouble.DEFAULT_K)
      }),
    ("theta_sketch_agg", "mergeable theta distinct sketch with set ops (serialized, binary)",
      (args: Seq[Expression]) => {
        require(args.length == 1 || args.length == 2,
          s"theta_sketch_agg takes (value[, nominalEntries]), got ${args.length} arguments")
        graft.sketch.ThetaSketchAgg(args(0),
          if (args.length == 2) intLit(args(1), "theta_sketch_agg", "nominalEntries")
          else 4096)
      }),
    ("bloom_filter_agg", "mergeable Bloom membership filter (serialized, binary)",
      (args: Seq[Expression]) => {
        require(args.length >= 1 && args.length <= 3,
          s"bloom_filter_agg takes (value[, expectedItems[, fpp]]), got ${args.length} arguments")
        val expected =
          if (args.length >= 2) longLit(args(1), "bloom_filter_agg", "expectedItems")
          else 1000000L
        val fpp = if (args.length == 3) doubleLit(args(2), "bloom_filter_agg", "fpp")
          else 0.01
        graft.sketch.BloomFilterAgg(args(0), expected, fpp)
      }),
    ("bloom_might_contain", "membership probe against a literal Bloom filter blob",
      (args: Seq[Expression]) => {
        arity("bloom_might_contain", args, 2)
        BloomMightContain(args(0), args(1))
      }),
    ("freq_items_agg", "mergeable frequent-items (heavy hitters) sketch (serialized, binary)",
      (args: Seq[Expression]) => {
        require(args.length == 1 || args.length == 2,
          s"freq_items_agg takes (value[, maxMapSize]), got ${args.length} arguments")
        graft.sketch.FreqItemsAgg(args(0),
          if (args.length == 2) intLit(args(1), "freq_items_agg", "maxMapSize")
          else 256)
      }),
    ("text_profile", "single-pass text profile: token/char-class counts + per-word-list hits",
      (args: Seq[Expression]) => {
        require(args.length >= 2,
          s"text_profile takes (text, wordList...), got ${args.length} arguments")
        TextProfile(args.head, args.tail.zipWithIndex.map { case (a, i) =>
          strLits(a, "text_profile", s"wordList$i")
        })
      }),
    // composed builders (not single native Expressions): the builder
    // re-expands the library's own column chain around the SQL argument,
    // so SQL and Scala callers share one definition
    ("extract_html_text", "HTML -> visible text (deterministic regex subset, P40)",
      (args: Seq[Expression]) => {
        arity("extract_html_text", args, 1)
        ComposedText.htmlExtract(args(0), graft.ops.TextOps.htmlEntities)
      }),
    ("normalize_text", "deterministic text normalization (accent fold + case + whitespace, P36)",
      (args: Seq[Expression]) => {
        arity("normalize_text", args, 1)
        ComposedText.normalize(args(0), graft.ops.TextOps.accentFrom,
          graft.ops.TextOps.accentTo)
      })
  ).map { case (name, _usage, builder) =>
    // two-arg ExpressionInfo(className, name): the 3-arg overload is
    // (className, db, name), NOT (className, name, usage)
    (name, new ExpressionInfo(classOf[GraftExtensions].getName, name), builder)
  }

  /** Register on a live session (tests, REPLs, existing deployments). */
  def register(spark: SparkSession): Unit = {
    val registry: FunctionRegistry = spark.sessionState.functionRegistry
    functions.foreach { case (name, info, builder) =>
      registry.registerFunction(FunctionIdentifier(name), info, builder)
    }
  }
}
