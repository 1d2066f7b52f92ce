package graft.tools

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.functions._

/** Micro-bench: native codegen SimHash64 / HyperplaneBucket vs the
  * interpreted HOF formulations they replaced. Prints per-variant wall
  * seconds over the same generated input (result is a checksum aggregate so
  * nothing materializes). */
object ExprMicro {

  private def simhashHof(tokensCol: Column): Column = {
    val bitSums = transform(sequence(lit(0), lit(63)), b =>
      aggregate(tokensCol, lit(0L), (acc, t) =>
        acc + when(call_function("shiftright", xxhash64(t), b).bitwiseAND(1L) === 1L, 1L).otherwise(-1L)))
    aggregate(bitSums, lit(0L), (acc, s) =>
      shiftleft(acc, 1) + when(s > 0L, 1L).otherwise(0L))
  }

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

  private def time(f: => Unit): Double = {
    val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
  }

  def main(args: Array[String]): Unit = {
    val rows = if (args.nonEmpty) args(0).toLong else 200000L
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    // ~20-token docs and 64-dim embeddings, deterministic
    val toks = spark.range(rows).select(transform(sequence(lit(0), lit(19)),
      i => concat(lit("w"), pmod(xxhash64($"id", i), lit(5000L)))).as("toks"))
    val embs = spark.range(rows).select(transform(sequence(lit(0), lit(63)),
      i => (pmod(xxhash64($"id", i, lit("e")), lit(1000L)).cast("double") - 500.0) / 500.0)
      .as("emb"))
    toks.cache().count(); embs.cache().count()

    def runL(df: org.apache.spark.sql.DataFrame, c: Column): Unit =
      df.select(c.as("v")).agg(bit_xor($"v")).collect() // xor: no ANSI overflow

    // warm-up then min of 3
    def best(f: => Unit): Double = { f; (1 to 3).map(_ => time(f)).min }

    val sNat = best(runL(toks, graft.functions.SimHash64.simhash64($"toks")))
    val sHof = best(runL(toks, simhashHof($"toks")))
    val hNat = best(runL(embs, graft.functions.HyperplaneBucket.hyperplane_bucket($"emb", 12)))
    val hHof = best(runL(embs, hyperplaneHof($"emb", 12)))

    // text chains over generated sentences (~20 words)
    def tokensHof(text: Column): Column =
      filter(split(lower(text), "\\s+"), t => length(t) > 0)
    def shinglesHof(text: Column, n: Int): Column = {
      val tk = tokensHof(text)
      array_distinct(
        when(size(tk) < n, array(concat_ws(" ", tk)))
          .otherwise(transform(sequence(lit(0), size(tk) - n), i =>
            concat_ws(" ", slice(tk, i + 1, lit(n))))))
    }
    def minhashHof(sh: Column, k: Int): Column =
      transform(sequence(lit(0), lit(k - 1)), i =>
        array_min(transform(sh, s => xxhash64(s, i))))
    val texts = spark.range(rows).select(concat_ws(" ", transform(sequence(lit(0), lit(19)),
      i => concat(lit("word"), pmod(xxhash64($"id", i), lit(5000L))))).as("text"))
    texts.cache().count()
    def runSz(c: Column): Unit = texts.select(size(c).as("v")).agg(sum($"v")).collect()
    val tkNat = best(runSz(graft.functions.TextNative.whitespace_tokens($"text")))
    val tkHof = best(runSz(tokensHof($"text")))
    val shNat = best(runSz(graft.functions.TextNative.word_shingles($"text", 3)))
    val shHof = best(runSz(shinglesHof($"text", 3)))
    val sig = texts.select(graft.functions.TextNative.word_shingles($"text", 3).as("sh"))
    sig.cache().count()
    def runSig(c: Column): Unit = sig.select(size(c).as("v")).agg(sum($"v")).collect()
    val mhNat = best(runSig(graft.functions.TextNative.minhash_sig($"sh", 32)))
    val mhHof = best(runSig(minhashHof($"sh", 32)))

    // cosine per row over two 64-dim vectors
    def cosineHof(a: Column, b: Column): Column = {
      val dot = aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (s, v) => s + v)
      val na = sqrt(aggregate(a, lit(0.0), (s, v) => s + v * v))
      val nb = sqrt(aggregate(b, lit(0.0), (s, v) => s + v * v))
      dot / (na * nb)
    }
    val embPairs = spark.range(rows).select(
      transform(sequence(lit(0), lit(63)),
        i => (pmod(xxhash64($"id", i, lit("p")), lit(1000L)).cast("double") - 500.0) / 500.0).as("a"),
      transform(sequence(lit(0), lit(63)),
        i => (pmod(xxhash64($"id", i, lit("q")), lit(1000L)).cast("double") - 500.0) / 500.0).as("b"))
    embPairs.cache().count()
    def runCos(c: Column): Unit = embPairs.select(c.as("v")).agg(sum($"v")).collect()
    val cNat = best(runCos(graft.functions.CosineSim.cosine_sim($"a", $"b")))
    val cHof = best(runCos(cosineHof($"a", $"b")))

    val stopWords = Seq("the", "a", "of", "and", "to", "in", "is", "it", "that", "for")
    val wl = typedlit(stopWords)
    val toksReal = texts.select(graft.functions.TextNative.whitespace_tokens($"text").as("toks"))
    toksReal.cache().count()
    def runSw(c: Column): Unit = toksReal.select(c.as("v")).agg(sum($"v")).collect()
    val swNat = best(runSw(graft.functions.StopwordCount.stopword_count($"toks", stopWords)))
    val swHof = best(runSw(size(filter($"toks", t => array_contains(wl, t)))))

    println(f"rows=$rows")
    println(f"stopwords  native=$swNat%.3fs hof=$swHof%.3fs speedup=${swHof / swNat}%.1fx")
    println(f"cosine     native=$cNat%.3fs hof=$cHof%.3fs speedup=${cHof / cNat}%.1fx")
    println(f"simhash    native=$sNat%.3fs hof=$sHof%.3fs speedup=${sHof / sNat}%.1fx")
    println(f"hyperplane native=$hNat%.3fs hof=$hHof%.3fs speedup=${hHof / hNat}%.1fx")
    println(f"tokens     native=$tkNat%.3fs hof=$tkHof%.3fs speedup=${tkHof / tkNat}%.1fx")
    println(f"shingles   native=$shNat%.3fs hof=$shHof%.3fs speedup=${shHof / shNat}%.1fx")
    println(f"minhashsig native=$mhNat%.3fs hof=$mhHof%.3fs speedup=${mhHof / mhNat}%.1fx")
    spark.stop()
  }
}
