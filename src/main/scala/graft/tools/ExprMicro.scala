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
    println(f"rows=$rows")
    println(f"simhash    native=$sNat%.3fs hof=$sHof%.3fs speedup=${sHof / sNat}%.1fx")
    println(f"hyperplane native=$hNat%.3fs hof=$hHof%.3fs speedup=${hHof / hNat}%.1fx")
    spark.stop()
  }
}
