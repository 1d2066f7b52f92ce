package graft.functions

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

  test("null inputs propagate") {
    val r = Seq((null: Seq[String], null: Seq[Double]))
      .toDF("toks", "emb")
      .select(SimHash64.simhash64($"toks"),
        HyperplaneBucket.hyperplane_bucket($"emb".cast("array<double>"), 8))
      .head()
    assert(r.isNullAt(0) && r.isNullAt(1))
  }
}
