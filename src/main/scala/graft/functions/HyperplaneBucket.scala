package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType, LongType}
import org.apache.spark.unsafe.Platform

/** Random-hyperplane LSH bucket id: `planes` sign bits of pseudo-random
  * hyperplane dot products, packed into a long (first plane = MSB side).
  *
  * Native Catalyst Expression with doGenCode, replacing the interpreted
  * `transform(sequence, p -> aggregate(zip_with(…)))` lambda chain that
  * re-derived every plane weight per ROW via three chained xxhash64 calls —
  * planes × dims hashes per row, all interpreted. Here the weight matrix is
  * derived once per (planes, dims) and cached process-wide (it is a pure
  * function of the hash family, identical on every executor), so the per-row
  * cost is just the planes × dims fused multiply-adds in compiled code.
  *
  * The weight derivation replays Spark's own semantics bit-exactly:
  * xxhash64(plane, dim, "hyperplane") = XXH64 folds (seed 42, int, int,
  * utf8-bytes), then pmod 2_000_000, shift/scale to [-1, 1) — so bucket ids
  * equal the previous column-expression formulation's exactly.
  */
case class HyperplaneBucket(child: Expression, planes: Int) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(DoubleType, _) | ArrayType(FloatType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case t => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"hyperplane_bucket needs array<double> or array<float>, got $t")
    }

  private def isFloat: Boolean = child.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    if (isFloat) HyperplaneBucket.bucketFloat(arr, planes)
    else HyperplaneBucket.bucketDouble(arr, planes)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val fn = if (isFloat) "bucketFloat" else "bucketDouble"
    defineCodeGen(ctx, ev, c => s"graft.functions.HyperplaneBucket.$fn($c, $planes)")
  }

  override protected def withNewChildInternal(newChild: Expression): HyperplaneBucket =
    copy(child = newChild)
  override def prettyName: String = "hyperplane_bucket"
}

object HyperplaneBucket {
  private final val Seed = 42L // Spark xxhash64() default seed
  private final val Mod = 2000000L
  private val saltBytes = "hyperplane".getBytes(java.nio.charset.StandardCharsets.UTF_8)

  /** Deterministic pseudo-random hyperplane component r(plane, dim) ∈ [-1,1),
    * identical to pmod(xxhash64(plane, dim, 'hyperplane'), 2e6) scaled. */
  private def weight(plane: Int, dim: Int): Double = {
    var h = XXH64.hashInt(plane, Seed)
    h = XXH64.hashInt(dim, h)
    h = XXH64.hashUnsafeBytes(saltBytes, Platform.BYTE_ARRAY_OFFSET, saltBytes.length, h)
    val m = h % Mod
    val pm = if (m < 0) m + Mod else m
    (pm.toDouble - 1000000.0) / 1000000.0
  }

  /** Process-wide weight-matrix cache, keyed (planes, dims); row-major
    * [plane][dim]. Pure function of the hash family — identical on every
    * executor, a few KB per distinct embedding width. */
  private val cache =
    new java.util.concurrent.ConcurrentHashMap[(Int, Int), Array[Double]]
  private def weights(planes: Int, dims: Int): Array[Double] =
    cache.computeIfAbsent((planes, dims), _ => {
      val w = new Array[Double](planes * dims)
      var p = 0
      while (p < planes) {
        var d = 0
        while (d < dims) { w(p * dims + d) = weight(p, d); d += 1 }
        p += 1
      }
      w
    })

  /** Static so generated code can call it. */
  def bucketDouble(emb: ArrayData, planes: Int): Long = {
    val dims = emb.numElements()
    val w = weights(planes, dims)
    var acc = 0L
    var p = 0
    while (p < planes) {
      var dot = 0.0
      var d = 0
      val base = p * dims
      while (d < dims) { dot += emb.getDouble(d) * w(base + d); d += 1 }
      acc = (acc << 1) + (if (dot >= 0.0) 1L else 0L)
      p += 1
    }
    acc
  }

  /** Float-array variant (each element widened exactly as Spark's implicit
    * float→double cast would). */
  def bucketFloat(emb: ArrayData, planes: Int): Long = {
    val dims = emb.numElements()
    val w = weights(planes, dims)
    var acc = 0L
    var p = 0
    while (p < planes) {
      var dot = 0.0
      var d = 0
      val base = p * dims
      while (d < dims) { dot += emb.getFloat(d).toDouble * w(base + d); d += 1 }
      acc = (acc << 1) + (if (dot >= 0.0) 1L else 0L)
      p += 1
    }
    acc
  }

  def hyperplane_bucket(emb: Column, planes: Int): Column =
    ColumnBridge.toColumn(HyperplaneBucket(ColumnBridge.toExpr(emb), planes))
}
