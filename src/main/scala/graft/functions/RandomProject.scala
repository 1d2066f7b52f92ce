package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType, LongType}

/** Deterministic random projection (Johnson–Lindenstrauss sign matrix):
  * `latent[j] = (Σ_i emb[i] · s(i,j)) / sqrt(outDim)` with
  * `s(i,j) ∈ {+1,−1}` derived from the parity of the first hex nibble of
  * `md5("rp-<seed>-<i>-<j>")`.
  *
  * This is the Spark-first equivalent of the reference's dimensionality-
  * reduction encoder (dimensionality_reduction_api/app/dr.py:136-146 — a
  * per-row image → latent-vector projection): a narrow, shuffle-free,
  * whole-stage-codegen'd per-row map whose "model" is a pure seeded hash
  * function rather than a trained weight artifact, so
  *  - every engine derives the SAME matrix from the literal recipe (the
  *    DuckDB oracle replays derivation AND projection bit-for-bit — md5 is
  *    the cross-engine primitive, exactly like [[graft.ops.Sample]]'s rank),
  *  - nothing ships to executors: the matrix is a pure function of
  *    (outDim, inDim, seed), derived once per process and cached (a few KB),
  *  - the sign matrix keeps the JL inner-product guarantee (Achlioptas
  *    2003: ±1 entries are as good as Gaussian for JL) while the projection
  *    loop is pure fused multiply-adds — no per-row hashing.
  *
  * At 100 TB this is the standard ANN prefilter: project 64-d float
  * embeddings to 8–16 dims, run candidate generation in the small space
  * (4–8× fewer bytes and FLOPs per comparison), exact re-rank only the
  * survivors ([[graft.ops.DimRed.projectedTopK]]).
  */
case class RandomProject(child: Expression, outDim: Int, seed: Int)
    extends UnaryExpression {
  require(outDim >= 1 && outDim <= 4096,
    s"random_project: outDim must be in [1, 4096], got $outDim")

  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(DoubleType, _) | ArrayType(FloatType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case t => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"random_project needs array<double> or array<float>, got $t")
    }

  private def isFloat: Boolean = child.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    if (isFloat) RandomProject.projectFloat(arr, outDim, seed)
    else RandomProject.projectDouble(arr, outDim, seed)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val fn = if (isFloat) "projectFloat" else "projectDouble"
    defineCodeGen(ctx, ev, c => s"graft.functions.RandomProject.$fn($c, $outDim, $seed)")
  }

  override protected def withNewChildInternal(newChild: Expression): RandomProject =
    copy(child = newChild)
  override def prettyName: String = "random_project"
}

/** Integer-exact twin of [[RandomProject]]: each input element is first
  * quantized to `floor(e · scale + 0.5)` (a pure IEEE-754 double op —
  * bit-identical on every engine), then sign-summed as a 64-bit INTEGER:
  * `latq[j] = Σ_i s(i,j) · q_i`. Integer addition is associative, so the
  * result is independent of summation order — the one property the float
  * projection cannot offer a cross-engine hash oracle (a SQL engine's
  * GROUP-BY sum order is unspecified, and its `round()` primitive may
  * change across versions). The quantized projection is the hash-gate for
  * the real one: `|lat·√outDim·scale − latq| ≤ inDim/2` by construction,
  * asserted in-row by the `dimred_project` driver query. */
case class RandomProjectQ(child: Expression, outDim: Int, seed: Int, scale: Int)
    extends UnaryExpression {
  require(outDim >= 1 && outDim <= 4096,
    s"random_project_q: outDim must be in [1, 4096], got $outDim")
  require(scale >= 1, s"random_project_q: scale must be >= 1, got $scale")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(DoubleType, _) | ArrayType(FloatType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case t => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"random_project_q needs array<double> or array<float>, got $t")
    }

  private def isFloat: Boolean = child.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  override def nullSafeEval(input: Any): Any =
    RandomProject.projectQuant(input.asInstanceOf[ArrayData], outDim, seed, scale, isFloat)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.RandomProject.projectQuant($c, $outDim, $seed, $scale, $isFloat)")

  override protected def withNewChildInternal(newChild: Expression): RandomProjectQ =
    copy(child = newChild)
  override def prettyName: String = "random_project_q"
}

object RandomProject {

  /** ±1 from the first hex nibble's parity of md5("rp-<seed>-<i>-<j>") —
    * even nibble (0,2,4,6,8,a,c,e) → +1. DuckDB replay:
    * `CASE WHEN strpos('02468ace', substr(md5('rp-S-' || i || '-' || j),
    * 1, 1)) > 0 THEN 1.0 ELSE -1.0 END`. */
  private def sign(seed: Int, i: Int, j: Int): Double = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val d = md.digest(s"rp-$seed-$i-$j".getBytes(java.nio.charset.StandardCharsets.UTF_8))
    if ((((d(0) >> 4) & 0xF) & 1) == 0) 1.0 else -1.0
  }

  /** Process-wide sign-matrix cache, keyed (outDim, inDim, seed); row-major
    * [j][i]. Pure function of the recipe — identical on every executor. */
  private val cache =
    new java.util.concurrent.ConcurrentHashMap[(Int, Int, Int), Array[Double]]
  private[graft] def signs(outDim: Int, inDim: Int, seed: Int): Array[Double] =
    cache.computeIfAbsent((outDim, inDim, seed), _ => {
      val w = new Array[Double](outDim * inDim)
      var j = 0
      while (j < outDim) {
        var i = 0
        while (i < inDim) { w(j * inDim + i) = sign(seed, i, j); i += 1 }
        j += 1
      }
      w
    })

  /** Static so generated code can call it. */
  def projectDouble(emb: ArrayData, outDim: Int, seed: Int): ArrayData = {
    val inDim = emb.numElements()
    val w = signs(outDim, inDim, seed)
    val inv = 1.0 / math.sqrt(outDim.toDouble)
    val out = new Array[Double](outDim)
    var j = 0
    while (j < outDim) {
      var dot = 0.0
      var i = 0
      val base = j * inDim
      while (i < inDim) { dot += emb.getDouble(i) * w(base + i); i += 1 }
      out(j) = dot * inv
      j += 1
    }
    new GenericArrayData(out)
  }

  /** Float-array variant (each element widened exactly as Spark's implicit
    * float→double cast would). */
  def projectFloat(emb: ArrayData, outDim: Int, seed: Int): ArrayData = {
    val inDim = emb.numElements()
    val w = signs(outDim, inDim, seed)
    val inv = 1.0 / math.sqrt(outDim.toDouble)
    val out = new Array[Double](outDim)
    var j = 0
    while (j < outDim) {
      var dot = 0.0
      var i = 0
      val base = j * inDim
      while (i < inDim) { dot += emb.getFloat(i).toDouble * w(base + i); i += 1 }
      out(j) = dot * inv
      j += 1
    }
    new GenericArrayData(out)
  }

  /** Driver-side twin for projecting a query vector — the SAME static loop
    * the executors run, so query and corpus latents share one code path. */
  def projectVec(v: Array[Double], outDim: Int, seed: Int): Array[Double] = {
    val inDim = v.length
    val w = signs(outDim, inDim, seed)
    val inv = 1.0 / math.sqrt(outDim.toDouble)
    val out = new Array[Double](outDim)
    var j = 0
    while (j < outDim) {
      var dot = 0.0
      var i = 0
      val base = j * inDim
      while (i < inDim) { dot += v(i) * w(base + i); i += 1 }
      out(j) = dot * inv
      j += 1
    }
    out
  }

  /** Quantize-then-sign-sum, exact in Long arithmetic (static so generated
    * code can call it). Quantization happens ONCE per element into a local
    * buffer; the j-loop then reads longs only. */
  def projectQuant(emb: ArrayData, outDim: Int, seed: Int, scale: Int,
                   isFloat: Boolean): ArrayData = {
    val inDim = emb.numElements()
    val w = signs(outDim, inDim, seed)
    val q = new Array[Long](inDim)
    var i = 0
    while (i < inDim) {
      val e = if (isFloat) emb.getFloat(i).toDouble else emb.getDouble(i)
      q(i) = math.floor(e * scale + 0.5).toLong
      i += 1
    }
    val out = new Array[Long](outDim)
    var j = 0
    while (j < outDim) {
      var acc = 0L
      var k = 0
      val base = j * inDim
      while (k < inDim) { acc += (if (w(base + k) > 0) q(k) else -q(k)); k += 1 }
      out(j) = acc
      j += 1
    }
    new GenericArrayData(out)
  }

  def random_project(emb: Column, outDim: Int, seed: Int): Column =
    ColumnBridge.toColumn(RandomProject(ColumnBridge.toExpr(emb), outDim, seed))

  def random_project_q(emb: Column, outDim: Int, seed: Int, scale: Int): Column =
    ColumnBridge.toColumn(RandomProjectQ(ColumnBridge.toExpr(emb), outDim, seed, scale))
}
