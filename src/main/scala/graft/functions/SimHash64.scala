package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}

/** 64-bit SimHash of a token array in ONE compiled pass: bit b of the result
  * is the sign of Σ_tokens (bit b of xxhash64(token) ? +1 : −1).
  *
  * Native Catalyst Expression with doGenCode, replacing the interpreted
  * `transform(sequence(0,63), b -> aggregate(tokens, …))` lambda chain —
  * higher-order functions evaluate interpreted with per-element allocation,
  * and that formulation re-walked the token array 64 times. This walks it
  * once with 64 local counters. Token hashing is Spark's own XXH64 with the
  * xxhash64() default seed (42), so values are bit-identical to the previous
  * column-expression formulation.
  */
case class SimHash64(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(StringType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case t => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"simhash64 needs array<string>, got $t")
    }

  override def nullSafeEval(input: Any): Any =
    SimHash64.hash(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.SimHash64.hash($c)")

  override protected def withNewChildInternal(newChild: Expression): SimHash64 =
    copy(child = newChild)
  override def prettyName: String = "simhash64"
}

object SimHash64 {
  final val Seed = 42L // Spark xxhash64() default seed

  /** Static so generated code can call it. */
  def hash(tokens: ArrayData): Long = {
    val n = tokens.numElements()
    val counts = new Array[Int](64)
    var ti = 0
    while (ti < n) {
      // a null token leaves the running hash at the seed — exactly what
      // Spark's XxHash64 expression does for a null input value
      val h = if (tokens.isNullAt(ti)) Seed
        else XXH64.hashUTF8String(tokens.getUTF8String(ti), Seed)
      var b = 0
      while (b < 64) {
        if (((h >>> b) & 1L) == 1L) counts(b) += 1 else counts(b) -= 1
        b += 1
      }
      ti += 1
    }
    var acc = 0L
    var b = 0
    while (b < 64) {
      acc = (acc << 1) | (if (counts(b) > 0) 1L else 0L)
      b += 1
    }
    acc
  }

  def simhash64(tokens: Column): Column =
    ColumnBridge.toColumn(SimHash64(ColumnBridge.toExpr(tokens)))
}
