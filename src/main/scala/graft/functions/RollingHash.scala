package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** 64-bit polynomial rolling hash of a string — document fingerprinting for
  * the training-data pipeline (near-identity dedup key; cheap, order-
  * sensitive, seed-stable across JVMs unlike String.hashCode).
  *
  * h = Σ byte_i · B^(n-1-i)  (mod 2^64), B = 1000003.
  *
  * Implemented as a native Catalyst Expression WITH doGenCode so it stays
  * inside whole-stage codegen (no UDF boxing) — the preferred extension
  * point per the build rules.
  */
case class RollingHash(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"rolling_hash needs a string argument, got ${child.dataType}")

  override def nullSafeEval(input: Any): Any =
    RollingHash.hashBytes(input.asInstanceOf[UTF8String].getBytes)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.RollingHash.hashBytes($c.getBytes())")

  override protected def withNewChildInternal(newChild: Expression): RollingHash =
    copy(child = newChild)
  override def prettyName: String = "rolling_hash"
}

object RollingHash {
  final val B = 1000003L

  /** Static so generated code can call it. */
  def hashBytes(bytes: Array[Byte]): Long = {
    var h = 0L
    var i = 0
    while (i < bytes.length) {
      h = h * B + (bytes(i) & 0xffL)
      i += 1
    }
    h
  }

  def rolling_hash(c: Column): Column = ColumnBridge.toColumn(RollingHash(ColumnBridge.toExpr(c)))
}
