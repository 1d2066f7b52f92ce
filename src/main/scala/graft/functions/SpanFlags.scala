package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, IntegerType => IT, StringType}

/** Span-integrity flags in ONE compiled array pass:
  * bit 0 — non-monotone offsets (some offset <= its predecessor),
  * bit 1 — at least one null span kind.
  *
  * Native Catalyst Expression with doGenCode (stays inside whole-stage
  * codegen): replaces the interpreted zip_with/slice/exists lambda chain the
  * dirty-partition rescan previously evaluated per row — higher-order
  * functions run interpreted with per-element allocation, which measured 3×
  * CPU inflation at 32 threads on the violation-materialization phase.
  * Semantics mirror graft.sketch.DocStatsBuffer.updateDoc exactly (offset
  * monotonicity tracked across ALL spans, null kinds included).
  */
case class SpanFlags(left: Expression, right: Expression) extends BinaryExpression {
  override def dataType: DataType = IntegerType
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(StringType, _), ArrayType(IT, _)) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case (l, r) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"span_flags needs (array<string>, array<int>), got ($l, $r)")
    }

  override def nullSafeEval(kinds: Any, offsets: Any): Any =
    SpanFlags.flags(kinds.asInstanceOf[ArrayData], offsets.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (k, o) => s"graft.functions.SpanFlags.flags($k, $o)")

  override protected def withNewChildrenInternal(l: Expression, r: Expression): SpanFlags =
    copy(left = l, right = r)
  override def prettyName: String = "span_flags"
}

object SpanFlags {
  final val OrdBit = 1 // non-monotone span offsets
  final val NullKindBit = 2 // null span kind present

  /** Static so generated code can call it. */
  def flags(kinds: ArrayData, offsets: ArrayData): Int = {
    val n = offsets.numElements()
    var fl = 0
    var prev = Int.MinValue
    var i = 0
    while (i < n) {
      val off = offsets.getInt(i)
      if (i > 0 && off <= prev) fl |= OrdBit
      prev = off
      i += 1
    }
    val nk = kinds.numElements()
    i = 0
    while (i < nk && (fl & NullKindBit) == 0) {
      if (kinds.isNullAt(i)) fl |= NullKindBit
      i += 1
    }
    fl
  }

  def span_flags(kinds: Column, offsets: Column): Column =
    ColumnBridge.toColumn(SpanFlags(ColumnBridge.toExpr(kinds), ColumnBridge.toExpr(offsets)))
}
