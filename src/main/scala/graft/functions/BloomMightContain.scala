package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{BinaryType, BooleanType, ByteType, DataType, IntegerType, LongType, ShortType, StringType}
import org.apache.spark.util.sketch.BloomFilter

import graft.sketch.BloomOps

/** `bloom_might_contain(filterBlob, value)` — membership probe against a
  * serialized [[graft.sketch.BloomFilterAgg]] filter. One-sided: `false`
  * is definite absence, `true` is presence with ≤ fpp false-positive
  * probability (while the build stayed ≤ expectedItems).
  *
  * The filter side must be FOLDABLE (a literal — the driver collects the
  * one-row aggregate and embeds the blob; Spark's own runtime-filtering
  * `might_contain` imposes the same shape, sql/core InjectRuntimeFilter):
  * the blob deserializes ONCE per task via a codegen reference object, not
  * per row, and the probe inlines into whole-stage codegen — the gate adds
  * zero exchanges and zero per-row allocation beyond the value's bytes.
  *
  * Value canonicalization matches the build side exactly
  * ([[graft.sketch.BloomOps]]): string ≡ UTF-8 bytes, binary ≡ bytes,
  * integral ≡ long. Unsupported probe types fail analysis loudly.
  */
case class BloomMightContain(filterExpr: Expression, valueExpr: Expression)
  extends BinaryExpression {

  override def left: Expression = filterExpr
  override def right: Expression = valueExpr
  override def dataType: DataType = BooleanType

  override def checkInputDataTypes(): TypeCheckResult = {
    if (filterExpr.dataType != BinaryType)
      return TypeCheckResult.TypeCheckFailure(
        s"bloom_might_contain: filter must be binary, got ${filterExpr.dataType}")
    if (!filterExpr.foldable)
      return TypeCheckResult.TypeCheckFailure(
        "bloom_might_contain: filter must be a foldable literal blob " +
          "(collect the one-row bloom_filter_agg result and embed it)")
    valueExpr.dataType match {
      case StringType | BinaryType | LongType | IntegerType | ShortType | ByteType =>
        TypeCheckResult.TypeCheckSuccess
      case t => TypeCheckResult.TypeCheckFailure(
        s"bloom_might_contain: unsupported value type $t " +
          "(supported: string, binary, integral)")
    }
  }

  @transient private lazy val filter: BloomFilter = {
    val bytes = filterExpr.eval(null)
    require(bytes != null, "bloom_might_contain: filter blob is NULL")
    BloomOps.fromBytes(bytes.asInstanceOf[Array[Byte]])
  }

  override def nullSafeEval(blob: Any, value: Any): Any =
    BloomOps.mightContain(filter, value)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    // the filter deserializes once per task as a codegen reference object;
    // the blob child's generated code is a constant reference and costs
    // nothing per row
    val bf = ctx.addReferenceObj("bloomFilter", filter, classOf[BloomFilter].getName)
    defineCodeGen(ctx, ev, (_, v) => valueExpr.dataType match {
      case StringType => s"$bf.mightContainBinary($v.getBytes())"
      case BinaryType => s"$bf.mightContainBinary($v)"
      case _ => s"$bf.mightContainLong((long) $v)"
    })
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): BloomMightContain =
    copy(filterExpr = newLeft, valueExpr = newRight)
  override def prettyName: String = "bloom_might_contain"
}

object BloomMightContain {
  def bloom_might_contain(filterBlob: Column, value: Column): Column =
    ColumnBridge.toColumn(
      BloomMightContain(ColumnBridge.toExpr(filterBlob), ColumnBridge.toExpr(value)))
}
