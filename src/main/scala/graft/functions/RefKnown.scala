package graft.functions

import org.apache.spark.broadcast.Broadcast
import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{BooleanType, DataType, StringType}

/** Membership probe of a media_ref against the run's broadcast
  * [[graft.sketch.LongHashSet]] — the SAME predicate the fused stats scan
  * uses to COUNT dangling refs (E6 broadcast path). Using it for the
  * dirty-partition violation-ROW rescan makes rows and counts share one
  * definition and turns the rescan into a single codegen'd
  * Scan→Generate→Filter stage: no per-job broadcast-relation build, no
  * anti-join. (A dangling ref is missed only on a 64-bit collision with a
  * valid catalog entry — the documented E6 broadcast-path budget, shared
  * with the counting scan; the exact string anti-join remains the
  * big-catalog/audit path.) */
case class RefKnown(child: Expression, set: Broadcast[graft.sketch.LongHashSet])
  extends UnaryExpression {

  override def dataType: DataType = BooleanType

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case StringType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case t =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"ref_known needs string, got $t")
    }

  override def nullSafeEval(ref: Any): Any =
    set.value.contains(graft.sketch.LongHashSet.hashUtf8(
      ref.asInstanceOf[org.apache.spark.unsafe.types.UTF8String]))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val setRef = ctx.addReferenceObj("refSet", set,
      classOf[Broadcast[graft.sketch.LongHashSet]].getName)
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = ((graft.sketch.LongHashSet) $setRef.value())" +
        s".contains(graft.sketch.LongHashSet.hashUtf8($c));")
  }

  override protected def withNewChildInternal(c: Expression): RefKnown =
    copy(child = c)
  override def prettyName: String = "ref_known"
}

object RefKnown {
  def ref_known(ref: Column, set: Broadcast[graft.sketch.LongHashSet]): Column =
    ColumnBridge.toColumn(RefKnown(ColumnBridge.toExpr(ref), set))
}
