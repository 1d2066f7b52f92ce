package graft.functions

import org.apache.spark.broadcast.Broadcast
import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{DataType, LongType}

/** Broadcast dup-key probe for the uniqueness recovery scan (E5): given the
  * row's (h1, h2) key-hash pair, returns the key's global duplicate count
  * from the broadcast [[graft.sketch.Long128Map]], or NULL when the key is
  * not duplicated. Compiled into whole-stage codegen, so the pruned
  * recovery scan stays one vectorized Scan→Filter→Project stage — no
  * LocalRelation of dup keys in the plan, no broadcast-join build, no
  * driver-side row encoding of the key set. */
case class DupCount(left: Expression, right: Expression,
                    dupMap: Broadcast[graft.sketch.Long128Map])
  extends BinaryExpression {

  override def dataType: DataType = LongType
  override def nullable: Boolean = true

  // Planner hint, not a semantic fact (the probe is pure): left
  // deterministic, CollapseProject + filter pushdown inline the aliased
  // probe into BOTH the filter and the detail projection, so every
  // recovery row paid two probes and four xxhash64 calls (observed in
  // plans/r06/uniq_violations_after.txt before this flag). Marking it
  // non-deterministic keeps the single aliased evaluation (guide §4.4's
  // duplicated-expensive-expression remedy); the part-range filter sits
  // below the projection already, so no useful pushdown is lost.
  override lazy val deterministic: Boolean = false

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (LongType, LongType) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case (l, r) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"dup_count needs (bigint, bigint), got ($l, $r)")
    }

  override def nullSafeEval(h1: Any, h2: Any): Any = {
    val n = dupMap.value.get(h1.asInstanceOf[Long], h2.asInstanceOf[Long])
    if (n < 0L) null else java.lang.Long.valueOf(n)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val mapRef = ctx.addReferenceObj("dupMap", dupMap,
      classOf[Broadcast[graft.sketch.Long128Map]].getName)
    val l = left.genCode(ctx)
    val r = right.genCode(ctx)
    ev.copy(code =
      code"""
        ${l.code}
        ${r.code}
        long ${ev.value} = -1L;
        if (!(${l.isNull}) && !(${r.isNull})) {
          ${ev.value} = ((graft.sketch.Long128Map) $mapRef.value())
            .get(${l.value}, ${r.value});
        }
        boolean ${ev.isNull} = ${ev.value} < 0L;
      """)
  }

  override protected def withNewChildrenInternal(l: Expression, r: Expression): DupCount =
    copy(left = l, right = r)
  override def prettyName: String = "dup_count"
}

object DupCount {
  def dup_count(h1: Column, h2: Column,
                dupMap: Broadcast[graft.sketch.Long128Map]): Column =
    ColumnBridge.toColumn(DupCount(
      ColumnBridge.toExpr(h1), ColumnBridge.toExpr(h2), dupMap))
}
