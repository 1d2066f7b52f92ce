package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Cosine similarity of two numeric arrays in ONE compiled pass.
  *
  * Native twin of the `aggregate(zip_with(a,b,*))/sqrt(aggregate(a,sq))/…`
  * column chain (three interpreted HOF walks per pair plus zip allocation).
  * Accumulation order matches the HOF twin exactly — each of dot/‖a‖²/‖b‖²
  * is an independent left fold in index order, and the final expression is
  * dot / (√na · √nb) — so results are bit-identical (NativeExprSpec).
  * Runs per CANDIDATE PAIR in brute-force top-k, the kNN join, and
  * embedding-dup verification — the highest-frequency similarity kernel.
  */
case class CosineSim(left: Expression, right: Expression) extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(DoubleType | FloatType, _), ArrayType(DoubleType | FloatType, _)) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case (l, r) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"cosine_sim needs two array<double|float>, got ($l, $r)")
    }

  private def isFloat(e: Expression): Boolean = e.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  override def nullable: Boolean = true

  override def nullSafeEval(a: Any, b: Any): Any =
    CosineSim.cosineBoxed(a.asInstanceOf[ArrayData], isFloat(left),
      b.asInstanceOf[ArrayData], isFloat(right))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      // freshName, NOT a fixed local: with non-nullable children the result
      // code inlines without a brace scope, so two cosine_sim calls in one
      // projection would redeclare the local (Janino error → silent
      // interpreted fallback)
      val cs = ctx.freshName("cs")
      s"""
         |java.lang.Double $cs = graft.functions.CosineSim.cosineBoxed(
         |  $a, ${isFloat(left)}, $b, ${isFloat(right)});
         |if ($cs == null) { ${ev.isNull} = true; } else { ${ev.value} = $cs.doubleValue(); }
       """.stripMargin
    })

  override protected def withNewChildrenInternal(l: Expression, r: Expression): CosineSim =
    copy(left = l, right = r)
  override def prettyName: String = "cosine_sim"
}

object CosineSim {
  /** Static so generated code can call it. Returns null for unequal
    * lengths — matching the HOF twin, where zip_with pads the shorter
    * array with nulls and the summing aggregate null-poisons.
    *
    * FP promotion matches Spark's arithmetic exactly: when BOTH sides are
    * float, the per-element product is computed in FLOAT (then widened by
    * the summing add), because `x * y` on two float columns is a float
    * Multiply; a mixed float/double pair promotes to double BEFORE the
    * multiply. Getting this wrong flips low bits on ~all float pairs. */
  def cosineBoxed(a: ArrayData, aFloat: Boolean, b: ArrayData, bFloat: Boolean): java.lang.Double = {
    val na = a.numElements()
    val nb = b.numElements()
    if (na != nb) return null
    val bothFloat = aFloat && bFloat
    var dot = 0.0
    var i = 0
    while (i < na) {
      if (bothFloat) dot += a.getFloat(i) * b.getFloat(i) // float multiply
      else {
        val x = if (aFloat) a.getFloat(i).toDouble else a.getDouble(i)
        val y = if (bFloat) b.getFloat(i).toDouble else b.getDouble(i)
        dot += x * y
      }
      i += 1
    }
    var sa = 0.0
    i = 0
    while (i < na) {
      if (aFloat) { val x = a.getFloat(i); sa += x * x } // float multiply
      else { val x = a.getDouble(i); sa += x * x }
      i += 1
    }
    var sb = 0.0
    i = 0
    while (i < nb) {
      if (bFloat) { val y = b.getFloat(i); sb += y * y } // float multiply
      else { val y = b.getDouble(i); sb += y * y }
      i += 1
    }
    java.lang.Double.valueOf(dot / (math.sqrt(sa) * math.sqrt(sb)))
  }

  def cosine_sim(a: Column, b: Column): Column =
    ColumnBridge.toColumn(CosineSim(ColumnBridge.toExpr(a), ColumnBridge.toExpr(b)))
}
