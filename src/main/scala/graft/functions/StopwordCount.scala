package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Count of tokens contained in a fixed word set — one hash probe per token.
  *
  * Native twin of `size(filter(toks, t => array_contains(lit(words), t)))`:
  * the HOF ran interpreted per element AND array_contains scanned the word
  * list linearly, so language-ID paid profiles × tokens × |profile|
  * comparisons per row. Counts are exact integers, so swapping this in is
  * bit-identical by construction (asserted in NativeExprSpec).
  */
case class StopwordCount(child: Expression, words: Seq[String]) extends UnaryExpression {
  override def dataType: DataType = IntegerType
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(StringType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case t => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"stopword_count needs array<string>, got $t")
    }

  @transient private lazy val set: java.util.HashSet[UTF8String] = {
    val s = new java.util.HashSet[UTF8String](words.size * 2)
    words.foreach(w => s.add(UTF8String.fromString(w)))
    s
  }

  override def nullSafeEval(input: Any): Any =
    StopwordCount.count(input.asInstanceOf[ArrayData], set)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val setRef = ctx.addReferenceObj("stopSet", set, classOf[java.util.HashSet[_]].getName)
    defineCodeGen(ctx, ev, c => s"graft.functions.StopwordCount.count($c, $setRef)")
  }

  override protected def withNewChildInternal(newChild: Expression): StopwordCount =
    copy(child = newChild)
  override def prettyName: String = "stopword_count"
}

object StopwordCount {
  /** Static so generated code can call it. Null tokens don't match (same as
    * array_contains against a non-null list). */
  def count(tokens: ArrayData, set: java.util.HashSet[_]): Int = {
    val n = tokens.numElements()
    var c = 0
    var i = 0
    while (i < n) {
      if (!tokens.isNullAt(i) && set.contains(tokens.getUTF8String(i))) c += 1
      i += 1
    }
    c
  }

  def stopword_count(tokens: Column, words: Seq[String]): Column =
    ColumnBridge.toColumn(StopwordCount(ColumnBridge.toExpr(tokens), words))
}
