package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** One-pass text profile: every per-character class count and per-word-list
  * hit count the quality/language gates need, from a SINGLE walk over the
  * UTF-8 bytes plus one tokenization.
  *
  * Why: `TextOps.qualityScore` + `TextOps.langId` were column compositions
  * over regexp_replace (three Java-regex passes per row, each materializing
  * a replaced string), repeated tokenizations, and a `when`-fold whose
  * branches duplicate subtrees — measured ~40 µs/doc EACH, which made the
  * curation pipeline's gate stage (~60 s/M docs) dominate the whole
  * composed near-dup pipeline (BASELINE.md round-4 dissection; the staged
  * materialization attacked plan re-execution and won 8% because THIS was
  * the actual bottleneck). One byte-walk + one token pass computes
  * everything those formulas consume; the scores become cheap arithmetic.
  *
  * Bit-identity with the replaced formulations (asserted in NativeExprSpec
  * against retained twins, on real multilingual testdata + adversarial
  * strings):
  *  - `len`       ≡ `length(text)` (UTF8String.numChars — this walk)
  *  - `non_space` ≡ `length(regexp_replace(text, "\s+", ""))` — Java `\s`
  *    without UNICODE_CHARACTER_CLASS is exactly ASCII
  *    `[ \t\n\x0B\f\r]`, all single-byte
  *  - `punct`     ≡ `length(regexp_replace(text, "[^!-/:-@\[-`{-~]", ""))`
  *    — the kept classes are the four ASCII punctuation runs 33–47, 58–64,
  *    91–96, 123–126
  *  - `cjk`       ≡ `length(regexp_replace(text, "[^\x{4E00}-\x{9FFF}]", ""))`
  *    — a BMP range, single 3-byte UTF-8 sequences
  *  - `n_tok`     ≡ `size(whitespace_tokens(text))`
  *  - `hits[i]`   ≡ `stopword_count(whitespace_tokens(text), profiles(i))`
  */
case class TextProfile(child: Expression, profiles: Seq[Seq[String]])
    extends UnaryExpression {
  require(profiles.nonEmpty, "text_profile needs at least one word list")

  override def dataType: DataType = TextProfile.schema
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"text_profile needs string, got ${child.dataType}")

  @transient private lazy val sets: Array[java.util.HashSet[UTF8String]] =
    profiles.map { words =>
      val s = new java.util.HashSet[UTF8String](words.size * 2)
      words.foreach(w => s.add(UTF8String.fromString(w)))
      s
    }.toArray

  override def nullSafeEval(input: Any): Any =
    TextProfile.profile(input.asInstanceOf[UTF8String], sets)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val setsRef = ctx.addReferenceObj("profileSets", sets, "java.util.HashSet[]")
    defineCodeGen(ctx, ev, c => s"graft.functions.TextProfile.profile($c, $setsRef)")
  }

  override protected def withNewChildInternal(newChild: Expression): TextProfile =
    copy(child = newChild)
  override def prettyName: String = "text_profile"
}

object TextProfile {
  val schema: StructType = StructType(Seq(
    StructField("n_tok", IntegerType, nullable = false),
    StructField("len", IntegerType, nullable = false),
    StructField("non_space", IntegerType, nullable = false),
    StructField("punct", IntegerType, nullable = false),
    StructField("cjk", IntegerType, nullable = false),
    StructField("hits", ArrayType(IntegerType, containsNull = false), nullable = false)))

  /** Static so generated code can call it. One walk over the UTF-8 bytes
    * (code-point counting identical to UTF8String.numChars: each lead byte
    * is one char, 4-byte astral sequences included) + one tokenization. */
  def profile(text: UTF8String, sets: Array[java.util.HashSet[UTF8String]]): InternalRow = {
    val nBytes = text.numBytes()
    var i = 0; var chars = 0; var ws = 0; var punct = 0; var cjk = 0
    while (i < nBytes) {
      val b = text.getByte(i) & 0xFF
      if (b < 0x80) {
        chars += 1
        if (b == ' ' || b == '\t' || b == '\n' || b == 0x0B || b == '\f' || b == '\r') ws += 1
        else if ((b >= 33 && b <= 47) || (b >= 58 && b <= 64) ||
                 (b >= 91 && b <= 96) || (b >= 123 && b <= 126)) punct += 1
        i += 1
      } else if (b < 0xE0) { chars += 1; i += 2 }
      else if (b < 0xF0) {
        chars += 1
        // bounds guard: UTF8String.getByte is an unchecked Platform read, so
        // a TRUNCATED 3-byte sequence (malformed UTF-8 reaches strings via
        // unvalidated binary->string casts) must not read past the buffer —
        // numChars itself only advances by lead-byte width, never
        // dereferencing continuation bytes. A truncated sequence counts as
        // one char, never as CJK.
        if (i + 2 < nBytes) {
          val cp = ((b & 0x0F) << 12) |
            ((text.getByte(i + 1) & 0x3F) << 6) | (text.getByte(i + 2) & 0x3F)
          if (cp >= 0x4E00 && cp <= 0x9FFF) cjk += 1
        }
        i += 3
      } else { chars += 1; i += 4 }
    }
    val toks = TextNative.tokens(text)
    val nt = toks.numElements()
    val hits = new Array[Int](sets.length)
    var t = 0
    while (t < nt) {
      val tok = toks.getUTF8String(t)
      var s = 0
      while (s < sets.length) {
        if (sets(s).contains(tok)) hits(s) += 1
        s += 1
      }
      t += 1
    }
    new GenericInternalRow(Array[Any](nt, chars, chars - ws, punct, cjk,
      new GenericArrayData(hits)))
  }

  def text_profile(text: Column, profiles: Seq[Seq[String]]): Column =
    ColumnBridge.toColumn(TextProfile(ColumnBridge.toExpr(text), profiles))
}
