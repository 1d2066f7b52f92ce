package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Training-sample preparation over INTERLEAVED documents — the two
  * renderings every multimodal training pipeline performs between the
  * validated corpus and the data loader:
  *
  *  - [[renderText]]: flatten a spans document to ONE training string,
  *    text spans verbatim and media spans as typed placeholder tokens
  *    (`<image:m-00000042>` — the sentinel convention interleaved trainers
  *    use so the collator can splice encoder outputs back in by position).
  *    Span ARRAY order is the render order (the order-significance
  *    invariant the whole engine preserves; offsets are checked by the
  *    span_order constraint, not re-sorted here — a reader must not mask
  *    an ordering defect by silently fixing it).
  *  - [[chunkByTokens]]: sliding-window token chunking (size `maxTok`,
  *    overlap `overlap`) — the context-window splitter. Chunks start every
  *    `maxTok - overlap` tokens while inside the document; the final chunk
  *    may be short; an empty document yields zero chunks (like any
  *    fixed-frame reader).
  *
  * Both are pure per-row column expressions — whole-stage codegen, ZERO
  * shuffle at any corpus size — and both are exactly replayable in SQL
  * (whitespace tokenization, deterministic placeholder format), which is
  * what lets the driver hash-check them end to end. */
object Interleave {

  /** One rendered training string per document: `(idCols…, n_spans,
    * rendered)`. Null-kind spans render as `<null:…>` — visible, not
    * silently dropped (the null_kind constraint owns flagging them);
    * media spans with a null ref render `<kind:none>`. */
  def renderText(docs: DataFrame, spansCol: String = "spans",
                 idCols: Seq[String] = Seq("doc_id")): DataFrame = {
    require(idCols.nonEmpty, "interleave: at least one id column required")
    val spanStr: Column => Column = sp =>
      when(sp.getField("kind") === "text" && sp.getField("text").isNotNull,
        sp.getField("text"))
        .otherwise(concat(lit("<"),
          coalesce(sp.getField("kind"), lit("null")), lit(":"),
          coalesce(sp.getField("media_ref"), lit("none")), lit(">")))
    docs.select(idCols.map(col) ++ Seq(
      size(col(spansCol)).as("n_spans"),
      array_join(transform(col(spansCol), spanStr), " ").as("rendered")): _*)
  }

  /** Sliding-window chunks: `(idCols…, chunk_idx, n_tok, chunk_text)`.
    * Tokenization is the engine-wide whitespace rule (split on `\s+`,
    * empties dropped). */
  def chunkByTokens(df: DataFrame, textCol: String, maxTok: Int,
                    overlap: Int, idCols: Seq[String] = Seq("doc_id")): DataFrame = {
    require(maxTok > 0, s"interleave: maxTok must be > 0, got $maxTok")
    require(overlap >= 0 && overlap < maxTok,
      s"interleave: overlap must be in [0, maxTok), got $overlap vs $maxTok")
    require(idCols.nonEmpty, "interleave: at least one id column required")
    val step = maxTok - overlap
    val toks = filter(split(col(textCol), "\\s+"), t => length(t) > 0)
    val starts = when(size(toks) > 0,
      sequence(lit(0), size(toks) - 1, lit(step)))
      .otherwise(array().cast("array<int>"))
    val chunk = slice(col("__toks"), col("__start") + 1, lit(maxTok))
    df.select(idCols.map(col) :+ toks.as("__toks") :+ starts.as("__starts"): _*)
      .select(idCols.map(col) :+ col("__toks") :+
        posexplode(col("__starts")).as(Seq("chunk_idx", "__start")): _*)
      .select(idCols.map(col) ++ Seq(
        col("chunk_idx"),
        size(chunk).as("n_tok"),
        array_join(chunk, " ").as("chunk_text")): _*)
  }
}
