package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Exact duplicate-SUBSTRING dedup (P33) — the corpus-wide repeated-span
  * remover ("Deduplicating Training Data Makes Language Models Better",
  * Lee et al. 2022: exact substrings repeated anywhere in the corpus are
  * memorization fuel even when whole-document dedup passes). The
  * suffix-array formulation is replational here: a token position is
  * duplicated iff its k-token gram occurs ≥ `minCount` times corpus-wide;
  * runs of duplicated positions merge into maximal token spans per doc
  * (gaps-and-islands over a per-doc window).
  *
  * Scale shape: one gram explode (O(tokens) slim rows), one
  * map-side-combined gram count (the ONLY corpus-wide exchange — grams
  * need just a ≥ minCount flag, never a posting list, so no df-cap is
  * needed and nothing is quadratic), one join back, and a window
  * PARTITIONED BY doc (bounded by doc length, never a global sort). Every
  * step — tokenization included — replays bit-for-bit in the DuckDB
  * oracle.
  *
  * Tokens are the engine's lowercase-whitespace tokens; [[trim]] rebuilds
  * text as surviving tokens joined by single spaces, so trimming
  * NORMALIZES whitespace/case — document vs reversible span storage
  * ([[duplicateSpans]]) when the original bytes must survive. */
object SubstringDedup {

  /** Maximal duplicated token spans: (idCol, start_tok, end_tok) with
    * token-grain, end-exclusive bounds.
    *
    * `hashGrams` (default true) counts and joins on a 16-hex-char md5
    * PREFIX of each gram instead of the gram string — the only corpus-wide
    * exchange then carries 16-byte keys instead of ~k×wordLen-byte ones
    * (probe-measured 18.6 → 10.1 GB shuffle, 251 → 204 s at 10M docs;
    * the residual is the per-position id+pos rows). A 64-bit prefix
    * collision would mark two unrelated positions together — expected
    * ~grams²/2⁶⁵ ≈ 10⁻³ positions at 10⁸ grams, and the md5 derivation is
    * engine-portable so the DuckDB oracle replays any collision
    * identically. `hashGrams = false` keeps exact string keys. */
  def duplicateSpans(df: DataFrame, idCol: String, textCol: String,
                     k: Int = 8, minCount: Long = 2,
                     hashGrams: Boolean = true): DataFrame = {
    require(k >= 1, s"substring dedup: k must be >= 1, got $k")
    require(minCount >= 2, s"substring dedup: minCount must be >= 2, got $minCount")
    def gramKey(i: org.apache.spark.sql.Column) = {
      val g = array_join(slice(col("__t"), i + 1, lit(k)), " ")
      if (hashGrams) substring(md5(g), 1, 16) else g
    }
    val grams = df
      .select(col(idCol).as("__id"), TextOps.tokens(col(textCol)).as("__t"))
      .filter(size(col("__t")) >= k)
      .select(col("__id"), posexplode(
        transform(sequence(lit(0), size(col("__t")) - k),
          (i: org.apache.spark.sql.Column) => gramKey(i)))
        .as(Seq("pos", "g")))
    val dup = grams.groupBy(col("g")).agg(count(lit(1)).as("__n"))
      .filter(col("__n") >= minCount).select(col("g"))
    val marked = grams.join(dup, "g").select(col("__id"), col("pos"))
    val w = Window.partitionBy(col("__id")).orderBy(col("pos"))
    marked
      .withColumn("__prev_end",
        max(col("pos") + k).over(w.rowsBetween(Window.unboundedPreceding, -1)))
      .withColumn("__island", sum(
        when(col("__prev_end").isNull || col("pos") > col("__prev_end"), 1L)
          .otherwise(0L)).over(w))
      .groupBy(col("__id"), col("__island"))
      .agg(min(col("pos")).as("start_tok"), (max(col("pos")) + k).as("end_tok"))
      .select(col("__id").as(idCol), col("start_tok"), col("end_tok"))
  }

  /** The trimmed corpus: every doc with its duplicated spans' tokens
    * removed — (idCol, text_trimmed). Docs without spans keep all tokens;
    * a doc that is entirely duplicated trims to the empty string (drop it
    * with a length gate downstream if desired). */
  def trim(df: DataFrame, idCol: String, textCol: String,
           k: Int = 8, minCount: Long = 2,
           hashGrams: Boolean = true): DataFrame = {
    val spans = duplicateSpans(df, idCol, textCol, k, minCount, hashGrams)
      .groupBy(col(idCol))
      .agg(collect_list(struct(col("start_tok"), col("end_tok"))).as("__spans"))
    df.join(spans, Seq(idCol), "left")
      .select(col(idCol),
        array_join(
          transform(
            filter(
              transform(TextOps.tokens(col(textCol)),
                (t, i) => struct(t.as("t"), i.as("i"))),
              s => !exists(coalesce(col("__spans"),
                  array().cast("array<struct<start_tok:int,end_tok:int>>")),
                sp => s.getField("i") >= sp.getField("start_tok") &&
                  s.getField("i") < sp.getField("end_tok"))),
            s => s.getField("t")),
          " ").as("text_trimmed"))
  }
}
