package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Corpus-level LINE dedup (P34) — the CCNet-family boilerplate remover
  * ("CCNet: Extracting High Quality Monolingual Datasets from Web Crawl
  * Data", Wenzek et al. 2020, §4.1: paragraphs whose normalized hash
  * repeats anywhere in the corpus are boilerplate — headers, footers,
  * cookie banners — and removing them is the single highest-yield web-text
  * cleanup). Document-grain dedup (P1) cannot see these: every page is
  * unique, yet 30%+ of its lines repeat corpus-wide.
  *
  * Scale shape: one line explode (O(lines) slim rows), one
  * map-side-combined count over 16-byte hashed keys — the ONLY corpus-wide
  * exchange; a line needs a (count, first-occurrence) pair, never a
  * posting list, so nothing is quadratic — a slim join back of only the
  * DUPLICATED keys (boilerplate vocabulary, ≪ corpus), and a doc-grain
  * rebuild partitioned by the input's own id key. At 10^12 docs every
  * exchanged row is ~32 bytes.
  *
  * Two drop policies, both deterministic under any partitioning:
  *   - `keepFirst = true` (CCNet): the globally-first occurrence (min
  *     (id, line_no) struct order) survives, later copies drop;
  *   - `keepFirst = false` (MassiveText-style boilerplate purge): EVERY
  *     occurrence of a repeated line drops.
  *
  * Line identity is a NORMALIZED key (lowercase, inner whitespace
  * collapsed, trimmed) so "  Accept Cookies " and "accept cookies" merge,
  * per CCNet's normalize-before-hash; pass `normalizeKey = false` for
  * byte-exact identity. Keys are hashed to a 16-hex md5 prefix
  * (engine-portable, same trade as [[SubstringDedup.duplicateSpans]]:
  * fixed-width shuffle keys, ~10⁻³ expected collisions at 10⁸ lines, and
  * the DuckDB oracle replays any collision identically). Empty/blank
  * lines share one normalized key, so they dedup like any other repeated
  * line — the boilerplate-removal reading of blank separators. */
object LineDedup {

  private def lineKey(line: Column, normalizeKey: Boolean): Column = {
    val k = if (normalizeKey) trim(regexp_replace(lower(line), "\\s+", " ")) else line
    substring(md5(k), 1, 16)
  }

  /** Exploded (id, line_no, line, key) rows. `sep` is a split REGEX
    * (Spark `split` semantics); default literal newline. */
  private def lineRows(df: DataFrame, idCol: String, textCol: String,
                       sep: String, normalizeKey: Boolean): DataFrame =
    df.select(col(idCol).as("__id"),
        posexplode(split(col(textCol), sep)).as(Seq("line_no", "line")))
      .withColumn("__k", lineKey(col("line"), normalizeKey))

  /** The duplicated-line report: one row per line key occurring ≥
    * `minCount` times corpus-wide — (line, n_docs, n_total), with `line`
    * the lexicographically-smallest raw witness of the key (deterministic
    * under any partitioning). The boilerplate census a pipeline operator
    * reviews before committing to a purge. */
  def lineStats(df: DataFrame, idCol: String, textCol: String,
                sep: String = "\n", minCount: Long = 2,
                normalizeKey: Boolean = true): DataFrame = {
    require(minCount >= 2, s"line dedup: minCount must be >= 2, got $minCount")
    lineRows(df, idCol, textCol, sep, normalizeKey)
      .groupBy(col("__k"))
      .agg(min(col("line")).as("line"),
        count(lit(1)).as("n_total"),
        count_distinct(col("__id")).as("n_docs"))
      .filter(col("n_total") >= minCount)
      .select(col("line"), col("n_docs"), col("n_total"))
  }

  /** The line-deduped corpus: (idCol, text) with repeated lines removed
    * under the chosen policy; surviving lines keep their original bytes
    * and order, rejoined with `joinSep`. A doc whose every line drops
    * yields the empty string (gate it downstream if desired). */
  def dedupLines(df: DataFrame, idCol: String, textCol: String,
                 sep: String = "\n", joinSep: String = "\n",
                 minCount: Long = 2, keepFirst: Boolean = true,
                 normalizeKey: Boolean = true): DataFrame = {
    require(minCount >= 2, s"line dedup: minCount must be >= 2, got $minCount")
    val rows = lineRows(df, idCol, textCol, sep, normalizeKey)
    // Only duplicated keys travel: the build side is the boilerplate
    // vocabulary, not the corpus. min(struct) = global first occurrence.
    val dups = rows.groupBy(col("__k"))
      .agg(count(lit(1)).as("__n"),
        min(struct(col("__id"), col("line_no"))).as("__first"))
      .filter(col("__n") >= minCount)
      .select(col("__k"), col("__first"))
    val keepPred =
      if (keepFirst)
        col("__first").isNull ||
          (col("__first.__id") === col("__id") &&
            col("__first.line_no") === col("line_no"))
      else col("__first").isNull
    val rebuilt = rows.join(dups, Seq("__k"), "left")
      .filter(keepPred)
      .groupBy(col("__id"))
      .agg(array_join(
        transform(array_sort(collect_list(struct(col("line_no"), col("line")))),
          s => s.getField("line")),
        joinSep).as("text"))
    // A doc whose EVERY line dropped has no surviving rows — re-attach it
    // as the empty string so the output stays doc-complete.
    df.select(col(idCol).as("__id")).distinct()
      .join(rebuilt, Seq("__id"), "left")
      .select(col("__id").as(idCol), coalesce(col("text"), lit("")).as("text"))
  }
}
