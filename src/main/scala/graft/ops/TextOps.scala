package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text-analysis operators for the training-data pipeline: tokenization,
  * quality scoring, language ID, fingerprinting. All pure column expressions
  * (whole-stage codegen, no shuffle) — per-row projections scale linearly. */
object TextOps {

  /** Whitespace tokens (lowercased). Native single-pass expression — the
    * `filter(split(lower(…)))` chain it replaces ran the filter HOF
    * interpreted per row (see graft.functions.TextNative; bit-identical). */
  def tokens(text: Column): Column =
    graft.functions.TextNative.whitespace_tokens(text)

  /** Token count by pure arithmetic (oracle-friendly: identical in any SQL
    * engine): separators + 1 on single-space-joined text. */
  def tokenCountArith(text: Column): Column =
    when(length(text) === 0, 0)
      .otherwise(length(text) - length(regexp_replace(text, " ", "")) + 1)

  /** BPE-ish subword count: word-boundary pieces + digit runs + punctuation,
    * approximating a byte-pair tokenizer's granularity. */
  def subwordCount(text: Column): Column =
    size(filter(split(lower(text), "(?<=[a-z])(?=[^a-z])|(?<=[0-9])(?=[^0-9])|\\s+"),
      t => length(t) > 0))

  private val qualityStopwords =
    Seq("the", "a", "of", "and", "to", "in", "is", "it", "that", "for")

  /** The score arithmetic shared by [[qualityScore]] and its retained twin:
    * inputs are the profile counts, output the raw double score. */
  private def qualityFormula(nTokRaw: Column, stopHits: Column, punctCnt: Column,
                             lenCnt: Column, nonSpaceCnt: Column): Column = {
    val nTok = greatest(nTokRaw.cast("double"), lit(1.0))
    val stopRatio = stopHits.cast("double") / nTok
    val punctRatio = punctCnt.cast("double") / greatest(lenCnt.cast("double"), lit(1.0))
    val meanTokLen = nonSpaceCnt.cast("double") / nTok
    val lenScore = least(nTok / 64.0, lit(1.0)) // reward docs up to ~64 tokens
    val stopScore = least(stopRatio * 5.0, lit(1.0)) // some stopwords = natural language
    val punctScore = greatest(lit(1.0) - punctRatio * 5.0, lit(0.0))
    val tokLenScore = when(meanTokLen.between(2.5, 9.0), 1.0).otherwise(0.4)
    // RAW double, deliberately un-rounded: the score lands on exact .5 ties
    // at fixed decimals (dyadic sub-scores), where Spark's BigDecimal-based
    // round/bround and DuckDB's FP-based round disagree per-value. Consumers
    // needing a stable cross-engine representation truncate to micros
    // (floor(q*1e6)) — tie-free and bit-reproducible, see OpsQueries.
    lenScore * 0.3 + stopScore * 0.25 + punctScore * 0.25 + tokLenScore * 0.2
  }

  /** Quality score in [0,1]: combines length band, stopword ratio, punct
    * ratio, mean token length — the classic cheap pretraining-quality
    * heuristics. All counts come from ONE single-pass [[graft.functions.TextProfile]]
    * evaluation (the regexp_replace×3 + repeated-tokenize formulation it
    * replaces measured ~40 µs/doc and dominated the curation gate stage;
    * bit-identical — twin retained below, asserted in NativeExprSpec). */
  def qualityScore(text: Column): Column = {
    val p = graft.functions.TextProfile.text_profile(text, Seq(qualityStopwords))
    qualityFormula(p.getField("n_tok"), element_at(p.getField("hits"), 1),
      p.getField("punct"), p.getField("len"), p.getField("non_space"))
  }

  /** The pre-TextProfile formulation (three regex passes + tokenize), kept
    * as the bit-identity twin for NativeExprSpec. */
  private[graft] def qualityScoreTwin(text: Column): Column = {
    val toks = tokens(text)
    qualityFormula(size(toks),
      graft.functions.StopwordCount.stopword_count(toks, qualityStopwords),
      length(regexp_replace(text, "[^!-/:-@\\[-`{-~]", "")),
      length(text),
      length(regexp_replace(text, "\\s+", "")))
  }

  /** Tiny per-language stopword profiles for the n-gram/stopword language-ID
    * heuristic. Public common function words only. */
  private val profiles: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "and", "of", "to", "in", "is", "it", "that", "was", "for", "with", "as"),
    "es" -> Seq("el", "la", "de", "que", "y", "en", "los", "del", "las", "por", "un", "una"),
    "de" -> Seq("der", "die", "und", "das", "von", "zu", "mit", "den", "ist", "des", "im", "ein"),
    "fr" -> Seq("le", "la", "de", "et", "les", "des", "en", "un", "une", "du", "est", "que"))

  /** Heuristic language ID: CJK codepoint share decides 'zh'; otherwise the
    * stopword profile with the highest hit ratio wins; 'und' when nothing
    * matches. One single-pass [[graft.functions.TextProfile]] evaluation;
    * the argmax is `array_position(hits, array_max(hits))` — first
    * occurrence of the max, replicating the replaced `when`-fold's
    * first-profile-wins strict-`>` tie rule (the fold also DUPLICATED its
    * accumulator subtree per branch, re-evaluating stopword counts; twin
    * retained below, bit-identity asserted in NativeExprSpec). All profile
    * ratios share the token-count denominator, so argmax over hit COUNTS
    * equals argmax over ratios. */
  def langId(text: Column): Column = {
    val p = graft.functions.TextProfile.text_profile(text, profiles.map(_._2))
    langDecision(p, p.getField("hits"))
  }

  /** The language decision over a profile struct + its (possibly sliced)
    * per-language hit counts, shared by [[langId]] and [[gateColumns]]. */
  private def langDecision(p: Column, hits: Column): Column = {
    val cjkRatio = p.getField("cjk").cast("double") /
      greatest(p.getField("len").cast("double"), lit(1.0))
    val nTok = greatest(p.getField("n_tok").cast("double"), lit(1.0))
    val mx = array_max(hits)
    val langNames = array(profiles.map(pr => lit(pr._1)): _*)
    when(cjkRatio > 0.2, "zh")
      .when(mx.cast("double") / nTok >= 0.05,
        element_at(langNames, array_position(hits, mx).cast("int")))
      .otherwise("und")
  }

  /** The curation gate projection from ONE [[graft.functions.TextProfile]]
    * evaluation: `(lang, quality_micros, n_tokens)`. Applying [[langId]],
    * [[qualityScore]] and `size(tokens)` separately costs three text passes
    * per row (each builds its own profile/token array); this shares a
    * single profile whose hit lists are the quality stopwords followed by
    * the language profiles. Values are bit-identical to the separate
    * application (same formulas over the same counts — spec-asserted in
    * CurateSpec). */
  def gateColumns(text: Column): (Column, Column, Column) = {
    val p = graft.functions.TextProfile.text_profile(text,
      qualityStopwords +: profiles.map(_._2))
    val hits = p.getField("hits")
    val lang = langDecision(p, slice(hits, 2, profiles.length))
    val quality = qualityFormula(p.getField("n_tok"), element_at(hits, 1),
      p.getField("punct"), p.getField("len"), p.getField("non_space"))
    (lang, floor(quality * 1e6).cast("long"), p.getField("n_tok"))
  }

  /** The pre-TextProfile formulation (regex CJK count + per-profile
    * stopword counts + `when`-fold argmax), kept as the bit-identity twin
    * for NativeExprSpec. */
  private[graft] def langIdTwin(text: Column): Column = {
    val cjk = length(regexp_replace(text, "[^\\x{4E00}-\\x{9FFF}]", "")).cast("double")
    val cjkRatio = cjk / greatest(length(text).cast("double"), lit(1.0))
    val toks = tokens(text)
    val nTok = greatest(size(toks).cast("double"), lit(1.0))
    val scores = profiles.map { case (lang, words) =>
      lang -> (graft.functions.StopwordCount.stopword_count(toks, words)
        .cast("double") / nTok)
    }
    val best = scores.tail.foldLeft(struct(lit(scores.head._1).as("lang"), scores.head._2.as("s"))) {
      case (acc, (lang, sc)) =>
        when(sc > acc.getField("s"), struct(lit(lang).as("lang"), sc.as("s"))).otherwise(acc)
    }
    when(cjkRatio > 0.2, "zh")
      .when(best.getField("s") >= 0.05, best.getField("lang"))
      .otherwise("und")
  }

  /** ALL word n-grams, duplicates kept (unlike [[shingles]], whose distinct
    * set feeds Jaccard) — the unit for repetition fractions. Empty array
    * under n tokens (`sequence(0, size-n)` would otherwise count DOWN and
    * fabricate n-grams). */
  private def ngramsAll(toks: Column, n: Int): Column =
    when(size(toks) >= n,
      transform(sequence(lit(0), size(toks) - n),
        i => concat_ws(" ", slice(toks, i + 1, lit(n)))))
      .otherwise(array().cast("array<string>"))

  /** Repetition profile (the Gopher-rule family: most-common-2-gram mass,
    * duplicate-3-gram mass) as EXACT integer counts — consumers derive the
    * fractions, and the DuckDB oracle hash-checks the counts with no FP
    * parity risk. Struct fields:
    *   top_bigram_cnt  — occurrences of the most frequent word bigram
    *   bigram_cnt      — total bigrams (tokens−1, floor 0)
    *   dup_trigram_cnt — trigram occurrences beyond each one's first
    *   trigram_cnt     — total trigrams
    * The per-row mode count is a sort + longest-run fold over the row's own
    * bigram array (shuffle-free; no explode/groupBy over the corpus — at
    * 10^12 docs a per-doc mode must never become a corpus-wide shuffle). */
  def repetitionStats(text: Column): Column = {
    val toks = tokens(text)
    val bg = ngramsAll(toks, 2)
    val tg = ngramsAll(toks, 3)
    val top = aggregate(array_sort(bg),
      struct(lit("").as("prev"), lit(0).as("run"), lit(0).as("best")),
      (acc, x) => {
        val run = when(x === acc.getField("prev"), acc.getField("run") + 1)
          .otherwise(lit(1))
        struct(x.as("prev"), run.as("run"),
          greatest(acc.getField("best"), run).as("best"))
      },
      acc => acc.getField("best"))
    struct(top.as("top_bigram_cnt"), size(bg).as("bigram_cnt"),
      (size(tg) - size(array_distinct(tg))).as("dup_trigram_cnt"),
      size(tg).as("trigram_cnt"))
  }

  /** The Gopher-style repetition gate over [[repetitionStats]] counts, as
    * integer cross-multiplication (no division — exact in any engine):
    * repetitive ⟺ top-bigram mass > 18 % of bigrams OR duplicate-trigram
    * mass > 30 % of trigrams. */
  def repetitiveGate(stats: Column): Column =
    (stats.getField("top_bigram_cnt") * 100 > stats.getField("bigram_cnt") * 18) ||
      (stats.getField("dup_trigram_cnt") * 100 > stats.getField("trigram_cnt") * 30)

  /** The Latin-1/Latin-Extended accent fold used by [[normalizeText]]:
    * a fixed `translate` table (engine-portable — DuckDB's `translate`
    * applies the identical map, unlike locale-dependent NFKD libraries).
    * Codepoint-per-codepoint, so `translate` length semantics hold. */
  private[graft] val accentFrom = "àáâãäåçèéêëìíîïñòóôõöùúûüýÿ" +
    "ÀÁÂÃÄÅÇÈÉÊËÌÍÎÏÑÒÓÔÕÖÙÚÛÜÝ"
  private[graft] val accentTo = "aaaaaaceeeeiiiinooooouuuuyy" +
    "AAAAAACEEEEIIIINOOOOOUUUUY"

  /** Deterministic text normalization (P36) — the canonical form a
    * dedup/fingerprint key wants: accent fold (fixed table), lowercase,
    * control chars to spaces, whitespace runs collapsed, trimmed. Pure
    * column expression (codegen'd, shuffle-free) whose every step replays
    * bit-identically in DuckDB (`translate`/`lower`/`regexp_replace`/
    * `trim`), so normalized-text hashes oracle across engines. NOT a
    * full NFKC pass — that needs ICU; this is the reproducible subset a
    * cross-engine pipeline can actually promise. */
  def normalizeText(text: Column): Column = {
    import org.apache.spark.sql.graftbridge.ColumnBridge
    ColumnBridge.toColumn(graft.functions.ComposedText.normalize(
      ColumnBridge.toExpr(text), accentFrom, accentTo))
  }

  /** Corpus composition report: per (group, language) doc counts, token
    * totals, and quality mass — the one-pass dashboard a pipeline reads
    * before committing a training mix (which sources dominate, what the
    * per-language token budget actually is, where the quality mass sits).
    * ONE shared TextProfile evaluation per row ([[gateColumns]] — not
    * three text passes) feeding ONE map-side-combined group aggregation;
    * all outputs are exact integers (quality reported as a SUM of micros,
    * not a float mean, so the report oracles bit-for-bit and re-aggregates
    * exactly across report merges: avg = quality_micros_sum/docs when a
    * reader wants it). NULL-group rows keep their row under a NULL group
    * key (a report must account for every doc, unlike a mixing decision —
    * [[Sample.byTemperature]] drops them because it cannot DECIDE). */
  def corpusReport(docs: DataFrame, groupCol: String,
                   textCol: String): DataFrame = {
    val (lang, q, nTok) = gateColumns(col(textCol))
    docs.select(col(groupCol), lang.as("lang"), q.as("__q"),
        nTok.cast("long").as("__t"))
      .groupBy(col(groupCol), col("lang"))
      .agg(count(lit(1)).as("docs"),
        sum(col("__t")).as("tokens"),
        sum(col("__q")).as("quality_micros_sum"))
  }

  /** The fixed entity table [[extractHtmlText]] decodes, applied strictly
    * AFTER tag stripping (so `&lt;script&gt;` in content decodes to visible
    * `<script>` text and is never executed as a strippable tag) and with
    * `&amp;` LAST (so double-encoded `&amp;lt;` correctly yields the
    * literal text `&lt;`, one decode level per pass — the HTML5 rule). */
  private[graft] val htmlEntities: Seq[(String, String)] = Seq(
    "&nbsp;" -> " ", "&lt;" -> "<", "&gt;" -> ">", "&quot;" -> "\"",
    "&#39;" -> "'", "&apos;" -> "'", "&amp;" -> "&")

  /** HTML → visible text (P40) — the extraction step every web-crawl
    * pipeline runs before any text op (dedup keys, quality gates, LM
    * training all want rendered text, not markup). Deliberately a
    * DETERMINISTIC REGEX SUBSET, not a parser: like [[normalizeText]] vs
    * NFKC, the point is a transform two engines replay bit-identically —
    * comments, `<script>`/`<style>` blocks (paired, then unclosed-to-EOF),
    * and all remaining tags drop to a space; the fixed entity table decodes
    * AFTER stripping; whitespace collapses. Pure codegen'd column chain
    * (`regexp_replace`/`replace`), shuffle-free, one pass over the corpus.
    * Documented non-goals (a parser's job, not a cross-engine subset's):
    * `>` inside a quoted attribute ends the tag early; CDATA is treated as
    * ordinary text. Plain text without markup passes through unchanged
    * modulo whitespace collapse (spec-asserted). */
  def extractHtmlText(html: Column): Column = {
    import org.apache.spark.sql.graftbridge.ColumnBridge
    ColumnBridge.toColumn(graft.functions.ComposedText.htmlExtract(
      ColumnBridge.toExpr(html), htmlEntities))
  }

  /** Word n-gram shingles (distinct), the unit for Jaccard/MinHash dedup.
    * Native single-pass expression (tokenize + n-gram join + first-
    * occurrence distinct); the transform/slice/concat_ws HOF chain it
    * replaces evaluated interpreted per row (bit-identical — NativeExprSpec
    * keeps the HOF twin). */
  def shingles(text: Column, n: Int = 3): Column =
    graft.functions.TextNative.word_shingles(text, n)
}
