package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** PII detection and redaction — the privacy-scrub stage every production
  * pretraining pipeline runs before packing (the reference validates
  * inbound batches for contract violations, detector_api/app/main.py; a
  * 100 TB corpus additionally has a CONTENT contract: no raw emails, IPs,
  * or phone numbers reach the training shards).
  *
  * Design constraints, in order:
  *  - pure column expressions (`regexp_count` / `regexp_replace`) — narrow,
  *    shuffle-free, whole-stage-codegen'd; the scrub pipelines into
  *    whatever pass already reads `text` and adds zero jobs to a fused
  *    curation plan
  *  - the patterns live in the RE2 ∩ java.util.regex COMMON SUBSET (no
  *    lookaround, no backreferences, no \b — RE2 rejects or mis-handles
  *    them), so a DuckDB oracle replays detection bit-for-bit and the
  *    same patterns port to any RE2-based scanner unchanged
  *  - redaction order is fixed (emails → IPv4 → phones): earlier rewrites
  *    must not manufacture later matches, and phone-like digit runs inside
  *    an email local-part are consumed by the email rewrite first
  *
  * Precision/recall trade is documented, not hidden: these are the
  * standard high-precision scrub patterns (C4/Dolma-style), NOT a
  * validated-IP parser — `999.999.999.999` does not match (octets are
  * range-checked) but an IP embedded in a longer dotted run may. At
  * 10^12 docs the cost model favors deterministic single-pass regexes
  * over per-row parsers. */
object Pii {

  /** RFC-5322-lite email: the C4-style scrub pattern. */
  val EmailRe: String = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"

  /** Range-checked IPv4 dotted quad (0-255 per octet, no \b — RE2-safe). */
  val Ipv4Re: String =
    "(25[0-5]|2[0-4][0-9]|1[0-9][0-9]|[1-9]?[0-9])" +
      "(\\.(25[0-5]|2[0-4][0-9]|1[0-9][0-9]|[1-9]?[0-9])){3}"

  /** International-ish phone: optional +, then ≥9 chars of digits/space/
    * hyphen ending in a digit. Deliberately does NOT match dotted quads
    * (dots break the run) or short ids. */
  val PhoneRe: String = "\\+?[0-9][0-9 -]{7,}[0-9]"

  val Kinds: Seq[(String, String, String)] = Seq(
    ("emails", EmailRe, "<EMAIL>"),
    ("ipv4s", Ipv4Re, "<IP>"),
    ("phones", PhoneRe, "<PHONE>"))

  /** Per-kind match counts as columns (`emails`, `ipv4s`, `phones`). */
  def countCols(text: Column): Seq[Column] =
    Kinds.map { case (name, re, _) => regexp_count(text, lit(re)).as(name) }

  /** Redacted text: fixed-order rewrite, each kind replaced by its tag. */
  def redactCol(text: Column): Column =
    Kinds.foldLeft(text) { case (c, (_, re, tag)) =>
      regexp_replace(c, lit(re), lit(tag))
    }

  /** Append count columns + a `text_redacted` column. */
  def scrub(docs: DataFrame, textCol: String): DataFrame = {
    val clash = ("text_redacted" +: Kinds.map(_._1)).filter(docs.columns.contains)
    require(clash.isEmpty, s"pii: output column(s) ${clash.mkString(",")} already exist on the input")
    val t = col(textCol)
    docs.select(col("*") +: countCols(t) :+ redactCol(t).as("text_redacted"): _*)
  }

  /** Keep docs whose total PII hits ≤ maxHits (0 = the usual strict gate
    * when redaction is not allowed to alter the text). */
  def gate(docs: DataFrame, textCol: String, maxHits: Int = 0): DataFrame = {
    val total = countCols(col(textCol)).reduce(_ + _)
    docs.filter(total <= maxHits)
  }
}
