package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Shared Column-level text helpers for the training-data operators.
  *
  * Everything here is pure Catalyst (whole-stage-codegen friendly, no UDFs)
  * and has a line-for-line ANSI-SQL twin used by the DuckDB oracle, so the
  * driver's hash compare is exact: ratios are single IEEE divisions of
  * exact integers, never accumulated floats.
  */
object TextOps {

  /** Whitespace word split, empties dropped (Python str.split() semantics
    * on single-space text; the corpora are single-spaced ASCII). */
  def words(text: Column): Column =
    filter(split(text, " ", -1), w => w =!= lit(""))

  /** BPE-ish regex tokenization: letter runs | digit runs | single
    * punctuation, over the lowercased text. */
  val bpePattern = "[a-z]+|[0-9]+|[^a-z0-9 ]"

  def bpeTokens(text: Column): Column =
    regexp_extract_all(lower(text), lit(bpePattern), lit(0))

  /** CJK-aware tokenization: one token per Han character (Chinese carries
    * no word spaces — the reference's own corpus language), non-Han runs
    * split on spaces. On pure-Latin text this degenerates to exactly
    * `words` (non-space runs), so it is safe as a default at corpus scale.
    * Pure regex, so the semantics are IDENTICAL in Spark (java.util.regex)
    * and the DuckDB twin (RE2 spelling `cjkPatternSql`) — the per-char Han
    * rule needs only literal code-point ranges, which both engines share.
    * This is the operator-layer sibling of TextSim.mentionTokens (which
    * additionally treats CJK punctuation as separators for scoring
    * parity); dedup/quality/vocab stats only need the char-grain split. */
  val cjkPattern = "[一-鿿]|[^ 一-鿿]+"

  /** The same pattern in DuckDB/RE2 spelling (for oracle twin SQL). */
  val cjkPatternSql = "[\\x{4e00}-\\x{9fff}]|[^ \\x{4e00}-\\x{9fff}]+"

  def cjkTokens(text: Column): Column =
    regexp_extract_all(text, lit(cjkPattern), lit(0))

  /** PII patterns shared VERBATIM with the DuckDB twins — plain character
    * classes and greedy quantifiers only, identical semantics in
    * java.util.regex and RE2 (no backrefs, no lookaround). The email
    * pattern is case-INsensitive ((?i), supported identically by both
    * engines): real transcripts carry mixed-case addresses, and a
    * redaction pass that misses John.Doe@Example.COM is not a redaction
    * pass. The phone pattern needs >= 8 chars ending in a digit, so short
    * in-text numbers never trip it. */
  val emailPattern = "(?i)[a-z0-9._%+-]+@[a-z0-9.-]+\\.[a-z]{2,}"
  val phonePattern = "\\+?[0-9][0-9 -]{6,}[0-9]"

  /** Whitespace-RUN tokenizer class shared VERBATIM with the DuckDB twins
    * (repetition stats): an EXPLICIT class instead of \s because Java's \s
    * includes vertical tab while RE2's does not — the one character the
    * two engines disagree on. */
  val wsRunPattern = "[ \\t\\n\\f\\r]+"

  private val cjkRe = java.util.regex.Pattern.compile(cjkPattern)

  /** JVM-side twin of `cjkTokens` for UDF paths (shingling). */
  def cjkTokenize(text: String): Array[String] = {
    if (text == null) return Array.empty
    val m = cjkRe.matcher(text)
    val buf = scala.collection.mutable.ArrayBuffer.empty[String]
    while (m.find()) buf += m.group()
    buf.toArray
  }

  /** Count of array elements that appear in a fixed marker set. */
  def markerHits(ws: Column, markers: Seq[String]): Column =
    size(filter(ws, w => w.isin(markers.map(lit): _*))).cast("long")
}
