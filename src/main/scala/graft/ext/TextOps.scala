package graft.ext

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis operators for large-scale training-data pipelines:
  * tokenization, quality scoring, language ID, fingerprinting
  * (SURVEY §7.5; beyond the reference surface, which has no text ops).
  *
  * Everything here is a pure codegen'd Column expression over built-ins
  * (split/transform/aggregate/regexp) — no UDFs, no shuffles. At 100 TB
  * these run map-side in whole-stage codegen; the only shuffles are the
  * groupBys the *callers* add.
  */
object TextOps {

  /** Whitespace tokens, empty-safe (split keeps trailing empties;
    * filter drops them so both engines agree). */
  def tokens(text: Column): Column =
    filter(split(trim(text), "\\s+"), t => t =!= "")

  /** BPE-ish token pattern: letter runs, digit runs, single non-space
    * symbols (GPT-2-style pre-tokenizer, ASCII simplification). */
  val BpeTokenRe = "[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]"

  def bpeishTokens(text: Column): Column =
    regexp_extract_all(text, lit(BpeTokenRe), lit(0))

  /** Adjacent character bigrams of a word ("the" → ["th","he"]),
    * overlapping, empty below 2 chars — the BPE merge-candidate unit
    * (Sennrich et al. 2016 count these corpus-wide to pick the next
    * merge). Pure built-ins; intended to run over the DISTINCT vocab
    * with per-word corpus counts joined in, so the derivation is
    * O(vocab × word length), never O(corpus tokens). */
  def charPairs(w: Column): Column =
    when(length(w) >= 2,
      transform(sequence(lit(1), length(w) - 1), i => w.substr(i, lit(2))))
      .otherwise(array().cast("array<string>"))

  /** Separator for the BPE trainer's symbol-sequence encoding: every
    * symbol is flanked by a DOUBLE separator (␁␁sym␁␁sym␁␁), so a
    * merge is a literal replace of ␁p1␁␁p2␁ → ␁p1p2␁. Both engines'
    * literal replace scans left-to-right non-overlapping — exactly
    * greedy BPE — and the double boundary is load-bearing: each match
    * consumes only the INNER half of its flanking boundaries, so runs
    * like a·a·a·a merge twice (single separators would be consumed by
    * the first match, hiding the second), and a pattern can never
    * match inside a symbol (a match's single-separator edges must
    * land on boundary halves, forcing p1/p2 to be complete symbols). */
  val BpeSep = "\u0001"
  val BpeBoundary: String = BpeSep + BpeSep

  /** Initial BPE representation of a word: its characters, each
    * flanked by double separators. */
  def bpeInitRep(w: Column): Column =
    concat(lit(BpeBoundary),
      array_join(transform(sequence(lit(1), length(w)),
        j => w.substr(j, lit(1))), BpeBoundary),
      lit(BpeBoundary))

  /** Symbol array of an encoded representation. */
  def bpeSymbols(rep: Column): Column =
    filter(split(rep, BpeBoundary), x => x =!= "")

  /** Apply one merge (p1, p2) → p1p2 greedily left-to-right. */
  def bpeMerge(rep: Column, p1: Column, p2: Column): Column =
    replace(rep,
      concat(lit(BpeSep), p1, lit(BpeBoundary), p2, lit(BpeSep)),
      concat(lit(BpeSep), p1, p2, lit(BpeSep)))

  /** Word n-gram shingles ("a b c" for n=3) from a token array.
    * Empty when the doc has fewer than n tokens (sequence() would
    * otherwise run backwards). */
  def shingles(toks: Column, n: Int): Column =
    when(size(toks) >= n,
      transform(sequence(lit(1), size(toks) - (n - 1)),
        i => concat_ws(" ", (0 until n).map(j => element_at(toks, i + j)): _*)))
      .otherwise(array().cast("array<string>"))

  /** Occurrences of a literal marker substring (non-overlapping,
    * left-to-right — same algorithm both engines). Long-typed. */
  def occurrences(text: Column, marker: String): Column =
    ((length(text) - length(regexp_replace(text, marker, ""))) / marker.length)
      .cast("long")

  /** Per-language marker words for the n-gram-heuristic language ID.
    * Space-padded so they only match whole words. */
  val LangMarkers: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq(" the ", " and ", " is "),
    "de" -> Seq(" der ", " und ", " die "),
    "es" -> Seq(" el ", " que ", " los "),
    "fr" -> Seq(" le ", " et ", " les "))

  def langScore(text: Column, lang: String): Column =
    LangMarkers.toMap.apply(lang).map(occurrences(text, _)).reduce(_ + _)

  /** CJK codepoint count — routes to 'zh' when positive. */
  def cjkCount(text: Column): Column =
    length(regexp_replace(text, "[^一-鿿]", "")).cast("long")

  /** Heuristic language ID: zh if any CJK, else argmax marker score with
    * fixed tie-break order en > de > es > fr (deterministic). */
  def langId(text: Column): Column = {
    val en = langScore(text, "en"); val de = langScore(text, "de")
    val es = langScore(text, "es"); val fr = langScore(text, "fr")
    when(cjkCount(text) > 0, lit("zh"))
      .when(en >= greatest(de, es, fr), lit("en"))
      .when(de >= greatest(es, fr), lit("de"))
      .when(es >= fr, lit("es"))
      .otherwise(lit("fr"))
  }

  /** Punctuation character count (sentence/clause marks). */
  def punctCount(text: Column): Column =
    length(regexp_replace(text, "[^.!?,;:]", "")).cast("long")

  /** Whole-content fingerprint: md5 of normalized text (hex string —
    * identical in any engine). */
  def contentFingerprint(text: Column): Column =
    md5(lower(trim(text)).cast("binary"))

  /** Locality-sensitive document fingerprint: lexicographic min of the
    * md5s of all word 3-gram shingles (winnowing-style; robust to
    * small edits away from the minimum shingle). */
  def minShingleFingerprint(text: Column): Column =
    array_min(transform(shingles(tokens(text), 3), s => md5(s.cast("binary"))))

  /** Email-shaped span, case-insensitive (John.Doe@Example.COM scrubs
    * the same as john.doe@example.com). Pattern subset chosen to
    * evaluate identically under Java regex (Spark codegen'd
    * regexp_replace) and RE2 (the DuckDB oracle): inline (?i),
    * character classes, +, bounded repetition — no backreferences or
    * lookaround. */
  val EmailRe = "(?i)[a-z0-9._%+-]+@[a-z0-9.-]+\\.[a-z]{2,}"

  /** Phone-shaped span. First alternative: North-American forms with
    * an optional +1/1 prefix, parenthesized or separator-delimited
    * area code, and -/./space separators — covers (555) 123-4567,
    * 555.123.4567, +1-555-123-4567. Second alternative: bare
    * NNN-N{3,8} digit runs (extension-style). Both alternatives are
    * leftmost-first in Java regex AND RE2, so engine and oracle pick
    * the same span when both could match. */
  val PhoneRe =
    "(?:\\+?1[-. ]?)?(?:\\([0-9]{3}\\) ?|[0-9]{3}[-. ])[0-9]{3}[-. ][0-9]{4}\\b" +
      "|\\b[0-9]{3}-[0-9]{3,8}\\b"

  /** PII scrub: replace email- and phone-shaped spans with typed
    * placeholder tags. Pure map-side codegen'd string work — the scrub
    * rides the scan's projection at any scale, no shuffle. */
  def scrubPii(text: Column): Column =
    regexp_replace(regexp_replace(text, EmailRe, "<EMAIL>"),
      PhoneRe, "<PHONE>")
}
