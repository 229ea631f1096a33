package graft.ext

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** C4-style document quality filtering — a fixed, ordered rule chain
  * that tags each document keep/drop with the reasons it failed
  * (Raffel et al., "Exploring the Limits of Transfer Learning with a
  * Unified Text-to-Text Transformer", JMLR 2020 §2.2 describes the
  * heuristic-filter family this follows).
  *
  * Unlike [[TextOps]]' raw quality *signals* (text_quality emits the
  * ratios), this is the decision layer a pipeline actually applies:
  * thresholds, a boolean verdict, and an auditable reasons string —
  * the thing you aggregate to answer "why did we drop 12% of src7?".
  *
  * Every rule is a pure codegen'd Column over exact integer counts and
  * IEEE divisions of those counts — identical in any engine, so the
  * verdict itself is oracle-checkable. Map-side only: the filter rides
  * the scan projection at any scale; downstream keep-rate dashboards
  * are one partial+final aggregate over the emitted booleans.
  */
object QualityFilter {

  /** Rule names in verdict order (the reasons CSV lists failures in
    * this order, so the output is deterministic). */
  val RuleNames: Seq[String] = Seq("too_short", "too_long", "word_len", "high_punct")

  /** Per-rule failure predicates. Thresholds follow the C4 family,
    * adapted to this corpus's word-bag scale:
    *  - too_short: < 5 words (C4 drops pages with < 5 sentences; the
    *    corpus has no sentence structure, so words are the unit)
    *  - too_long: > 50,000 words (pathological concatenations)
    *  - word_len: mean word length outside [2, 15] (gibberish /
    *    minified-code signature, Gopher rule table A1)
    *  - high_punct: > 20% punctuation characters (markup residue)
    */
  def rules(text: Column): Seq[(String, Column)] = {
    val toks = TextOps.tokens(text)
    val nWords = size(toks).cast("long")
    // Σ token lengths = length of the separator-free concatenation —
    // a codegen'd built-in chain (the aggregate() HOF form is
    // interpreted; SCALE.md round-2 measured that class of swap), and
    // whitespace runs can't leak into the count. Exact integer both
    // engines.
    val charSum = length(concat_ws("", toks)).cast("long")
    val meanLen = charSum.cast("double") / nWords.cast("double")
    val punctRatio = TextOps.punctCount(text).cast("double") / length(text).cast("long").cast("double")
    Seq(
      "too_short" -> (nWords < 5L),
      "too_long" -> (nWords > 50000L),
      "word_len" -> (nWords > 0L && (meanLen < 2.0 || meanLen > 15.0)),
      "high_punct" -> (length(text) > 0 && punctRatio > 0.2))
  }

  /** keep verdict: no rule fired. */
  def keep(text: Column): Column =
    rules(text).map(_._2).reduce(_ || _).unary_!

  /** Comma-joined names of the rules that fired, in [[RuleNames]]
    * order; empty string for clean documents. */
  def reasons(text: Column): Column =
    concat_ws(",", rules(text).map { case (name, fired) =>
      when(fired, lit(name))
    }: _*)
}
