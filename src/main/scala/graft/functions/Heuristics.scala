package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** C4-family heuristic document filters (Raffel et al. 2020, "Exploring the
  * Limits of Transfer Learning…", §2.2) — the rule-based page screen every
  * web-scale corpus recipe applies before any statistical gate: well-formed
  * lines (terminal punctuation + a minimum word count), and document-level
  * blacklist flags (code braces, boilerplate "lorem ipsum"). The
  * "javascript" rule is LINE-level, exactly as C4 prescribes ("we removed
  * any line with the word Javascript"): such lines are excluded from the
  * good-line count, but a page legitimately *mentioning* JavaScript is not
  * discarded wholesale. Braces and lorem-ipsum remain page-level, also per
  * the recipe. (Engine-addition family — the reference has no web-text
  * surface.)
  *
  * All columns are built-in Catalyst expressions (codegen'd, no UDFs, no
  * shuffles — the whole screen is scan-local), and every regex is restricted
  * to the Java∩RE2 dialect so the DuckDB oracle mirrors the semantics 1:1
  * (same reasoning as [[Text.tokens]] — note `[ \t]` not `\s` in the line
  * tokenizer).
  */
object Heuristics {

  /** Lines of the raw text (newline-split; the raw line unit [[graft.operators.Boilerplate]]
    * also uses). Empty text → one empty line. */
  def lines(c: Column): Column = split(coalesce(c, lit("")), "\n", -1)

  /** A C4 "good" line: after trimming, ends in terminal punctuation
    * ([.!?]), carries at least `minTokens` whitespace-separated words, and
    * is not a javascript line (the C4 line-removal rule — a removed line
    * can never count as good). */
  private def goodLine(line: Column, minTokens: Int): Column =
    trim(line).rlike("[.!?]$") &&
      size(split(trim(line), "[ \\t]+")) >= minTokens &&
      trim(line) =!= "" &&
      !jsLine(line)

  def lineCount(c: Column): Column = size(lines(c)).cast("long")

  /** Count of well-formed lines (terminal punctuation + ≥ `minTokens` words). */
  def goodLineCount(c: Column, minTokens: Int = 5): Column =
    size(filter(lines(c), l => goodLine(l, minTokens))).cast("long")

  /** Code smell: any curly brace (C4 drops pages containing `{`). */
  def hasBrace(c: Column): Column = coalesce(c, lit("")).contains("{")

  /** Placeholder-text smell. */
  def hasLorem(c: Column): Column = lower(coalesce(c, lit(""))).contains("lorem ipsum")

  /** A javascript line (C4 removes the LINE, not the page). */
  private def jsLine(line: Column): Column = lower(line).contains("javascript")

  /** Script-warning smell anywhere on the page — reporting column only
    * (q73's `has_js`); the keep decision applies the rule per line via
    * [[goodLineCount]], per the C4 recipe. */
  def hasJavascript(c: Column): Column =
    lower(coalesce(c, lit(""))).contains("javascript")

  /** The composite C4 keep decision: at least `minGoodLines` well-formed
    * non-javascript lines and neither page-level blacklist flag. */
  def c4Keep(c: Column, minGoodLines: Int = 3, minLineTokens: Int = 5): Column =
    goodLineCount(c, minLineTokens) >= minGoodLines &&
      !hasBrace(c) && !hasLorem(c)
}
