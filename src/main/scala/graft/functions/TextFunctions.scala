package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis column functions for the documents pipeline. All are
  * built from codegen'd `org.apache.spark.sql.functions` primitives (no
  * UDFs), and each has an exact ANSI-SQL twin used by the DuckDB oracle
  * (see SparkEntry.oracleSql) — so semantics are pinned engine-to-engine:
  *
  *   - counts/ratios use integer regexp counts + one double division
  *     (IEEE-identical across engines; no transcendental functions);
  *   - tokenization is `\S+` runs (never split-on-space, which yields
  *     phantom empty tokens on leading/trailing whitespace).
  */
object TextFunctions {

  /** Whitespace-delimited token count: number of `\S+` runs. */
  def token_count(text: Column): Column = regexp_count(text, lit("\\S+"))

  /** Token array (non-empty tokens only). */
  def tokens(text: Column): Column =
    filter(split(text, "\\s+"), t => length(t) > 0)

  /** Word n-gram shingles from a token array: n consecutive tokens
    * joined by a single space. Empty when fewer than n tokens.
    */
  def word_shingles(toks: Column, n: Int): Column =
    filter(
      transform(toks, (_, i) =>
        when(i <= size(toks) - n,
          array_join(slice(toks, i + 1, lit(n)), " "))),
      s => s.isNotNull)

  /** Count of non-space characters (total token length). */
  def nonspace_chars(text: Column): Column = regexp_count(text, lit("\\S"))

  /** Count of punctuation characters. */
  def punct_count(text: Column): Column =
    regexp_count(text, lit("[.,;:!?'\"()\\[\\]{}-]"))

  /** English-ish stopword hits (word-boundary matches). */
  val StopwordsRe = "\\b(the|a|an|of|and|or|to|in|is|it)\\b"
  def stopword_count(text: Column): Column = regexp_count(text, lit(StopwordsRe))

  /** Per-language marker-word regexes for the n-gram/marker language-ID
    * heuristic. Order = deterministic tie-break priority.
    */
  val LangMarkers: Seq[(String, String)] = Seq(
    "en" -> "\\b(the|a|of|and|is|to|in)\\b",
    "de" -> "\\b(der|die|das|und|ist|ein|zu)\\b",
    "es" -> "\\b(el|la|de|y|es|un|en)\\b",
    "fr" -> "\\b(le|la|de|et|est|un|dans)\\b",
    "zh" -> "[\\x{4e00}-\\x{9fff}]",
  )

  /** Heuristic language ID: argmax of marker hits, ties broken by the
    * LangMarkers order, "und" when nothing matches.
    */
  def lang_guess(text: Column): Column = {
    val scores = LangMarkers.map { case (l, re) =>
      l -> regexp_count(text, lit(re))
    }
    val best = scores.map(_._2).reduce((a, b) => greatest(a, b))
    coalesce(
      scores.foldLeft(lit(null).cast("string")) { case (acc, (l, s)) =>
        coalesce(acc, when(s === best && best > 0, lit(l)))
      },
      lit("und"))
  }

  /** Quality score in [0,1] from rational arithmetic only (engine-
    * portable): 0.6·min(tokens,100)/100 + 0.2·stopword_ratio +
    * 0.2·[3 ≤ avg_token_len ≤ 8].
    */
  def quality_score(nTokens: Column, stopCount: Column, nonspace: Column): Column = {
    val toks = greatest(nTokens, lit(1))
    val stopRatio = stopCount.cast("double") / toks.cast("double")
    val avgLen = nonspace.cast("double") / toks.cast("double")
    least(nTokens, lit(100)).cast("double") / lit(100.0) * lit(0.6) +
      stopRatio * lit(0.2) +
      when(avgLen >= 3.0 && avgLen <= 8.0, lit(0.2)).otherwise(lit(0.0))
  }
}
