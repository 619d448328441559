package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis primitives for the documents table — all built-in
  * (codegen'd) string/array functions, no UDFs, so they vectorize over a
  * 100 TB corpus scan. Each has a matching ANSI/DuckDB formulation used by
  * the oracle SQL in TextQueries.
  */
object TextFunctions {

  /** Whitespace tokens, empty strings dropped. Native codegen'd
    * expression (the equivalent filter(split(...)) pays an interpreted
    * lambda per token under every downstream text operator). */
  def tokens(text: Column): Column = {
    import org.apache.spark.sql.graft.{ColumnBridge, WhitespaceTokens}
    ColumnBridge.column(WhitespaceTokens(ColumnBridge.expression(text)))
  }

  /** BPE-ish lexical tokens: word runs or single non-space symbols. */
  val bpeishPattern = "\\w+|[^\\w\\s]"
  def bpeishTokenCount(text: Column): Column =
    size(regexp_extract_all(text, lit(bpeishPattern), lit(0)))

  /** Count of tokens contained in a fixed stopword set. */
  def stopwordCount(toks: Column, stopwords: Seq[String]): Column =
    size(filter(toks, t => t.isin(stopwords.map(x => x: Any): _*)))

  /** Tiny per-language stopword inventories for the n-gram-free language
    * heuristic. Order matters: ties resolve to the first language in this
    * (lexicographic) order, identically in the SQL oracle. */
  val langStopwords: Seq[(String, Seq[String])] = Seq(
    "de" -> Seq("der", "die", "das", "und", "ist", "nicht"),
    "en" -> Seq("the", "a", "of", "and", "is", "to"),
    "es" -> Seq("el", "la", "de", "los", "que", "es"),
    "fr" -> Seq("le", "la", "les", "des", "et", "est"),
    "pt" -> Seq("o", "a", "de", "que", "do", "os"))

  /** Heuristic language id: argmax of stopword hits, lexicographic
    * tie-break, 'und' (undetermined) when no stopword hits at all. */
  def langScores(toks: Column): Seq[(String, Column)] =
    langStopwords.map { case (lang, words) => lang -> stopwordCount(toks, words) }

  def predictedLang(scores: Seq[(String, Column)]): Column = {
    val m = greatest(scores.map(_._2): _*)
    val chain = scores.foldLeft(when(m === 0, lit("und"))) {
      case (acc, (lang, s)) => acc.when(s === m, lit(lang))
    }
    chain
  }

  /** Content fingerprint: md5 hex of the exact text bytes. */
  def fingerprint(text: Column): Column = md5(text)

  /** Cleaning transforms for corpus preparation — plain regexp_replace
    * (codegen'd, oracle-expressible; patterns kept to the regex subset
    * Java and RE2 agree on). */
  def normalizeWhitespace(text: Column): Column =
    trim(regexp_replace(text, "\\s+", " "))
  def removeUrls(text: Column): Column =
    regexp_replace(text, "https?://[^ ]+", "")
  def maskDigits(text: Column): Column =
    regexp_replace(text, "[0-9]", "#")

  /** Distinct word n-gram shingles (n consecutive tokens joined by one
    * space); empty array when the doc has fewer than n tokens. Native
    * codegen'd expression — one pass per row. */
  def shingles(toks: Column, n: Int): Column = {
    import org.apache.spark.sql.graft.{ColumnBridge, WordShingles}
    ColumnBridge.column(WordShingles(ColumnBridge.expression(toks), n))
  }

  /** ALL word n-gram occurrences in document order (multiset semantics —
    * the occurrence-counting input for collocation/PMI statistics). Same
    * codegen'd single pass as [[shingles]]. */
  def shinglesAll(toks: Column, n: Int): Column = {
    import org.apache.spark.sql.graft.{ColumnBridge, WordShingles}
    ColumnBridge.column(
      WordShingles(ColumnBridge.expression(toks), n, distinct = false))
  }

  /** Per-document gram-multiplicity stats struct<n_grams, n_distinct,
    * top_count> in one codegen'd pass — the repetition-filter primitive
    * (no explode, no per-gram shuffle). */
  def gramStats(toks: Column, n: Int): Column = {
    import org.apache.spark.sql.graft.{ColumnBridge, GramStats}
    ColumnBridge.column(GramStats(ColumnBridge.expression(toks), n))
  }
}
