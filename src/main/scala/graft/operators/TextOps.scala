package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis operators for LLM training-data pipelines: tokenization,
  * quality scoring, language identification, document fingerprinting.
  *
  * All pure Column expressions over builtins — fully codegen'd, no UDFs —
  * so at 100 TB they run as projections fused into the scan stage with
  * column pruning (only `text` is read).
  */
object TextOps {

  /** Whitespace tokens of lowercased, trimmed text. Empty text → []. */
  def tokens(text: Column): Column = {
    val t = split(lower(trim(text)), "\\s+")
    when(trim(text) === "", array().cast("array<string>")).otherwise(t)
  }

  /** Token count (whitespace tokenization). */
  def tokenCount(text: Column): Column = size(tokens(text))

  /** A BPE-ish upper bound on subword count: word-piece regex split that
    * separates letters / digits / punctuation runs (public GPT-2-style
    * pre-tokenizer shape, without the merges table).
    */
  def subwordCount(text: Column): Column =
    size(regexp_extract_all(lower(trim(text)),
      lit("[a-z]+|[0-9]+|[^a-z0-9\\s]"), lit(0)))

  /** Character-level quality metrics. Ratios in [0,1], 0 for empty text. */
  def punctRatio(text: Column): Column = {
    val n = length(text)
    when(n === 0, 0.0).otherwise(
      (n - length(regexp_replace(text, "[\\p{Punct}]", ""))).cast("double") / n)
  }

  def digitRatio(text: Column): Column = {
    val n = length(text)
    when(n === 0, 0.0).otherwise(
      (n - length(regexp_replace(text, "[0-9]", ""))).cast("double") / n)
  }

  def meanWordLength(text: Column): Column = {
    val tk = tokens(text)
    when(size(tk) === 0, 0.0).otherwise(
      aggregate(tk, lit(0L), (acc, w) => acc + length(w)).cast("double")
        / size(tk))
  }

  /** Fraction of tokens that are (any language's) stopwords. */
  def stopwordRatio(text: Column,
      stopwords: Seq[String] = Languages.all.flatMap(_._2).distinct): Column = {
    val tk = tokens(text)
    val sw = array(stopwords.map(lit): _*)
    when(size(tk) === 0, 0.0).otherwise(
      size(filter(tk, t => array_contains(sw, t))).cast("double") / size(tk))
  }

  /** Tiny per-language stopword lists for the n-gram/stopword lang-ID
    * heuristic. Public common-word lists, deliberately minimal.
    */
  object Languages {
    val all: Seq[(String, Seq[String])] = Seq(
      "en" -> Seq("the", "a", "and", "of", "to", "in", "is", "that"),
      "de" -> Seq("der", "die", "das", "und", "ist", "nicht", "ein"),
      "es" -> Seq("el", "los", "que", "y", "en", "un", "una", "por"),
      "fr" -> Seq("le", "les", "et", "est", "une", "dans", "pour"))
  }

  /** Language-ID heuristic: count distinct stopword hits per language, pick
    * the argmax (ties broken by language order). Returns a language code or
    * "und" when no stopwords hit.
    */
  def langId(text: Column,
      langs: Seq[(String, Seq[String])] = Languages.all): Column = {
    val tk = array_distinct(tokens(text))
    val scores = langs.map { case (code, words) =>
      code -> size(array_intersect(tk, array(words.map(lit): _*)))
    }
    val best = scores.map(_._2).reduce((a, b) => greatest(a, b))
    scores.foldRight(lit("und"): Column) { case ((code, s), acc) =>
      when(s === best && s > 0, code).otherwise(acc)
    }
  }

  /** Deterministic polynomial rolling hash of the raw characters —
    * the document fingerprint (order-sensitive, unlike a token set hash).
    * acc = (acc * 31 + codepoint) mod 1e9+7.
    */
  def fingerprint(text: Column): Column =
    aggregate(
      // filter the trailing "" Spark's split-by-empty-regex emits
      transform(filter(split(text, ""), c => c =!= ""),
        c => ascii(c).cast("bigint")),
      lit(0L), (acc, x) => (acc * 31 + x) % 1000000007L)
}
