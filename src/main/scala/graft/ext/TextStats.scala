package graft.ext

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text analysis for training-data curation: token counting, quality
  * scoring, language ID, document fingerprinting. All column expressions —
  * codegen'd, no UDFs, no shuffles beyond the caller's aggregations.
  *
  * Two tokenizers on purpose: `tokenCount` (regex, robust) and
  * `tokenCountSimple` (space-split arithmetic that is bit-identical across
  * engines — used by the DuckDB oracle queries).
  */
object TextStats {

  def tokens(text: Column): Column = split(text, "\\s+")

  def tokenCount(text: Column): Column = size(tokens(text))

  /** (len − len(without spaces)) + 1: exact parity formula shared with SQL. */
  def tokenCountSimple(text: Column): Column =
    length(text) - length(regexp_replace(text, " ", "")) + lit(1)

  /** BPE-ish subword estimate: word tokens + one extra per 4 chars of long
    * words (common ~4 chars/token heuristic for byte-pair vocabularies).
    */
  def bpeTokenEstimate(text: Column): Column =
    aggregate(tokens(text), lit(0L),
      (acc, t) => acc + greatest(ceil(length(t) / 4.0), lit(1.0)).cast("long"))

  def avgWordLength(text: Column): Column =
    length(regexp_replace(text, " ", "")).cast("double") / tokenCountSimple(text)

  def punctRatio(text: Column): Column =
    (length(text) - length(regexp_replace(text, "[\\p{Punct}]", ""))).cast("double") /
      greatest(length(text), lit(1))

  def upperRatio(text: Column): Column =
    (length(text) - length(regexp_replace(text, "[A-Z]", ""))).cast("double") /
      greatest(length(text), lit(1))

  /** Fraction of tokens found in the stopword list (repeats counted). */
  def stopwordRatio(text: Column, stopwords: Seq[String]): Column =
    size(filter(tokens(text), t => t.isin(stopwords: _*))).cast("double") /
      greatest(tokenCount(text), lit(1))

  /** Heuristic quality score in [0,1]: length sweet-spot, average word length
    * sanity, low punctuation noise. Deterministic, tunable weights.
    */
  def qualityScore(text: Column): Column = {
    val lenScore = least(length(text).cast("double") / 500.0, lit(1.0))
    val awl = avgWordLength(text)
    val wordScore = when(awl.between(3.0, 10.0), 1.0).otherwise(0.5)
    val punctScore = lit(1.0) - least(punctRatio(text) * 5.0, lit(1.0))
    lenScore * 0.4 + wordScore * 0.4 + punctScore * 0.2
  }

  /** Language marker lexicons (tiny common-word sets; public knowledge). */
  val LangMarkers: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "and", "of", "to", "in", "is", "a"),
    "de" -> Seq("der", "die", "und", "das", "nicht", "ist"),
    "fr" -> Seq("le", "la", "et", "les", "des", "est"),
    "es" -> Seq("el", "de", "que", "los", "es", "una"),
    "zh" -> Seq("的", "是", "了", "在", "我"))

  /** Marker-hit count for one language. */
  def langScore(text: Column, markers: Seq[String]): Column =
    size(filter(tokens(lower(text)), t => t.isin(markers: _*)))

  /** All language marker counts in ONE pass over the token array (struct
    * accumulator) — one split per row instead of one per (language ×
    * reference in the argmax tree).
    */
  def langScoresStruct(text: Column): Column = {
    val zero = struct(LangMarkers.map { case (l, _) => lit(0).as(l) }: _*)
    aggregate(tokens(lower(text)), zero, (acc, t) =>
      struct(LangMarkers.map { case (l, m) =>
        (acc.getItem(l) + when(t.isin(m: _*), 1).otherwise(0)).as(l)
      }: _*))
  }

  /** Predicted language from per-language score columns (first wins ties,
    * "und" when nothing matches).
    */
  def langIdFromCols(scores: Seq[(String, Column)]): Column = {
    val best = scores.map(_._2).reduce((a, b) => greatest(a, b))
    scores.foldRight(lit("und"): Column) { case ((l, s), acc) =>
      when(s === best && s > 0, lit(l)).otherwise(acc)
    }
  }

  /** Predicted language from a precomputed score struct. */
  def langIdFromScores(scores: Column): Column =
    langIdFromCols(LangMarkers.map { case (l, _) => l -> scores.getItem(l) })

  /** Aggregate-side language scores for an EXPLODED token column — the fast
    * path: conditional sums are whole-stage-codegen'd, vs interpreted
    * higher-order lambdas on the array form.
    */
  def langScoreAggs(token: Column): Seq[(String, Column)] =
    LangMarkers.map { case (l, m) =>
      l -> sum(when(token.isin(m: _*), 1).otherwise(0))
    }

  /** Predicted language = argmax marker count. N-gram-free heuristic that
    * degrades gracefully on synthetic text. (For hot paths, materialize
    * `langScoresStruct` in a projection first — see langIdFromScores.)
    */
  def langId(text: Column): Column = langIdFromScores(langScoresStruct(text))

  /** Intra-document token repetition: 1 − distinct/total tokens (lowercased)
    * — the standard "repetitive junk" corpus-quality signal (boilerplate,
    * keyword stuffing, generation loops). Row-local, no shuffle.
    */
  def repetitionRatio(text: Column): Column =
    // tokenization let-bound: the two references (distinct size, total size)
    // would otherwise tokenize twice per row
    graft.core.Exprs.bindOnce(tokens(lower(text)), tok =>
      lit(1.0) - size(array_distinct(tok)).cast("double") / size(tok))

  /** PII patterns (lowercase input): conservative email and dotted-quad IP.
    * Both are expressible identically in Java regex and RE2, so an external
    * engine can replay the scrub (the q45 oracle does).
    */
  val EmailPattern = "[a-z0-9._%+-]+@[a-z0-9.-]+\\.[a-z]{2,}"
  val Ipv4Pattern = "\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b"

  /** Redact emails and IPs (row-local regexp_replace chain). */
  def scrubPii(text: Column): Column =
    regexp_replace(regexp_replace(text, EmailPattern, "[EMAIL]"),
      Ipv4Pattern, "[IP]")

  /** Count of PII matches for a pattern (audit column for scrub pipelines). */
  def piiCount(text: Column, pattern: String): Column =
    size(regexp_extract_all(text, lit(pattern), lit(0)))

  /** Order-sensitive rolling-hash fingerprint of the token stream
    * (polynomial accumulate over xxhash64'd tokens): robust doc identity for
    * shift-invariant near-dup grouping upstream of MinHash.
    */
  def fingerprint(text: Column): Column =
    aggregate(tokens(text), lit(0L), (acc, t) => acc * lit(1000003L) + xxhash64(t))
}
