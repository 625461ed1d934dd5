package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Exact byte-pair-encoding tokenizer (Sennrich et al. 2016) with an
  * embedded merges table trained by [[graft.tools.BpeTrain]] on the
  * sf0.001 `documents` corpus (the corpus the engine tokenizes — the same
  * convention as any production tokenizer trained on its own corpus).
  *
  * Representation: a word is encoded as a string with every token prefixed
  * by the U+001F unit separator (`"spark"` → `"␟s␟p␟a␟r␟k"`); merge
  * (a, b) → ab is the literal replacement `"␟a␟b"` → `"␟ab"`. Because
  * every token start is preceded by the separator and tokens never contain
  * it, the pattern matches exactly at adjacent-token boundaries, and
  * built-in `replace` gives the left-to-right non-overlapping scan BPE
  * specifies. Applying the merges in training order reproduces the
  * trainer's end state symbol-for-symbol.
  *
  * Everything is built-in `Column` arithmetic — a chain of 1 regexp +
  * |Merges| literal replaces, whole-stage codegen'd, zero UDFs — and the
  * identical computation is emitted as ANSI SQL by [[mergesValuesSql]] /
  * the q208 oracle, so an external engine replays token counts
  * byte-identically (the supersedes-note on
  * [[TextStats.bpeTokenEstimate]]'s ~4-chars/token heuristic).
  *
  * Scale: [[wordTokenCounts]] encodes each DISTINCT word once (the
  * dictionary frame — heavy-tailed, bounded far below corpus size) and the
  * corpus-sized path is a keyed join + sum, never per-occurrence encoding.
  */
object Bpe {

  val Sep = "\u001F"

  /** Trained merges in training (= application) order.
    * Output of `runMain graft.tools.BpeTrain /root/testdata/sf0.001 32`;
    * 32 merges leaves most words genuinely multi-token (subword regime)
    * instead of saturating the 31-word vocabulary into whole-word tokens.
    */
  val Merges: Seq[(String, String)] = Seq(
    ("e", "r"), ("o", "r"), ("i", "n"), ("o", "w"), ("s", "t"),
    ("l", "u"), ("a", "r"), ("p", "ar"), ("m", "er"), ("a", "t"),
    ("a", "n"), ("c", "an"), ("s", "can"), ("c", "o"), ("co", "lu"),
    ("colu", "m"), ("colum", "n"), ("d", "ow"), ("in", "dow"),
    ("w", "indow"), ("d", "er"), ("or", "der"), ("or", "t"),
    ("s", "ort"), ("par", "t"), ("u", "p"), ("a", "g"), ("ag", "g"),
    ("a", "lu"), ("alu", "e"), ("v", "alue"), ("in", "e"))

  /** Separator-encoded BPE state of one word (see class doc). */
  def encodedCol(word: Column): Column =
    Merges.foldLeft(regexp_replace(word, "(.)", Sep + "$1")) {
      case (s, (a, b)) => replace(s, lit(Sep + a + Sep + b), lit(Sep + a + b))
    }

  /** Exact BPE token count of one word (0 for the empty string). */
  def tokenCountCol(word: Column): Column =
    graft.core.Exprs.bindOnce(encodedCol(word), enc =>
      (length(enc) - length(replace(enc, lit(Sep), lit("")))).cast("long"))

  /** Reference Scala implementation (same algorithm, for tests/driver use). */
  def encodeWord(w: String): Seq[String] = {
    val init = w.flatMap(c => Sep + c)
    val enc = Merges.foldLeft(init: String) { case (s, (a, b)) =>
      s.replace(Sep + a + Sep + b, Sep + a + b)
    }
    enc.split(Sep.charAt(0)).filter(_.nonEmpty).toSeq
  }

  def tokenCount(w: String): Int = encodeWord(w).length

  /** (word, n_tok) dictionary for every distinct word of `textCol` split on
    * single spaces. Encoding runs once per distinct word, distributed — no
    * driver collect, no per-occurrence re-encode.
    */
  def wordTokenCounts(df: DataFrame, textCol: Column): DataFrame =
    df.select(explode(split(textCol, " ")).as("w"))
      .filter(length(col("w")) > 0)
      .distinct()
      .select(col("w"), tokenCountCol(col("w")).as("n_tok"))

  /** Exact BPE token count per row of `df`: explode → per-(id, word)
    * occurrence counts → join the distinct-word dictionary → weighted sum.
    * Both sides of the join are keyed on the word — an ordinary shuffle
    * join; AQE broadcasts the dictionary when it is small.
    * Rows whose text has no words (empty string) get count 0.
    */
  def docTokenCounts(df: DataFrame, idCol: String, textCol: Column): DataFrame = {
    val occ = df.select(col(idCol), explode(split(textCol, " ")).as("w"))
      .filter(length(col("w")) > 0)
      .groupBy(col(idCol), col("w")).agg(count(lit(1)).as("occ"))
    val dict = wordTokenCounts(df, textCol)
    val summed = occ.join(dict, "w")
      .groupBy(col(idCol))
      .agg(sum(col("occ") * col("n_tok")).as("bpe_tokens"))
    df.select(col(idCol)).join(summed, Seq(idCol), "left")
      .select(col(idCol), coalesce(col("bpe_tokens"), lit(0L)).as("bpe_tokens"))
  }

  /** The merges table as a SQL VALUES list `(rk, pat, rep)` in the q208
    * oracle's encoding — pattern/replacement built from chr(31) so the SQL
    * carries no raw control characters.
    */
  def mergesValuesSql: String =
    Merges.zipWithIndex.map { case ((a, b), i) =>
      s"($i, chr(31)||'$a'||chr(31)||'$b', chr(31)||'$a$b')"
    }.mkString(",\n    ")

  /** Recursive-CTE oracle fragment: `bpe_dict(w, n_tok)` — the DuckDB
    * replay of [[wordTokenCounts]] over `documents.text`. Interpolate into
    * a query's WITH RECURSIVE chain.
    */
  def dictCteSql: String =
    s"""merges(rk, pat, rep) AS (VALUES
       |    $mergesValuesSql),
       |bpe_words AS (
       |  SELECT DISTINCT w FROM (
       |    SELECT unnest(string_split(text, ' ')) AS w FROM documents)
       |  WHERE length(w) > 0),
       |bpe_enc AS (
       |  SELECT w, regexp_replace(w, '(.)', chr(31) || '\\1', 'g') AS s, 0 AS i
       |  FROM bpe_words
       |  UNION ALL
       |  SELECT e.w, replace(e.s, m.pat, m.rep), e.i + 1
       |  FROM bpe_enc e JOIN merges m ON m.rk = e.i),
       |bpe_dict AS (
       |  SELECT w, length(s) - length(replace(s, chr(31), '')) AS n_tok
       |  FROM bpe_enc WHERE i = ${Merges.length})""".stripMargin
}
