package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Exact byte-pair-encoding tokenizer (Sennrich et al. 2016) with an
  * embedded merges table trained by [[graft.tools.BpeTrain]] on the
  * sf0.1 `documents` corpus (the corpus the engine tokenizes — the same
  * convention as any production tokenizer trained on its own corpus),
  * over a production-shaped pre-tokenization ([[PreTokenPattern]]:
  * letter/digit/punctuation runs, not bare space-split).
  *
  * Representation: a word is encoded as a string with every token WRAPPED
  * in the U+001F unit separator (`"fast"` → `"␟f␟␟a␟␟s␟␟t␟"`); merge
  * (a, b) → ab is the literal replacement `"␟a␟␟b␟"` → `"␟ab␟"`. Both
  * boundaries of both symbols are pinned by separators, so the pattern
  * matches exactly the adjacent token pair (a, b) — never a longer
  * neighbor that merely starts with `b` — and built-in `replace` gives
  * the left-to-right non-overlapping scan BPE specifies (see
  * [[encodedCol]] for why adjacent pair runs still chain). Applying the
  * merges in training order reproduces the trainer's end state
  * symbol-for-symbol.
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

  /** Pre-tokenization pattern: letter runs, digit runs, punctuation runs —
    * the standard word/number/symbol split (GPT-2-style in spirit, public
    * method), expressed in syntax valid for BOTH Java regex (Spark) and
    * RE2 (DuckDB) so engine and oracle pre-tokenize identically. The
    * U+001F separator is excluded from the punctuation class (`\x1F`), so
    * it can never enter a token — the trainer, the runtime tokenizer, and
    * the oracle all share that guarantee by construction.
    */
  val PreTokenPattern: String = "\\p{L}+|\\p{N}+|[^\\p{L}\\p{N}\\s\\x1F]+"

  /** Array of pre-tokens of one text column (Spark side). */
  def preTokens(text: Column): Column =
    regexp_extract_all(text, lit(PreTokenPattern), lit(0))

  /** The same pre-tokenization as a DuckDB fragment over `expr` (the
    * pattern literal is valid RE2 and Java regex alike, shared verbatim). */
  def preTokensSql(expr: String): String =
    s"regexp_extract_all($expr, '\\p{L}+|\\p{N}+|[^\\p{L}\\p{N}\\s\\x1F]+')"

  /** Scala twin of [[preTokens]] for tests and the trainer. */
  private val preTokenRe = PreTokenPattern.r
  def preTokenize(s: String): Seq[String] = preTokenRe.findAllIn(s).toSeq

  /** Trained merges in training (= application) order.
    * Output of `runMain graft.tools.BpeTrain /root/testdata/sf0.1 60` over
    * the [[preTokens]] pre-tokenization. The sf0.1 corpus vocabulary (31
    * distinct words) saturates at 89 merges — every word a single token —
    * so 60 is the production-shaped choice for THIS corpus: the frequent
    * half of the vocabulary is fully merged (as a trained tokenizer's top
    * words are) while 15 words stay genuinely multi-token, keeping the
    * oracle gate's counts discriminating. Out-of-vocabulary text
    * (punctuation runs, digits, unseen words) decomposes into subwords or
    * characters exactly as a production BPE does.
    */
  val Merges: Seq[(String, String)] = Seq(
    ("e", "r"), ("i", "n"), ("o", "r"), ("s", "t"), ("o", "w"),
    ("t", "a"), ("l", "u"), ("m", "er"), ("a", "r"), ("p", "ar"),
    ("u", "p"), ("par", "k"), ("s", "park"), ("d", "ow"), ("in", "dow"),
    ("w", "indow"), ("g", "e"), ("mer", "ge"), ("b", "l"), ("bl", "e"),
    ("ta", "ble"), ("c", "o"), ("co", "lu"), ("colu", "m"), ("colum", "n"),
    ("c", "t"), ("ct", "or"), ("e", "ctor"), ("v", "ector"), ("a", "m"),
    ("e", "am"), ("r", "eam"), ("st", "ream"), ("a", "lu"), ("alu", "e"),
    ("v", "alue"), ("a", "ta"), ("d", "ata"), ("a", "l"), ("al", "l"),
    ("m", "all"), ("s", "mall"), ("j", "o"), ("jo", "in"), ("f", "i"),
    ("fi", "l"), ("fil", "t"), ("filt", "er"), ("b", "i"), ("bi", "g"),
    ("g", "r"), ("gr", "o"), ("gro", "up"), ("a", "s"), ("as", "h"),
    ("h", "ash"), ("c", "u"), ("cu", "st"), ("cust", "o"), ("custo", "mer"))

  /** Separator-encoded BPE state of one word: every token is WRAPPED as
    * `␟tok␟` (adjacent tokens separated by `␟␟`), so merge (a, b) is the
    * literal replacement `␟a␟␟b␟` → `␟ab␟`. The closing separator makes
    * the pattern boundary-exact: `␟a␟␟s␟` cannot match a neighbor token
    * `st` that merely STARTS with `s` (the prefix-only encoding of round 8
    * had exactly that false match — "fast" collapsed to `f|ast` via the
    * unrelated ("a","s") merge). A consumed trailing `␟` is re-supplied by
    * the replacement, so runs of adjacent pairs (`abab` under (a,b)) still
    * merge left-to-right non-overlapping exactly as Sennrich's scan does.
    */
  def encodedCol(word: Column): Column =
    Merges.foldLeft(regexp_replace(word, "(.)", Sep + "$1" + Sep)) {
      case (s, (a, b)) =>
        replace(s, lit(Sep + a + Sep + Sep + b + Sep), lit(Sep + a + b + Sep))
    }

  /** Exact BPE token count of one word (0 for the empty string): each token
    * contributes exactly two separators. */
  def tokenCountCol(word: Column): Column =
    graft.core.Exprs.bindOnce(encodedCol(word), enc =>
      ((length(enc) - length(replace(enc, lit(Sep), lit("")))) / 2).cast("long"))

  /** Reference Scala implementation (same algorithm, for tests/driver use). */
  def encodeWord(w: String): Seq[String] = {
    val init = w.flatMap(c => Sep + c + Sep)
    val enc = Merges.foldLeft(init: String) { case (s, (a, b)) =>
      s.replace(Sep + a + Sep + Sep + b + Sep, Sep + a + b + Sep)
    }
    enc.split(Sep.charAt(0)).filter(_.nonEmpty).toSeq
  }

  def tokenCount(w: String): Int = encodeWord(w).length

  /** (word, n_tok) dictionary for every distinct pre-token of `textCol`
    * (see [[preTokens]]: letter/digit/punctuation runs; U+001F can never
    * appear in a token). Encoding runs once per distinct word, distributed
    * — no driver collect, no per-occurrence re-encode.
    */
  def wordTokenCounts(df: DataFrame, textCol: Column): DataFrame =
    df.select(explode(preTokens(textCol)).as("w"))
      .distinct()
      .select(col("w"), tokenCountCol(col("w")).as("n_tok"))

  /** Exact BPE token count per row of `df`: explode → per-(id, word)
    * occurrence counts → join the distinct-word dictionary → weighted sum.
    * Both sides of the join are keyed on the word — an ordinary shuffle
    * join; AQE broadcasts the dictionary when it is small.
    * Rows whose text has no words (empty string) get count 0.
    */
  def docTokenCounts(df: DataFrame, idCol: String, textCol: Column): DataFrame = {
    val occ = df.select(col(idCol), explode(preTokens(textCol)).as("w"))
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
  def mergesValuesSql: String = {
    def esc(s: String) = s.replace("'", "''")
    Merges.zipWithIndex.map { case ((a, b), i) =>
      s"($i, chr(31)||'${esc(a)}'||chr(31)||chr(31)||'${esc(b)}'||chr(31), " +
        s"chr(31)||'${esc(a + b)}'||chr(31))"
    }.mkString(",\n    ")
  }

  /** Recursive-CTE oracle fragment: `bpe_dict(w, n_tok)` — the DuckDB
    * replay of [[wordTokenCounts]] over `documents.text`. Interpolate into
    * a query's WITH RECURSIVE chain.
    */
  def dictCteSql: String =
    s"""merges(rk, pat, rep) AS (VALUES
       |    $mergesValuesSql),
       |bpe_words AS (
       |  SELECT DISTINCT w FROM (
       |    SELECT unnest(${preTokensSql("text")}) AS w FROM documents)),
       |bpe_enc AS (
       |  SELECT w, regexp_replace(w, '(.)', chr(31) || '\\1' || chr(31), 'g') AS s, 0 AS i
       |  FROM bpe_words
       |  UNION ALL
       |  SELECT e.w, replace(e.s, m.pat, m.rep), e.i + 1
       |  FROM bpe_enc e JOIN merges m ON m.rk = e.i),
       |bpe_dict AS (
       |  SELECT w, (length(s) - length(replace(s, chr(31), ''))) // 2 AS n_tok
       |  FROM bpe_enc WHERE i = ${Merges.length})""".stripMargin

  /** Oracle fragment for per-(doc, word) occurrence counts with the same
    * pre-tokenization as [[docTokenCounts]]'s engine path. */
  def occCteSql: String =
    s"""occ AS (
       |  SELECT doc_id, w, COUNT(*) AS occ FROM (
       |    SELECT doc_id, unnest(${preTokensSql("text")}) AS w FROM documents)
       |  GROUP BY doc_id, w)""".stripMargin
}
