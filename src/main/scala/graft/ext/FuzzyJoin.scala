package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Blocked fuzzy self-join for near-identical short strings — the record-
  * linkage primitive (IDs, codes, fixed-format names) of an entity-
  * resolution pass.
  *
  * Wildcard (deletion-neighborhood) blocking: a pair of equal-length
  * strings at Hamming distance EXACTLY 1 agrees on every position except
  * one, so masking each position `i` in turn and equi-joining on
  * `(i, masked)` finds every such pair exactly once — at the one masked
  * position where they differ (any other mask leaves the differing char
  * visible, so no other bucket can hold both). The join is EXACT by
  * construction: a collision IS agreement everywhere else, so there is no
  * verification step, no false positives, and no false negatives.
  *
  * Why not segment blocking (the PassJoin-style pigeonhole): fixed-format
  * strings share low-entropy segments — every `Customer#0000…` agrees on
  * its first segments, which turns those buckets into all-pairs joins. The
  * wildcard key carries the string's FULL entropy minus one character, so
  * bucket size is bounded by the alphabet at the masked position no matter
  * how large the corpus — skew-proof at 100 TB — at the cost of an L-fold
  * key blowup that is the right trade for the short strings record linkage
  * targets.
  */
object FuzzyJoin {

  /** `(id1 < id2, pos)` for every pair of `strCol` values at Hamming
    * distance exactly 1; `pos` is the 0-based differing position. Strings
    * of different lengths never collide (their masked forms differ in
    * length), so mixed-length input is safe; identical strings are
    * excluded by the differing-char predicate. U+0001 must not appear in
    * the data (it is the mask sentinel).
    */
  def hamming1Pairs(df: DataFrame, idCol: String, strCol: String): DataFrame = {
    val keyed = df
      .select(col(idCol).as("id"), col(strCol).as("s"))
      .select(col("id"), col("s"),
        explode(sequence(lit(0), length(col("s")) - 1)).as("pos"))
      .select(col("id"), col("pos"),
        expr("concat(substring(s, 1, pos), char(1), substring(s, pos + 2))")
          .as("masked"),
        expr("substring(s, pos + 1, 1)").as("ch"))
    // shuffled-hash hint: both sides shuffle on the masked key either way,
    // but SHJ skips sort-merge's two full sorts of the L-fold expanded key
    // frames; per-partition build size is bounded (hash-partitioned masked
    // keys, bucket sizes alphabet-bounded), so the build always fits
    keyed.as("a").join(keyed.as("b").hint("shuffle_hash"),
        col("a.pos") === col("b.pos") && col("a.masked") === col("b.masked") &&
          col("a.id") < col("b.id") && col("a.ch") =!= col("b.ch"))
      .select(col("a.id").as("id1"), col("b.id").as("id2"),
        col("a.pos").as("pos"))
  }

  /** `(id1 < id2, s1, s2)` for every pair of rows whose `strCol` values are
    * at Levenshtein distance EXACTLY 1 — FastSS deletion-neighborhood
    * blocking. Each string emits `len+1` keys: itself plus each
    * single-character deletion. Two strings within edit distance 1 must
    * share a key — a substitution deletes the differing position on both
    * sides; an insertion/deletion makes the longer string's deletion equal
    * the shorter string itself — so candidates come from one equi-join on
    * short keys (never all-pairs) and the exact `levenshtein` predicate
    * runs on candidates only (it also drops the distance-0 collisions that
    * duplicate strings produce on the identity key). Unlike
    * [[hamming1Pairs]] this sees insertions and deletions, at the cost of
    * a verification pass; key blowup is `len+1`-fold, the right trade for
    * the short strings linkage targets.
    */
  def editDistance1Pairs(df: DataFrame, idCol: String, strCol: String): DataFrame = {
    val keyed = df
      .select(col(idCol).as("id"), col(strCol).as("s"))
      .select(col("id"), col("s"), explode(expr(
        """transform(sequence(0, length(s)), j ->
          |  CASE WHEN j = 0 THEN s
          |       ELSE concat(substring(s, 1, j - 1), substring(s, j + 1, length(s)))
          |  END)""".stripMargin)).as("v"))
    keyed.as("a").join(keyed.as("b"),
        col("a.v") === col("b.v") && col("a.id") < col("b.id"))
      .select(col("a.id").as("id1"), col("b.id").as("id2"),
        col("a.s").as("s1"), col("b.s").as("s2"))
      .distinct()
      .where(levenshtein(col("s1"), col("s2")) === 1)
  }
}
