package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Document deduplication for large-scale training-data pipelines.
  *
  * Four families, all shuffle-architected for the 100-TB case:
  *  - exact: hash-groupBy on content digest — one shuffle on the digest;
  *  - MinHash + LSH: shingle → k minhashes → banded signatures → candidate
  *    pairs via an equi-join on (band, bandHash) — avoids the O(n²) pair
  *    space; only candidates get exact Jaccard verification;
  *  - SimHash: 64-bit sign-summed token hashes; near-dups via 16-bit band
  *    join + popcount(xor) Hamming check;
  *  - n-gram Jaccard: exact set similarity on candidates only.
  *
  * Everything is built from codegen'd builtins (split, xxhash64, higher-order
  * array functions, bit ops) — no UDFs, no driver-side loops. Hot-band skew
  * at scale: salt the band join or cap band bucket size (see
  * `lshCandidatePairs(maxBucket)`).
  */
object Dedup {

  def tokens(text: Column): Column = split(lower(text), "\\s+")

  /** Word n-gram shingles; empty array when the document is shorter than n. */
  def shingles(text: Column, n: Int = 3): Column = {
    val t = tokens(text)
    when(size(t) < n, array().cast("array<string>"))
      .otherwise(transform(sequence(lit(0), size(t) - n),
        i => concat_ws(" ", slice(t, i + lit(1), lit(n)))))
  }

  // ---- exact ---------------------------------------------------------------

  /** 1-row summary: total docs, distinct texts, duplicate groups. */
  def exactStats(df: DataFrame, textCol: String): DataFrame =
    df.agg(
      count(lit(1)).as("n_docs"),
      countDistinct(md5(col(textCol).cast("binary"))).as("n_distinct"),
      (count(lit(1)) - countDistinct(md5(col(textCol).cast("binary")))).as("n_dup_rows"))

  /** (digest, count, example ids) for every exact-duplicate group. */
  def exactDuplicateGroups(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.groupBy(md5(col(textCol).cast("binary")).as("digest"))
      .agg(count(lit(1)).as("cnt"), sort_array(collect_list(col(idCol))).as("ids"))
      .filter(col("cnt") > 1)

  /** Shingle hashes straight from per-token hashes (no n-gram string
    * building): hash each token once, combine n consecutive hashes with
    * distinct odd multipliers. ~5× cheaper than string shingles on the hot
    * explode path; collision probability is negligible for dedup purposes.
    * Pass a column that already holds `transform(tokens, xxhash64)`.
    */
  def shingleHashesFromTokenHashes(th: Column, n: Int): Column =
    when(size(th) < n, array().cast("array<bigint>"))
      .otherwise(transform(sequence(lit(0), size(th) - n),
        i => (0 until n).map(j =>
          element_at(th, i + lit(j + 1)) * lit(0x9E3779B97F4A7C15L * (2L * j + 1)))
          .reduce(_ + _)))

  def tokenHashes(text: Column): Column = transform(tokens(text), t => xxhash64(t))

  // ---- MinHash + LSH -------------------------------------------------------

  /** Deterministic affine permutations of a 64-bit base hash (mod 2^64 wrap). */
  private def permuted(h: Column, i: Int): Column = {
    // odd multipliers + offsets derived from splitmix64 of the index
    val a = 0x9E3779B97F4A7C15L * (2L * i + 1)
    val b = 0xBF58476D1CE4E5B9L * (i + 1)
    h * lit(a) + lit(b)
  }

  /** (id, sig: array<long>[k]) MinHash signatures over word shingles.
    * One explode + one groupBy(id) — shuffles only (id, k longs) per doc.
    */
  def minhashSignatures(df: DataFrame, idCol: String, textCol: String,
      numHashes: Int = 16, shingleSize: Int = 3): DataFrame = {
    // materialize token hashes in their own projection (CollapseProject
    // keeps multi-referenced non-cheap aliases), then explode shingle hashes
    val withTh = df.select(col(idCol).as("id"), tokenHashes(col(textCol)).as("__th"))
    val sh = withTh.select(col("id"),
      explode(shingleHashesFromTokenHashes(col("__th"), shingleSize)).as("h"))
    val mins = (0 until numHashes).map(i => min(permuted(col("h"), i)).as(s"m$i"))
    sh.groupBy("id").agg(mins.head, mins.tail: _*)
      .select(col("id"), array((0 until numHashes).map(i => col(s"m$i")): _*).as("sig"))
  }

  /** Candidate near-dup pairs from banded signatures: docs agreeing on any
    * band collide. `maxBucket` caps pathological buckets (constant shingles)
    * to bound the pair blow-up at scale.
    */
  def lshCandidatePairs(sig: DataFrame, bands: Int = 4, maxBucket: Int = 64): DataFrame = {
    val banded = sig.select(col("id"),
      posexplode(transform(sequence(lit(0), lit(bands - 1)),
        b => xxhash64(concat_ws(",",
          slice(col("sig"), b * (size(col("sig")) / bands) + 1,
            size(col("sig")) / bands).cast("array<string>")), b))))
      .select(col("id"), col("pos").as("band"), col("col").as("bh"))
    val capped = banded.groupBy("band", "bh")
      .agg(sort_array(collect_list("id")).as("ids"), count(lit(1)).as("n"))
      .filter(col("n") > 1 && col("n") <= maxBucket)
    capped.select(explode(expr(
      "flatten(transform(ids, (x, i) -> transform(slice(ids, i + 2, size(ids)), y -> struct(x as id1, y as id2))))"))
      .as("p"))
      .select(col("p.id1"), col("p.id2")).distinct()
  }

  /** Verified near-duplicate pairs: LSH candidates + exact shingle-set
    * Jaccard ≥ threshold. Joins shingle sets only for candidates.
    */
  def nearDuplicatePairs(df: DataFrame, idCol: String, textCol: String,
      threshold: Double = 0.7, numHashes: Int = 16, shingleSize: Int = 3,
      bands: Int = 4): DataFrame = {
    val sig = minhashSignatures(df, idCol, textCol, numHashes, shingleSize)
    val cands = lshCandidatePairs(sig, bands)
    val sets = df.select(col(idCol).as("id"), tokenHashes(col(textCol)).as("__th"))
      .select(col("id"),
        array_distinct(shingleHashesFromTokenHashes(col("__th"), shingleSize)).as("sset"))
    cands
      .join(sets.withColumnRenamed("id", "id1").withColumnRenamed("sset", "s1"), "id1")
      .join(sets.withColumnRenamed("id", "id2").withColumnRenamed("sset", "s2"), "id2")
      .select(col("id1"), col("id2"),
        (size(array_intersect(col("s1"), col("s2"))).cast("double") /
          size(array_union(col("s1"), col("s2")))).as("jaccard"))
      .filter(col("jaccard") >= threshold)
  }

  /** Exact n-gram Jaccard similarity for all LSH-candidate pairs (no
    * threshold) — building block for similarity-histogram analyses.
    */
  def ngramJaccardPairs(df: DataFrame, idCol: String, textCol: String,
      shingleSize: Int = 3, numHashes: Int = 16, bands: Int = 8): DataFrame =
    nearDuplicatePairs(df, idCol, textCol, threshold = 0.0, numHashes, shingleSize, bands)

  // ---- SimHash -------------------------------------------------------------

  /** (id, simhash: long). 64-bit SimHash: per token-hash bit, +1/−1 vote;
    * sign of the vote sum sets the bit. Explode + one groupBy; the 64 votes
    * are plain conditional sums (fully codegen).
    */
  def simhash(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val tok = df.select(col(idCol).as("id"), explode(tokens(col(textCol))).as("t"))
      .select(col("id"), xxhash64(col("t")).as("h"))
    val votes = (0 until 64).map { b =>
      sum(when(shiftright(col("h"), b).bitwiseAND(1) === 1, 1).otherwise(-1)).as(s"v$b")
    }
    val agg = tok.groupBy("id").agg(votes.head, votes.tail: _*)
    val bits = (0 until 64).map(b =>
      when(col(s"v$b") > 0, lit(1L << b)).otherwise(lit(0L)))
    agg.select(col("id"), bits.reduce((a, c) => a.bitwiseOR(c)).as("simhash"))
  }

  /** Near-duplicate pairs by SimHash Hamming distance ≤ maxHamming, using
    * 16-bit band collision (any identical quarter ⇒ candidate, guaranteed to
    * catch all pairs with ≤ 3 differing bits... for maxHamming ≤ 3 with 4
    * bands by pigeonhole) then popcount verification.
    */
  def simhashNearDuplicates(df: DataFrame, idCol: String, textCol: String,
      maxHamming: Int = 3): DataFrame =
    simhashNearDuplicatesFromHashes(simhash(df, idCol, textCol), maxHamming)

  /** Same, over an already-computed (id, simhash) frame — reuse the hash
    * pass when callers also need the signatures.
    */
  def simhashNearDuplicatesFromHashes(sh: DataFrame,
      maxHamming: Int = 3): DataFrame = {
    val banded = sh.select(col("id"), col("simhash"),
      posexplode(array((0 until 4).map(q =>
        shiftright(col("simhash"), q * 16).bitwiseAND(0xFFFFL)): _*)))
      .select(col("id"), col("simhash"), col("pos").as("q"), col("col").as("chunk"))
    val l = banded.select(col("q"), col("chunk"), col("id").as("id1"), col("simhash").as("h1"))
    val r = banded.select(col("q"), col("chunk"), col("id").as("id2"), col("simhash").as("h2"))
    l.join(r, Seq("q", "chunk")).filter(col("id1") < col("id2"))
      .select(col("id1"), col("id2"),
        bit_count(col("h1").bitwiseXOR(col("h2"))).as("hamming"))
      .distinct()
      .filter(col("hamming") <= maxHamming)
  }
}
