package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
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
  * at scale: buckets larger than `maxBucket` are routed through a distributed
  * self-join (never collected into a single `collect_list` row, never
  * dropped); `lshBucketStats` surfaces the oversized-bucket volume.
  */
object Dedup {

  def tokens(text: Column): Column = split(lower(text), "\\s+")

  /** Cross-engine-reproducible 60-bit token hash: the first 15 hex digits of
    * md5, parsed base-16. Slower than xxhash64 (crypto hash) but computable
    * bit-for-bit by any engine with md5 — used by the oracle-verified
    * portable SimHash; prefer `xxhash64` paths for pure-Spark pipelines.
    */
  def portableTokenHash(t: Column): Column =
    conv(substring(md5(t.cast("binary")), 1, 15), 16, 10).cast("long")

  /** Word n-gram shingles; empty array when the document is shorter than n. */
  def shingles(text: Column, n: Int = 3): Column =
    // tokenization let-bound (see bindOnce): the slice-per-position lambda
    // would otherwise re-tokenize the document once per shingle position
    // when the optimizer inlines the projection (measured 4x on the q65
    // bigram explode at sf0.1)
    graft.core.Exprs.bindOnce(tokens(text), t =>
      when(size(t) < n, array().cast("array<string>"))
        .otherwise(transform(sequence(lit(0), size(t) - n),
          i => concat_ws(" ", slice(t, i + lit(1), lit(n))))))

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

  /** See [[graft.core.Exprs.bindOnce]] — re-exported for local readability. */
  private def bindOnce(value: Column, body: Column => Column): Column =
    graft.core.Exprs.bindOnce(value, body)

  /** Shingle hashes straight from per-token hashes (no n-gram string
    * building): hash each token once, combine n consecutive hashes with
    * distinct odd multipliers. ~5× cheaper than string shingles on the hot
    * explode path; collision probability is negligible for dedup purposes.
    * Pass a column that already holds `transform(tokens, xxhash64)` — it is
    * let-bound here ([[bindOnce]]), so callers need no materialization
    * barrier between the token-hash projection and this one.
    */
  def shingleHashesFromTokenHashes(th: Column, n: Int): Column =
    bindOnce(th, thv =>
      when(size(thv) < n, array().cast("array<bigint>"))
        .otherwise(transform(sequence(lit(0), size(thv) - n),
          i => (0 until n).map(j =>
            element_at(thv, i + lit(j + 1)) * lit(0x9E3779B97F4A7C15L * (2L * j + 1)))
            .reduce(_ + _))))

  def tokenHashes(text: Column): Column = transform(tokens(text), t => xxhash64(t))

  /** Order-sensitive token-stream fingerprint, cross-engine portable:
    * modular polynomial rolling hash over portable token hashes. The modulus
    * (1e9+7) keeps every intermediate in non-overflowing BIGINT range —
    * DuckDB ERRORS on 64-bit overflow where Spark wraps, so the full-width
    * xxhash64 variant ([[graft.ext.TextStats.fingerprint]]) is NOT oracle
    * computable; this one is. Documents equal up to whitespace runs collapse
    * to the same fingerprint (tokenizer-normalized identity).
    */
  def portableFingerprint(text: Column): Column = {
    val m = lit(1000000007L)
    aggregate(transform(tokens(text), t => pmod(portableTokenHash(t), m)),
      lit(0L), (acc, h) => pmod(acc * lit(1000003L) + h, m))
  }

  /** 1-row whitespace-robust dedup summary over a precomputed fingerprint
    * column — the token-stream analog of [[exactStats]].
    */
  def fingerprintStats(fps: DataFrame, fpCol: String = "fp"): DataFrame =
    fps.agg(
      count(lit(1)).as("n_docs"),
      countDistinct(col(fpCol)).as("n_fingerprints"),
      (count(lit(1)) - countDistinct(col(fpCol))).as("n_dup_rows"))

  // ---- MinHash + LSH -------------------------------------------------------

  /** Deterministic affine permutations of a 64-bit base hash (mod 2^64 wrap). */
  private def permuted(h: Column, i: Int): Column = {
    // odd multipliers + offsets derived from splitmix64 of the index
    val a = 0x9E3779B97F4A7C15L * (2L * i + 1)
    val b = 0xBF58476D1CE4E5B9L * (i + 1)
    h * lit(a) + lit(b)
  }

  /** (id, sig: array<long>[k]) MinHash signatures over word shingles —
    * computed ROW-LOCALLY: each permutation's minimum is `array_min` over
    * the transformed shingle-hash array, a pure projection with NO shuffle
    * at all. Measured 8.5× faster than the explode + groupBy(id) min-agg
    * formulation at sf0.1 (the interpreted HOF lambda is far cheaper than
    * shuffling exploded rows through a hash aggregate), and at 100 TB it
    * removes the one shuffle the signature stage had. Docs with no shingles
    * (shorter than the shingle size) drop out, as before.
    */
  def minhashSignatures(df: DataFrame, idCol: String, textCol: String,
      numHashes: Int = 16, shingleSize: Int = 3): DataFrame = {
    // the shingle-less-doc filter must sit BELOW the projections and use only
    // source columns: a filter on __sh between the projections gets
    // predicate-pushed through them, which lets CollapseProject inline the
    // whole shingle pipeline into every one of the numHashes array_min
    // references (measured 25× regression). Filtering on the raw token count
    // costs one extra tokenize per row and keeps the projections intact
    // (CollapseProject leaves multi-referenced non-cheap aliases alone).
    val enough = df.filter(size(tokens(col(textCol))) >= lit(shingleSize))
    val withTh = enough.select(col(idCol).as("id"), tokenHashes(col(textCol)).as("__th"))
    val sh = withTh.select(col("id"),
      shingleHashesFromTokenHashes(col("__th"), shingleSize).as("__sh"))
    sh.select(col("id"), array((0 until numHashes).map(i =>
      array_min(transform(col("__sh"), h => permuted(h, i)))): _*).as("sig"))
  }

  /** (id, band, bh) banded-signature rows: one row per (doc, band), keyed by
    * the hash of that band's signature slice.
    */
  private def bandedSignatures(sig: DataFrame, bands: Int, numHashes: Int): DataFrame = {
    require(numHashes % bands == 0, s"numHashes $numHashes must divide into $bands bands")
    val perBand = numHashes / bands
    // band hash = variadic xxhash64 over the band's raw signature longs
    // (numeric, codegen'd) — the previous cast-to-string + concat_ws built a
    // string per band per doc, which dominated the banding stage's cost.
    // sig is let-bound: this select feeds a posexplode, and the Generate
    // pushdown would otherwise inline an unmaterialized signature pipeline
    // into all bands×perBand element_at references (see bindOnce).
    val bandHashArray = bindOnce(col("sig"), s =>
      array((0 until bands).map { b =>
        xxhash64(lit(b) +: (0 until perBand).map(j =>
          element_at(s, b * perBand + j + 1)): _*)
      }: _*))
    sig.select(col("id"), posexplode(bandHashArray))
      .select(col("id"), col("pos").as("band"), col("col").as("bh"))
  }

  /** Candidate near-dup pairs from banded signatures: docs agreeing on any
    * band collide. NOTHING is dropped: buckets of size ≤ `maxBucket` use the
    * cheap collect_list pair expansion; larger (pathological) buckets are
    * routed through a distributed self-join so a mega-bucket never has to fit
    * in one aggregation row — AQE skew handling splits the hot key. The pair
    * OUTPUT of a mega-bucket is inherently quadratic; callers that only need
    * connectivity should dedup via components instead. `lshBucketStats`
    * reports the oversized volume (no silent caps).
    */
  def lshCandidatePairs(sig: DataFrame, bands: Int = 4, maxBucket: Int = 64,
      numHashes: Int = 16): DataFrame = {
    val banded = bandedSignatures(sig, bands, numHashes)
    // bucket size via a window over (band, bh) instead of a separate
    // aggregate + self-join: ONE exchange that every downstream branch
    // (small-bucket pair expansion, oversized self-join) reuses — with the
    // old two-branch join the whole signature lineage was computed twice
    val w = org.apache.spark.sql.expressions.Window.partitionBy("band", "bh")
    val keyed = banded.withColumn("n", count(lit(1)).over(w)).filter(col("n") > 1)
    val small = keyed.filter(col("n") <= maxBucket)
      .groupBy("band", "bh")
      .agg(sort_array(collect_list("id")).as("ids"))
      .select(explode(expr(
        "flatten(transform(ids, (x, i) -> transform(slice(ids, i + 2, size(ids)), y -> struct(x as id1, y as id2))))"))
        .as("p"))
      .select(col("p.id1"), col("p.id2"))
    val bigIds = keyed.filter(col("n") > maxBucket).select("band", "bh", "id")
    val big = bigIds.select(col("band"), col("bh"), col("id").as("id1"))
      .join(bigIds.select(col("band"), col("bh"), col("id").as("id2")), Seq("band", "bh"))
      .filter(col("id1") < col("id2"))
      .select(col("id1"), col("id2"))
    small.union(big).distinct()
  }

  /** One-row audit of LSH bucket skew: total/oversized bucket counts and the
    * row volume routed to the distributed-join path. Surfaces what a silent
    * cap would hide; an oversized count > 0 means the corpus has degenerate
    * near-constant content worth investigating upstream.
    */
  def lshBucketStats(sig: DataFrame, bands: Int = 4, maxBucket: Int = 64,
      numHashes: Int = 16): DataFrame =
    bandedSignatures(sig, bands, numHashes)
      .groupBy("band", "bh").agg(count(lit(1)).as("n"))
      .agg(count(lit(1)).as("n_buckets"),
        // every aggregate coalesced: on an empty signature frame sum()/max()
        // are NULL and audit readers would NPE on getAs[Long]
        coalesce(sum((col("n") > 1).cast("long")), lit(0L)).as("n_colliding_buckets"),
        coalesce(sum((col("n") > maxBucket).cast("long")), lit(0L)).as("n_oversized_buckets"),
        coalesce(sum(when(col("n") > maxBucket, col("n"))), lit(0L)).as("n_oversized_rows"),
        coalesce(max(col("n")), lit(0L)).as("max_bucket"))

  /** Verified near-duplicate pairs: LSH candidates + exact shingle-set
    * Jaccard ≥ threshold. Joins shingle sets only for candidates.
    *
    * Note: Jaccard here is over combined 64-bit shingle TOKEN-HASHES while
    * the DuckDB q18 oracle uses distinct shingle strings — an (astronomically
    * unlikely) additive-hash collision would shift this side's Jaccard.
    * If a q18 hash_match investigation ever starts, start at the hashing.
    */
  def nearDuplicatePairs(df: DataFrame, idCol: String, textCol: String,
      threshold: Double = 0.7, numHashes: Int = 16, shingleSize: Int = 3,
      bands: Int = 4): DataFrame =
    nearDuplicatePairsFromSignatures(
      minhashSignatures(df, idCol, textCol, numHashes, shingleSize),
      shingleSets(df, idCol, textCol, shingleSize),
      threshold, numHashes, bands)

  /** (id, sset) distinct shingle-hash sets — the exact-verification side of
    * the MinHash pipeline, exposed so callers can materialize/cache it
    * (sets are built for the WHOLE corpus deliberately: restricting them to
    * candidate ids via a semi-join embeds the candidate pipeline into both
    * verify-join branches, and AQE does not reuse that exchange — measured
    * 5× slower. A 100-TB pipeline should MATERIALIZE candidates first, then
    * verify against sets built for candidate ids only).
    */
  def shingleSets(df: DataFrame, idCol: String, textCol: String,
      shingleSize: Int = 3): DataFrame =
    df.select(col(idCol).as("id"), tokenHashes(col(textCol)).as("__th"))
      .select(col("id"),
        array_distinct(shingleHashesFromTokenHashes(col("__th"), shingleSize)).as("sset"))

  /** Verified pairs from precomputed signature + shingle-set frames — lets
    * per-session pipelines cache the two per-row stages and pay only the
    * candidate join + verification per run.
    */
  def nearDuplicatePairsFromSignatures(sig: DataFrame, sets: DataFrame,
      threshold: Double, numHashes: Int, bands: Int): DataFrame = {
    val cands = lshCandidatePairs(sig, bands, numHashes = numHashes)
    cands
      .join(sets.withColumnRenamed("id", "id1").withColumnRenamed("sset", "s1"), "id1")
      .join(sets.withColumnRenamed("id", "id2").withColumnRenamed("sset", "s2"), "id2")
      .select(col("id1"), col("id2"),
        (size(array_intersect(col("s1"), col("s2"))).cast("double") /
          size(array_union(col("s1"), col("s2")))).as("jaccard"))
      .filter(col("jaccard") >= threshold)
  }

  /** EXACT Jaccard self-join via prefix filtering — every pair of sets with
    * J(A,B) ≥ `threshold`, no approximation and no O(n²) pair space. Each
    * set contributes only the `|A| − ⌈t·|A|⌉ + 1` elements that sort FIRST
    * under a global rarest-first order (document frequency, element
    * tiebreak) to the candidate inverted index; the prefix-filtering
    * principle (Chaudhuri et al., ICDE'06; Xiao et al., WWW'08 — public
    * literature) guarantees two sets with J ≥ t share at least one prefix
    * element under ANY common total order, so the prefix equi-join has
    * total recall, and the exact intersect/union verification on candidates
    * makes precision 1. The MinHash path trades exactness for a cheaper
    * candidate stage; this is the exact complement for thresholds where the
    * prefix tail stays small.
    *
    * 100-TB shape: the join keys are the frequency TAIL of the vocabulary
    * (rarest elements), so hot common tokens never become join keys — the
    * candidate index is naturally skew-resistant, the opposite of a naive
    * shared-token join. Stages: one explode + keyed count (df), one
    * per-set-keyed window for the prefix cut, one equi-join on prefix
    * elements, exact verification on candidates only.
    *
    * `⌈t·|A|⌉` is evaluated as `ceil(round(t·|A|, 6))` so an IEEE product a
    * half-ulp above an exact integer cannot shrink the prefix below the
    * lossless bound.
    *
    * Input: `(id, sset)` with `sset` the DISTINCT element array (e.g.
    * [[shingleSets]]); empty sets are dropped (J undefined). Output:
    * `(id1 < id2, jaccard)` unrounded.
    */
  def prefixFilterJaccardPairs(sets: DataFrame, threshold: Double): DataFrame =
    prefixFilterJaccardPairsFromIndex(
      jaccardPrefixIndex(sets, threshold), sets, threshold)

  /** The candidate-generation index for [[prefixFilterJaccardPairs]]:
    * `(id, sz, rk, g)` — one row per PREFIX element, where `rk` is the
    * element's 1-based rank within its set under the global rarest-first
    * order and `sz` the full set size. Split out so pipelines can
    * materialize/cache it once: the pair stage self-joins this frame, and
    * without a cache boundary the explode + doc-frequency join + window
    * would execute twice (once per join side).
    */
  def jaccardPrefixIndex(sets: DataFrame, threshold: Double): DataFrame = {
    require(threshold > 0 && threshold <= 1,
      s"threshold=$threshold must be in (0, 1]")
    val ex = sets.select(col("id"), size(col("sset")).as("sz"),
      explode(col("sset")).as("g"))
    val dfreq = ex.groupBy("g").agg(count(lit(1)).as("df"))
    val w = Window.partitionBy("id").orderBy(col("df"), col("g"))
    ex.join(dfreq, "g")
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= col("sz") - ceil(round(lit(threshold) * col("sz"), 6)) + 1)
      .select(col("id"), col("sz"), col("rk"), col("g"))
  }

  /** Pair mining + exact verification over a (possibly cached)
    * [[jaccardPrefixIndex]] frame. Two ppjoin-style lossless prunes run
    * inside the candidate equi-join, BEFORE the per-pair shuffle:
    *
    *  - length filter: `J ≥ t ⟹ t·max(|A|,|B|) ≤ |A∩B| ≤ min(|A|,|B|)`,
    *    so candidates with `min < t·max` cannot verify;
    *  - positional filter: for a shared element at sorted rank `i` in A and
    *    `j` in B, `|A∩B| ≤ min(i−1, j−1) + 1 + min(|A|−i, |B|−j)` (common
    *    elements split into strictly-before / this one / strictly-after the
    *    match under the shared total order); prune when that bound is below
    *    the required overlap `⌈t·(|A|+|B|)/(1+t)⌉`.
    *
    * A qualifying pair keeps EVERY matching prefix row (each per-row bound
    * dominates the true overlap, which meets the requirement), so recall is
    * untouched; measured at sf0.1/t=0.4 the two prunes drop the verification
    * load 2.5× (555k → 217k candidate rows). The surviving pairs get one
    * more pair-level prune — the MIN of their per-row bounds, free in the
    * same aggregation that dedups candidate rows — then exact
    * intersect/union verification.
    */
  def prefixFilterJaccardPairsFromIndex(prefix: DataFrame, sets: DataFrame,
      threshold: Double): DataFrame = {
    require(threshold > 0 && threshold <= 1,
      s"threshold=$threshold must be in (0, 1]")
    // required |A∩B| for J ≥ t; round-guarded so an IEEE product a half-ulp
    // above the exact rational cannot raise the ceiling
    def required(sz1: Column, sz2: Column): Column =
      ceil(round(lit(threshold / (1 + threshold)) * (sz1 + sz2), 6))
    val bound =
      least(col("a.rk"), col("b.rk")) - 1 + lit(1) +
        least(col("a.sz") - col("a.rk"), col("b.sz") - col("b.rk"))
    val cands = prefix.as("a")
      .join(prefix.as("b"),
        col("a.g") === col("b.g") && col("a.id") < col("b.id") &&
          least(col("a.sz"), col("b.sz")) >=
            round(lit(threshold) * greatest(col("a.sz"), col("b.sz")), 6) &&
          bound >= required(col("a.sz"), col("b.sz")))
      .groupBy(col("a.id").as("id1"), col("b.id").as("id2"))
      .agg(min(bound).as("min_bound"),
        first(required(col("a.sz"), col("b.sz"))).as("req"))
      .filter(col("min_bound") >= col("req"))
      .select("id1", "id2")
    cands
      .join(sets.select(col("id").as("id1"), col("sset").as("s1")), "id1")
      .join(sets.select(col("id").as("id2"), col("sset").as("s2")), "id2")
      .select(col("id1"), col("id2"),
        (size(array_intersect(col("s1"), col("s2"))).cast("double") /
          size(array_union(col("s1"), col("s2")))).as("jaccard"))
      .filter(col("jaccard") >= threshold)
  }

  /** Benchmark decontamination report: corpus docs sharing ≥ `minOverlap`
    * distinct `shingleSize`-gram shingles with ANY benchmark document —
    * the test-set-overlap removal stage of a training pipeline (cross-corpus
    * containment, not within-corpus dedup). The benchmark's distinct shingle
    * set is broadcast (benchmark suites are small by definition); the corpus
    * is touched in one exploded pass + one aggregation. Returns
    * (id, n_overlap) for flagged docs; anti-join the ids to decontaminate.
    * Overlap counts are over 64-bit shingle hashes (same collision caveat
    * as [[nearDuplicatePairs]]).
    */
  def contaminationReport(corpus: DataFrame, benchmark: DataFrame,
      idCol: String, textCol: String, shingleSize: Int = 3,
      minOverlap: Int = 5): DataFrame =
    contaminationReportFromSets(
      shingleSets(corpus, idCol, textCol, shingleSize),
      shingleSets(benchmark, idCol, textCol, shingleSize), minOverlap)

  /** Report from precomputed (id, sset) frames — lets pipelines reuse a
    * materialized/cached shingle pass (the per-row shingle expression is the
    * expensive stage; q44 shares q18's cached sets).
    */
  def contaminationReportFromSets(corpusSets: DataFrame, benchmarkSets: DataFrame,
      minOverlap: Int): DataFrame = {
    val bench = broadcast(
      benchmarkSets.select(explode(col("sset")).as("__g")).distinct())
    corpusSets
      .select(col("id"), explode(col("sset")).as("__g"))
      .join(bench, Seq("__g"))
      // sset is distinct per doc, so each (id, shingle) row is unique and
      // the plain count IS the distinct-overlap count
      .groupBy("id").agg(count(lit(1)).as("n_overlap"))
      .filter(col("n_overlap") >= minOverlap)
  }

  /** Per-document duplicated-SPAN statistics — passage-level dedup signal
    * (à la "Deduplicating Training Data Makes Language Models Better",
    * Lee et al. 2022, but windowed-hash instead of suffix-array): a span is
    * a `spanTokens`-token window; a span is DUPLICATED if it occurs in more
    * than one document. Returns (id, n_spans, n_shared_spans, dup_fraction)
    * for every doc long enough to have a span.
    *
    * Shape: inverted index on span hashes — explode distinct spans, count
    * doc-frequency per span (one shuffle on the span hash, map-side
    * combined), join the >1-doc spans back, re-aggregate per doc. No
    * all-pairs stage anywhere, so unlike pairwise MinHash this stays linear
    * in corpus size at 100 TB.
    * Span identity is the combined 64-bit token-hash (collision caveat as
    * [[nearDuplicatePairs]]).
    *
    * Hot-key note: a boilerplate span shared by ~every doc concentrates the
    * join-back's left rows on one reducer, and AQE's skew-join split cannot
    * see this join — its right side is an aggregate output inside the same
    * stage, not the bare `Sort(ShuffleQueryStage)` shape OptimizeSkewedJoin
    * pattern-matches (verified empirically, including under
    * `forceOptimizeSkewedJoin`). `salts > 1` routes around it: the spans
    * side salts deterministically by doc id, the (small, one-row-per-
    * distinct-shared-span) side replicates `salts`×, and the join key
    * becomes (span, salt) — a planted df=100k span's rows then spread
    * across `salts` reducers instead of one. Identical results by
    * construction (ScaleSpec asserts both equality and the reducer-balance
    * bound at 100k docs).
    */
  def spanDuplication(df: DataFrame, idCol: String, textCol: String,
      spanTokens: Int = 8, salts: Int = 1): DataFrame = {
    require(salts >= 1, s"salts=$salts must be >= 1")
    val sets = shingleSets(df, idCol, textCol, spanTokens)
    val spans = sets.select(col("id"), explode(col("sset")).as("__g"))
    // sset is distinct per doc → count(*) per span IS its doc-frequency
    val shared = spans.groupBy("__g").agg(count(lit(1)).as("__df"))
      .filter(col("__df") > 1).select("__g")
    val joined =
      if (salts == 1) spans.join(shared, Seq("__g"))
      else spans.withColumn("__salt", pmod(xxhash64(col("id")), lit(salts.toLong)))
        .join(shared.select(col("__g"),
          explode(sequence(lit(0L), lit(salts.toLong - 1))).as("__salt")),
          Seq("__g", "__salt"))
    val perDoc = joined
      .groupBy("id").agg(count(lit(1)).as("n_shared_spans"))
    sets.select(col("id"), size(col("sset")).cast("long").as("n_spans"))
      .filter(col("n_spans") > 0)
      .join(perDoc, Seq("id"), "left")
      .select(col("id"), col("n_spans"),
        coalesce(col("n_shared_spans"), lit(0L)).as("n_shared_spans"))
      .withColumn("dup_fraction",
        col("n_shared_spans").cast("double") / col("n_spans"))
  }

  /** Longest shared contiguous token run per document pair — the
    * exact-substring EXTENT signal of suffix-array dedup ("Deduplicating
    * Training Data…", Lee et al. 2022), re-expressed shuffle-native with no
    * suffix array: [[spanDuplication]] counts how MANY k-token windows a doc
    * shares with the corpus; this answers the follow-up the dedup decision
    * actually needs — whether those windows chain into one long verbatim
    * passage (crawl duplication, licence boilerplate → cut the span) or sit
    * as scattered idioms (leave the doc alone).
    *
    * Shape, every stage linear in matched volume:
    *   1. positional k-gram hashes `(id, pos, h)` — one projection+explode;
    *   2. doc-frequency band: k-grams in fewer than 2 or more than `maxDf`
    *      docs are dropped BEFORE pairing. The cap is the megacorpus guard —
    *      a boilerplate k-gram present in 10⁶ docs would emit ~10¹² pair
    *      rows; a capped k-gram can only interrupt (never extend) a shared
    *      run, so reported runs are conservative on hyper-common text and
    *      exact everywhere else. Band check AND pairing share ONE exchange:
    *      positions shuffle once keyed by `h`; the band test runs as
    *      spillable (h)-keyed windows BEFORE any aggregation buffering
    *      (r14 — a hyper-common k-gram streams through the test and is
    *      discarded, never collected), and only banded groups are
    *      collected, so the buffered list is bounded by `maxDf` docs ×
    *      per-doc occurrences. This replaced the former keep-aggregate +
    *      two-sided self-join, which shuffled the position table three
    *      times (optimization guide §2.3/§2.4 — r13: 3 position-table
    *      exchanges → 1, sf0.1 bench 2.1 s → 1.56 s);
    *   3. row-local pair expansion within each banded group (two chained
    *      generators, `id_a < id_b`) → matched positions
    *      `(id_a, id_b, pa, pb)` — fan-out per position ≤ maxDf, exactly
    *      the pair set the equi-join emitted;
    *   4. anti-diagonal gaps-and-islands: within `(id_a, id_b, pa − pb)`,
    *      consecutive `pa` form one island = one contiguous shared run of
    *      `island_len + k − 1` tokens (same islands primitive as the streak
    *      and drawdown-episode operators, keyed by pair+diagonal).
    * Steps 3–4 shuffle only MATCHED positions keyed by (id_a, id_b, diag) —
    * never the n² pair space, never a global sort. 64-bit combined-hash
    * identity (collision caveat as [[nearDuplicatePairs]]).
    *
    * @return (id_a < id_b, longest_run, n_runs, n_matched) for pairs whose
    *         longest run is at least `minRun` tokens; `n_matched` is the
    *         pair's total matched k-gram positions, `n_runs` its island count.
    */
  def longestSharedRuns(df: DataFrame, idCol: String, textCol: String,
      k: Int = 8, maxDf: Int = 64, minRun: Int = 16): DataFrame = {
    require(k >= 2, s"k=$k must be >= 2")
    require(maxDf >= 2, s"maxDf=$maxDf must be >= 2")
    val pos = df.select(col(idCol).as("id"),
      posexplode(shingleHashesFromTokenHashes(tokenHashes(col(textCol)), k))
        .as(Seq("pos", "h")))
    // band filter + pairing in ONE shuffle: positions exchange once keyed by
    // hash; the df band is applied through a pair of (h)-keyed WINDOWS
    // (distinct-id index via dense_rank over id, group doc-count as its
    // partition max) BEFORE anything is buffered in an aggregation row —
    // WindowExec spills its per-group buffer to disk, so a hyper-common
    // k-gram (the 10⁶-doc boilerplate case above) streams through the band
    // test and is discarded without ever being collected (r14, round-13
    // advice: the r13 shape collect_list'ed the whole group FIRST and
    // band-tested after, an unspillable aggregation-buffer OOM at scale).
    // Only banded groups reach collect_list, whose buffered list is then
    // genuinely bounded: ≤ maxDf docs × per-doc occurrences of one k-gram.
    // The windows reuse the single hash(h) exchange (dense_rank sorts
    // (h, id); the partition-max window and the groupBy(h) both reuse that
    // clustering), so the r13 one-shuffle shape is preserved.
    val wDr = Window.partitionBy("h").orderBy("id")
    val banded = pos
      .withColumn("__dr", dense_rank().over(wDr))
      .withColumn("__ndoc", max(col("__dr")).over(Window.partitionBy("h")))
      .filter(col("__ndoc").between(2, maxDf))
    val grouped = banded.groupBy("h")
      .agg(collect_list(struct(col("id"), col("pos"))).as("__items"))
    val m = grouped
      .select(col("__items"), explode(col("__items")).as("a"))
      .select(col("a"), explode(col("__items")).as("b"))
      .filter(col("a.id") < col("b.id"))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"),
        col("a.pos").as("pa"), col("b.pos").as("pb"))
    val wIsl = Window.partitionBy("id_a", "id_b", "__diag").orderBy("pa")
    m.withColumn("__diag", col("pa") - col("pb"))
      .withColumn("__grp", col("pa") - row_number().over(wIsl))
      .groupBy("id_a", "id_b", "__diag", "__grp")
      .agg(count(lit(1)).as("__len"))
      .groupBy("id_a", "id_b")
      .agg((max(col("__len")) + lit(k - 1L)).as("longest_run"),
        count(lit(1)).as("n_runs"),
        sum(col("__len")).as("n_matched"))
      .filter(col("longest_run") >= minRun)
  }

  /** Build the benchmark-span Bloom filter alone — a reusable input artifact
    * (like cached signatures/shingle sets): sessions probing one benchmark
    * many times should build it once and pass it to the report overload.
    */
  def benchmarkBloomFilter(benchmarkSets: DataFrame,
      fpp: Double = 0.01): org.apache.spark.util.sketch.BloomFilter = {
    val bench = benchmarkSets.select(explode(col("sset")).as("__g")).distinct()
    val nBench = math.max(bench.count(), 1L)
    bench.stat.bloomFilter("__g", nBench, fpp)
  }

  /** [[contaminationReportFromSets]] with a broadcast Bloom prefilter — the
    * 100-TB-shaped variant. The exact formulation must shuffle (or at least
    * join-probe) EVERY exploded corpus span; here a Bloom filter built once
    * over the benchmark's distinct spans (driver-side `stat.bloomFilter`,
    * ~1.2 bytes/span at 1% fpp — a 10⁹-span benchmark is ~1.2 GB, broadcast
    * range) drops ~(1−fpp) of clean spans BEFORE anything wide happens.
    * Survivors still go through the exact join, so the OUTPUT has no false
    * positives — bit-identical to the exact path (asserted in ExtSpec).
    * The probe is the builtin `BloomFilterMightContain` expression (via
    * [[org.apache.spark.sql.graft.SqlBridge.bloomMightContain]]) — fully
    * codegen'd, no UDF — with the serialized sketch embedded as a foldable
    * literal (the expression's requirement). Sketches past a 64 MB literal
    * budget fall back to the broadcast-variable UDF probe: a plan-embedded
    * literal travels with every task closure, while a broadcast ships once
    * per executor — the right trade flips with sketch size.
    */
  def bloomContaminationReportFromSets(corpusSets: DataFrame,
      benchmarkSets: DataFrame, minOverlap: Int, fpp: Double = 0.01,
      prebuilt: Option[org.apache.spark.util.sketch.BloomFilter] = None): DataFrame = {
    val bench = benchmarkSets.select(explode(col("sset")).as("__g")).distinct()
    val bf = prebuilt.getOrElse(benchmarkBloomFilter(benchmarkSets, fpp))
    // decide the path from bitSize BEFORE serializing: a ~1.2 GB sketch
    // must not be copied through a growing byte stream just to learn it is
    // too big for the literal path
    val probe: Column =
      if (bf.bitSize() / 8 <= (64L << 20)) {
        val bos = new java.io.ByteArrayOutputStream()
        bf.writeTo(bos)
        org.apache.spark.sql.graft.SqlBridge.bloomMightContain(bos.toByteArray, col("__g"))
      } else {
        val bc = corpusSets.sparkSession.sparkContext.broadcast(bf)
        udf((g: Long) => bc.value.mightContainLong(g)).apply(col("__g"))
      }
    corpusSets.select(col("id"), explode(col("sset")).as("__g"))
      .filter(probe)
      .join(broadcast(bench), Seq("__g"))
      .groupBy("id").agg(count(lit(1)).as("n_overlap"))
      .filter(col("n_overlap") >= minOverlap)
  }

  /** Connected components over a near-duplicate pair list (id1, id2) —
    * dedup GROUPS, the pipeline's end product (keep one doc per group).
    * Adaptive: edge lists within a bounded driver budget are solved by a
    * single-collect union-find (one job); larger graphs run distributed
    * min-label propagation — every node starts labeled with its own id,
    * each iteration joins labels across edges and keeps the minimum, until
    * a fixpoint. Iteration count is bounded by the largest component's
    * diameter (near-dup components are shallow in practice); every step is
    * joins + aggregation — the driver only checks convergence counts, never
    * touches graph data beyond the bounded probe. Returns (id, group_id)
    * with group_id = the component's minimum doc id.
    */
  def duplicateGroups(pairs: DataFrame, maxIter: Int = 30,
      driverEdgeThreshold: Int = 1 << 20): DataFrame = {
    val idType = pairs.schema("id1").dataType
    val integralIds = Set[org.apache.spark.sql.types.DataType](
      org.apache.spark.sql.types.ByteType, org.apache.spark.sql.types.ShortType,
      org.apache.spark.sql.types.IntegerType, org.apache.spark.sql.types.LongType
    ).contains(idType)
    // materialize the edge list ONCE: both the probe below and the
    // distributed path read the checkpointed partitions, so deciding the
    // path never re-executes an expensive upstream pair pipeline
    val edgeList = pairs.select(col("id1"), col("id2")).localCheckpoint()
    // ADAPTIVE fast path (integral ids only — union-find keys are longs):
    // near-dup graphs are almost always tiny relative to the corpus (pairs,
    // not rows). When the edge list fits a bounded driver budget (default
    // 2^20 edges — same bounded-driver contract as IVF centroid training;
    // the collect is transient Rows, tens of MB at the default), a single
    // collect + union-find replaces ~log(n) scheduler rounds of 3-4 jobs
    // each. Larger graphs and non-numeric ids take the distributed
    // fixed-point below, unchanged.
    val probe = if (integralIds)
      edgeList.select(col("id1").cast("long"), col("id2").cast("long"))
        .limit(driverEdgeThreshold + 1).collect()
    else Array.empty[org.apache.spark.sql.Row]
    if (integralIds && probe.length <= driverEdgeThreshold) {
      val parent = scala.collection.mutable.LongMap.empty[Long]
      def find(x: Long): Long = {
        var r = x
        while (parent.getOrElse(r, r) != r) r = parent(r)
        var c = x // path compression
        while (parent.getOrElse(c, c) != r) { val n = parent(c); parent(c) = r; c = n }
        r
      }
      probe.foreach { e =>
        val (a, b) = (e.getLong(0), e.getLong(1))
        parent.getOrElseUpdate(a, a)
        parent.getOrElseUpdate(b, b)
        val (ra, rb) = (find(a), find(b))
        if (ra != rb) { if (ra < rb) parent(rb) = ra else parent(ra) = rb }
      }
      // roots are component minima because unions always point to the
      // smaller root
      val rows = parent.keys.toArray.sorted.map(id => (id, find(id))).toSeq
      val s = pairs.sparkSession
      import s.implicits._
      // cast back to the input id type: both adaptive paths emit the SAME
      // schema for the same input
      return rows.toDF("id", "group_id")
        .select(col("id").cast(idType).as("id"),
          col("group_id").cast(idType).as("group_id"))
    }
    // Shiloach-Vishkin-style alternation, O(log n) rounds on any topology:
    //  hook:     label(x) <- min(label(x), min over neighbors' labels)
    //  compress: label(x) <- label(label(x))   (pointer jumping)
    // localCheckpoint truncates lineage each round — without it the logical
    // plan doubles per iteration and planning time, not data, dominates.
    val edges = edgeList.select(col("id1").as("a"), col("id2").as("b"))
      .union(edgeList.select(col("id2").as("a"), col("id1").as("b")))
      .localCheckpoint()
    var labels = edges.select(col("a").as("id")).distinct()
      .select(col("id"), col("id").as("group_id")).localCheckpoint()
    var iter = 0
    // convergence signal (numeric ids): labels only ever DECREASE, so
    // Σ group_id strictly decreases every round that changes anything — one
    // tiny aggregate on the already-checkpointed frame instead of a join
    // against last round. The sum runs in decimal(38,0): exact, ANSI-safe,
    // and headroom for any realistic scale (10^7 nodes × 2^63-range ids
    // ≈ 10^26 « 10^38), where a long sum could overflow and void the
    // strict-decrease invariant. Non-numeric ids (min() still works on
    // strings) fall back to an any-row-changed probe against last round.
    val numericIds = idType.isInstanceOf[org.apache.spark.sql.types.NumericType]
    var prevSum: Any = this // sentinel: never equal to a sum value
    var converged = false
    // re-alias = fresh expression ids; a checkpointed frame referenced on
    // both sides of a union/join otherwise trips Catalyst's constraint
    // rewrite on duplicate attribute ids
    def fresh(df: DataFrame): DataFrame =
      df.select(df.columns.map(c => col(c).as(c)).toSeq: _*)
    while (!converged && iter < maxIter) {
      val viaNeighbor = edges
        .join(labels.select(col("id").as("b"), col("group_id")), "b")
        .select(col("a").as("id"), col("group_id"))
      val hooked = fresh(labels).union(viaNeighbor)
        .groupBy("id").agg(min("group_id").as("group_id"))
      val jumped = fresh(hooked).as("x")
        .join(fresh(hooked).select(col("id").as("gid"), col("group_id").as("g2")).as("y"),
          col("x.group_id") === col("y.gid"), "left")
        .select(col("x.id").as("id"),
          coalesce(col("y.g2"), col("x.group_id")).as("group_id"))
        .localCheckpoint()
      if (numericIds) {
        val cur = jumped
          .agg(org.apache.spark.sql.functions.sum(col("group_id").cast("decimal(38,0)")))
          .head().get(0)
        converged = cur == prevSum
        prevSum = cur
      } else {
        converged = jumped
          .join(fresh(labels).withColumnRenamed("group_id", "old"), "id")
          .filter(col("group_id") =!= col("old")).limit(1).count() == 0
      }
      labels = jumped
      iter += 1
    }
    labels
  }

  /** Exact n-gram Jaccard similarity for all LSH-candidate pairs (no
    * threshold) — building block for similarity-histogram analyses.
    */
  def ngramJaccardPairs(df: DataFrame, idCol: String, textCol: String,
      shingleSize: Int = 3, numHashes: Int = 16, bands: Int = 8): DataFrame =
    nearDuplicatePairs(df, idCol, textCol, threshold = 0.0, numHashes, shingleSize, bands)

  // ---- SimHash -------------------------------------------------------------

  /** Shared SimHash core over (id, h) token-hash rows: per bit, +1/−1 vote;
    * sign of the vote sum sets the bit. One groupBy; the votes are plain
    * conditional sums (fully codegen).
    */
  private def simhashFromTokenHashes(tok: DataFrame, bits: Int): DataFrame = {
    val votes = (0 until bits).map { b =>
      sum(when(shiftright(col("h"), b).bitwiseAND(1) === 1, 1).otherwise(-1)).as(s"v$b")
    }
    val agg = tok.groupBy("id").agg(votes.head, votes.tail: _*)
    val bitCols = (0 until bits).map(b =>
      when(col(s"v$b") > 0, lit(1L << b)).otherwise(lit(0L)))
    agg.select(col("id"), bitCols.reduce((a, c) => a.bitwiseOR(c)).as("simhash"))
  }

  /** (id, simhash: long). 64-bit SimHash over xxhash64 token hashes — the
    * fast pure-Spark variant.
    */
  def simhash(df: DataFrame, idCol: String, textCol: String): DataFrame =
    simhashFromTokenHashes(
      df.select(col(idCol).as("id"), explode(tokens(col(textCol))).as("t"))
        .select(col("id"), xxhash64(col("t")).as("h")), bits = 64)

  /** 60-bit SimHash over the md5-derived [[portableTokenHash]] — bit-for-bit
    * reproducible in any engine with md5 (DuckDB, Trino, …), which is what
    * makes the q19 driver oracle possible. 60 bits so the value fits a signed
    * long in engines without wrapping 64-bit arithmetic.
    */
  def simhashPortable(df: DataFrame, idCol: String, textCol: String): DataFrame =
    simhashFromTokenHashes(
      df.select(col(idCol).as("id"), explode(tokens(col(textCol))).as("t"))
        .select(col("id"), portableTokenHash(col("t")).as("h")), bits = 60)

  /** Row-local 64-bit SimHash COLUMN — no explode, no groupBy, which makes
    * it legal inside a streaming query before a stateful operator (a
    * groupBy(id) aggregation would itself be a stateful op on a stream).
    * One interpreted `aggregate` pass over the token-hash array per bit;
    * identical bit semantics to [[simhash]].
    */
  def simhashCol(text: Column, bits: Int = 64): Column =
    simhashColFromTokenHashes(tokenHashes(text), bits)

  /** Row-local 60-bit PORTABLE SimHash column — the streaming-legal twin of
    * [[simhashPortable]], bit-identical to the batch explode+groupBy pass
    * (same md5-derived token hashes, same vote rule), so streaming stages
    * can share signatures — and therefore pair sets and dedup decisions —
    * with batch pipelines gated on the portable oracle.
    */
  def simhashColPortable(text: Column): Column =
    simhashColFromTokenHashes(
      transform(tokens(text), t => portableTokenHash(t)), bits = 60)

  private def simhashColFromTokenHashes(th: Column, bits: Int): Column =
    // the token-hash array is let-bound: without it the expression tree holds
    // `bits` copies of the tokenize+hash pipeline, one per vote lambda, and
    // interpreted HOF eval runs all of them per row (see bindOnce)
    bindOnce(th, thv =>
      (0 until bits).map { b =>
        val vote = aggregate(thv, lit(0),
          (acc, h) => acc + when(shiftright(h, b).bitwiseAND(1) === 1, 1).otherwise(-1))
        when(vote > 0, lit(1L << b)).otherwise(lit(0L))
      }.reduce(_ bitwiseOR _))

  /** Near-duplicate pairs by SimHash Hamming distance ≤ maxHamming, using
    * band collision (any identical `bits/bands`-wide chunk ⇒ candidate) then
    * popcount verification. EXACT for maxHamming < bands: by pigeonhole, a
    * pair differing in ≤ bands−1 bits must agree on at least one band.
    */
  def simhashNearDuplicates(df: DataFrame, idCol: String, textCol: String,
      maxHamming: Int = 3): DataFrame =
    simhashNearDuplicatesFromHashes(simhash(df, idCol, textCol), maxHamming)

  /** Same, over an already-computed (id, simhash) frame — reuse the hash
    * pass when callers also need the signatures. `bits`/`bands` must match
    * the simhash variant (64/4 for [[simhash]], 60/4 for [[simhashPortable]]).
    */
  def simhashNearDuplicatesFromHashes(sh: DataFrame,
      maxHamming: Int = 3, bits: Int = 64, bands: Int = 4): DataFrame = {
    require(bits % bands == 0, s"bits=$bits must divide into bands=$bands")
    val width = bits / bands
    val mask = (1L << width) - 1
    val banded = sh.select(col("id"), col("simhash"),
      posexplode(array((0 until bands).map(q =>
        shiftright(col("simhash"), q * width).bitwiseAND(mask)): _*)))
      .select(col("id"), col("simhash"), col("pos").as("q"), col("col").as("chunk"))
    val l = banded.select(col("q"), col("chunk"), col("id").as("id1"), col("simhash").as("h1"))
    val r = banded.select(col("q"), col("chunk"), col("id").as("id2"), col("simhash").as("h2"))
    l.join(r, Seq("q", "chunk")).filter(col("id1") < col("id2"))
      .select(col("id1"), col("id2"),
        bit_count(col("h1").bitwiseXOR(col("h2"))).cast("long").as("hamming"))
      .filter(col("hamming") <= maxHamming)
      .distinct()
  }

  /** Incremental dedup of an incoming batch against a HISTORICAL signature
    * store — the production shape for continuous corpus ingestion. The
    * corpus side is only (id, simhash): the ~8-bytes-per-doc index a steady
    * pipeline maintains, NOT the corpus text. The banded equi-join compares
    * NEW against OLD only — old×old was paid when the corpus was built, and
    * new×new is a separate within-batch pass ([[simhashNearDuplicatesFromHashes]])
    * — so each ingestion step costs |batch|·bands probe rows against the
    * bucketed index, never a corpus self-join. Returns one row per new doc:
    * the input columns plus `matched_id`, the SMALLEST corpus id within
    * `maxHamming` (deterministic attribution) or null for novel docs.
    * Exact for maxHamming < bands by pigeonhole, as ever.
    */
  def dedupAgainstCorpus(newSigs: DataFrame, corpusSigs: DataFrame,
      maxHamming: Int = 3, bits: Int = 64, bands: Int = 4): DataFrame = {
    require(bits % bands == 0, s"bits=$bits must divide into bands=$bands")
    val width = bits / bands
    val mask = (1L << width) - 1
    def banded(sh: DataFrame, idAs: String, hAs: String): DataFrame =
      sh.select(col("id"), col("simhash"),
        posexplode(array((0 until bands).map(q =>
          shiftright(col("simhash"), q * width).bitwiseAND(mask)): _*)))
        .select(col("id").as(idAs), col("simhash").as(hAs),
          col("pos").as("q"), col("col").as("chunk"))
    val matches = banded(newSigs, "id", "h1")
      .join(banded(corpusSigs, "corpus_id", "h2"), Seq("q", "chunk"))
      .select(col("id"), col("corpus_id"),
        bit_count(col("h1").bitwiseXOR(col("h2"))).cast("long").as("hamming"))
      .filter(col("hamming") <= maxHamming)
      .groupBy("id").agg(min(col("corpus_id")).as("matched_id"))
    newSigs.join(matches, Seq("id"), "left")
  }

  /** Perceptual near-duplicate IMAGE pairs over (id, phash) rows from
    * [[Multimodal.perceptualHashes]] — the pixel-modality member of the
    * dedup family (byte-exact q14 misses every re-encode/resize/tint; the
    * aHash signature survives them). Same banded-LSH + popcount machinery
    * as SimHash: exact for maxHamming < 4 by pigeonhole, never all-pairs.
    * Quarantined (undecodable) rows must be filtered out by the caller —
    * their phash-0 placeholder would band-collide as one giant bucket.
    */
  def perceptualNearDuplicatePairs(phashes: DataFrame,
      maxHamming: Int = 3): DataFrame =
    simhashNearDuplicatesFromHashes(
      phashes.select(col("id"), col("phash").as("simhash")),
      maxHamming, bits = 64, bands = 4)

  // ---- segment-level dedup with document reconstruction ---------------------

  /** One (id, seg_idx, seg, k) row per consecutive `segTokens`-token segment
    * — the shared explode stage of [[dedupSegmentsRebuild]] and the
    * streaming first-seen twin ([[graft.streaming.StreamOps]]).
    */
  def segmentRows(df: DataFrame, idCol: String, textCol: String,
      segTokens: Int): DataFrame = {
    require(segTokens >= 1, s"segTokens=$segTokens must be >= 1")
    // tokenization let-bound (bindOnce): the slice-per-segment lambda would
    // otherwise re-split the document once per segment (O(n_segs · doc_len))
    val segsCol = bindOnce(split(col(textCol), " "), ts => {
      // ceil(size/segTokens) in exact integer arithmetic (Column./ is double
      // division); size >= 1 (split of "" is [""]), so nseg >= 1
      val nseg = floor((size(ts) + lit(segTokens - 1)).cast("double") / segTokens)
      transform(sequence(lit(0), nseg.cast("int") - 1),
        i => concat_ws(" ", slice(ts, i * segTokens + 1, lit(segTokens))))
    })
    df.select(col(idCol).as("id"), posexplode(segsCol))
      .withColumnRenamed("pos", "seg_idx").withColumnRenamed("col", "seg")
      .withColumn("k", md5(col("seg").cast("binary")))
  }

  /** Segment-level dedup that APPLIES the removal and rebuilds each document
    * — the transform stage behind paragraph dedup in web-corpus pipelines
    * (CCNet/RefinedWeb-style: drop every repeated paragraph, keep its first
    * occurrence corpus-wide), where [[spanDuplication]] is the read-only
    * audit. Documents are cut into consecutive `segTokens`-token segments
    * (the "paragraphs" of the single-line fixture corpus; a real corpus
    * would split on blank lines first — same machinery); a segment survives
    * iff it is the FIRST occurrence of its content under the deterministic
    * total order (id, segment index).
    *
    * 100-TB shape: one shuffle keyed on the segment digest for the
    * first-occurrence aggregation (map-side partial min), one digest-keyed
    * join back, one id-keyed aggregation to rebuild — no windows over
    * unbounded partitions, no driver state. Duplicate-heavy keys are
    * aggregate keys (a min), never join-explode keys. Rebuild collects one
    * document's kept segments into a row — bounded by the document itself
    * (the input row already held the full text).
    *
    * Returns (id, n_segs, kept_segs, rebuilt) — one row per input document;
    * a document whose every segment occurred earlier rebuilds to "".
    */
  def dedupSegmentsRebuild(df: DataFrame, idCol: String, textCol: String,
      segTokens: Int = 16): DataFrame = {
    val segs = segmentRows(df, idCol, textCol, segTokens)
    val firsts = segs.groupBy("k")
      .agg(min(struct(col("id"), col("seg_idx"))).as("w"))
    segs.join(firsts, Seq("k"))
      .withColumn("kept",
        col("w.id") === col("id") && col("w.seg_idx") === col("seg_idx"))
      .groupBy("id").agg(
        count(lit(1)).as("n_segs"),
        sum(col("kept").cast("long")).as("kept_segs"),
        array_join(transform(
          array_sort(collect_list(when(col("kept"),
            struct(col("seg_idx"), col("seg"))))),
          s => s.getField("seg")), " ").as("rebuilt"))
  }

  // ---- winnowing fingerprints (MOSS) ----------------------------------------

  /** Winnowing document fingerprints (Schleimer, Wilkerson, Aiken — SIGMOD'03,
    * the MOSS algorithm): hash every `k`-token k-gram, slide a window of `w`
    * consecutive k-gram hashes, and select the minimum hash of each window
    * (rightmost position on ties). Guarantees: every shared run of w+k-1
    * tokens yields at least one shared fingerprint (detection), and at most
    * ~2/(w+1) of k-grams are selected (density) — robust local fingerprints
    * for plagiarism/boilerplate mining at a fraction of the k-gram volume.
    *
    * Entirely ROW-LOCAL: k-gram hashing, window minima, and fingerprint
    * distinct-ing run inside higher-order array expressions over each
    * document row — zero shuffles until the caller aggregates, so the 100-TB
    * case is embarrassingly parallel. The hash is the portable 40-bit md5
    * prefix (first 10 hex digits) so an external engine replays it
    * bit-for-bit; the tie rule is encoded arithmetically as
    * `key = hash * 2^20 + (2^20-1 - pos)` (min key = min hash, rightmost
    * position), which bounds supported documents at 2^20 k-grams (~1M
    * tokens) — far above web-document sizes; raise the base for book-length
    * inputs.
    *
    * Returns (id, pos, hv) — one row per selected fingerprint, `pos` the
    * 0-based k-gram position. Documents shorter than `k` tokens yield none.
    */
  def winnowFingerprints(df: DataFrame, idCol: String, textCol: String,
      k: Int = 5, w: Int = 4): DataFrame = {
    require(k >= 1 && w >= 1, s"k=$k and w=$w must be >= 1")
    val posBase = 1048576L // 2^20
    // k-gram count derived from the BOUND token array (size(t) is an O(1)
    // length read; referencing the unbound split would re-tokenize the
    // document once per use of nk)
    val keys = graft.core.Exprs.bindOnce(split(col(textCol), " "), t => {
      val nk = size(t) - lit(k - 1) // <= 0 when doc shorter than k
      when(nk <= 0, array().cast("array<long>"))
        .otherwise(transform(sequence(lit(0), nk - 1), i =>
          conv(substring(md5(concat_ws(" ", slice(t, i + 1, lit(k))).cast("binary")),
            1, 10), 16, 10).cast("long") * posBase +
            (lit(posBase - 1) - i)))
    })
    // one window min per start position 0..max(nk-w, 0); slice truncates at
    // the end, so a doc with fewer than w k-grams gets one whole-doc window
    val selected = graft.core.Exprs.bindOnce(keys, ks =>
      when(size(ks) === 0, array().cast("array<long>"))
        .otherwise(array_distinct(
          transform(sequence(lit(0), greatest(size(ks) - w, lit(0))),
            p => array_min(slice(ks, p + 1, lit(w)))))))
    // decode with bit ops, not `/` (Column./ is DOUBLE division — a 60-bit
    // key would round through a 53-bit mantissa); posBase is 2^20 exactly
    df.select(col(idCol).as("id"), explode(selected).as("key"))
      .select(col("id"),
        (lit(posBase - 1) - col("key").bitwiseAND(lit(posBase - 1)))
          .cast("int").as("pos"),
        shiftright(col("key"), 20).as("hv"))
  }

  // ---- set-containment join (quote / inclusion mining) -----------------------

  /** Exact set-CONTAINMENT self-join: every ordered pair (A, B), A ≠ B, with
    * `|A ∩ B| ≥ t·|A|` over (id, sset) distinct-element frames (e.g.
    * [[shingleSets]]). Containment is the asymmetric cousin of Jaccard —
    * it finds documents SUBSTANTIALLY INCLUDED in another (quotes,
    * boilerplate wrappers, partial scrapes) that resemblance misses when
    * the container is much longer than the contained.
    *
    * Lossless candidate generation by prefix filtering (Chaudhuri et al.,
    * ICDE'06): under ANY global element order, a pair with overlap ≥
    * ⌈t·|A|⌉ must share one of A's first `|A| − ⌈t·|A|⌉ + 1` elements.
    * Because only the A side is thresholded, B indexes ALL its elements;
    * the order is rarest-first (document frequency, element tiebreak), so
    * the join keys are the frequency tail — the B-side index is linear in
    * the corpus but candidates form only where a RARE element matches,
    * keeping the equi-join skew-resistant. Candidates get exact row-local
    * `array_intersect` verification; precision 1, recall 1.
    *
    * Returns (a_id, b_id, sz_a, inter, containment) unrounded.
    */
  def containmentPairs(sets: DataFrame, threshold: Double): DataFrame =
    containmentPairsFromRankedIndex(containmentRankedIndex(sets), sets,
      threshold)

  /** The candidate-generation index for [[containmentPairs]]: (id, sz, rk, g)
    * — one row per element, `rk` its 1-based rank within the set under the
    * global rarest-first order (document frequency, element tiebreak), `sz`
    * the set size. Unlike [[jaccardPrefixIndex]] this keeps ALL elements
    * (the containment join thresholds only the A side, so B must index its
    * full set) and is threshold-free — one cached frame serves the A-prefix
    * cut for ANY threshold plus the B side, and the df-count + rank-window
    * pass (the expensive stage) runs once.
    */
  def containmentRankedIndex(sets: DataFrame): DataFrame = {
    val ex = sets.select(col("id"), size(col("sset")).as("sz"),
      explode(col("sset")).as("g"))
    val dfreq = ex.groupBy("g").agg(count(lit(1)).as("df"))
    val w = Window.partitionBy("id").orderBy(col("df"), col("g"))
    ex.join(dfreq, "g")
      .withColumn("rk", row_number().over(w))
      .select(col("id"), col("sz"), col("rk"), col("g"))
  }

  /** Pair mining + exact verification over a (possibly cached)
    * [[containmentRankedIndex]] frame. Two lossless ppjoin-style prunes run
    * inside the candidate equi-join, before the per-pair shuffle:
    *
    *  - length filter: `|A∩B| ≥ ⌈t·|A|⌉` needs `|B| ≥ ⌈t·|A|⌉`;
    *  - positional filter: a shared element at sorted rank `i` in A and `j`
    *    in B bounds `|A∩B| ≤ min(i−1, j−1) + 1 + min(|A|−i, |B|−j)`; prune
    *    below the required overlap.
    *
    * The ceiling is round-guarded like [[prefixFilterJaccardPairs]] so an
    * IEEE product a half-ulp above the exact rational cannot shrink the
    * lossless prefix.
    */
  def containmentPairsFromRankedIndex(ranked: DataFrame, sets: DataFrame,
      threshold: Double): DataFrame = {
    require(threshold > 0 && threshold <= 1,
      s"threshold=$threshold must be in (0, 1]")
    def required(sz: Column): Column = ceil(round(lit(threshold) * sz, 6))
    val prefix = ranked
      .filter(col("rk") <= col("sz") - required(col("sz")) + 1)
    val bound =
      least(col("a.rk"), col("b.rk")) - 1 + lit(1) +
        least(col("a.sz") - col("a.rk"), col("b.sz") - col("b.rk"))
    val cands = prefix.as("a")
      .join(ranked.as("b"),
        col("a.g") === col("b.g") && col("a.id") =!= col("b.id") &&
          col("b.sz") >= required(col("a.sz")) &&
          bound >= required(col("a.sz")))
      .select(col("a.id").as("a_id"), col("b.id").as("b_id")).distinct()
    cands
      .join(sets.select(col("id").as("a_id"), col("sset").as("sa")), "a_id")
      .join(sets.select(col("id").as("b_id"), col("sset").as("sb")), "b_id")
      .select(col("a_id"), col("b_id"), size(col("sa")).as("sz_a"),
        size(array_intersect(col("sa"), col("sb"))).as("inter"))
      .filter(col("inter") >= ceil(round(lit(threshold) * col("sz_a"), 6)))
      .withColumn("containment", col("inter").cast("double") / col("sz_a"))
  }
}
