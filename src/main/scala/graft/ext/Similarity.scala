package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Embedding similarity search over `array<float>` columns.
  *
  * Baseline: brute-force cosine top-k — broadcast the (small) query set, one
  * pass over the corpus, per-query top-k via window rank. 100-TB path:
  * SRP-LSH (random-hyperplane) bucketing — sign bits of projections onto
  * deterministic hyperplanes form a bucket key; the corpus is joined to
  * queries per bucket, cutting the candidate set by ~2^planes (an IVF-style
  * coarse quantization with hash-defined centroids).
  *
  * All vector math is higher-order-function expressions in double precision —
  * no UDFs, executes inside the JVM row pipeline.
  */
object Similarity {

  /** Codegen'd tight-loop vector math (graft.functions.VectorExprs) — the
    * HOF formulation (`aggregate(zip_with(...))`) pays an interpreted lambda
    * call per element; these generate straight Java loops.
    */
  def dot(a: Column, b: Column): Column = graft.functions.VectorExprs.dot(a, b)

  def norm2(a: Column): Column = graft.functions.VectorExprs.norm2(a)

  def cosine(a: Column, b: Column): Column =
    dot(a, b) / (sqrt(norm2(a)) * sqrt(norm2(b)))

  /** Top-k cosine neighbors for each query vector. `queries` must be small
    * (it is broadcast); corpus side never shuffles except the final per-query
    * rank, which is tiny (k × queries rows after local pre-filtering at scale).
    */
  def bruteForceTopK(corpus: DataFrame, idCol: String, vecCol: String,
      queries: DataFrame, queryIdCol: String, queryVecCol: String,
      k: Int = 10): DataFrame = {
    val q = broadcast(queries.select(
      col(queryIdCol).as("query_id"), col(queryVecCol).as("__qv")))
    val scored = corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("__cv"))
      .join(q, col("neighbor_id") =!= col("query_id"))
      .select(col("query_id"), col("neighbor_id"),
        cosine(col("__qv"), col("__cv")).as("cos"))
    val w = Window.partitionBy("query_id").orderBy(col("cos").desc, col("neighbor_id"))
    scored.withColumn("rank", row_number().over(w)).filter(col("rank") <= k)
      .drop("rank").orderBy(col("query_id"), col("cos").desc, col("neighbor_id"))
  }

  /** Deterministic SRP hyperplanes (seeded Gaussian, fixed seed). */
  private def hyperplanes(dims: Int, planes: Int, seed: Long = 42L): Seq[Seq[Double]] = {
    val rnd = new scala.util.Random(seed)
    Seq.fill(planes)(Seq.fill(dims)(rnd.nextGaussian()))
  }

  /** Sign-random-projection bucket id (0 .. 2^planes − 1) for a vector. */
  def srpBucket(vec: Column, dims: Int, planes: Int = 8, seed: Long = 42L): Column = {
    require(planes <= 62, "srpBucket packs sign bits into one long (<= 62 planes)")
    val hp = hyperplanes(dims, planes, seed)
    val bits = hp.zipWithIndex.map { case (plane, p) =>
      val proj = dot(vec, typedLit(plane))
      when(proj >= 0, lit(1L << p)).otherwise(lit(0L))
    }
    bits.reduce((a, b) => a.bitwiseOR(b))
  }

  /** LSH-bucketed approximate top-k: candidates limited to the query's SRP
    * bucket, plus — multi-probe LSH — every bucket within Hamming distance
    * `probeHamming` of it (probing C(planes, ≤h) buckets recovers neighbors
    * that flipped a few sign bits; the standard recall knob that avoids
    * building multiple hash tables). Candidate reduction is
    * ~2^planes / Σ C(planes, ≤h). Returns the same schema as bruteForceTopK.
    */
  def srpBucketTopK(corpus: DataFrame, idCol: String, vecCol: String,
      queries: DataFrame, queryIdCol: String, queryVecCol: String,
      dims: Int, k: Int = 10, planes: Int = 8, probeHamming: Int = 0): DataFrame = {
    require(planes <= 20, "srpBucketTopK supports at most 20 planes")
    val c = corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("__cv"),
      srpBucket(col(vecCol), dims, planes).as("__bucket"))
    val base = srpBucket(col(queryVecCol), dims, planes)
    // XOR masks with popcount ≤ probeHamming enumerate the probe set; the
    // query side stays tiny (rows × probes) and broadcast
    val masks = (0 until (1 << planes)).filter(m => Integer.bitCount(m) <= probeHamming)
    // the signature pipeline is let-bound ONCE before the mask fan-out: an
    // unbound `base` is inlined per mask (56 copies at planes=10, h<=2),
    // which breaks whole-stage codegen (64KB method limit) and re-evaluates
    // the planes x dims projection per probe row (see Exprs.bindOnce)
    val probeBuckets = graft.core.Exprs.bindOnce(base, b =>
      array(masks.map(m => b.bitwiseXOR(lit(m.toLong))): _*))
    val q = broadcast(queries.select(col(queryIdCol).as("query_id"),
      col(queryVecCol).as("__qv"), explode(probeBuckets).as("__bucket")))
    val scored = c.join(q, Seq("__bucket")).filter(col("neighbor_id") =!= col("query_id"))
      .select(col("query_id"), col("neighbor_id"), cosine(col("__qv"), col("__cv")).as("cos"))
    val w = Window.partitionBy("query_id").orderBy(col("cos").desc, col("neighbor_id"))
    scored.withColumn("rank", row_number().over(w)).filter(col("rank") <= k)
      .drop("rank").orderBy(col("query_id"), col("cos").desc, col("neighbor_id"))
  }

  /** EXACT embedding-cosine pair mining: every (id1 < id2) pair with
    * cosine ≥ threshold. Quadratic by construction — the verification
    * baseline (q37 gate, recall truth for the banded path) and the right
    * tool when the corpus side is small. Norms are computed once per row,
    * not once per pair; the cosine is the same `dot / (√n1·√n2)` expression
    * shape the DuckDB oracle evaluates, so unrounded values agree to the
    * last ulp (a pair landing EXACTLY on the threshold boundary is the one
    * theoretical divergence — probability ~0 on continuous data).
    */
  /** (id, __v, __n) projection: vector + its norm, computed once per row. */
  private def normed(corpus: DataFrame, idCol: String, vecCol: String): DataFrame =
    corpus.select(col(idCol).as("id"), col(vecCol).as("__v"),
      sqrt(norm2(col(vecCol))).as("__n"))

  private def side(vecs: DataFrame, n: Int): DataFrame =
    vecs.select(col("id").as(s"id$n"), col("__v").as(s"__v$n"), col("__n").as(s"__n$n"))

  private val pairCosine: Column =
    dot(col("__v1"), col("__v2")) / (col("__n1") * col("__n2"))

  def cosinePairsExact(corpus: DataFrame, idCol: String, vecCol: String,
      threshold: Double): DataFrame = {
    val vecs = normed(corpus, idCol, vecCol)
    side(vecs, 1).join(side(vecs, 2), col("id1") < col("id2"))
      .select(col("id1"), col("id2"), pairCosine.as("cos"))
      .filter(col("cos") >= threshold)
  }

  /** Embedding-cosine near-duplicate pairs via BANDED sign-random-projection
    * — the 100-TB path. A `planes`-bit SRP signature is split into `bands`
    * bands; vectors agreeing on ANY band become candidates (band equi-join,
    * never all-pairs), then every candidate is verified with the exact
    * cosine, so precision is 1.0 and only recall is probabilistic.
    *
    * Recall: a sign bit agrees with probability 1 − θ/π; a band of
    * `planes/bands` bits matches with p^(planes/bands) and any of the
    * `bands` bands with 1 − (1 − p^b)^bands — at the defaults (48 planes,
    * 8 bands of 6 bits) that is ≈ 0.998 for cosine 0.95 and ≈ 0.98 for
    * cosine 0.9. Raising recall further at billion-row scale: union the
    * candidates of a second signature set (different `seed`) rather than
    * widening bands (candidate noise per band scales with n²/2^bandBits).
    */
  def cosineNearDuplicates(corpus: DataFrame, idCol: String, vecCol: String,
      dims: Int, threshold: Double = 0.95, planes: Int = 48, bands: Int = 8,
      seed: Long = 42L): DataFrame = {
    require(planes % bands == 0, s"planes $planes must divide into $bands bands")
    val bandBits = planes / bands
    // narrow bands degenerate: at b bits a RANDOM pair matches a band with
    // probability 2^-b, so b < 4 admits >6% of all n² pairs as candidates
    // per band — worse than the exact quadratic path, with extra shuffles
    require(bandBits >= 4,
      s"$bandBits-bit bands admit ~n²/2^$bandBits random candidates per band; use >= 4 bits (raise planes or lower bands)")
    val banded = corpus
      .select(col(idCol).as("id"), srpBucket(col(vecCol), dims, planes, seed).as("__sig"))
      .select(col("id"), posexplode(array((0 until bands).map(b =>
        shiftright(col("__sig"), b * bandBits).bitwiseAND(lit((1L << bandBits) - 1))): _*)))
      .select(col("id"), col("pos").as("band"), col("col").as("bh"))
    val cand = banded.select(col("band"), col("bh"), col("id").as("id1"))
      .join(banded.select(col("band"), col("bh"), col("id").as("id2")), Seq("band", "bh"))
      .filter(col("id1") < col("id2"))
      .select("id1", "id2").distinct()
    val vecs = normed(corpus, idCol, vecCol)
    cand
      .join(side(vecs, 1), "id1")
      .join(side(vecs, 2), "id2")
      .select(col("id1"), col("id2"), pairCosine.as("cos"))
      .filter(col("cos") >= threshold)
  }

  // ---- IVF-style ANN -------------------------------------------------------

  /** Deterministic driver-side k-means over a small ordered sample — the
    * coarse-quantizer training step of an IVF index. The sample is bounded
    * (`sampleSize` rows), everything else stays distributed.
    */
  private[ext] def trainCentroids(corpus: DataFrame, idCol: String, vecCol: String,
      nLists: Int, sampleSize: Int, iterations: Int = 5): Array[Array[Double]] = {
    val sample = corpus.orderBy(col(idCol)).limit(sampleSize)
      .select(col(vecCol)).collect()
      .map(_.getSeq[Number](0).map(_.doubleValue()).toArray) // float OR double arrays
    require(sample.length >= nLists, s"need >= $nLists sample vectors")
    def d2(a: Array[Double], b: Array[Double]): Double = {
      var s = 0.0; var i = 0
      while (i < a.length) { val t = a(i) - b(i); s += t * t; i += 1 }
      s
    }
    // deterministic farthest-point init (k-means++-style, no randomness):
    // start from the first sample, repeatedly take the point farthest from
    // its nearest chosen centroid — robust to clustered sample ordering.
    val chosen = scala.collection.mutable.ArrayBuffer(sample(0).clone())
    while (chosen.length < nLists) {
      val next = sample.maxBy(v => chosen.map(c => d2(v, c)).min)
      chosen += next.clone()
    }
    var centroids = chosen.toArray
    for (_ <- 1 to iterations) {
      val sums = Array.fill(nLists)(new Array[Double](sample.head.length))
      val counts = new Array[Int](nLists)
      sample.foreach { v =>
        var best = 0
        var bestD = Double.MaxValue
        var c = 0
        while (c < nLists) {
          var d = 0.0
          var i = 0
          while (i < v.length) { val t = v(i) - centroids(c)(i); d += t * t; i += 1 }
          if (d < bestD) { bestD = d; best = c }
          c += 1
        }
        counts(best) += 1
        var i = 0
        while (i < v.length) { sums(best)(i) += v(i); i += 1 }
      }
      centroids = Array.tabulate(nLists)(c =>
        if (counts(c) == 0) centroids(c)
        else sums(c).map(_ / counts(c)))
    }
    centroids
  }

  /** Distributed Lloyd refinement of IVF centroids: assign EVERY corpus row
    * to its nearest centroid (fused [[graft.functions.NearestCentroid]]
    * expression), recompute each centroid as the element-wise mean via the
    * [[graft.functions.VectorAgg.vectorAvg]] Aggregator (map-side merged —
    * each iteration's exchange carries nLists×dim doubles per partition,
    * never the corpus), repeat. Fixes the seed quantizer's blind spot: the
    * bounded driver sample can misplace centroids the full corpus sees
    * clearly. Empty lists keep their previous centroid. The driver only
    * ever holds the nLists×dim centroid table per round.
    */
  private[ext] def refineCentroids(corpus: DataFrame, vecCol: String,
      seed: Array[Array[Double]], iterations: Int): Array[Array[Double]] = {
    var cur = seed
    for (_ <- 1 to iterations) {
      val means = corpus
        .select(col(vecCol).cast("array<double>").as("__v"),
          ivfListId(col(vecCol), cur).as("__list"))
        .groupBy("__list")
        .agg(graft.functions.VectorAgg.vectorAvg(col("__v")).as("__c"))
        .collect()
        .map(r => r.getAs[Number]("__list").intValue() ->
          r.getSeq[Double](1).toArray).toMap
      cur = Array.tabulate(cur.length)(i => means.getOrElse(i, cur(i)))
    }
    cur
  }

  /** Distance ranking to every centroid: ‖cᵢ‖² − 2·v·cᵢ (the ‖v‖² term is
    * constant per row and cannot change the argmin/ordering, so it is
    * dropped), using the codegen'd dot product against literal centroid
    * arrays.
    */
  private def centroidDists(vec: Column, centroids: Array[Array[Double]]): Column =
    array(centroids.map { c =>
      val cn = c.map(x => x * x).sum
      lit(cn) - lit(2.0) * dot(vec, typedLit(c.toSeq))
    }: _*)

  /** Index of the nearest centroid (list assignment) — a single fused
    * codegen expression; see [[graft.functions.NearestCentroid]] for why the
    * array-of-dots formulation is ~100× slower on wide centroid sets.
    */
  def ivfListId(vec: Column, centroids: Array[Array[Double]]): Column =
    graft.functions.VectorExprs.nearestCentroid(vec, centroids)

  /** IVF-style approximate top-k: corpus rows are bucketed by nearest
    * centroid; each query probes its `nProbe` nearest lists only —
    * candidates shrink by ~nLists/nProbe versus brute force, and the
    * centroid set is tiny + broadcast, so the corpus is touched in one
    * pass. The classic inverted-file ANN layout expressed as joins.
    */
  def ivfTopK(corpus: DataFrame, idCol: String, vecCol: String,
      queries: DataFrame, queryIdCol: String, queryVecCol: String,
      k: Int = 10, nLists: Int = 16, nProbe: Int = 4,
      sampleSize: Int = 256, refineIterations: Int = 0): DataFrame = {
    val seed = trainCentroids(corpus, idCol, vecCol, nLists, sampleSize)
    val centroids =
      if (refineIterations > 0) refineCentroids(corpus, vecCol, seed, refineIterations)
      else seed
    val c = corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("__cv"),
      ivfListId(col(vecCol), centroids).as("__list"))
    // per query: the nProbe closest lists, via sorting (dist, idx) structs
    val qd = centroidDists(col(queryVecCol), centroids)
    val probes = transform(
      slice(array_sort(zip_with(qd,
        transform(sequence(lit(0), lit(nLists - 1)), i => i),
        (d, i) => struct(d.as("d"), i.as("i")))), 1, nProbe),
      s => s.getField("i"))
    val q = broadcast(queries.select(col(queryIdCol).as("query_id"),
      col(queryVecCol).as("__qv"), explode(probes).as("__list")))
    val scored = c.join(q, Seq("__list"))
      .filter(col("neighbor_id") =!= col("query_id"))
      .select(col("query_id"), col("neighbor_id"),
        (dot(col("__qv"), col("__cv")) /
          (sqrt(norm2(col("__qv"))) * sqrt(norm2(col("__cv"))))).as("cos"))
    val w = Window.partitionBy("query_id").orderBy(col("cos").desc, col("neighbor_id"))
    scored.withColumn("rank", row_number().over(w)).filter(col("rank") <= k)
      .drop("rank").orderBy(col("query_id"), col("cos").desc, col("neighbor_id"))
  }

  /** Per-label centroid (element-wise mean vector) — class prototypes /
    * mean pooling. One buffer per (label, partition) via
    * [[graft.functions.VectorAgg.vectorAvg]]; the exchange carries
    * labels·dims·partitions doubles, not the exploded corpus.
    */
  def labelCentroids(corpus: DataFrame, labelCol: String, vecCol: String): DataFrame =
    corpus.groupBy(col(labelCol))
      .agg(graft.functions.VectorAgg.vectorAvg(
        col(vecCol).cast("array<double>")).as("centroid"))

  // ---- int8 quantization ---------------------------------------------------

  /** Per-vector symmetric int8 scale: max|x| / 127, floored away from zero
    * so all-zero vectors quantize to zeros instead of NaN.
    */
  def int8Scale(vec: Column): Column =
    greatest(aggregate(vec, lit(0.0), (a, x) => greatest(a, abs(x))) / 127.0,
      lit(1e-12))

  /** Quantize to int8 codes (storage form: 4-32× smaller than the float
    * vector; ship (codes, scale) and dequantize on read). The scale argument
    * is let-bound ([[graft.core.Exprs.bindOnce]]): if a caller passes the
    * `int8Scale` aggregate inline (or the optimizer inlines its alias), an
    * unbound reference would re-run that max-|x| pass once per ELEMENT in
    * the interpreted lambda.
    */
  def quantizeInt8(vec: Column, scale: Column): Column =
    graft.core.Exprs.bindOnce(scale, s =>
      transform(vec, x => round(x / s).cast("int")))

  /** Dequantized double vector from int8 codes (scale let-bound, as above). */
  def dequantizeInt8(codes: Column, scale: Column): Column =
    graft.core.Exprs.bindOnce(scale, s =>
      transform(codes, x => x.cast("double") * s))

  /** Round-trip reconstruction in pure double arithmetic (round(x/s)·s) —
    * the exact shape an external engine can replay, for error auditing.
    */
  def int8RoundTrip(vec: Column, scale: Column): Column =
    graft.core.Exprs.bindOnce(scale, s =>
      transform(vec, x => round(x / s) * s))

  /** Per-label embedding statistics (norm distribution) — sanity panel. */
  def normStats(corpus: DataFrame, labelCol: String, vecCol: String): DataFrame =
    corpus.groupBy(col(labelCol))
      .agg(count(lit(1)).as("n"),
        avg(sqrt(norm2(col(vecCol)))).as("avg_norm"),
        min(sqrt(norm2(col(vecCol)))).as("min_norm"),
        max(sqrt(norm2(col(vecCol)))).as("max_norm"))

  // ---- retrieval evaluation (recall@k / MRR@k / NDCG@k) ----------------------

  /** Axis-parallel sign bucket: bit j set iff `v[j] >= 0`, j < `bits` — the
    * degenerate SRP-LSH whose hyperplanes are the coordinate axes. Used as
    * the deterministic, externally-replayable "system under evaluation" in
    * [[retrievalEval]] (a hash-seeded SRP basis cannot be recomputed by a
    * SQL oracle; coordinate signs can, bit-for-bit).
    */
  def signBucket(v: Column, bits: Int): Column =
    (0 until bits).map(j =>
      when(element_at(v, j + 1) >= 0f, lit(1L << j)).otherwise(lit(0L)))
      .reduce(_ + _)

  /** Ranking-quality evaluation of a bucketed ANN retriever against exact
    * brute-force ground truth — recall@k, MRR@k and binary-relevance NDCG@k
    * per query. This is the eval harness every ANN deployment needs next to
    * the index itself: ground truth is the exact top-k cosine neighbors
    * (rounded to 6dp BEFORE ranking so rank ties break identically in any
    * engine — the q20 determinism recipe), the system under test retrieves
    * candidates from the query's [[signBucket]] and ranks them the same way.
    *
    * Scale shape: the ground-truth pass is an explicit audit (broadcast
    * queries × corpus — the same cost brute-force retrieval itself pays);
    * the system pass touches only same-bucket candidates. All per-query
    * ranking windows partition on query_id with candidate-bounded partitions.
    *
    * Returns one row per query:
    * (query_id, n_candidates, recall_at_k, mrr_at_k, ndcg_at_k).
    */
  def retrievalEval(corpus: DataFrame, idCol: String, vecCol: String,
      queryPred: Column, k: Int = 10, bucketBits: Int = 6): DataFrame = {
    require(k >= 1 && bucketBits >= 1 && bucketBits <= 62,
      s"k=$k, bucketBits=$bucketBits out of range")
    val base = corpus.select(col(idCol).as("nid"), col(vecCol).as("cv"),
      sqrt(norm2(col(vecCol))).as("cn"),
      signBucket(col(vecCol), bucketBits).as("cb"))
    val q = broadcast(corpus.filter(queryPred)
      .select(col(idCol).as("query_id"), col(vecCol).as("qv"),
        sqrt(norm2(col(vecCol))).as("qn"),
        signBucket(col(vecCol), bucketBits).as("qb")))
    def ranked(scored: DataFrame): DataFrame = {
      val w = Window.partitionBy("query_id")
        .orderBy(col("cos").desc, col("nid"))
      scored.withColumn("rank", row_number().over(w)).filter(col("rank") <= k)
    }
    // IEEE division (graft.core.Exprs.fdiv): an all-zero embedding makes the
    // norm product 0, which Spark non-ANSI division would turn into NULL
    // while the DuckDB oracle's IEEE division yields NaN/Inf — fdiv keeps
    // both engines on the IEEE answer for degenerate vectors.
    val cos = round(graft.core.Exprs.fdiv(
      dot(col("qv"), col("cv")), col("qn") * col("cn")), 6)
    val gt = ranked(base.join(q, col("nid") =!= col("query_id"))
      .select(col("query_id"), col("nid"), cos.as("cos")))
      .select(col("query_id"), col("nid"), lit(true).as("rel"))
    val cand = base.join(q,
      col("cb") === col("qb") && col("nid") =!= col("query_id"))
      .select(col("query_id"), col("nid"), cos.as("cos"))
    val nCand = cand.groupBy("query_id").agg(count(lit(1)).as("n_candidates"))
    // ln(rank+1)/ln(2) spelled out on BOTH engines (a native log2 can differ
    // in the last ulp from the ln ratio); binary relevance, |GT| = k ideal
    val idcg = (1 to k).map(i => 1.0 / (math.log(i + 1.0) / math.log(2.0))).sum
    val perQ = ranked(cand)
      .join(gt, Seq("query_id", "nid"), "left")
      .groupBy("query_id").agg(
        (sum(coalesce(col("rel").cast("int"), lit(0))).cast("double") / k)
          .as("recall"),
        coalesce(max(when(col("rel"), lit(1.0) / col("rank"))), lit(0.0))
          .as("mrr"),
        (coalesce(sum(when(col("rel"),
          lit(1.0) / (log(col("rank") + 1) / math.log(2.0)))), lit(0.0)) / idcg)
          .as("ndcg"))
    q.select("query_id").join(nCand, Seq("query_id"), "left")
      .join(perQ, Seq("query_id"), "left")
      .select(col("query_id"),
        coalesce(col("n_candidates"), lit(0L)).as("n_candidates"),
        round(coalesce(col("recall"), lit(0.0)), 6).as("recall_at_k"),
        round(coalesce(col("mrr"), lit(0.0)), 6).as("mrr_at_k"),
        round(coalesce(col("ndcg"), lit(0.0)), 6).as("ndcg_at_k"))
  }
}
