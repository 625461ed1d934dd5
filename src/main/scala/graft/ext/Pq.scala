package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Product quantization for embedding compression + approximate nearest
  * neighbor (Jégou, Douze, Schmid 2011, "Product Quantization for Nearest
  * Neighbor Search" — the public IVF-PQ family every billion-scale ANN
  * system builds on).
  *
  * The vector is split into `m` contiguous subvectors; each subspace has
  * its own codebook of `k` centroids; a vector is stored as `m` small
  * integer codes (m bytes at k ≤ 256 — a 64-dim float vector compresses
  * 256 B → 8 B, 32×). Search runs in code space: per query, a LUT of
  * k·m subspace distances is precomputed once (O(k·d) — driver/executor
  * local, independent of corpus size), and each candidate's asymmetric
  * distance (ADC) is m table lookups + adds — no float vector is ever
  * read at scan time. At 100 TB this is the difference between scanning
  * compressed codes that fit in memory and re-reading raw embeddings.
  *
  * Production path: [[train]] (bounded deterministic driver sample for
  * per-subspace Lloyd, optional distributed refinement where each
  * iteration shuffles only m·k centroid partials per partition),
  * [[encode]] (one fused codegen'd argmin per subspace —
  * [[graft.functions.VectorExprs.nearestCentroid]] — over the slice),
  * [[adcTopK]] (LUT scan over codes). Exercised by `PqScaleProbe` at
  * 1M×64d and the recall-floor spec.
  *
  * Gate path (q216): the same algebra in a cross-engine-stable
  * formulation — data-derived codebook, subspace distances as UNROLLED
  * per-dimension chains (both engines add the same doubles left to
  * right), argmin on `round(d2, 4)` with centroid-id tie-break (the q57
  * convention) — so DuckDB replays codes, ADC distances, and recall
  * bit-for-bit.
  */
object Pq {

  /** Per-subspace codebooks: `centroids(sub)(code)` is a subDim-length
    * centroid; `m · subDim` = vector dim. */
  case class Codebook(m: Int, k: Int, subDim: Int,
      centroids: Array[Array[Array[Double]]]) {
    require(centroids.length == m && centroids.forall(_.length == k) &&
      centroids.forall(_.forall(_.length == subDim)))
    def dim: Int = m * subDim
  }

  /** Split a collected vector into m subvectors. */
  private def slices(v: Array[Double], m: Int): Array[Array[Double]] = {
    val subDim = v.length / m
    Array.tabulate(m)(s => v.slice(s * subDim, (s + 1) * subDim))
  }

  private def d2(a: Array[Double], b: Array[Double]): Double = {
    var s = 0.0; var i = 0
    while (i < a.length) { val t = a(i) - b(i); s += t * t; i += 1 }
    s
  }

  /** Train per-subspace codebooks. The sample is deterministic (lowest
    * `sampleSize` ids — the bounded-driver-probe convention); `iterations`
    * of Lloyd run driver-side per subspace on that sample. Empty clusters
    * keep their previous centroid. For corpus-level refinement after
    * seeding, see [[refine]].
    */
  def train(corpus: DataFrame, idCol: String, vecCol: String,
      m: Int, k: Int, sampleSize: Int = 1024, iterations: Int = 8): Codebook = {
    val rows = corpus.orderBy(col(idCol))
      .select(col(vecCol).cast("array<double>")).limit(sampleSize)
      .collect().map(_.getSeq[Double](0).toArray)
    require(rows.nonEmpty && rows.head.length % m == 0,
      s"dim ${rows.headOption.map(_.length)} not divisible by m=$m")
    val subDim = rows.head.length / m
    val cents = Array.tabulate(m) { s =>
      val sub = rows.map(v => v.slice(s * subDim, (s + 1) * subDim))
      // seed: first k distinct-ish sample subvectors
      var c = sub.take(k).padTo(k, sub.head).map(_.clone)
      for (_ <- 1 to iterations) {
        val sums = Array.fill(k)(new Array[Double](subDim))
        val counts = new Array[Long](k)
        sub.foreach { v =>
          var best = 0; var bestD = Double.MaxValue; var j = 0
          while (j < k) {
            val d = d2(v, c(j)); if (d < bestD) { bestD = d; best = j }; j += 1
          }
          counts(best) += 1
          var i = 0
          while (i < subDim) { sums(best)(i) += v(i); i += 1 }
        }
        c = Array.tabulate(k)(j =>
          if (counts(j) == 0) c(j) else sums(j).map(_ / counts(j)))
      }
      c
    }
    Codebook(m, k, subDim, cents)
  }

  /** Distributed codebook refinement: one Lloyd iteration per call over the
    * FULL corpus — assign every row's subvectors with the fused argmin,
    * recompute centroids via the vector-mean Aggregator. Each iteration's
    * exchange carries m·k centroid partials per partition (never the
    * corpus); the driver holds only the m·k·subDim codebook.
    */
  def refine(corpus: DataFrame, vecCol: String, cb: Codebook,
      iterations: Int = 2): Codebook = {
    var cur = cb
    for (_ <- 1 to iterations) {
      val v = col(vecCol).cast("array<double>")
      val subCols = (0 until cur.m).flatMap { s =>
        val sv = slice(v, s * cur.subDim + 1, cur.subDim)
        Seq(graft.functions.VectorExprs
          .nearestCentroid(sv, cur.centroids(s)).as(s"__c$s"),
          sv.as(s"__v$s"))
      }
      val assigned = corpus.select(subCols: _*)
      val perSub = (0 until cur.m).map { s =>
        assigned.groupBy(col(s"__c$s").as("code"))
          .agg(graft.functions.VectorAgg.vectorAvg(col(s"__v$s")).as("cent"))
          .withColumn("sub", lit(s))
      }.reduce(_ unionAll _)
      val got = perSub.collect()
        .map(r => (r.getAs[Int]("sub"), r.getAs[Number]("code").intValue()) ->
          r.getSeq[Double](1).toArray).toMap
      cur = cur.copy(centroids = Array.tabulate(cur.m)(s =>
        Array.tabulate(cur.k)(c => got.getOrElse((s, c), cur.centroids(s)(c)))))
    }
    cur
  }

  /** PQ codes of a vector column: `array<int>` of length m, each the fused
    * codegen'd argmin over that subspace's codebook (production path — raw
    * double argmin, lowest index on ties). */
  def encode(vec: Column, cb: Codebook): Column = {
    val v = vec.cast("array<double>")
    array((0 until cb.m).map { s =>
      graft.functions.VectorExprs.nearestCentroid(
        slice(v, s * cb.subDim + 1, cb.subDim), cb.centroids(s))
    }: _*)
  }

  /** Reconstructed (decoded) vector from PQ codes. */
  def reconstruct(codes: Column, cb: Codebook): Column =
    concat((0 until cb.m).map { s =>
      element_at(typedLit(cb.centroids(s).map(_.toSeq).toSeq),
        element_at(codes, s + 1) + 1)
    }: _*)

  /** Unrolled subspace squared distance `Σᵢ (v[off+i] − cᵢ)²` — a fixed
    * left-to-right addition chain, so an external engine replaying the
    * same chain produces the identical double. */
  def subD2Unrolled(v: Column, offset: Int, centroid: Array[Double]): Column =
    centroid.zipWithIndex.map { case (c, i) =>
      val t = element_at(v, offset + i + 1) - lit(c)
      t * t
    }.reduce(_ + _)

  /** Column-column twin of [[subD2Unrolled]]: the IDENTICAL left-assoc
    * term order, but the second vector is a runtime array column instead
    * of compile-time literals — so a BATCH of query vectors can ride as
    * DATA (one exploded literal array, ONE compiled plan, one corpus
    * pass) instead of as plan size (one unioned scan + codegen unit per
    * query). IEEE-identical to the literal form whenever the column
    * elements equal the literals.
    */
  def subD2Cols(v: Column, q: Column, offset: Int, subDim: Int): Column =
    (0 until subDim).map { i =>
      val t = element_at(v, offset + i + 1) - element_at(q, offset + i + 1)
      t * t
    }.reduce(_ + _)

  /** Cross-engine-stable subspace assignment: argmin over `round(d2, 4)`
    * with lowest-code tie-break, as `array_min` over (d2r, code) structs
    * (struct ordering = lexicographic). */
  def assignRounded(v: Column, sub: Int, cb: Codebook): Column =
    array_min(array((0 until cb.k).map { c =>
      struct(round(subD2Unrolled(v, sub * cb.subDim, cb.centroids(sub)(c)), 4)
        .as("d"), lit(c).as("i"))
    }: _*)).getField("i")

  /** Rounded-argmin codes for the gate path — the fused loop expression
    * ([[graft.functions.PqEncodeRounded]]), semantics identical to
    * [[encodeRoundedUnrolled]] (Round16Spec pins equality). The unrolled
    * Column form expands to m·k codegen'd chains and overflowed Janino's
    * 64 KB method limit inside the fused ADC-scan stage, disabling
    * whole-stage codegen for the entire stage.
    */
  def encodeRounded(vec: Column, cb: Codebook): Column =
    graft.functions.VectorExprs.pqEncodeRounded(
      vec.cast("array<double>"), cb.centroids, 4)

  /** The original unrolled-chain + struct-array-min formulation of
    * [[encodeRounded]] — kept as the independent reference the spec checks
    * the fused expression against (and as documentation of the exact
    * chain/round/tie-break the oracle replays).
    */
  def encodeRoundedUnrolled(vec: Column, cb: Codebook): Column = {
    val v = vec.cast("array<double>")
    array((0 until cb.m).map(assignRounded(v, _, cb)): _*)
  }

  /** The k·m subspace-distance LUT of one query — each entry the same
    * left-to-right addition chain as [[subD2Unrolled]], so ADC totals are
    * engine-replayable. Layout: lut(s)(code). */
  def queryLut(query: Array[Double], cb: Codebook): Array[Array[Double]] =
    Array.tabulate(cb.m) { s =>
      val qs = query.slice(s * cb.subDim, (s + 1) * cb.subDim)
      Array.tabulate(cb.k) { c =>
        cb.centroids(s)(c).zip(qs).map { case (cv, qv) =>
          val t = qv - cv; t * t
        }.reduceLeft(_ + _)
      }
    }

  /** ADC distance of a literal query vector to a codes column: the query's
    * LUT is computed once driver-side; the scan is m lookups + adds. */
  def adcDist(codes: Column, query: Array[Double], cb: Codebook): Column =
    graft.functions.VectorExprs.pqAdcBatch(codes, Array(queryLut(query, cb)))
      .getItem(0)

  /** LUT-scan approximate top-k over a pre-encoded corpus: `codes` frame
    * has (idCol, codesCol); queries are bounded and driver-resident. Their
    * LUTs ride into ONE fused batch expression
    * ([[graft.functions.PqAdcBatch]]) — a single pass over the code
    * column computes every query's ADC in a tight Q·m loop, so |queries|
    * never multiplies the number of corpus scans and the scan reads
    * 8-16 bytes per vector instead of the raw floats. Ranking on
    * `round(adc, 4)` with id tie-break. */
  def adcTopK(codes: DataFrame, idCol: String, codesCol: String,
      queries: Seq[(Long, Array[Double])], cb: Codebook, k: Int = 10): DataFrame = {
    val luts = queries.map { case (_, qv) => queryLut(qv, cb) }.toArray
    val qids = queries.map(_._1)
    val scored = codes
      .select(col(idCol).as("neighbor_id"),
        posexplode(graft.functions.VectorExprs.pqAdcBatch(col(codesCol), luts))
          .as(Seq("qi", "adc0")))
      .select(element_at(typedLit(qids), col("qi") + 1).as("query_id"),
        col("neighbor_id"), round(col("adc0"), 4).as("adc"))
      .filter(col("neighbor_id") =!= col("query_id"))
    // per-query top-k via the bounded TopKAgg, NOT a window: a window
    // shuffles all n·|queries| scored rows to the per-query reducers; the
    // truncated-merge aggregate ships ≤ k·|queries|·partitions entries.
    // Order (-adc desc, id asc) ≡ (adc asc, id asc) — the same total order
    // a window would use, so results are identical.
    scored.groupBy("query_id")
      .agg(graft.functions.TopKAgg.topK(-col("adc"), col("neighbor_id"), k)
        .as("__top"))
      .select(col("query_id"), posexplode(col("__top")).as(Seq("__pos", "__e")))
      .select(col("query_id"), col("__e.id").as("neighbor_id"),
        (-col("__e.score")).as("adc"))
      .orderBy(col("query_id"), col("adc"), col("neighbor_id"))
  }

  /** In-memory reference of the gate-path algebra (tests): codes and ADC
    * distance with the identical rounding and tie rules. */
  def referenceEncodeRounded(v: Array[Double], cb: Codebook): Array[Int] =
    Array.tabulate(cb.m) { s =>
      val sv = v.slice(s * cb.subDim, (s + 1) * cb.subDim)
      val ds = cb.centroids(s).map { c =>
        val raw = c.zip(sv).map { case (cv, x) => val t = x - cv; t * t }
          .reduceLeft(_ + _)
        // HALF_UP to match Spark's round() (rint would be half-even)
        BigDecimal(raw).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
      }
      ds.zipWithIndex.minBy { case (d, i) => (d, i) }._2
    }
}
