package graft.functions

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** Bounded-memory quantile sketch: DDSketch (Masson, Rim & Lee, VLDB 2019
  * — public method), as a typed [[Aggregator]].
  *
  * Chosen over t-digest/GK deliberately: DDSketch's buckets are a pure
  * FUNCTION of each value (geometric index `ceil(log_γ x)`), so the sketch
  * is **merge-order-invariant and deterministic** — the same multiset gives
  * bit-identical estimates under any partitioning (asserted in
  * Round12Spec), which makes it gateable by a hash-comparing oracle and
  * reproducible across runs. t-digest and GK are merge-order-dependent:
  * correct within their error bound but nondeterministic under Spark's
  * nondeterministic partition merge order — a flaky gate by construction.
  *
  * Guarantee: for γ = (1+α)/(1−α), every value in bucket i lies within
  * relative α of the bucket estimate `2γ^i/(γ+1)`, so the reported
  * q-quantile is within relative α of the TRUE ORDER STATISTIC at rank
  * `⌊q(n−1)⌋+1` (the discrete quantile — not the interpolated midpoint,
  * whose distance additionally depends on local sample spacing). Memory is
  * O(log_γ(max/min)) occupied buckets regardless of n — the bound exact
  * `percentile` (whole-multiset-per-group) cannot offer; `maxBuckets`
  * caps even adversarial ranges by collapsing the LOWEST positive (and
  * least-negative) buckets, degrading only the quantiles that land there.
  *
  * Negative values mirror into their own bucket store; exact zeros count
  * separately. The walk order is negatives (most negative first), zeros,
  * positives — standard quantile order.
  */
object DDSketchAgg {

  /** (positive buckets, exact-zero count, negative buckets — index over
    * |x|). Maps are index → count. */
  case class DDBuf(pos: Map[Int, Long], zero: Long, neg: Map[Int, Long])

  /** finish() layout: one estimate per requested quantile, then the
    * occupied-bucket count as a trailing diagnostic element. */
  class Quantiles(alpha: Double, qs: Seq[Double], maxBuckets: Int = 2048)
      extends Aggregator[Double, DDBuf, Seq[Double]] {
    require(alpha > 0 && alpha < 1, s"alpha $alpha")
    private val gamma = (1 + alpha) / (1 - alpha)
    private val logGamma = math.log(gamma)

    private def bucketOf(x: Double): Int = math.ceil(math.log(x) / logGamma).toInt
    private def estimateOf(i: Int): Double = 2.0 * math.pow(gamma, i) / (gamma + 1.0)

    /** Collapse the lowest indices into one bucket until within budget —
      * deterministic, and only ever widens the error of the smallest
      * magnitudes. */
    private def bounded(m: Map[Int, Long]): Map[Int, Long] =
      if (m.size <= maxBuckets) m
      else {
        val keys = m.keys.toArray.sorted
        val cut = keys(m.size - maxBuckets) // keep the top maxBuckets indices
        val low = keys.takeWhile(_ < cut).map(m).sum
        m.filter { case (k, _) => k >= cut } |+| (cut -> low)
      }
    private implicit class MapAdd(m: Map[Int, Long]) {
      def |+|(kv: (Int, Long)): Map[Int, Long] =
        if (kv._2 == 0) m else m.updated(kv._1, m.getOrElse(kv._1, 0L) + kv._2)
      def |++|(o: Map[Int, Long]): Map[Int, Long] =
        o.foldLeft(m)((acc, kv) => acc |+| kv)
    }

    def zero: DDBuf = DDBuf(Map.empty, 0L, Map.empty)

    def reduce(b: DDBuf, x: Double): DDBuf =
      if (x.isNaN) b
      else if (x == 0.0) b.copy(zero = b.zero + 1)
      else if (x > 0) b.copy(pos = bounded(b.pos |+| (bucketOf(x) -> 1L)))
      else b.copy(neg = bounded(b.neg |+| (bucketOf(-x) -> 1L)))

    def merge(a: DDBuf, b: DDBuf): DDBuf =
      DDBuf(bounded(a.pos |++| b.pos), a.zero + b.zero, bounded(a.neg |++| b.neg))

    /** Value at rank ⌊q(n−1)⌋+1 (1-based) of the sketched multiset. */
    def quantile(b: DDBuf, q: Double): Double = {
      val n = b.zero + b.pos.valuesIterator.sum + b.neg.valuesIterator.sum
      if (n == 0) return Double.NaN
      val target = math.floor(q * (n - 1)).toLong + 1
      var cum = 0L
      for ((i, c) <- b.neg.toSeq.sortBy(-_._1)) { // most negative first
        cum += c
        if (cum >= target) return -estimateOf(i)
      }
      cum += b.zero
      if (cum >= target) return 0.0
      for ((i, c) <- b.pos.toSeq.sortBy(_._1)) {
        cum += c
        if (cum >= target) return estimateOf(i)
      }
      estimateOf(b.pos.keys.max) // unreachable (cum == n covers all ranks)
    }

    def finish(b: DDBuf): Seq[Double] =
      qs.map(q => quantile(b, q)) :+ (b.pos.size + b.neg.size +
        (if (b.zero > 0) 1 else 0)).toDouble

    def bufferEncoder: Encoder[DDBuf] = ExpressionEncoder[DDBuf]()
    def outputEncoder: Encoder[Seq[Double]] = ExpressionEncoder[Seq[Double]]()
  }
}
