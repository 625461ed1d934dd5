package graft.functions

import org.apache.spark.sql.{Column, Encoder}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** Element-wise vector aggregates over `array<double>` columns.
  *
  * The stock-function route to a per-group centroid is
  * `posexplode + groupBy(key, pos)` — which shuffles n·dims rows. This
  * Aggregator keeps one (sum[dims], count) buffer per group per partition
  * and merges buffers map-side, so the exchange carries
  * groups·dims·partitions values instead of the whole exploded corpus:
  * the difference between shuffling 100 TB and shuffling kilobytes when
  * computing label centroids over billions of embeddings.
  *
  * Runs as an ObjectHashAggregate (imperative buffer, in-place array adds);
  * no per-row allocation after the first vector of each group.
  */
object VectorAgg {

  case class VecBuf(var sum: Array[Double], var n: Long)

  private object VectorAvgAgg extends Aggregator[Seq[Double], VecBuf, Seq[Double]] {
    def zero: VecBuf = VecBuf(null, 0L)
    def reduce(b: VecBuf, v: Seq[Double]): VecBuf = {
      if (v == null) b
      else if (b.sum == null) { b.sum = v.toArray; b.n = 1L; b }
      else {
        val s = b.sum
        var i = 0
        while (i < s.length) { s(i) += v(i); i += 1 }
        b.n += 1
        b
      }
    }
    def merge(a: VecBuf, c: VecBuf): VecBuf = {
      if (c.sum == null) a
      else if (a.sum == null) c
      else {
        val s = a.sum
        var i = 0
        while (i < s.length) { s(i) += c.sum(i); i += 1 }
        a.n += c.n
        a
      }
    }
    def finish(b: VecBuf): Seq[Double] =
      if (b.sum == null) null else b.sum.map(_ / b.n).toSeq
    def bufferEncoder: Encoder[VecBuf] = ExpressionEncoder[VecBuf]()
    def outputEncoder: Encoder[Seq[Double]] = ExpressionEncoder[Seq[Double]]()
  }

  /** Element-wise mean of an `array<double>` column (null vectors skipped,
    * null on empty/all-null groups). All input vectors of a group must share
    * one length.
    */
  def vectorAvg(c: Column): Column = udaf(VectorAvgAgg).apply(c)
}
