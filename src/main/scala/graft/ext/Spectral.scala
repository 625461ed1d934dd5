package graft.ext

import org.apache.spark.sql.{Column, DataFrame, Encoder, Row, SparkSession}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, LongType, StructField, StructType}

/** Spectral analysis of an embedding corpus: the top principal component
  * (dominant eigenvector of the centered Gram/covariance matrix) via one
  * distributed X^T X pass and driver-side power iteration.
  *
  * The 100-TB shape: the n·d² work — accumulating Σ v·vᵀ over every vector —
  * runs as a single global [[Aggregator]] whose buffer is one flat
  * d²+d+1 double array (cross-products, per-dim sums, count) per partition,
  * merged map-side then tree-combined: the exchange carries
  * `partitions × (d²+d+1)` doubles, NOT the corpus. The naive stock-function
  * route (posexplode twice + groupBy(i,j)) shuffles n·d² rows — 400 billion
  * for 100M vectors at d=64 — where this buffer plan shuffles kilobytes.
  * The d×d eigen-solve itself is a bounded driver-side object (d=64 →
  * 32 KB), same budget class as the IVF centroid sample: never
  * data-proportional.
  *
  * Determinism contract with the DuckDB oracle (q86): both sides compute the
  * centered Gram as `Σ x_i·x_j − n·avg_i·avg_j` in doubles, run the same
  * fixed unrolled power iterations from the all-ones vector, and round only
  * the FINAL normalized loadings to 6 dp — fp summation-order noise (~1e-13
  * relative) cannot move a 6-dp digit, and a boundary tie in one Gram entry
  * perturbs the normalized result by ~|g|/λ·1e-6 ≪ 1e-6.
  */
object Spectral {

  /** Flat accumulator: acc(0 until d*d) = Σ x_i·x_j (row-major),
    * acc(d*d until d*d+d) = Σ x_i, acc(d*d+d) = n.
    */
  case class GramBuf(var acc: Array[Double])

  private final class GramAgg(d: Int)
      extends Aggregator[Seq[Double], GramBuf, Seq[Double]] {
    def zero: GramBuf = GramBuf(null)
    def reduce(b: GramBuf, v: Seq[Double]): GramBuf = {
      if (v == null) return b
      require(v.length == d, s"expected dim $d, got ${v.length}")
      if (b.acc == null) b.acc = new Array[Double](d * d + d + 1)
      val a = b.acc
      val x = v.toArray
      var i = 0
      while (i < d) {
        val xi = x(i)
        val off = i * d
        var j = 0
        while (j < d) { a(off + j) += xi * x(j); j += 1 }
        a(d * d + i) += xi
        i += 1
      }
      a(d * d + d) += 1d
      b
    }
    def merge(p: GramBuf, q: GramBuf): GramBuf = {
      if (q.acc == null) return p
      if (p.acc == null) return q
      var i = 0
      while (i < p.acc.length) { p.acc(i) += q.acc(i); i += 1 }
      p
    }
    def finish(b: GramBuf): Seq[Double] =
      if (b.acc == null) null else b.acc.toSeq
    def bufferEncoder: Encoder[GramBuf] = ExpressionEncoder[GramBuf]()
    def outputEncoder: Encoder[Seq[Double]] = ExpressionEncoder[Seq[Double]]()
  }

  /** One-pass raw moments of the `array<double>` column `vecCol`: returns
    * the flat (d², d, 1) accumulator described on [[GramBuf]].
    */
  def gramMoments(df: DataFrame, vecCol: String, d: Int): Array[Double] = {
    val agg = udaf(new GramAgg(d))
    val row = df.select(agg(col(vecCol)).as("m")).head()
    row.getSeq[Double](0).toArray
  }

  /** Loadings of the top principal component of the vectors in `vecCol`
    * (dim `d`): dominant eigenvector of the CENTERED Gram matrix after
    * `iters` power iterations from the all-ones vector, normalized at the
    * end and rounded to 6 dp. Sign follows the iteration (deterministic
    * given the fixed start vector). The array form lets callers cache the
    * one expensive Gram pass and reuse it across queries.
    */
  def topLoadings(df: DataFrame, vecCol: String, d: Int,
      iters: Int = 3): Array[Double] = {
    require(iters >= 1, s"iters=$iters must be >= 1")
    val m = gramMoments(df, vecCol, d)
    val n = m(d * d + d)
    require(n > 0, "topLoadings: empty input")
    // centered Gram, oracle formula: sum_ij - n * avg_i * avg_j
    val g = Array.tabulate(d, d) { (i, j) =>
      m(i * d + j) - n * (m(d * d + i) / n) * (m(d * d + j) / n)
    }
    var v = Array.fill(d)(1d)
    for (_ <- 0 until iters) {
      val nv = new Array[Double](d)
      var i = 0
      while (i < d) {
        var s = 0d
        var j = 0
        while (j < d) { s += g(i)(j) * v(j); j += 1 }
        nv(i) = s
        i += 1
      }
      v = nv
    }
    val z = math.sqrt(v.map(x => x * x).sum)
    v.map(x => BigDecimal(x / z)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
  }

  /** The loadings as a one-row-per-dimension frame: (dim, loading). */
  def loadingsFrame(spark: SparkSession, loadings: Array[Double]): DataFrame = {
    val rows = loadings.zipWithIndex.map { case (x, i) => Row(i.toLong, x) }
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows.toIndexedSeq, 1),
      StructType(Seq(StructField("dim", LongType, nullable = false),
        StructField("loading", DoubleType, nullable = false))))
  }

  /** [[topLoadings]] + [[loadingsFrame]] in one call. */
  def topComponent(spark: SparkSession, df: DataFrame, vecCol: String,
      d: Int, iters: Int = 3): DataFrame =
    loadingsFrame(spark, topLoadings(df, vecCol, d, iters))
}
