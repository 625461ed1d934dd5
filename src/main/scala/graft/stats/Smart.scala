package graft.stats

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, StructField, StructType}

import graft.core.{Dist, ReturnsFrame}

/** Autocorrelation penalty, smart ratios and the probabilistic Sharpe ratio
  * (reference: alphastats/stats.py:255-336, 1292-1361).
  *
  * The lag-1 correlation is computed distributed (lag window + corr — the
  * reference's hand-rolled covariance/variance sums over (head, tail) slices
  * are exactly Pearson correlation of the lag pairs); only the O(n)
  * geometric-decay sum Σ((n−x)/n)·ρˣ is driver-side, in closed form.
  */
object Smart {

  /** Per-column penalty √(1 + 2·Σ_{x=1}^{n-1} ((n−x)/n)·ρˣ), ρ = |lag-1 corr|;
    * NaN when n < 2 or a slice variance is 0 (alphastats/stats.py:1292-1315).
    */
  def autocorrPenaltyValues(returns: DataFrame): Seq[(String, Double)] = {
    val rfm = ReturnsFrame(returns)
    val (odf, ord) = rfm.withOrder
    rfm.numericCols.map { c =>
      val nn = odf.select(ord.as("__ord"), col(c).as("__v")).filter(col("__v").isNotNull)
      val w = Window.orderBy("__ord")
      val row = nn.withColumn("__prev", lag("__v", 1).over(w))
        .agg(count("__v"), corr("__prev", "__v")).head()
      val n = row.getLong(0)
      val penalty =
        if (n < 2 || row.isNullAt(1) || row.getDouble(1).isNaN) Double.NaN
        else {
          val coef = math.abs(row.getDouble(1))
          math.sqrt(1 + 2 * decaySum(coef, n))
        }
      c -> penalty
    }
  }

  /** Σ_{x=1}^{n-1} ((n−x)/n)·cˣ in closed form:
    * Σcˣ − (1/n)Σx·cˣ over x ∈ [1, n−1].
    */
  private def decaySum(c: Double, n: Long): Double = {
    val m = n - 1
    if (c == 0.0) 0.0
    else if (math.abs(1.0 - c) < 1e-12) m.toDouble - m.toDouble * (m + 1) / (2.0 * n)
    else {
      val cm = math.pow(c, m.toDouble)
      val s1 = c * (1 - cm) / (1 - c)
      val s2 = c * (1 - (m + 1) * cm + m * cm * c) / ((1 - c) * (1 - c))
      s1 - s2 / n
    }
  }

  def autocorrPenalty(returns: DataFrame): DataFrame =
    localRow(returns, autocorrPenaltyValues(returns).map(_._2))

  /** base ratio ÷ penalty, per column (alphastats/stats.py:1334-1361). */
  def scaleByPenalty(base: DataFrame, returns: DataFrame): DataFrame = {
    val penalties = autocorrPenaltyValues(returns).toMap
    val row = base.head()
    val vals = base.columns.toSeq.map { c =>
      val b = row.getAs[Any](base.columns.indexOf(c)) match {
        case d: Double => d
        case null => Double.NaN
      }
      b / penalties(c)
    }
    localRow(returns, vals, base.columns.toSeq)
  }

  /** QuantStats-compatible PSR (alphastats/stats.py:255-336). Note the
    * preserved quirks: the collected kurtosis is ALREADY excess yet still has
    * 3 subtracted again, and `annualize` multiplies the probability by √252
    * (hard-coded) — both QuantStats behaviors.
    */
  def psr(returns: DataFrame, rf: Double, periods: Int, annualize: Boolean,
      smart: Boolean): DataFrame = {
    val base =
      if (smart) Stats.smartSharpe(returns, 0.0, periods, annualize = false)
      else Stats.sharpe(returns, 0.0, periods, annualize = false)
    val cols = base.columns.toSeq
    val baseRow = base.head()
    val skewRow = Stats.skew(returns).head()
    val kurtRow = Stats.kurtosis(returns).head()
    val countRow = ReturnsFrame(returns).aggAll(count).head()
    val vals = cols.indices.map { i =>
      val b = dbl(baseRow, i)
      val sk = dbl(skewRow, i)
      val ku = dbl(kurtRow, i)
      val n = countRow.getLong(i)
      val sigma = math.sqrt(
        (1 + 0.5 * b * b - sk * b + ((ku - 3) / 4) * b * b) / (n - 1))
      val p = Dist.cdf((b - rf) / sigma)
      if (annualize) p * math.sqrt(252.0) else p
    }
    localRow(returns, vals, cols)
  }

  private def dbl(r: Row, i: Int): Double =
    if (r.isNullAt(i)) Double.NaN else r.getDouble(i)

  private def localRow(returns: DataFrame, vals: Seq[Double]): DataFrame =
    localRow(returns, vals, ReturnsFrame(returns).numericCols)

  private def localRow(returns: DataFrame, vals: Seq[Double], cols: Seq[String]): DataFrame = {
    val schema = StructType(cols.map(c => StructField(c, DoubleType, nullable = false)))
    returns.sparkSession.createDataFrame(
      java.util.Collections.singletonList(Row.fromSeq(vals)), schema)
  }
}
