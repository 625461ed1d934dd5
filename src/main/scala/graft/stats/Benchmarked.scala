package graft.stats

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.core.{AsOfJoin, Exprs, ReturnsFrame}
import graft.core.Exprs.fdiv

/** Benchmark-relative metrics: align returns and benchmark (backward as-of
  * join on the temporal columns, positional concat when either lacks one),
  * then one wide aggregation per metric
  * (reference: alphastats/stats.py:419-471, 527-579, 1398-1567).
  */
object Benchmarked {

  private val B = ReturnsFrame.BenchmarkCol

  /** (joined frame, strategy column names). */
  private[graft] def joined(returns: DataFrame, benchmark: DataFrame): (DataFrame, Seq[String]) = {
    val rfm = ReturnsFrame(returns)
    val bm = ReturnsFrame.prepareBenchmark(benchmark)
    val j = (rfm.temporalCol, bm.temporalCol) match {
      case (Some(lt), Some(rt)) => AsOfJoin.backward(rfm.df, bm.df, lt, rt, Seq(B))
      case _ => AsOfJoin.positional(rfm.df, bm.df.select(col(B)))
    }
    (j, rfm.numericCols)
  }

  private def beta(c: Column): Column = fdiv(covar_samp(c, col(B)), var_samp(col(B)))

  /** CAPM α/β per strategy column as struct{alpha, beta}
    * (reference: alphastats/stats.py:419-471).
    */
  def greeks(returns: DataFrame, benchmark: DataFrame, periods: Int = 252): DataFrame = {
    val (j, cols) = joined(returns, benchmark)
    j.select(cols.map { c =>
      val b = beta(col(c))
      val alpha = avg(col(c)) - b * avg(col(B))
      struct((alpha * periods).as("alpha"), b.as("beta")).as(c)
    }: _*)
  }

  def informationRatio(returns: DataFrame, benchmark: DataFrame,
      periods: Int = 252, annualize: Boolean = false): DataFrame = {
    val (j, cols) = joined(returns, benchmark)
    j.select(cols.map { c =>
      val active = col(c) - col(B)
      val ir = fdiv(avg(active), stddev_samp(active))
      (if (annualize) ir * math.sqrt(periods.toDouble) else ir).as(c)
    }: _*)
  }

  def correlation(returns: DataFrame, benchmark: DataFrame): DataFrame = {
    val (j, cols) = joined(returns, benchmark)
    j.select(cols.map(c => corr(col(c), col(B)).as(c)): _*)
  }

  def rSquared(returns: DataFrame, benchmark: DataFrame): DataFrame = {
    val c = correlation(returns, benchmark)
    c.select(c.columns.map(n => (col(n) * col(n)).as(n)): _*)
  }

  /** (comp(r) − rf) / β (reference: alphastats/stats.py:1486-1503). */
  def treynorRatio(returns: DataFrame, benchmark: DataFrame, rf: Double = 0.0): DataFrame = {
    val (j, cols) = joined(returns, benchmark)
    j.select(cols.map(c => fdiv(Exprs.comp(col(c)) - lit(rf), beta(col(c))).as(c)): _*)
  }
}
