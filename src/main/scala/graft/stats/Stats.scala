package graft.stats

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.core.{Dist, Exprs, ReturnsFrame}
import graft.core.Exprs.fdiv
import graft.functions.GraftProduct.product

/** The reference's public metric API (SURVEY.md §2.b), Spark-first.
  *
  * Contract: every function takes a DataFrame whose numeric columns are
  * return series (plus at most one temporal column) and returns a 1-row
  * DataFrame keyed by the original column names — the reference's shape
  * contract (alphastats/stats.py:120-121). `Stats.scalar` collapses a 1-row
  * 1-col result to Double for series-style use.
  *
  * Each scalar metric is a single wide aggregation (one scan, map-side
  * partials, no row shuffle). Drawdown/streak metrics add ordered window
  * passes. This wide API mirrors the reference's one-column-per-asset model;
  * the scale path for many assets is [[graft.api.GroupedStats]] (long format,
  * partitioned by asset key).
  */
object Stats {

  def scalar(res: DataFrame): Double = {
    val row = res.head()
    row.get(0) match {
      case d: Double => d
      case f: Float => f.toDouble
      case l: java.lang.Long => l.toDouble
      case i: java.lang.Integer => i.toDouble
      case null => Double.NaN
    }
  }

  def scalarLong(res: DataFrame): Long = res.head().getLong(0)

  // ---- core return / risk -------------------------------------------------

  /** Total compounded return Π(1+r) − 1 (reference: alphastats/stats.py:29-50). */
  def comp(returns: DataFrame): DataFrame =
    ReturnsFrame(returns).aggAll(Exprs.comp)

  /** CAGR; requires a temporal column (reference: alphastats/stats.py:53-89). */
  def cagr(returns: DataFrame, rf: Double = 0.0, compound: Boolean = true,
      periods: Int = 252): DataFrame = {
    val rfm = ReturnsFrame(returns)
    rfm.requireTemporal
    rfm.aggAll(r => Exprs.cagr(r, rf, compound, periods))
  }

  def sharpe(returns: DataFrame, rf: Double = 0.0, periods: Int = 252,
      annualize: Boolean = true): DataFrame =
    ReturnsFrame(returns).aggAll(Exprs.sharpe(_, rf, periods, annualize))

  def sortino(returns: DataFrame, rf: Double = 0.0, periods: Int = 252,
      annualize: Boolean = true): DataFrame =
    ReturnsFrame(returns).aggAll(Exprs.sortino(_, rf, periods, annualize))

  /** Jack Schwager's Sortino / √2 (reference: alphastats/stats.py:1364-1380). */
  def adjustedSortino(returns: DataFrame, rf: Double = 0.0, periods: Int = 252,
      annualize: Boolean = true, smart: Boolean = false): DataFrame = {
    val base =
      if (smart) smartSortino(returns, rf, periods, annualize)
      else sortino(returns, rf, periods, annualize)
    base.select(base.columns.map(c => (col(c) / math.sqrt(2.0)).as(c)): _*)
  }

  def smartAdjustedSortino(returns: DataFrame, rf: Double = 0.0,
      periods: Int = 252, annualize: Boolean = true): DataFrame =
    adjustedSortino(returns, rf, periods, annualize, smart = true)

  def volatility(returns: DataFrame, periods: Int = 252,
      annualize: Boolean = true): DataFrame =
    ReturnsFrame(returns).aggAll(Exprs.volatility(_, periods, annualize))

  def valueAtRisk(returns: DataFrame, sigma: Double = 1.0,
      confidence: Double = 0.95): DataFrame =
    ReturnsFrame(returns).aggAll(Exprs.valueAtRisk(_, sigma, confidence))

  /** CVaR / expected shortfall with VaR fallback when no returns fall below
    * VaR (reference: alphastats/stats.py:1223-1246). The per-column VaR is an
    * aggregate needed inside a row-level predicate, so it is broadcast back
    * over an unbounded window first, then the conditional mean is one agg.
    */
  def conditionalValueAtRisk(returns: DataFrame, sigma: Double = 1.0,
      confidence: Double = 0.95): DataFrame = {
    val conf = if (confidence > 1) confidence / 100 else confidence
    val z = Dist.invCdf(1 - conf)
    val rfm = ReturnsFrame(returns)
    val r = col("__r")
    val withVar = melted(rfm).df.withColumn("__var",
      avg(r).over(Window.partitionBy(col("__asset"))) +
        lit(z * sigma) * stddev_samp(r).over(Window.partitionBy(col("__asset"))))
    val piv = withVar.groupBy(col("__asset"))
      .agg(coalesce(avg(when(r < col("__var"), r)), first(col("__var"))).as("__v"))
      .groupBy().pivot("__asset", rfm.numericCols).agg(first(col("__v")))
    piv.select(rfm.numericCols.map(c => piv(c).as(c)): _*)
  }

  // ---- trade stats --------------------------------------------------------

  def winRate(returns: DataFrame, aggregate: Option[String] = None,
      compounded: Boolean = true): DataFrame =
    aggregated(returns, aggregate, compounded).aggAll(Exprs.winRate)

  def avgReturn(returns: DataFrame, aggregate: Option[String] = None,
      compounded: Boolean = true): DataFrame =
    aggregated(returns, aggregate, compounded).aggAll(Exprs.avgReturn)

  def avgWin(returns: DataFrame, aggregate: Option[String] = None,
      compounded: Boolean = true): DataFrame =
    aggregated(returns, aggregate, compounded).aggAll(Exprs.avgWin)

  def avgLoss(returns: DataFrame, aggregate: Option[String] = None,
      compounded: Boolean = true): DataFrame =
    aggregated(returns, aggregate, compounded).aggAll(Exprs.avgLoss)

  def best(returns: DataFrame, aggregate: Option[String] = None,
      compounded: Boolean = true): DataFrame =
    aggregated(returns, aggregate, compounded).aggAll(max)

  def worst(returns: DataFrame, aggregate: Option[String] = None,
      compounded: Boolean = true): DataFrame =
    aggregated(returns, aggregate, compounded).aggAll(min)

  def expectedReturn(returns: DataFrame, aggregate: Option[String] = None,
      compounded: Boolean = true): DataFrame =
    aggregated(returns, aggregate, compounded).aggAll(Exprs.expectedReturn)

  def payoffRatio(returns: DataFrame): DataFrame =
    ReturnsFrame(returns).aggAll(Exprs.payoffRatio)

  def profitFactor(returns: DataFrame): DataFrame =
    ReturnsFrame(returns).aggAll(Exprs.profitFactor)

  def cpcIndex(returns: DataFrame): DataFrame =
    ReturnsFrame(returns).aggAll(Exprs.cpcIndex)

  def commonSenseRatio(returns: DataFrame): DataFrame =
    ReturnsFrame(returns).aggAll(Exprs.commonSenseRatio)

  def tailRatio(returns: DataFrame, cutoff: Double = 0.95): DataFrame =
    ReturnsFrame(returns).aggAll(Exprs.tailRatio(_, cutoff))

  def outlierWinRatio(returns: DataFrame, quantile: Double = 0.99): DataFrame =
    ReturnsFrame(returns).aggAll(Exprs.outlierWinRatio(_, quantile))

  def outlierLossRatio(returns: DataFrame, quantile: Double = 0.01): DataFrame =
    ReturnsFrame(returns).aggAll(Exprs.outlierLossRatio(_, quantile))

  def kellyCriterion(returns: DataFrame): DataFrame =
    ReturnsFrame(returns).aggAll(Exprs.kellyCriterion)

  def riskOfRuin(returns: DataFrame): DataFrame =
    ReturnsFrame(returns).aggAll(Exprs.riskOfRuin)

  def gainToPainRatio(returns: DataFrame, rf: Double = 0.0): DataFrame =
    ReturnsFrame(returns).aggAll(Exprs.gainToPain(_, rf))

  /** Gain-to-pain over month-SUMMED returns (reference: alphastats/stats.py:1038-1048). */
  def gainToPainRatio1m(returns: DataFrame, rf: Double = 0.0): DataFrame =
    aggregated(returns, Some("month"), compounded = false)
      .aggAll(Exprs.gainToPain(_, rf))

  def exposure(returns: DataFrame): DataFrame =
    ReturnsFrame(returns).aggAll(Exprs.exposure)

  def omega(returns: DataFrame, threshold: Double = 0.0): DataFrame =
    ReturnsFrame(returns).aggAll(Exprs.omega(_, threshold))

  def skew(returns: DataFrame): DataFrame =
    ReturnsFrame(returns).aggAll(Exprs.skew)

  def kurtosis(returns: DataFrame): DataFrame =
    ReturnsFrame(returns).aggAll(Exprs.kurtosis)

  /** Annual → per-period risk-free rate (reference: alphastats/stats.py:1645-1647). */
  def riskFreeRate(rf: Double, periods: Int = 252): Double =
    math.pow(1 + rf, 1.0 / periods) - 1

  // ---- drawdowns ----------------------------------------------------------

  /** Shape-preserving returns→drawdowns transform (reference: alphastats/stats.py:388-416). */
  def toDrawdowns(returns: DataFrame): DataFrame = {
    val rfm = ReturnsFrame(returns)
    val (ddDf, ddName) = withDrawdownCols(rfm)
    // output = the returns-frame data model (temporal + numeric columns, in
    // input order); any other column has no per-row identity through the
    // melt/pivot and is dropped
    val kept = rfm.df.columns.filter(c =>
      rfm.numericCols.contains(c) || rfm.temporalCol.contains(c))
    ddDf.orderBy(col("__ord")).select(kept.map { c =>
      if (rfm.numericCols.contains(c)) col(ddName(c)).as(c) else col(c)
    }.toSeq: _*)
  }

  def maxDrawdown(returns: DataFrame): DataFrame = {
    val rfm = ReturnsFrame(returns)
    val (ddDf, ddName) = withDrawdownCols(rfm)
    ddDf.select(rfm.numericCols.map(c => min(col(ddName(c))).as(c)): _*)
  }

  /** CAGR / |maxDD|; one aggregation over the dd-augmented frame
    * (reference: alphastats/stats.py:474-506).
    */
  def calmar(returns: DataFrame, periods: Int = 252): DataFrame = {
    val rfm = ReturnsFrame(returns)
    rfm.requireTemporal
    val (ddDf, ddName) = withDrawdownCols(rfm)
    ddDf.select(rfm.numericCols.map { c =>
      fdiv(Exprs.cagr(col(c), 0.0, compound = true, periods), abs(min(col(ddName(c))))).as(c)
    }: _*)
  }

  def ulcerIndex(returns: DataFrame): DataFrame = {
    val rfm = ReturnsFrame(returns)
    val (ddDf, ddName) = withDrawdownCols(rfm)
    ddDf.select(rfm.numericCols.map(c =>
      Exprs.ulcerIndex(col(ddName(c)), col(c)).as(c)): _*)
  }

  def recoveryFactor(returns: DataFrame, rf: Double = 0.0): DataFrame = {
    val rfm = ReturnsFrame(returns)
    val (ddDf, ddName) = withDrawdownCols(rfm)
    ddDf.select(rfm.numericCols.map(c =>
      Exprs.recoveryFactor(col(c), col(ddName(c)), rf).as(c)): _*)
  }

  /** Serenity = (Σr − rf) / (ulcer · pitfall), pitfall = −CVaR(dd)/σ(r)
    * (reference: alphastats/stats.py:1549-1567). Computed over the melted
    * frame: the per-column dd-VaR threshold broadcasts via an asset-
    * partitioned window, never a global one.
    */
  def serenityIndex(returns: DataFrame, rf: Double = 0.0): DataFrame = {
    val z = Dist.invCdf(0.05)
    val rfm = ReturnsFrame(returns)
    val dd = graft.api.GroupedStats.withDrawdown(melted(rfm)).df
    val wholeA = Window.partitionBy(col("__asset"))
    val r = col("__r")
    val ddc = col("__dd")
    val withVar = dd.withColumn("__ddvar",
      avg(ddc).over(wholeA) + lit(z) * stddev_samp(ddc).over(wholeA))
    val ddCvar = coalesce(avg(when(ddc < col("__ddvar"), ddc)), first(col("__ddvar")))
    val pitfall = fdiv(-ddCvar, stddev_samp(r))
    val serenity = fdiv(sum(r) - lit(rf), Exprs.ulcerIndex(ddc, r) * pitfall)
    val piv = withVar.groupBy(col("__asset")).agg(serenity.as("__v"))
      .groupBy().pivot("__asset", rfm.numericCols).agg(first(col("__v")))
    piv.select(rfm.numericCols.map(c => piv(c).as(c)): _*)
  }

  // ---- internals ----------------------------------------------------------

  /** Melted (asset, ord, value) view of a wide frame — the internal long
    * format that turns N columns into N window partitions (the 100-TB shape;
    * SURVEY.md §7.1). `__ord` is a (order, uid) struct so duplicate
    * timestamps keep distinct row identity through groupBy/pivot round
    * trips.
    */
  private[graft] def melted(rfm: ReturnsFrame): graft.api.SeriesFrame = {
    val (odf, ord) = rfm.withOrder
    val stacked = odf.select(
      struct(ord.as("o"), monotonically_increasing_id().as("u")).as("__ord"),
      explode(map(rfm.numericCols.flatMap(c =>
        Seq(lit(c), col(c).cast("double"))): _*)).as(Seq("__asset", "__r")))
    graft.api.SeriesFrame(stacked, Seq("__asset"), "__ord", "__r")
  }

  /** Appends `__dd_<c>` drawdown columns for every numeric column via the
    * melted frame: per-asset partitioned windows compute the drawdowns (N
    * columns = N partitions, no single-partition global window), then a
    * pivot on the row ordinal restores the wide shape.
    */
  private[graft] def withDrawdownCols(rfm: ReturnsFrame): (DataFrame, String => String) = {
    val dd = graft.api.GroupedStats.withDrawdown(melted(rfm)).df
    val pivoted = dd.groupBy(col("__ord"))
      .pivot("__asset", rfm.numericCols)
      .agg(first(col("__r")).as("r"), first(col("__dd")).as("dd"))
    // __ord kept so order-sensitive consumers (toDrawdowns) can re-sort;
    // aggregate consumers ignore it
    val restored = pivoted.select(
      (col("__ord") +: rfm.temporalCol.map(t => col("__ord").getField("o").as(t)).toSeq) ++
        rfm.numericCols.map(c => pivoted(s"${c}_r").as(c)) ++
        rfm.numericCols.map(c => pivoted(s"${c}_dd").as(s"__dd_$c")): _*)
    (restored, (c: String) => "__dd_" + c)
  }

  /** Calendar-bucket pre-aggregation (reference `_simple_returns`,
    * alphastats/stats.py:736-774). Returns a ReturnsFrame over the bucketed
    * per-column comp-or-sum returns; bucket keys are dropped.
    */
  private[graft] def aggregated(returns: DataFrame, aggregate: Option[String],
      compounded: Boolean): ReturnsFrame =
    ReturnsFrame(Calendar.simpleReturns(ReturnsFrame(returns), aggregate, compounded))

  // Implemented in sibling files, re-exported here for one API surface:
  def consecutiveWins(returns: DataFrame, aggregate: Option[String] = None,
      compounded: Boolean = true): DataFrame =
    Streaks.consecutive(returns, winning = true, aggregate, compounded)

  def consecutiveLosses(returns: DataFrame, aggregate: Option[String] = None,
      compounded: Boolean = true): DataFrame =
    Streaks.consecutive(returns, winning = false, aggregate, compounded)

  def autocorrPenalty(returns: DataFrame): DataFrame = Smart.autocorrPenalty(returns)

  def smartSharpe(returns: DataFrame, rf: Double = 0.0, periods: Int = 252,
      annualize: Boolean = true): DataFrame =
    Smart.scaledByPenalty(returns, Exprs.sharpe(_, rf, periods, annualize))

  def smartSortino(returns: DataFrame, rf: Double = 0.0, periods: Int = 252,
      annualize: Boolean = true): DataFrame =
    Smart.scaledByPenalty(returns, Exprs.sortino(_, rf, periods, annualize))

  def probabilisticSharpeRatio(returns: DataFrame, rf: Double = 0.0,
      periods: Int = 252, annualize: Boolean = false,
      smart: Boolean = false): DataFrame =
    Smart.psr(returns, rf, periods, annualize, smart)

  def longestDrawdownDays(returns: DataFrame): DataFrame =
    DrawdownEpisodes.longestDays(returns)

  def avgDrawdownDays(returns: DataFrame): DataFrame =
    DrawdownEpisodes.avgDays(returns)

  def avgDrawdown(returns: DataFrame): DataFrame =
    DrawdownEpisodes.avgDepth(returns)

  def greeks(returns: DataFrame, benchmark: DataFrame, periods: Int = 252): DataFrame =
    Benchmarked.greeks(returns, benchmark, periods)

  def informationRatio(returns: DataFrame, benchmark: DataFrame,
      periods: Int = 252, annualize: Boolean = false): DataFrame =
    Benchmarked.informationRatio(returns, benchmark, periods, annualize)

  def correlation(returns: DataFrame, benchmark: DataFrame): DataFrame =
    Benchmarked.correlation(returns, benchmark)

  def rSquared(returns: DataFrame, benchmark: DataFrame): DataFrame =
    Benchmarked.rSquared(returns, benchmark)

  def treynorRatio(returns: DataFrame, benchmark: DataFrame, rf: Double = 0.0): DataFrame =
    Benchmarked.treynorRatio(returns, benchmark, rf)

  // ---- trailing / fixed-period wrappers (reference: alphastats/stats.py:1650-1817) ----

  def mtd(returns: DataFrame): DataFrame = Calendar.periodComp(returns, Calendar.Mtd)
  def ytd(returns: DataFrame): DataFrame = Calendar.periodComp(returns, Calendar.Ytd)
  def threeMonth(returns: DataFrame): DataFrame = Calendar.periodComp(returns, Calendar.Months(3))
  def sixMonth(returns: DataFrame): DataFrame = Calendar.periodComp(returns, Calendar.Months(6))
  def oneYear(returns: DataFrame): DataFrame = Calendar.periodComp(returns, Calendar.Years(1))
  def threeYear(returns: DataFrame, periods: Int = 252): DataFrame =
    Calendar.periodCagr(returns, Calendar.Years(3), periods)
  def fiveYear(returns: DataFrame, periods: Int = 252): DataFrame =
    Calendar.periodCagr(returns, Calendar.Years(5), periods)
  def tenYear(returns: DataFrame, periods: Int = 252): DataFrame =
    Calendar.periodCagr(returns, Calendar.Years(10), periods)
  def allTime(returns: DataFrame, periods: Int = 252): DataFrame =
    Calendar.periodCagr(returns, Calendar.All, periods)

  def expectedDaily(returns: DataFrame): DataFrame = expectedReturn(returns, Some("day"))
  def expectedMonthly(returns: DataFrame): DataFrame = expectedReturn(returns, Some("month"))
  def expectedYearly(returns: DataFrame): DataFrame = expectedReturn(returns, Some("year"))
  def bestDay(returns: DataFrame): DataFrame = best(returns, Some("day"))
  def worstDay(returns: DataFrame): DataFrame = worst(returns, Some("day"))
  def bestMonth(returns: DataFrame): DataFrame = best(returns, Some("month"))
  def worstMonth(returns: DataFrame): DataFrame = worst(returns, Some("month"))
  def bestYear(returns: DataFrame): DataFrame = best(returns, Some("year"))
  def worstYear(returns: DataFrame): DataFrame = worst(returns, Some("year"))
  def avgUpMonth(returns: DataFrame): DataFrame = avgWin(returns, Some("month"))
  def avgDownMonth(returns: DataFrame): DataFrame = avgLoss(returns, Some("month"))
  def winDays(returns: DataFrame): DataFrame = winRate(returns, Some("day"))
  def winMonth(returns: DataFrame): DataFrame = winRate(returns, Some("month"))
  def winQuarter(returns: DataFrame): DataFrame = winRate(returns, Some("quarter"))
  def winYear(returns: DataFrame): DataFrame = winRate(returns, Some("year"))

  // ---- reference aliases (alphastats/stats.py alias bindings) -------------

  /** Alias for probabilisticSharpeRatio (reference: psr). */
  def psr(returns: DataFrame, rf: Double = 0.0, periods: Int = 252,
      annualize: Boolean = false, smart: Boolean = false): DataFrame =
    probabilisticSharpeRatio(returns, rf, periods, annualize, smart)

  /** Alias for valueAtRisk (reference: var). */
  def varRatio(returns: DataFrame, sigma: Double = 1.0, confidence: Double = 0.95): DataFrame =
    valueAtRisk(returns, sigma, confidence)

  /** Alias for conditionalValueAtRisk (reference: cvar). */
  def cvar(returns: DataFrame, sigma: Double = 1.0, confidence: Double = 0.95): DataFrame =
    conditionalValueAtRisk(returns, sigma, confidence)

  /** Alias for conditionalValueAtRisk (reference: expected_shortfall). */
  def expectedShortfall(returns: DataFrame, sigma: Double = 1.0,
      confidence: Double = 0.95): DataFrame =
    conditionalValueAtRisk(returns, sigma, confidence)

  /** Alias for riskOfRuin (reference: ror). */
  def ror(returns: DataFrame): DataFrame = riskOfRuin(returns)

  /** Alias for rSquared (reference: r2). */
  def r2(returns: DataFrame, benchmark: DataFrame): DataFrame = rSquared(returns, benchmark)

  /** Alias for expectedReturn (reference: geometric_mean). */
  def geometricMean(returns: DataFrame, aggregate: Option[String] = None,
      compounded: Boolean = true): DataFrame = expectedReturn(returns, aggregate, compounded)

  /** Alias for adjustedSortino (reference: sortino_sqrt2). */
  def sortinoSqrt2(returns: DataFrame, rf: Double = 0.0, periods: Int = 252,
      annualize: Boolean = true, smart: Boolean = false): DataFrame =
    adjustedSortino(returns, rf, periods, annualize, smart)

  /** Alias for smartAdjustedSortino (reference: smart_sortino_sqrt2). */
  def smartSortinoSqrt2(returns: DataFrame, rf: Double = 0.0, periods: Int = 252,
      annualize: Boolean = true): DataFrame =
    smartAdjustedSortino(returns, rf, periods, annualize)

  /** Alias for gainToPainRatio1m (reference: gain_to_pain_ratio_monthly). */
  def gainToPainRatioMonthly(returns: DataFrame, rf: Double = 0.0): DataFrame =
    gainToPainRatio1m(returns, rf)
}
