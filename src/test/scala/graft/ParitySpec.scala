package graft

import graft.stats.Stats
import graft.stats.Stats.scalar

/** Independent-oracle parity: golden values computed by a from-scratch
  * Python implementation of the reference formulas (stdlib only) over the
  * 10-row daily parity fixture (tests/test_quantstats_parity.py:20-54).
  * Complements StatsGoldenSpec's inline-snapshot constants with a second,
  * independently-derived oracle across the wider metric surface.
  */
class ParitySpec extends SparkSpec {
  import spark.implicits._

  private def rets = {
    val vals = Seq(0.01, -0.02, 0.03, -0.01, 0.02, 0.0, 0.015, -0.005, 0.01, -0.015)
    (2 to 11).map(d => java.sql.Date.valueOf(f"2023-01-$d%02d")).zip(vals)
      .toDF("date", "asset")
  }

  private def bench = {
    val vals = Seq(0.005, -0.01, 0.015, -0.005, 0.01, 0.0, 0.007, -0.002, 0.004, -0.006)
    (2 to 11).map(d => java.sql.Date.valueOf(f"2023-01-$d%02d")).zip(vals)
      .toDF("date", "benchmark")
  }

  private val tol = 1e-9

  test("core ratios match independent oracle") {
    assertApprox(scalar(Stats.sharpe(rets)), 3.436566509324014, tol)
    assertApprox(scalar(Stats.sortino(rets)), 6.415605972938177, tol)
    assertApprox(scalar(Stats.volatility(rets)), 0.2566515147042776, tol)
    assertApprox(scalar(Stats.comp(rets)), 0.03434821143070521, tol)
    assertApprox(scalar(Stats.cagr(rets)), 1.342084440788959, tol)
  }

  test("tail / trade stats match independent oracle") {
    assertApprox(scalar(Stats.tailRatio(rets)), 1.4366197183098586, tol)
    assertApprox(scalar(Stats.outlierWinRatio(rets)), 2.0541176470588236, tol)
    assertApprox(scalar(Stats.outlierLossRatio(rets)), 1.5640000000000003, tol)
    assertApprox(scalar(Stats.profitFactor(rets)), 1.7, tol)
    assertApprox(scalar(Stats.commonSenseRatio(rets)), 2.4422535211267595, tol)
    assertApprox(scalar(Stats.cpcIndex(rets)), 1.2844444444444445, tol)
    assertApprox(scalar(Stats.gainToPainRatio(rets)), 0.7000000000000002, tol)
    assertApprox(scalar(Stats.kellyCriterion(rets)), 0.22875816993464054, tol)
    assertApprox(scalar(Stats.riskOfRuin(rets)), 3.625096370832828e-06, tol)
    assert(scalar(Stats.gainToPainRatio1m(rets)).isPosInfinity) // no losing month
  }

  test("VaR / CVaR match independent oracle") {
    assertApprox(scalar(Stats.valueAtRisk(rets)), -0.02309321336932803, tol)
    assertApprox(scalar(Stats.conditionalValueAtRisk(rets)), -0.02309321336932803, tol)
  }

  test("drawdown family matches independent oracle") {
    assertApprox(scalar(Stats.maxDrawdown(rets)), -0.020000000000000018, tol)
    assertApprox(scalar(Stats.ulcerIndex(rets)), 0.00912870929175279, tol)
    assertApprox(scalar(Stats.recoveryFactor(rets)), 1.7499999999999987, tol)
    assertApprox(scalar(Stats.calmar(rets)), 67.10422203944789, tol)
    assertApprox(scalar(Stats.serenityIndex(rets)), 3.0993614933832108, tol)
    assert(Stats.longestDrawdownDays(rets).head().getLong(0) == 1L)
    assertApprox(scalar(Stats.avgDrawdownDays(rets)), 1.0, tol)
    assertApprox(scalar(Stats.avgDrawdown(rets)), -0.012500000000000039, tol)
  }

  test("autocorrelation penalty and smart ratios match independent oracle") {
    assertApprox(scalar(Stats.autocorrPenalty(rets)), 2.3423880654176625, tol)
    assertApprox(scalar(Stats.smartSharpe(rets)), 1.4671209096650057, tol)
    assertApprox(scalar(Stats.smartSortino(rets)), 2.7389167779909407, tol)
  }

  test("calendar aggregates match independent oracle") {
    assertApprox(scalar(Stats.expectedDaily(rets)), 0.0033828570828338123, tol)
    // single-month fixture: monthly comp == total comp
    assertApprox(scalar(Stats.bestMonth(rets)), 0.03434821143070521, tol)
    assertApprox(scalar(Stats.worstMonth(rets)), 0.03434821143070521, tol)
    assertApprox(scalar(Stats.mtd(rets)), 0.03434821143070521, tol)
    assertApprox(scalar(Stats.ytd(rets)), 0.03434821143070521, tol)
    assertApprox(scalar(Stats.threeMonth(rets)), 0.03434821143070521, tol)
  }

  test("timestamp temporal column takes the same code paths as dates") {
    val vals = Seq(0.01, -0.02, 0.03, -0.01, 0.02, 0.0, 0.015, -0.005, 0.01, -0.015)
    val tsDf = (2 to 11).map(d =>
      java.sql.Timestamp.valueOf(f"2023-01-$d%02d 15:30:00")).zip(vals)
      .toDF("dt", "asset")
    assertApprox(scalar(Stats.cagr(tsDf)), 1.342084440788959, tol)
    assertApprox(scalar(Stats.mtd(tsDf)), 0.03434821143070521, tol)
    assertApprox(scalar(Stats.ytd(tsDf)), 0.03434821143070521, tol)
    // drawdown episodes on timestamps use the floor-seconds day arithmetic
    val epTs = (1 to 7).map(d =>
      java.sql.Timestamp.valueOf(f"2023-01-$d%02d 09:00:00"))
      .zip(Seq(0.02, -0.01, -0.02, 0.05, -0.01, -0.01, 0.03)).toDF("dt", "asset")
    assert(Stats.longestDrawdownDays(epTs).head().getLong(0) == 2L)
    assertApprox(scalar(Stats.avgDrawdownDays(epTs)), 2.0, tol)
    // monthly bucket on timestamps
    assertApprox(scalar(Stats.bestMonth(tsDf)), 0.03434821143070521, tol)
  }

  test("monthly-frequency metrics on the month-end fixture (periods=12)") {
    // reference monthly fixture (tests/test_quantstats_parity.py:20-54)
    val vals = Seq(0.01, -0.02, 0.03, -0.015, 0.02, -0.01, 0.025, -0.02, 0.015, 0.01)
    val ends = Seq("2023-01-31", "2023-02-28", "2023-03-31", "2023-04-30",
      "2023-05-31", "2023-06-30", "2023-07-31", "2023-08-31", "2023-09-30",
      "2023-10-31").map(java.sql.Date.valueOf)
    val df = ends.zip(vals).toDF("date", "asset")
    val n = vals.length
    def mean(xs: Seq[Double]) = xs.sum / xs.length
    def std(xs: Seq[Double]) = {
      val m = mean(xs); math.sqrt(xs.map(x => (x - m) * (x - m)).sum / (xs.length - 1))
    }
    assertApprox(scalar(Stats.sharpe(df, periods = 12)),
      mean(vals) / std(vals) * math.sqrt(12.0), tol)
    assertApprox(scalar(Stats.volatility(df, periods = 12)),
      std(vals) * math.sqrt(12.0), tol)
    val comp = vals.map(1 + _).product - 1
    assertApprox(scalar(Stats.cagr(df, periods = 12)),
      math.pow(comp + 1, 12.0 / n) - 1, tol)
    // each row is its own month bucket → monthly best == plain best
    assertApprox(scalar(Stats.bestMonth(df)), vals.max, tol)
    assertApprox(scalar(Stats.winMonth(df)), 6.0 / 10, tol)
  }

  test("benchmark-relative metrics match independent oracle") {
    val g = Stats.greeks(rets, bench).head().getStruct(0)
    assertApprox(g.getDouble(0), -0.05568298027757443, tol, "alpha")
    assertApprox(g.getDouble(1), 2.0672023374726076, tol, "beta")
    assertApprox(scalar(Stats.informationRatio(rets, bench)), 0.20221225779288912, tol)
    assertApprox(scalar(Stats.correlation(rets, bench)), 0.9973552797772041, tol)
    assertApprox(scalar(Stats.rSquared(rets, bench)), 0.9947175540994649, tol)
    assertApprox(scalar(Stats.treynorRatio(rets, bench)), 0.016615795564888847, tol)
  }
}
