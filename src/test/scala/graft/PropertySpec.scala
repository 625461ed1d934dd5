package graft

import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.api.GroupedStats
import graft.stats.Stats
import graft.stats.Stats.scalar

/** Property tests the reference lacks (SURVEY.md §5): structural invariants
  * over ScalaCheck-generated return series (fixed seeds — deterministic).
  */
class PropertySpec extends SparkSpec {
  import spark.implicits._

  private val returnsGen: Gen[List[Double]] =
    Gen.chooseNum(2, 40).flatMap(n => Gen.listOfN(n, Gen.chooseNum(-0.99, 1.5)))

  private def cases(n: Int): Seq[List[Double]] =
    (1 to n).map(i => returnsGen.pureApply(Gen.Parameters.default, Seed(42L + i)))

  test("comp >= -1 when all returns >= -1") {
    cases(8).foreach { rs =>
      val c = scalar(Stats.comp(rs.toDF("r")))
      assert(c >= -1.0 - 1e-12, s"comp $c for $rs")
    }
  }

  test("drawdowns are always <= 0") {
    cases(8).foreach { rs =>
      val dd = Stats.toDrawdowns(rs.toDF("r")).collect().map(_.getDouble(0))
      assert(dd.forall(_ <= 1e-15), s"positive dd in ${dd.toSeq} for $rs")
    }
  }

  test("max drawdown equals min of drawdown curve") {
    cases(8).foreach { rs =>
      val df = rs.toDF("r")
      val dd = Stats.toDrawdowns(df).collect().map(_.getDouble(0))
      val mdd = scalar(Stats.maxDrawdown(df))
      assert(math.abs(dd.min - mdd) < 1e-12, s"dd.min ${dd.min} vs maxDD $mdd")
    }
  }

  test("best/worst equal extrema of the series") {
    cases(8).foreach { rs =>
      val df = rs.toDF("r")
      assert(scalar(Stats.best(df)) == rs.max)
      assert(scalar(Stats.worst(df)) == rs.min)
    }
  }

  test("wide and long paths agree on sharpe per asset") {
    cases(6).foreach { rs =>
      val wide = dates(rs.length).zip(rs).toDF("date", "a1")
      val long = GroupedStats.fromWide(wide, "date")
      val wideVal = scalar(Stats.sharpe(wide))
      val longVal = GroupedStats.aggregate(long,
        Seq("sharpe" -> (c => graft.core.Exprs.sharpe(c, 0.0, 252, annualize = true))))
        .head().getDouble(1)
      if (!(wideVal.isNaN && longVal.isNaN)) assertApprox(longVal, wideVal, 1e-12)
    }
  }

  test("wide and long paths agree on smart sharpe and autocorr penalty") {
    cases(6).foreach { rs =>
      val wide = dates(rs.length).zip(rs).toDF("date", "a1")
      val long = GroupedStats.fromWide(wide, "date")
      val wideSmart = scalar(Stats.smartSharpe(wide))
      val widePen = scalar(Stats.autocorrPenalty(wide))
      val row = GroupedStats.smartSharpe(long).head()
      val longPen = row.getAs[Double]("autocorr_penalty")
      val longSmart = row.getAs[Double]("smart_sharpe")
      if (!(widePen.isNaN && longPen.isNaN)) assertApprox(longPen, widePen, 1e-9)
      if (!(wideSmart.isNaN && longSmart.isNaN)) assertApprox(longSmart, wideSmart, 1e-9)
    }
  }

  test("exposure is within [0, 1]") {
    cases(8).foreach { rs =>
      val e = scalar(Stats.exposure(rs.toDF("r")))
      assert(e >= 0.0 && e <= 1.0)
    }
  }
}
