package graft

import org.apache.spark.sql.functions._

import graft.core.Exprs

/** r14: `Exprs.roundHalfUpLong` must be bit-identical to Spark's
  * `round(x, 0).cast("long")` (BigDecimal-on-shortest-repr HALF_UP) over
  * its documented domain |x| < 2^51 — boundary vectors first (exact k.5,
  * within-half-ulp-below-k.5 where the floor(x+0.5) carry correction
  * fires, shortest-repr oddities), then a deterministic random sweep at
  * the magnitudes the cents/milli quantizations produce.
  */
class ExprsRoundSpec extends SparkSpec {
  import spark.implicits._

  private def check(xs: Seq[Double]): Unit = {
    val df = xs.toDF("x")
      .select(col("x"), round(col("x"), 0).cast("long").as("ref"),
        Exprs.roundHalfUpLong(col("x")).as("fast"))
    val bad = df.filter(col("ref") =!= col("fast")).collect()
    assert(bad.isEmpty,
      s"mismatches: ${bad.take(5).map(r => (r.getDouble(0), r.getLong(1), r.getLong(2))).mkString(", ")}")
  }

  test("boundary vectors") {
    val halves = Seq(0.5, 1.5, 2.5, 3.5, 1e6 + 0.5, (1L << 40).toDouble + 0.5)
    // largest double strictly below each k.5 (the carry-correction case)
    val belowHalves = halves.map(h => Math.nextDown(h))
    val aboveHalves = halves.map(h => Math.nextUp(h))
    val reprOddities = Seq(2.675, 0.49999999999999994, 1048576.4999999999,
      4.499999999999999, 0.9999999999999999, 1e15 + 0.5)
    val base = halves ++ belowHalves ++ aboveHalves ++ reprOddities ++
      Seq(0.0, -0.0, 1.0, 123456789.987, (1L << 50).toDouble + 0.25)
    check(base ++ base.map(-_))
  }

  test("deterministic random sweep at cents magnitudes") {
    val rnd = new scala.util.Random(1234567L)
    val xs = Seq.fill(20000) {
      val mag = math.pow(10.0, rnd.nextInt(10) - 2) // 1e-2 .. 1e7
      (rnd.nextDouble() * 2 - 1) * mag * 100.0
    }
    // plus products shaped like the revenue idiom price*(1-disc)*100
    val rev = Seq.fill(20000) {
      val price = 900.0 + rnd.nextDouble() * 104000.0
      val disc = rnd.nextInt(11) / 100.0
      price * (1.0 - disc) * 100.0
    }
    check(xs ++ rev)
  }
}
