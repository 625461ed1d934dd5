package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Quality-classifier training INSIDE the engine: full-batch gradient
  * descent for logistic regression, expressed so every step is a plain
  * aggregation and the whole trajectory is bit-reproducible across
  * engines and partitionings.
  *
  * The curation stacks that matter (fastText-style quality classifiers,
  * CCNet/Gopher filtering) train small linear models over cheap document
  * features; at corpus scale the training data never fits a driver, but a
  * full-batch GD step is just Σᵢ gᵢ — a map-side-combined aggregation.
  * The classic blocker is determinism: float gradient sums depend on
  * partition fold order. Here each row's gradient contribution is
  * quantized ROW-LOCALLY to nano-units (`round(g·1e9) → long` — per-row
  * double math is deterministic; only multi-row summation is
  * order-dependent) and summed as exact integers — the same trick the
  * exact-cents revenue aggregates use, applied to learning. The weight
  * update is then a fixed-order double expression over those exact
  * scalars, rounded to 9 dp, so every step's weights are identical in
  * Spark and in the DuckDB oracle's chained-CTE replay at any partition
  * count.
  *
  * Model: p = σ(w·x); per-row gradient of mean log-loss g = (p − y)·x;
  * update w ← w − lr·(Σg)/n. σ's `exp` is evaluated per row and
  * quantized with the row — cross-engine libm agreement is needed only
  * at a 1e-9 rounding boundary, the same exposure the q54-style `ln`
  * scoring carries.
  *
  * Nano-unit headroom: |g| ≤ max|x|, so the long sum is exact up to
  * ~9.2e18/(max|x|·1e9) rows (~10¹⁰ at unit-scaled features); past that,
  * swap the accumulator to DECIMAL(38,0) as the rank-statistics queries
  * do. Each step is one scan of the feature frame (cache it); the shuffle
  * carries `partitions × (features+1)` longs per step — independent of n.
  * The driver holds only the weight vector (a bounded 1-row collect per
  * step).
  */
object QualityModel {

  /** Row-local nano-unit quantization: exact-integer summand. */
  def qNano(c: Column): Column = graft.core.Exprs.roundHalfUpLong(c * 1e9)

  /** HALF_UP 9-dp rounding of the driver-side update — the same decision
    * Spark's/DuckDB's ROUND(x, 9) makes on the exact binary double. */
  private def r9(x: Double): Double =
    BigDecimal(x).setScale(9, BigDecimal.RoundingMode.HALF_UP).toDouble

  /** σ(w·x) with the dot product written as a fixed left-to-right chain —
    * replay the same chain in any engine and the double agrees. */
  def sigmoid(w: Array[Double]): Column = {
    val z = w.indices.map(j => lit(w(j)) * col(s"x$j")).reduce(_ + _)
    lit(1.0) / (lit(1.0) + exp(-z))
  }

  /** One GD step: given current weights, returns
    * round(w_j − lr·(S_j/1e9)/n, 9) where S_j is the exact nano-unit
    * gradient sum. */
  def step(feat: DataFrame, w: Array[Double], lr: Double): Array[Double] = {
    val p = sigmoid(w)
    val aggs = w.indices.map(j =>
      sum(qNano((p - col("y")) * col(s"x$j"))).as(s"g$j")) :+
      count(lit(1)).as("n")
    val r = feat.agg(aggs.head, aggs.tail: _*).collect()(0)
    val n = r.getAs[Long]("n").toDouble
    Array.tabulate(w.length) { j =>
      val g = r.getAs[Long](s"g$j").toDouble
      r9(w(j) - lr * ((g / 1e9) / n))
    }
  }

  /** Train `steps` full-batch GD steps from w = 0. Returns the weight
    * trajectory (element 0 = after the first step). `feat` is scanned
    * once per step — cache it. */
  def train(feat: DataFrame, dims: Int, lr: Double, steps: Int): Seq[Array[Double]] = {
    var w = new Array[Double](dims)
    (1 to steps).map { _ => w = step(feat, w, lr); w }
  }

  /** Evaluation panel of one weight vector over the feature frame:
    * exact confusion counts at p > 0.5 (p quantized to 9 dp row-locally,
    * so the threshold compare is engine-stable) and mean log-loss
    * (round 6 — the one float multi-row sum, q54-convention). */
  def evalPanel(feat: DataFrame, w: Array[Double]): DataFrame = {
    val p = round(sigmoid(w), 9)
    val pred = (p > 0.5).cast("int")
    feat.agg(
      sum(when(col("y") === 1 && pred === 1, 1L).otherwise(0L)).as("tp"),
      sum(when(col("y") === 0 && pred === 1, 1L).otherwise(0L)).as("fp"),
      sum(when(col("y") === 0 && pred === 0, 1L).otherwise(0L)).as("tn"),
      sum(when(col("y") === 1 && pred === 0, 1L).otherwise(0L)).as("fn"),
      // branch instead of y·ln(p) + (1−y)·ln(1−p): at a saturated p the
      // dead branch would be 0·(−Inf) = NaN under IEEE
      round(avg(when(col("y") === 1, -log(p)).otherwise(-log(lit(1.0) - p))), 6)
        .as("logloss"))
  }

  /** In-memory reference trainer (tests): identical quantization (exact
    * long sums) and identical update arithmetic. */
  def referenceTrain(rows: Seq[(Double, Array[Double])], lr: Double,
      steps: Int): Seq[Array[Double]] = {
    val d = rows.head._2.length
    var w = new Array[Double](d)
    (1 to steps).map { _ =>
      val sums = new Array[Long](d)
      rows.foreach { case (y, x) =>
        val z = (0 until d).map(j => w(j) * x(j)).reduceLeft(_ + _)
        val p = 1.0 / (1.0 + math.exp(-z))
        (0 until d).foreach { j =>
          sums(j) += BigDecimal((p - y) * x(j) * 1e9)
            .setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong
        }
      }
      val n = rows.size.toDouble
      w = Array.tabulate(d)(j => r9(w(j) - lr * ((sums(j).toDouble / 1e9) / n)))
      w
    }
  }
}
