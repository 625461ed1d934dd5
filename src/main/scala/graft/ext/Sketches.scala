package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Distributed, engine-portable sketches for approximate analytics at scale.
  *
  * Both sketches here are expressed as ordinary keyed aggregations, so Spark
  * gives them map-side partial aggregation for free: at 100 TB the shuffle
  * carries one row per (group, register/cell) — a few KB per group — never
  * the raw values. That merge-by-max / merge-by-sum structure is exactly the
  * sketch-union property that also makes them streamable (see
  * [[graft.streaming.StreamOps.approxDistinctRegisters]]).
  *
  * Hashing is the portable 60-bit md5-derived hash ([[Dedup.portableTokenHash]])
  * so an external engine (the DuckDB oracle) can replay every register
  * bit-for-bit. Production pipelines that never need cross-engine replay can
  * swap in `xxhash64` (same sketch shape, cheaper hash) — mirroring the
  * portable-vs-fast split the SimHash family uses.
  *
  * Null keys/items are EXCLUDED from both sketches (NULL is "no value", the
  * COUNT(DISTINCT …) / GROUP BY convention), not hashed: a null key would
  * otherwise produce a null bucket row that hllEstimate counts in n_present
  * but not sum_present, silently biasing the estimate.
  *
  * HyperLogLog per Flajolet et al. 2007 ("HyperLogLog: the analysis of a
  * near-optimal cardinality estimation algorithm"); count-min per Cormode &
  * Muthukrishnan 2005. Reference analogue: alphastats has no sketch surface —
  * this is part of the training-data-pipeline extension suite.
  */
object Sketches {

  /** HLL registers for `key` within each group: one row per (group, bucket)
    * with the max rank rho. `p` register bits → m = 2^p registers.
    *
    * The 60-bit hash splits as: low p bits → bucket, high (60-p) bits → w;
    * rho = number of leading zeros of w within its (60-p)-bit width, + 1 —
    * computed portably as (60-p) - LENGTH(bin(w)) + 1, with w = 0 capped at
    * (60-p) + 1.
    */
  def hllRegisters(df: DataFrame, keyCol: String, groupCols: Seq[String],
      p: Int = 9): DataFrame = {
    // p >= 7 because hllEstimate's alpha approximation is only valid for
    // m >= 128 (the small-m constants 0.673/0.697/0.709 are not implemented)
    require(p >= 7 && p <= 18, s"p=$p out of range [7, 18]")
    val m = 1 << p
    val vBits = 60 - p
    val h = Dedup.portableTokenHash(col(keyCol).cast("string"))
    val bucket = h.bitwiseAND(lit((m - 1).toLong))
    val v = shiftright(h, p)
    val rho = when(v === 0L, lit(vBits + 1))
      .otherwise(lit(vBits + 1) - length(bin(v)))
    df.filter(col(keyCol).isNotNull) // null keys are not values (see object doc)
      .select((groupCols.map(col) :+ bucket.as("bucket") :+ rho.as("rho")): _*)
      .groupBy((groupCols :+ "bucket").map(col): _*)
      .agg(max(col("rho")).as("M"))
  }

  /** Cardinality estimate from [[hllRegisters]] output, one row per group.
    * Standard HLL estimator with the small-range linear-counting correction;
    * the large-range correction is unnecessary at a 60-bit hash width.
    * Columns: groupCols…, hll_est (double).
    */
  def hllEstimate(registers: DataFrame, groupCols: Seq[String],
      p: Int = 9): DataFrame = {
    require(p >= 7 && p <= 18, s"p=$p out of range [7, 18]")
    val m = 1 << p
    val alpha = 0.7213 / (1.0 + 1.079 / m) // valid for m >= 128, hence p >= 7
    val grouped =
      if (groupCols.isEmpty) registers.groupBy()
      else registers.groupBy(groupCols.map(col): _*)
    val agg = grouped.agg(
      count(lit(1)).as("n_present"),
      sum(pow(lit(2.0), -col("M"))).as("sum_present"))
    val vZero = lit(m.toDouble) - col("n_present")
    val sumReg = col("sum_present") + vZero // absent registers contribute 2^0
    val raw = lit(alpha * m * m) / sumReg
    val est = when(raw <= lit(2.5 * m) && vZero > 0,
      lit(m.toDouble) * log(lit(m.toDouble) / vZero)).otherwise(raw)
    agg.select((groupCols.map(col) :+ est.as("hll_est")): _*)
  }

  /** End-to-end portable approximate distinct count of `keyCol` per group. */
  def approxDistinct(df: DataFrame, keyCol: String, groupCols: Seq[String],
      p: Int = 9): DataFrame =
    hllEstimate(hllRegisters(df, keyCol, groupCols, p), groupCols, p)

  /** Count-min sketch cells from pre-aggregated (item, count) rows: `d`
    * independent hash rows of width `w` (a power of two). Returns one row per
    * (i, bucket) with the summed count. Building from pre-aggregated counts
    * instead of raw occurrences is identical math (sums commute) and turns
    * the d-way explode into d rows per DISTINCT item, not per occurrence.
    */
  def cmCells(counts: DataFrame, itemCol: String, cntCol: String,
      d: Int = 4, w: Int = 64): DataFrame = {
    require((w & (w - 1)) == 0, s"w=$w must be a power of two")
    val rows = (0 until d).map { i =>
      struct(lit(i).as("i"),
        cmBucket(col(itemCol), i, w).as("bucket"),
        col(cntCol).as("c"))
    }
    counts.filter(col(itemCol).isNotNull) // null items are not values (object doc)
      .select(explode(array(rows: _*)).as("e"))
      .select(col("e.i").as("i"), col("e.bucket").as("bucket"), col("e.c").as("c"))
      .groupBy("i", "bucket").agg(sum(col("c")).as("cell"))
  }

  /** Salted portable bucket for count-min row `i`. */
  def cmBucket(item: Column, i: Int, w: Int): Column =
    Dedup.portableTokenHash(concat(lit(s"$i:"), item))
      .bitwiseAND(lit((w - 1).toLong))

  /** Point-estimate counts for `items` from [[cmCells]] output: the min over
    * the d cells each item hashes to (classic CM upper-bound estimate —
    * always >= the true count). The cell join is LEFT: a probe bucket absent
    * from the cells frame is an empty cell, i.e. count 0 — an item never
    * inserted must estimate as 0 (and must not vanish from the output), which
    * matters when probing items not drawn from the sketch's own input (e.g.
    * yesterday's heavy hitters against a streaming sink). Columns: itemCol,
    * cm_est.
    */
  def cmEstimate(cells: DataFrame, items: DataFrame, itemCol: String,
      d: Int = 4, w: Int = 64): DataFrame = {
    val probes = items.select(col(itemCol), explode(array((0 until d).map(i =>
      struct(lit(i).as("i"), cmBucket(col(itemCol), i, w).as("bucket"))): _*)).as("e"))
      .select(col(itemCol), col("e.i").as("i"), col("e.bucket").as("bucket"))
    probes.join(cells, Seq("i", "bucket"), "left")
      .groupBy(itemCol)
      .agg(min(coalesce(col("cell"), lit(0L))).as("cm_est"))
  }
}
