package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.ext.Curation.withGlobalOffset

/** Data-layout optimization: Morton (Z-order) clustering and zone-map
  * (min/max) pruning audits.
  *
  * At 100 TB the scan you never run is the cheapest operator in the
  * engine: lakehouse tables keep per-file min/max statistics ("zone
  * maps"), and a range predicate skips every file whose interval cannot
  * intersect it. How much skips is purely a function of LAYOUT — rows
  * sorted by one column prune perfectly on that column and not at all on
  * any other, while interleaving the bits of two columns (the Morton /
  * Z-order curve, the clustering scheme behind Delta Lake's OPTIMIZE
  * ZORDER and Databricks/Iceberg sort orders) bounds BOTH dimensions in
  * every file, trading a little single-column locality for multi-column
  * pruning. Everything here is exact integer arithmetic (quantization is
  * integer division, the curve is bit interleaving, file assignment is a
  * rank scaled by an integer division), so a SQL oracle replays layouts,
  * zone maps, and pruning decisions bit-for-bit.
  *
  * Scale shape: the only wide operation is the rank that assigns file
  * ids — [[Curation.withGlobalOffset]]'s range-partitioned distributed
  * prefix sum (no single-partition window; probed at 10M rows). Zone
  * maps are one keyed aggregation over file ids; the pruning audit is
  * arithmetic over the BOUNDED (files × predicates) grid, never over
  * rows.
  */
object Layout {

  /** Exact floor division for non-negative integer-valued long columns:
    * `(a - a mod b) / b` stays in exact-double range for |a| < 2^53 and
    * the final division is exact by construction (numerator divisible).
    * Avoids the `cast(a/b as long)` trap where the double quotient
    * rounds UP across an integer boundary.
    */
  def idiv(a: Column, b: Column): Column =
    ((a - pmod(a, b)) / b).cast("long")

  /** Quantize `v` in [lo, hi] to an integer level in [0, levels):
    * `((v - lo) * levels) div (hi - lo + 1)` — exact, monotone, and the
    * level boundaries are reproducible by any engine with integer
    * division.
    */
  def quantize(v: Column, lo: Column, hi: Column, levels: Int): Column =
    idiv((v - lo) * levels, hi - lo + lit(1L))

  /** Morton/Z-value of two quantized coordinates (each in [0, 2^bits)):
    * bit i of x lands at position 2i, bit i of y at 2i+1. A sum of
    * 2·bits shift/mask terms — plain long arithmetic, whole-stage
    * codegen'd, and replayable in SQL as the same shift/mod chain.
    */
  def zValue(x: Column, y: Column, bits: Int): Column = {
    require(bits >= 1 && bits <= 31, s"bits must be in [1,31], got $bits")
    (0 until bits).map { i =>
      val xb = pmod(shiftright(x, i), lit(2L)) * lit(1L << (2 * i))
      val yb = pmod(shiftright(y, i), lit(2L)) * lit(2L << (2 * i))
      xb + yb
    }.reduce(_ + _)
  }

  /** SQL twin of [[zValue]] for the oracle (DuckDB shares the shift/mod
    * chain verbatim; `>>` and `%` on BIGINT).
    */
  def zValueSql(x: String, y: String, bits: Int): String =
    (0 until bits).map { i =>
      s"((($x >> $i) % 2) * ${1L << (2 * i)} + (($y >> $i) % 2) * ${2L << (2 * i)})"
    }.mkString(" + ")

  /** Hilbert curve index of two quantized coordinates (each in
    * [0, 2^bits)) — the locality upgrade over [[zValue]]: consecutive
    * Hilbert indices are always ADJACENT cells (unit step), while the
    * Z curve jumps across the space at every quadrant boundary, so
    * Hilbert-clustered files have tighter min/max boxes at the seams.
    * Standard MSB-first quadrant walk (the xy2d loop): at each level s,
    * the quadrant bit pair maps to a curve digit via (3·rx) XOR ry and
    * the sub-quadrant frame is reflected/swapped. The per-level state
    * (x, y, d) threads through a [[graft.core.Exprs.bindOnce]] chain —
    * a lambda variable cannot be inlined, so the expression stays LINEAR
    * in `bits` instead of the 4^bits blowup naive substitution would
    * produce. Plain long arithmetic, replayed by the oracle as one CTE
    * per level ([[hilbertLevelSql]]).
    */
  def hilbertValue(x: Column, y: Column, bits: Int): Column = {
    require(bits >= 1 && bits <= 31, s"bits must be in [1,31], got $bits")
    val init = struct(x.as("x"), y.as("y"), lit(0L).as("d"))
    val fin = (bits - 1 to 0 by -1).foldLeft(init: Column) { (st, lvl) =>
      val s = 1L << lvl
      graft.core.Exprs.bindOnce(st, c => {
        val cx = c.getField("x"); val cy = c.getField("y")
        val cd = c.getField("d")
        val xl = pmod(cx, lit(s)); val yl = pmod(cy, lit(s))
        val rxHi = cx >= s // rx == 1
        val ryHi = cy >= s // ry == 1
        val digit = when(!rxHi, when(ryHi, 1L).otherwise(0L))
          .otherwise(when(ryHi, 2L).otherwise(3L)) // (3*rx) xor ry
        val nx = when(ryHi, xl).otherwise(
          when(rxHi, lit(s - 1) - yl).otherwise(yl))
        val ny = when(ryHi, yl).otherwise(
          when(rxHi, lit(s - 1) - xl).otherwise(xl))
        struct(nx.as("x"), ny.as("y"), (cd + lit(s * s) * digit).as("d"))
      })
    }
    fin.getField("d")
  }

  /** One oracle CTE body per Hilbert level: given columns (hx, hy, hd)
    * holding the level state, emits the next (hx, hy, hd) expressions for
    * level size `s` — the SQL twin of one [[hilbertValue]] fold step.
    */
  def hilbertLevelSql(s: Long): (String, String, String) = (
    s"""CASE WHEN hy >= $s THEN hx % $s
       |     WHEN hx >= $s THEN $s - 1 - (hy % $s)
       |     ELSE hy % $s END""".stripMargin,
    s"""CASE WHEN hy >= $s THEN hy % $s
       |     WHEN hx >= $s THEN $s - 1 - (hx % $s)
       |     ELSE hx % $s END""".stripMargin,
    s"hd + ${s * s} * (CASE WHEN hx < $s THEN (hy // $s) ELSE 3 - (hy // $s) END)")

  /** Driver-side reference Hilbert index (the textbook xy2d loop) — used
    * by specs to pin [[hilbertValue]] and by probes for spot checks.
    */
  def hilbertRef(x0: Long, y0: Long, bits: Int): Long = {
    var x = x0; var y = y0; var d = 0L
    var s = 1L << (bits - 1)
    while (s > 0) {
      val rx = if (x >= s) 1L else 0L
      val ry = if (y >= s) 1L else 0L
      d += s * s * ((3 * rx) ^ ry)
      val xl = x % s; val yl = y % s
      if (ry == 0) {
        if (rx == 1) { x = s - 1 - yl; y = s - 1 - xl }
        else { x = yl; y = xl }
      } else { x = xl; y = yl }
      s >>= 1
    }
    d
  }

  /** Assign each row to one of `files` equal-size files in the total
    * order of `orderKey` (must be UNIQUE — pack a unique row id into the
    * low bits): file = floor(rank · files / n) over the 0-based global
    * rank. The rank is the distributed prefix sum, not a global window;
    * n is a lit the caller supplies (one count, reused across layouts).
    */
  def fileAssign(df: DataFrame, orderKey: String, n: Long, files: Int,
      fileCol: String, numPartitions: Int = 0): DataFrame = {
    val ranked = withGlobalOffset(
      df.withColumn("__one", lit(1L)), orderKey, "__one", "__rank",
      numPartitions)
    ranked
      .withColumn(fileCol, idiv(col("__rank") * files, lit(n)))
      .drop("__one", "__rank")
  }

  /** Zone map: per-file min/max of the given columns. One keyed
    * aggregation; output is bounded by the file count.
    */
  def zoneMap(df: DataFrame, fileCol: String, cols: Seq[String]): DataFrame =
    df.groupBy(fileCol).agg(
      min(col(cols.head)).as(s"${cols.head}_min"),
      (max(col(cols.head)).as(s"${cols.head}_max") +:
        cols.tail.flatMap(c =>
          Seq(min(col(c)).as(s"${c}_min"), max(col(c)).as(s"${c}_max")))): _*)
}
