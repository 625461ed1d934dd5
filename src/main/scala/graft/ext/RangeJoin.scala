package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Bucketed interval-overlap (range) join — the non-equi join Spark has no
  * native shuffle strategy for. A naive `a JOIN b ON a.s <= b.e AND b.s <=
  * a.e` plans as a broadcast-nested-loop / cartesian product: O(|a|·|b|)
  * comparisons, a scale-killer the moment neither side broadcasts.
  *
  * The scale shape used here is the standard bucketed decomposition: slice
  * the number line into fixed-width buckets, replicate each interval to
  * every bucket it touches, equi-join on the bucket id (an ordinary shuffle
  * join Catalyst/AQE fully optimize), and keep the exact overlap predicate
  * as a post-filter. Replication factor is `len/width + 1` per interval, so
  * a width near the typical interval length costs ~2× rows for a plan that
  * shuffles instead of looping. Pairs whose intervals share several buckets
  * would match once per shared bucket; rather than paying a `distinct`
  * shuffle, each candidate pair is counted exactly once by the
  * OWNERSHIP rule: a pair is emitted only in the bucket containing the
  * overlap's start (`greatest(s1, s2)`), which both intervals by
  * construction cover. Skew (a bucket everyone overlaps) splits under AQE
  * skew-join handling since the join is a plain equi-join by then.
  */
object RangeJoin {

  /** Joins rows of `left` and `right` whose CLOSED intervals
    * `[lStart, lEnd]` / `[rStart, rEnd]` overlap (touching endpoints
    * count), with an optional extra predicate evaluated after the bucket
    * equi-join. Column names must not collide across the two sides (rename
    * before calling). Output: all left columns, all right columns, plus
    * `overlap_len = least(ends) - greatest(starts)` (0 when they merely
    * touch). Bounds are numeric (e.g. epoch seconds); `bucketWidth` in the
    * same unit.
    */
  def overlapJoin(left: DataFrame, lStart: String, lEnd: String,
      right: DataFrame, rStart: String, rEnd: String,
      bucketWidth: Long, extraPred: Column = lit(true)): DataFrame = {
    require(bucketWidth > 0, s"bucketWidth=$bucketWidth must be positive")
    def bucketOf(c: Column): Column = floor(c / bucketWidth).cast("long")
    // sequence() silently steps DOWNWARD when end < start, which would turn
    // an invalid interval into bogus matches — fail the row loudly instead.
    def replicated(df: DataFrame, s: String, e: String): DataFrame =
      df.withColumn("__bucket", explode(
        when(col(e) >= col(s), sequence(bucketOf(col(s)), bucketOf(col(e))))
          .otherwise(raise_error(concat(
            lit(s"overlapJoin: interval end < start in ($s, $e): "),
            col(s), lit(" > "), col(e))))))
    val overlapStart = greatest(col(lStart), col(rStart))
    replicated(left, lStart, lEnd)
      .join(replicated(right, rStart, rEnd), "__bucket")
      .filter(col(lStart) <= col(rEnd) && col(rStart) <= col(lEnd) &&
        bucketOf(overlapStart) === col("__bucket") && extraPred)
      .drop("__bucket")
      .withColumn("overlap_len",
        least(col(lEnd), col(rEnd)) - overlapStart)
  }
}
