package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Incremental aggregate maintenance: fold a CDC delta into a stored
  * aggregate state instead of recomputing over the full history.
  *
  * The maintainable class under insert-only CDC is the commutative
  * monoid: count, sum, min, max (and anything derived from them — mean,
  * rates), plus sketch states that merge (HLL register max — q62 proves
  * the merge identity; DDSketch bucket sum — q212). At 100 TB the
  * difference is structural, not constant-factor: the full recompute
  * scans the whole table every refresh, while maintenance scans ONLY the
  * delta and merges it with the stored per-key state — a frame bounded
  * by the key domain, not by history. This is the materialized-view
  * maintenance algebra (self-maintainable views over insert streams);
  * the streaming twin is Structured Streaming's update-mode aggregation,
  * whose state store holds exactly this monoid state.
  *
  * Sums quantize row-locally to integer micro-units so that state merge
  * is EXACT and order/partitioning-independent — the property that lets
  * an oracle replay maintenance bit-for-bit and lets the maintained
  * answer be asserted EQUAL to the recompute, not merely close.
  */
object Incremental {

  /** Monoid aggregate state per key: row count, exact integer sum of
    * `round(valueCol · 1e6)` micro-units, min/max micro-units. One keyed
    * aggregation; this is the frame a store would persist.
    */
  def state(df: DataFrame, keyCols: Seq[String], valueCol: String): DataFrame =
    df.withColumn("__micros", graft.core.Exprs.roundHalfUpLong(col(valueCol) * 1e6))
      .groupBy(keyCols.map(col): _*)
      .agg(
        count(lit(1)).as("n"),
        sum(col("__micros")).as("sum_micros"),
        min(col("__micros")).as("min_micros"),
        max(col("__micros")).as("max_micros"))

  /** Merge two aggregate states (FULL OUTER on the key: a key may exist
    * in only one side — a brand-new key in the delta, or an untouched
    * key in the base). count/sum merge additively with zero identity;
    * min/max via least/greatest with null-absorbing coalesce.
    */
  def merge(a: DataFrame, b: DataFrame, keyCols: Seq[String]): DataFrame = {
    val l = a.select(keyCols.map(col) ++ Seq(col("n").as("n_a"),
      col("sum_micros").as("s_a"), col("min_micros").as("mn_a"),
      col("max_micros").as("mx_a")): _*)
    val r = b.select(keyCols.map(col) ++ Seq(col("n").as("n_b"),
      col("sum_micros").as("s_b"), col("min_micros").as("mn_b"),
      col("max_micros").as("mx_b")): _*)
    l.join(r, keyCols, "full_outer").select(
      keyCols.map(col) ++ Seq(
        (coalesce(col("n_a"), lit(0L)) + coalesce(col("n_b"), lit(0L))).as("n"),
        (coalesce(col("s_a"), lit(0L)) + coalesce(col("s_b"), lit(0L))).as("sum_micros"),
        least(coalesce(col("mn_a"), col("mn_b")),
          coalesce(col("mn_b"), col("mn_a"))).as("min_micros"),
        greatest(coalesce(col("mx_a"), col("mx_b")),
          coalesce(col("mx_b"), col("mx_a"))).as("max_micros")): _*)
  }
}
