package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic dataset partitioning for training pipelines: every row's
  * split assignment is a pure function of its id (md5-derived bucket in
  * [0, 100)), so the same corpus always produces the same train/val/test
  * membership — across runs, engines, and cluster layouts. No sampling
  * state, no RNG, no shuffle: assignment is a row-local projection, and
  * it is reproducible bit-for-bit by any engine with md5 (the q34 oracle).
  */
object Splits {

  /** Stable bucket in [0, 100) from the row id (works for any id type —
    * hashed via its string form).
    */
  def bucket(id: Column): Column =
    pmod(Dedup.portableTokenHash(id.cast("string")), lit(100))

  /** Split label from cumulative percentage weights, e.g.
    * `Seq("train" -> 80, "val" -> 10, "test" -> 10)` (must sum to 100).
    */
  def splitLabel(id: Column, weights: Seq[(String, Int)]): Column = {
    require(weights.map(_._2).sum == 100, "split weights must sum to 100")
    val b = bucket(id)
    val (expr, _) = weights.foldLeft((lit(null).cast("string"), 0)) {
      case ((acc, cum), (name, w)) =>
        (when(b >= cum && b < cum + w, lit(name)).otherwise(acc), cum + w)
    }
    expr
  }

  /** Attach a `split` column. */
  def withSplit(df: DataFrame, idCol: String,
      weights: Seq[(String, Int)] = Seq("train" -> 80, "val" -> 10, "test" -> 10)): DataFrame =
    df.withColumn("split", splitLabel(col(idCol), weights))

  /** Deterministic per-stratum subsampling: keep a row iff its bucket falls
    * below the stratum's percentage (strata absent from the map are dropped).
    * The hash-threshold form of stratified sampling — reproducible, and the
    * kept set only GROWS when a fraction is raised (nested samples).
    */
  def stratifiedSample(df: DataFrame, idCol: String, strataCol: String,
      pct: Map[String, Int]): DataFrame = {
    val keep = pct.foldLeft(lit(false)) { case (acc, (stratum, p)) =>
      when(col(strataCol) === stratum, bucket(col(idCol)) < p).otherwise(acc)
    }
    df.filter(keep)
  }
}
