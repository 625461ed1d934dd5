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

  /** Efraimidis–Spirakis (2006) weighted sampling WITHOUT replacement,
    * algorithm A-ES: each row gets key eᵢ = −ln(uᵢ)/wᵢ (an Exponential(wᵢ)
    * race — equivalent to ranking uᵢ^(1/wᵢ) descending) and the k smallest
    * keys are the sample; inclusion probability is proportional to weight
    * in the without-replacement sense. uᵢ is md5-derived ("wsample:"-
    * prefixed so it is independent of split/shard hashes), so the sample
    * is a pure row-local function of (id, weight): reproducible across
    * runs, engines, and partitionings, and the top-k is a
    * TakeOrderedAndProject — no global sort materialization, no RNG state,
    * no shuffle beyond k rows per partition. Keys are rounded to 6 dp with
    * id tie-break BEFORE ranking so an external engine's last-ulp `ln`
    * difference cannot reorder the boundary.
    */
  def weightedSampleKey(id: Column, weight: Column): Column = {
    val h = Dedup.portableTokenHash(concat(lit("wsample:"), id.cast("string")))
    // h uniform on [0, 16^15) = [0, 2^60); +0.5 keeps u strictly inside (0,1)
    val u = (h.cast("double") + 0.5) / lit(1.152921504606846976e18)
    round(-log(u) / weight, 6)
  }

  /** The k-row weighted sample (no replacement), smallest race keys first. */
  def weightedSample(df: DataFrame, idCol: String, weightCol: String,
      k: Int): DataFrame =
    df.withColumn("__key", weightedSampleKey(col(idCol), col(weightCol)))
      .orderBy(col("__key"), col(idCol))
      .limit(k)

  /** Per-group A-ES weighted sample (no replacement): the k smallest race
    * keys WITHIN each group, via the bounded TopKAgg (score = −key so the
    * best-first buffer keeps the smallest keys; ties break on the id,
    * matching the global [[weightedSample]]'s (key, id) order). The
    * exchange carries ≤ k·groups·partitions entries — the grouped
    * counterpart of the global sample's TakeOrderedAndProject, and the
    * shape that survives a 100-TB corpus with millions of groups where
    * any per-group window would ship every row to its group's reducer.
    * Returns (groupCols..., rank, id, __key) exploded rows.
    */
  def weightedSamplePerGroup(df: DataFrame, groupCols: Seq[String],
      idCol: String, weightCol: String, k: Int): DataFrame = {
    import org.apache.spark.sql.functions.posexplode
    df.withColumn("__key", weightedSampleKey(col(idCol), col(weightCol)))
      .groupBy(groupCols.map(col): _*)
      .agg(graft.functions.TopKAgg.topK(-col("__key"), col(idCol), k).as("tk"))
      .select(groupCols.map(col) :+ posexplode(col("tk")): _*)
      .select(groupCols.map(col) ++ Seq(
        (col("pos") + 1).cast("long").as("rank"),
        col("col.id").as(idCol), (-col("col.score")).as("__key")): _*)
  }

  /** Deterministic output-shard assignment in [0, shards) — an md5
    * derivation INDEPENDENT of [[bucket]]'s split hash (the key is
    * prefixed), so shard and split membership don't correlate.
    */
  def shardId(id: Column, shards: Int): Column =
    pmod(Dedup.portableTokenHash(concat(lit("shard:"), id.cast("string"))),
      lit(shards))

  /** Shard source-mixing chi2 epilogue over a (shard, source, o) count-cell
    * frame: per shard, the chi-square statistic of its source composition
    * against expected counts n_shard·p_source. Shared by the batch audit
    * (q148) and the streaming cell aggregation
    * ([[graft.streaming.StreamOps.shardCellsStream]]) — cells are the
    * commutative sufficient statistic, the epilogue is a marginal-sized
    * computation. The chi2 sum is an ORDER-PINNED window cumsum over the
    * source axis so engines add the same doubles in the same sequence.
    */
  def shardMixingChi2(cells: DataFrame): DataFrame = {
    val shardTot = cells.groupBy("shard").agg(sum(col("o")).as("n_shard"))
    val srcTot = cells.groupBy("source").agg(sum(col("o")).as("n_src"))
    val tot = srcTot.agg(sum(col("n_src")).as("__N"))
    // complete grid: absent (shard, source) cells contribute e (o=0)
    val grid = shardTot.crossJoin(broadcast(srcTot))
      .join(cells, Seq("shard", "source"), "left")
      .na.fill(0L, Seq("o"))
      .crossJoin(broadcast(tot))
      .withColumn("e",
        col("n_shard").cast("double") * col("n_src") / col("__N"))
      .withColumn("term",
        (col("o").cast("double") - col("e")) * (col("o").cast("double") - col("e"))
          / col("e"))
    val wCum = org.apache.spark.sql.expressions.Window
      .partitionBy("shard").orderBy("source")
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
        org.apache.spark.sql.expressions.Window.currentRow)
    val wLast = org.apache.spark.sql.expressions.Window
      .partitionBy("shard").orderBy(col("source").desc)
    grid
      .withColumn("chi2_cum", sum(col("term")).over(wCum))
      .withColumn("rn", row_number().over(wLast))
      .filter(col("rn") === 1)
      .select(col("shard"), col("n_shard").as("n_docs"),
        round(col("chi2_cum"), 6).as("chi2"))
      .orderBy("shard")
  }

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
