package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Corpus curation under a global token budget — the training-data
  * primitive "fill an N-token budget with the best documents".
  *
  * The naive formulation is a cumulative sum over the corpus ordered by
  * quality, i.e. a single-partition global window — a non-starter at 100 TB.
  * Instead the selection is computed as:
  *
  *   1. quantize quality to a bounded key (caller pre-rounds, e.g. 3 dp),
  *   2. ONE aggregation: token sum per quality key (≤ a few thousand rows),
  *   3. a driver-side prefix scan over the sorted histogram finds the cutoff:
  *      every strictly-better key fits entirely, one boundary key is taken
  *      partially,
  *   4. ONE filter pass emits `q > cutoff`, plus an ordered cumulative sum
  *      over ONLY the boundary key's rows — a window partitioned by the
  *      quality key, so the single "global" scan is confined to one small
  *      partition by construction.
  *
  * Two passes over the data, a histogram on the driver, no global window.
  * Rows with a null quality or null token count are EXCLUDED up front;
  * over the remaining rows the result is row-identical to the naive
  * `cum_sum ≤ budget` over `ORDER BY quality DESC, id` (ties inside the
  * boundary key break by id).
  */
object Curation {

  def selectByTokenBudget(df: DataFrame, idCol: String, qualityCol: String,
      tokenCol: String, budget: Long, maxQualityKeys: Int = 100000): DataFrame = {
    import org.apache.spark.sql.types.{DoubleType, IntegerType, LongType}
    require(df.schema(qualityCol).dataType == DoubleType,
      s"quality column $qualityCol must be a (quantized) double")
    require(Set[org.apache.spark.sql.types.DataType](IntegerType, LongType)
        .contains(df.schema(tokenCol).dataType),
      s"token column $tokenCol must be an integral count")
    val q = col(qualityCol)
    val rows = df.filter(q.isNotNull && col(tokenCol).isNotNull)
    // The per-quality histogram is collected to the driver, which is only
    // safe for a QUANTIZED score: a raw continuous quality would collect one
    // row per distinct value — a driver OOM at corpus scale. The limit bounds
    // what can ever reach the driver (the groupBy itself stays distributed),
    // and the require turns the unbounded case into a fail-fast instead of a
    // silently truncated (wrong) budget boundary.
    val hist = rows.groupBy(q.as("__q")).agg(sum(col(tokenCol)).as("__t"))
      .orderBy(col("__q").desc).limit(maxQualityKeys + 1).collect()
    require(hist.length <= maxQualityKeys,
      s"selectByTokenBudget: quality column '$qualityCol' has more than " +
        s"$maxQualityKeys distinct values; quantize the score (e.g. round to " +
        "k decimals) before budget selection — a continuous quality cannot " +
        "be histogrammed on the driver")
    var acc = 0L
    var boundaryQ = Double.NaN
    var rem = 0L
    var crossed = false
    val it = hist.iterator
    while (it.hasNext && !crossed) {
      val r = it.next()
      val bq = r.getDouble(0)
      val t = r.getLong(1)
      if (acc + t <= budget) acc += t // key fits entirely
      else { crossed = true; boundaryQ = bq; rem = budget - acc }
    }
    if (!crossed) rows // whole corpus fits the budget
    else {
      val above = rows.filter(q > lit(boundaryQ))
      val w = Window.partitionBy(q).orderBy(col(idCol))
      val partial = rows.filter(q === lit(boundaryQ))
        .withColumn("__cum", sum(col(tokenCol)).over(w))
        .filter(col("__cum") <= lit(rem)).drop("__cum")
      above.unionByName(partial)
    }
  }

  /** Distributed EXCLUSIVE prefix sum (scan): adds `offsetCol` = Σ tokenCol
    * over all rows strictly before this one in `orderCol` order — the global
    * cumulative-sum primitive Spark's API only offers as a single-partition
    * window. Three steps, none global:
    *   1. range-partition + sort on the order key (one shuffle, pinned with
    *      localCheckpoint so both consumers see one partition assignment),
    *   2. per-partition token sums (≤ numPartitions rows) → driver-side
    *      exclusive prefix, rejoined as a literal map lookup,
    *   3. a PARTITION-LOCAL cumulative window + the partition's prefix.
    * `orderCol` must be unique (it is the total order).
    */
  def withGlobalOffset(df: DataFrame, orderCol: String, tokenCol: String,
      offsetCol: String = "offset", numPartitions: Int = 0): DataFrame = {
    val n = if (numPartitions > 0) numPartitions
      else df.sparkSession.conf.get("spark.sql.shuffle.partitions", "200").toInt
    val ranged = df.repartitionByRange(n, col(orderCol))
      .sortWithinPartitions(orderCol)
      .withColumn("__pid", spark_partition_id())
      .localCheckpoint()
    val partSums = ranged.groupBy("__pid").agg(sum(col(tokenCol)).as("t"))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).sortBy(_._1)
    // exclusive prefix: tokens of all partitions strictly before pid
    val excl = {
      var acc = 0L
      partSums.map { case (pid, t) => val p = pid -> acc; acc += t; p }.toMap
    }
    val w = Window.partitionBy("__pid").orderBy(orderCol)
    ranged
      .withColumn("__local", sum(col(tokenCol)).over(w))
      .withColumn(offsetCol,
        col("__local") - col(tokenCol) +
          coalesce(element_at(typedLit(excl), col("__pid")), lit(0L)))
      .drop("__pid", "__local")
  }

  /** Waterfilling allocation under per-source supply caps: split `budget`
    * across suppliers so that uncapped sources share a common fill level C
    * with Σ min(supply, C) = budget — the q145/q151 solve exposed as a
    * reusable operator. Closed sorted-cumsum form: order sources by supply,
    * and the unique cut where the candidate level (budget − prefix)/(n − k)
    * falls between adjacent supplies is C. The window runs over the
    * POST-AGGREGATION per-source frame (domain-count bounded); validated
    * against an independent bisection solver over random supplies in
    * PropertySpec.
    *
    * @param supplies (keyCol, supplyCol) one row per source, supply > 0
    * @return (keyCol, supplyCol, allocation, capped)
    */
  def waterfillAllocations(supplies: DataFrame, keyCol: String,
      supplyCol: String, budget: Double): DataFrame =
    waterfillCore(supplies, keyCol, supplyCol, lit(budget))

  /** [[waterfillAllocations]] with the budget expressed as a FRACTION of
    * total supply (the q145 shape: "half the corpus"), computed in-plan so
    * no driver round-trip is needed to learn the total first. */
  def waterfillAllocationsFraction(supplies: DataFrame, keyCol: String,
      supplyCol: String, budgetFraction: Double): DataFrame =
    waterfillCore(supplies, keyCol, supplyCol, col("__tt") * budgetFraction)

  /** `budgetExpr` may reference `__tt` (total supply as double). Output
    * keeps `supplyCol` at its ORIGINAL dtype (callers join it into typed
    * reports); `allocation` is unrounded. No valid cut ⇔ budget ≥ Σ supply
    * ⇒ level = MaxValue ⇒ everything fully funded, nobody capped. */
  private def waterfillCore(supplies: DataFrame, keyCol: String,
      supplyCol: String, budgetExpr: org.apache.spark.sql.Column): DataFrame = {
    val t = supplies.select(col(keyCol), col(supplyCol),
      col(supplyCol).cast("double").as("__T"))
    val tot = t.agg(count(lit(1)).cast("double").as("__n"),
      sum(col("__T")).as("__tt"))
    val ord = Window.orderBy(col("__T"), col(keyCol))
    val cum = ord.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val ranked = t.crossJoin(tot)
      .withColumn("__B", budgetExpr)
      .withColumn("__k", row_number().over(ord).cast("double") - 1.0)
      .withColumn("__prefix", sum(col("__T")).over(cum) - col("__T"))
      .withColumn("__cand",
        (col("__B") - col("__prefix")) / (col("__n") - col("__k")))
      .withColumn("__prevT", coalesce(lag(col("__T"), 1).over(ord), lit(0.0)))
    // no valid cut ⇔ budget ≥ Σ supply: everything is fully funded
    val level = ranked
      .filter(col("__cand") <= col("__T") && col("__cand") >= col("__prevT"))
      .agg(coalesce(min(col("__cand")), lit(Double.MaxValue)).as("__C"))
    ranked.crossJoin(level)
      .select(col(keyCol), col(supplyCol),
        least(col("__T"), col("__C")).as("allocation"),
        (col("__T") > col("__C")).as("capped"))
  }

  /** WEIGHTED waterfilling (the q151 temperature-mixture solve): target
    * shares t_s = w_s/Σw, budget B = `budgetFraction`·ΣT, and allocations
    * min(T_s, λ·t_s·B) where the scale λ makes the allocations exhaust B.
    * Each source's saturation ratio r_s = T_s/(t_s·B) orders the closed
    * sorted-cumsum solve exactly as the unweighted form orders by supply.
    * One keyed aggregation + windows over the POST-AGGREGATION per-source
    * frame only. Same fallback as the unweighted core: no valid cut ⇔
    * budget ≥ Σ supply ⇒ λ = MaxValue ⇒ all fully funded.
    *
    * Output: (keyCol, supplyCol [original dtype], target_share, allocation,
    * budget, saturated) — `budget` is returned so callers can derive
    * realized shares without recomputing the total.
    */
  def waterfillWeightedAllocations(supplies: DataFrame, keyCol: String,
      supplyCol: String, weightCol: String,
      budgetFraction: Double): DataFrame = {
    val t = supplies.select(col(keyCol), col(supplyCol),
      col(supplyCol).cast("double").as("__T"),
      col(weightCol).cast("double").as("__w"))
    val tot = t.agg(sum(col("__T")).as("__tt"), sum(col("__w")).as("__tw"))
    val base = t.crossJoin(tot)
      .withColumn("__B", col("__tt") * budgetFraction)
      .withColumn("__ts", col("__w") / col("__tw"))
      .withColumn("__r", col("__T") / (col("__ts") * col("__B")))
    val ord = Window.orderBy(col("__r"), col(keyCol))
    val cum = ord.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val ranked = base
      .withColumn("__prefT", sum(col("__T")).over(cum) - col("__T"))
      .withColumn("__preft", sum(col("__ts")).over(cum) - col("__ts"))
      .withColumn("__cand",
        (col("__B") - col("__prefT")) / (col("__B") * (lit(1.0) - col("__preft"))))
      .withColumn("__prevR", coalesce(lag(col("__r"), 1).over(ord), lit(0.0)))
    val level = ranked
      .filter(col("__cand") <= col("__r") && col("__cand") >= col("__prevR"))
      .agg(coalesce(min(col("__cand")), lit(Double.MaxValue)).as("__L"))
    ranked.crossJoin(level)
      .select(col(keyCol), col(supplyCol),
        col("__ts").as("target_share"),
        least(col("__T"), col("__L") * col("__ts") * col("__B")).as("allocation"),
        col("__B").as("budget"),
        (col("__T") < col("__L") * col("__ts") * col("__B")).as("saturated"))
  }

  /** Row-level diff between two corpus snapshots — the incremental-ingest
    * audit (what changed between yesterday's crawl and today's?). Each
    * side collapses to `(id, content digest)`; a single full-outer merge
    * on the id classifies every row as `added` (new id), `removed`
    * (disappeared id), `changed` (same id, different digest) or
    * `unchanged`. Complements the q110 table-level fingerprints: that says
    * WHETHER replicas diverged, this says WHICH rows and HOW.
    *
    * 100-TB shape: digests are row-local projections, so the only wide
    * operation is one key-partitioned full-outer join carrying
    * (id, 16-byte digest) — never the payloads. Digests are compared
    * engine-internally only (equality, never cross-engine), so the md5
    * choice is an implementation detail.
    *
    * Output: `(idCol, change)` — one row per id appearing in either
    * snapshot.
    */
  def snapshotDiff(a: DataFrame, b: DataFrame, idCol: String,
      payloadCol: String): DataFrame = {
    def digested(df: DataFrame, out: String): DataFrame =
      df.select(col(idCol).as("__id"),
        md5(col(payloadCol).cast("binary")).as(out))
    digested(a, "__da")
      .join(digested(b, "__db"), Seq("__id"), "full_outer")
      .select(col("__id").as(idCol),
        when(col("__da").isNull, lit("added"))
          .when(col("__db").isNull, lit("removed"))
          .when(col("__da") =!= col("__db"), lit("changed"))
          .otherwise(lit("unchanged")).as("change"))
  }
}
