package graft

import org.apache.spark.sql.functions._

import graft.queries.Round8Queries

/** Invariant tests for the round-8 curation-decision queries (q142–q147)
  * over the sf0.001 driver testdata — conservation, bound, and
  * cross-formulation properties the oracle compare cannot express.
  */
class Round8Spec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  test("q142 semantic decontam: corpus partition, flags bounded, cos ≤ 1") {
    val r = Round8Queries.q142SemanticDecontam(spark, sf).collect()
    assert(r.nonEmpty)
    val nCorpus = r.map(_.getAs[Long]("n_corpus")).sum
    val nVecs = spark.read.parquet(s"$sf/embeddings.parquet").count()
    val nBench = spark.read.parquet(s"$sf/embeddings.parquet")
      .filter(col("vec_id") % 20 === 0).count()
    assert(nCorpus == nVecs - nBench)
    r.foreach { row =>
      assert(row.getAs[Long]("n_contaminated") <= row.getAs[Long]("n_corpus"))
      assert(row.getAs[Double]("max_cos") <= 1.0 + 1e-9)
      // every flagged vector's cosine is ≥ the threshold, so the average is
      val avg = row.getAs[java.lang.Double]("avg_contam_cos")
      if (avg != null) assert(avg >= 0.35 - 1e-9 && avg <= 1.0 + 1e-9)
    }
  }

  test("q143 semdedup: clusters partition the corpus, kept + pruned = members") {
    val r = Round8Queries.q143SemdedupPrune(spark, sf).collect()
    assert(r.nonEmpty && r.length <= 8)
    val members = r.map(_.getAs[Long]("n_members")).sum
    assert(members == spark.read.parquet(s"$sf/embeddings.parquet").count())
    r.foreach { row =>
      assert(row.getAs[Long]("n_kept") + row.getAs[Long]("n_pruned") ==
        row.getAs[Long]("n_members"))
      // every component keeps exactly one representative → kept ≥ 1 whenever
      // the cluster has members
      assert(row.getAs[Long]("n_kept") >= 1)
    }
  }

  test("q144 domain cap: kept ≤ min(cap, n), token mass conserved") {
    val r = Round8Queries.q144DomainCap(spark, sf).collect()
    assert(r.nonEmpty)
    r.foreach { row =>
      val n = row.getAs[Long]("n_docs")
      val kept = row.getAs[Long]("n_kept")
      assert(kept <= 50 && kept <= n)
      assert(kept == math.min(50L, n))
      assert(row.getAs[Long]("tokens_kept") >= 0)
      assert(row.getAs[Long]("tokens_dropped") >= 0)
    }
  }

  test("q144 kept set ≡ the window-rank formulation (TopKAgg equivalence)") {
    import org.apache.spark.sql.expressions.Window
    val d = spark.read.parquet(s"$sf/documents.parquet")
      .select(col("doc_id"), col("source"),
        round(graft.ext.TextStats.qualityScore(col("text")), 3).as("q"),
        graft.ext.TextStats.tokenCountSimple(col("text")).cast("long").as("tokens"))
    val w = Window.partitionBy("source").orderBy(col("q").desc, col("doc_id"))
    val windowed = d.withColumn("rk", row_number().over(w))
      .groupBy("source").agg(
        sum(when(col("rk") <= 50, 1L).otherwise(0L)).as("n_kept"),
        sum(when(col("rk") <= 50, col("tokens")).otherwise(0L)).as("tokens_kept"))
      .orderBy("source").collect()
    val agg = Round8Queries.q144DomainCap(spark, sf).orderBy("source").collect()
    assert(agg.length == windowed.length)
    agg.zip(windowed).foreach { case (a, wr) =>
      assert(a.getAs[String]("source") == wr.getAs[String]("source"))
      assert(a.getAs[Long]("n_kept") == wr.getAs[Long]("n_kept"))
      assert(a.getAs[Long]("tokens_kept") == wr.getAs[Long]("tokens_kept"))
    }
  }

  test("q145 waterfill: allocations sum to the budget, caps respected") {
    val r = Round8Queries.q145EpochAllocation(spark, sf).collect()
    assert(r.nonEmpty)
    val totalTokens = r.map(_.getAs[Long]("tokens")).sum
    val allocated = r.map(_.getAs[Double]("allocation")).sum
    // Σ min(T, C) = B = ΣT/2 (rounding at 6 dp per source)
    assert(math.abs(allocated - totalTokens / 2.0) < 1e-3 * r.length,
      s"allocated $allocated vs budget ${totalTokens / 2.0}")
    r.foreach { row =>
      val t = row.getAs[Long]("tokens").toDouble
      val a = row.getAs[Double]("allocation")
      assert(a >= -1e-9 && a <= t + 1e-6)
      val f = row.getAs[Double]("fill_fraction")
      assert(f >= 0.0 && f <= 1.0 + 1e-9)
      // uncapped sources are fully funded
      if (!row.getAs[Boolean]("capped")) assert(math.abs(a - t) < 1e-6)
    }
    // capped sources all sit at the common fill level C
    val cappedAllocs = r.filter(_.getAs[Boolean]("capped"))
      .map(_.getAs[Double]("allocation"))
    if (cappedAllocs.length >= 2)
      assert(cappedAllocs.max - cappedAllocs.min < 1e-6)
  }

  test("q146 split leakage: leaked ≤ test docs, rate consistent") {
    val r = Round8Queries.q146SplitLeakage(spark, sf).collect()
    assert(r.nonEmpty)
    r.foreach { row =>
      val n = row.getAs[Long]("n_test")
      val leaked = row.getAs[Long]("n_leaked")
      assert(leaked >= 0 && leaked <= n)
      assert(math.abs(row.getAs[Double]("leak_rate") - leaked.toDouble / n) < 1e-6)
    }
    // the test split itself must match the q34 partitioning
    val nTest = r.map(_.getAs[Long]("n_test")).sum
    val expect = graft.ext.Splits
      .withSplit(spark.read.parquet(s"$sf/documents.parquet"), "doc_id")
      .filter(col("split") === "test").count()
    assert(nTest == expect)
  }

  test("q147 curriculum: stages partition the corpus into near-equal counts" +
    " and are ordered by length") {
    val r = Round8Queries.q147LengthCurriculum(spark, sf).collect()
    assert(r.nonEmpty)
    val n = spark.read.parquet(s"$sf/documents.parquet").count()
    assert(r.map(_.getAs[Long]("n_docs")).sum == n)
    val perStage = r.groupBy(_.getAs[Long]("stage")).view
      .mapValues(_.map(_.getAs[Long]("n_docs")).sum).toMap
    assert(perStage.keySet == Set(0L, 1L, 2L, 3L))
    // equal-count cut: stage sizes differ by at most 1
    assert(perStage.values.max - perStage.values.min <= 1)
    // monotone: a later stage's max token count ≥ an earlier stage's min;
    // stage boundaries cut the sorted order, so max(stage i) ≤ min(stage i+1)
    // up to the key tie-break (token counts themselves are non-decreasing)
    val maxPer = r.groupBy(_.getAs[Long]("stage")).view
      .mapValues(_.map(_.getAs[Long]("max_tokens")).max).toMap
    val minPer = r.groupBy(_.getAs[Long]("stage")).view
      .mapValues(_.map(_.getAs[Long]("min_tokens")).min).toMap
    for (s <- 0L to 2L) assert(maxPer(s) <= minPer(s + 1))
  }

  test("q148 shard mixing: shards partition the corpus, chi2 ≥ 0") {
    val r = Round8Queries.q148ShardMixing(spark, sf).collect()
    assert(r.nonEmpty && r.length <= 16)
    val n = r.map(_.getAs[Long]("n_docs")).sum
    assert(n == spark.read.parquet(s"$sf/documents.parquet").count())
    r.foreach { row =>
      assert(row.getAs[Double]("chi2") >= 0.0)
      assert(row.getAs[Long]("n_docs") > 0)
    }
  }

  test("q149 near-dup leakage: leaked ⊆ test, consistent with q146-style rate") {
    val r = Round8Queries.q149NeardupLeakage(spark, sf).collect()
    assert(r.nonEmpty)
    r.foreach { row =>
      val n = row.getAs[Long]("n_test")
      val leaked = row.getAs[Long]("n_neardup_leaked")
      assert(leaked >= 0 && leaked <= n)
      assert(math.abs(row.getAs[Double]("leak_rate") - leaked.toDouble / n) < 1e-6)
    }
  }

  test("q150 effective tokens: monotone pipeline, retention in (0,1]") {
    val r = Round8Queries.q150EffectiveTokens(spark, sf).collect()
    assert(r.nonEmpty)
    r.foreach { row =>
      val total = row.getAs[Long]("tokens_total")
      val exact = row.getAs[Long]("tokens_exact")
      val fin = row.getAs[Long]("tokens_final")
      // each dedup stage only removes tokens
      assert(fin <= exact && exact <= total)
      val ret = row.getAs[Double]("retention")
      assert(ret > 0.0 && ret <= 1.0)
    }
    // global conservation: per-source totals sum to the corpus token count
    val total = r.map(_.getAs[Long]("tokens_total")).sum
    val corpus = spark.read.parquet(s"$sf/documents.parquet")
      .select(sum(length(col("text")) -
        length(regexp_replace(col("text"), " ", "")) + lit(1)))
      .head.getLong(0)
    assert(total == corpus)
  }

  test("q151 temperature mixture: budget exhausted, caps respected," +
    " unsaturated shares proportional to targets") {
    val r = Round8Queries.q151TemperatureMixture(spark, sf).collect()
    assert(r.nonEmpty)
    val totalTokens = r.map(_.getAs[Long]("tokens")).sum
    val allocated = r.map(_.getAs[Double]("allocation")).sum
    assert(math.abs(allocated - totalTokens * 0.6) < 1e-3 * r.length,
      s"allocated $allocated vs budget ${totalTokens * 0.6}")
    assert(math.abs(r.map(_.getAs[Double]("realized_share")).sum - 1.0) < 1e-4)
    val ratios = r.filterNot(_.getAs[Boolean]("saturated")).map { row =>
      row.getAs[Double]("realized_share") / row.getAs[Double]("target_share")
    }
    r.foreach { row =>
      val a = row.getAs[Double]("allocation")
      val t = row.getAs[Long]("tokens").toDouble
      assert(a <= t + 1e-6)
      // saturated ⟺ the whole supply is allocated
      assert(row.getAs[Boolean]("saturated") == (math.abs(a - t) < 1e-3))
    }
    // unsaturated sources all sit at the same water level λ
    if (ratios.length >= 2) assert(ratios.max - ratios.min < 1e-4)
  }

  test("q152 cross-lingual dups: unordered pairs, cos within (0.4, 1]") {
    val r = Round8Queries.q152CrosslingualDups(spark, sf).collect()
    assert(r.nonEmpty)
    r.foreach { row =>
      assert(row.getAs[String]("lang_a") <= row.getAs[String]("lang_b"))
      val avg = row.getAs[Double]("avg_cos"); val mx = row.getAs[Double]("max_cos")
      assert(avg >= 0.4 - 1e-9 && avg <= mx + 1e-9)
      assert(mx <= 1.0 + 1e-9)
      assert(row.getAs[Long]("n_pairs") > 0)
    }
    // mass check: the matrix partitions the full ≥0.4 pair set
    val nPairs = r.map(_.getAs[Long]("n_pairs")).sum
    val truth = graft.ext.Similarity.cosinePairsExact(
      spark.read.parquet(s"$sf/embeddings.parquet"), "vec_id", "embedding", 0.4)
      .count()
    assert(nPairs == truth)
  }

  test("q153 peak concurrency: curve nonnegative, closes at zero, peak bounds") {
    val r = Round8Queries.q153PeakConcurrency(spark, sf).collect()
    assert(r.nonEmpty)
    val started = r.map(_.getAs[Long]("n_sessions_started")).sum
    // every session contributes one +1: total starts = session count
    val sessions = graft.ext.Events.sessionize(
      graft.ext.Events.normalizeTs(
        spark.read.parquet(s"$sf/events.parquet")), "user_id", "ts")
      .select("user_id", "session_id").distinct().count()
    assert(started == sessions, s"starts $started vs sessions $sessions")
    r.foreach { row =>
      val peak = row.getAs[Long]("peak_concurrency")
      assert(peak >= 0)
      // a day's peak cannot exceed the total session count
      assert(peak <= sessions)
      assert(row.getAs[String]("day").matches("\\d{4}-\\d{2}-\\d{2}"))
    }
    // at least one day must reach concurrency ≥ 1 (sessions exist)
    assert(r.map(_.getAs[Long]("peak_concurrency")).max >= 1)
  }

  test("q154 survival: at-risk monotone non-increasing from the user count," +
    " survival monotone non-increasing in [0,1]") {
    val r = Round8Queries.q154ConversionSurvival(spark, sf).orderBy("k").collect()
    assert(r.nonEmpty)
    val users = spark.read.parquet(s"$sf/events.parquet")
      .select("user_id").distinct().count()
    assert(r.head.getAs[Long]("at_risk") == users)
    val atRisk = r.map(_.getAs[Long]("at_risk"))
    assert(atRisk.zip(atRisk.tail).forall { case (a, b) => a >= b })
    val surv = r.map(_.getAs[Double]("survival"))
    assert(surv.zip(surv.tail).forall { case (a, b) => a >= b - 1e-9 })
    assert(surv.forall(s => s >= 0.0 && s <= 1.0 + 1e-9))
    r.foreach { row =>
      assert(row.getAs[Long]("conversions") <= row.getAs[Long]("at_risk"))
      val h = row.getAs[Double]("hazard")
      assert(h >= 0.0 && h <= 1.0)
    }
    // conversions sum to the number of converting users
    val conv = spark.read.parquet(s"$sf/events.parquet")
      .filter(col("event_type") === "purchase")
      .select("user_id").distinct().count()
    assert(r.map(_.getAs[Long]("conversions")).sum == conv)
  }

  test("q155 shipping priority: TakeOrderedAndProject top-k, broadcast" +
    " segment filter, shipdate pushed to the lineitem scan") {
    val df = Round8Queries.q155ShippingPriority(spark, sf)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"), plan.take(400))
    assert(plan.contains("BroadcastExchange"), plan.take(400))
    assert(!plan.contains("CartesianProduct"))
    val r = df.collect()
    assert(r.length <= 10 && r.nonEmpty)
    val revs = r.map(_.getAs[Double]("revenue"))
    assert(revs.zip(revs.tail).forall { case (a, b) => a >= b })
    r.foreach(row => assert(row.getAs[Double]("revenue") > 0.0))
  }

  test("q156 latency percentiles: ordered p50 ≤ p90 ≤ p99 ≤ max, lines conserved") {
    val r = Round8Queries.q156FulfillmentLatency(spark, sf).collect()
    assert(r.nonEmpty)
    r.foreach { row =>
      val p50 = row.getAs[Double]("p50_days")
      val p90 = row.getAs[Double]("p90_days")
      val p99 = row.getAs[Double]("p99_days")
      val mx = row.getAs[Long]("max_days").toDouble
      assert(p50 <= p90 + 1e-9 && p90 <= p99 + 1e-9 && p99 <= mx + 1e-9)
      assert(row.getAs[Double]("avg_days") <= mx)
    }
    val lines = r.map(_.getAs[Long]("n_lines")).sum
    assert(lines == spark.read.parquet(s"$sf/lineitem.parquet").count())
  }

  test("q157 multi-signal groups: members ≥ 2, every group has ≥ 1 edge," +
    " union refines the single-signal partitions") {
    val r = Round8Queries.q157MultisignalGroups(spark, sf).collect()
    assert(r.nonEmpty)
    r.foreach { row =>
      assert(row.getAs[Long]("n_members") >= 2)
      assert(row.getAs[Long]("text_edges") + row.getAs[Long]("sem_edges") >= 1)
    }
    // the union graph can only MERGE single-signal components, never split:
    // group count ≤ text-only group count + sem-only group count
    val textGroups = graft.queries.ExtQueries
      .q36DupGroups(spark, sf).select("group_id").distinct().count()
    val semGroups = graft.queries.ExtQueries
      .q63SemanticGroups(spark, sf).select("group_id").distinct().count()
    assert(r.length <= textGroups + semGroups)
  }

  test("q158 growth accounting: actives decompose exactly, churn bounded") {
    val r = Round8Queries.q158GrowthAccounting(spark, sf).orderBy("week").collect()
    assert(r.nonEmpty)
    r.foreach { row =>
      assert(row.getAs[Long]("n_active") ==
        row.getAs[Long]("n_new") + row.getAs[Long]("n_retained") +
          row.getAs[Long]("n_resurrected"))
      Seq("n_new", "n_retained", "n_resurrected", "n_churned")
        .foreach(c => assert(row.getAs[Long](c) >= 0, s"$c negative"))
    }
    // first week: everyone is new, nobody churned
    assert(r.head.getAs[Long]("n_new") == r.head.getAs[Long]("n_active"))
    assert(r.head.getAs[Long]("n_churned") == 0)
    // Σ new over all weeks = distinct users ever
    val users = spark.read.parquet(s"$sf/events.parquet")
      .select("user_id").distinct().count()
    assert(r.map(_.getAs[Long]("n_new")).sum == users)
  }

  test("q159 funnel latency: counts equal the q33 funnel stages, percentiles" +
    " ordered, deltas positive") {
    val r = Round8Queries.q159FunnelLatency(spark, sf).collect()
      .map(row => row.getAs[String]("stage") -> row).toMap
    assert(r.keySet == Set("view_to_click", "click_to_purchase"))
    val funnel = graft.queries.ExtQueries.q33Funnel(spark, sf).head
    assert(r("view_to_click").getAs[Long]("n_users") ==
      funnel.getAs[Long]("n_click"))
    assert(r("click_to_purchase").getAs[Long]("n_users") ==
      funnel.getAs[Long]("n_purchase"))
    r.values.foreach { row =>
      val med = row.getAs[Double]("median_s")
      val p90 = row.getAs[Double]("p90_s")
      val mx = row.getAs[Double]("max_s")
      assert(med > 0.0 && med <= p90 + 1e-9 && p90 <= mx + 1e-9)
    }
  }

  test("q160 mutual information: 0 ≤ MI ≤ min(H), NMI in [0,1]") {
    val r = Round8Queries.q160MutualInformation(spark, sf).collect()
    assert(r.length == 1)
    val row = r.head
    val mi = row.getAs[Double]("mi_nats")
    val hx = row.getAs[Double]("h_quality")
    val hy = row.getAs[Double]("h_length")
    assert(mi >= -1e-9)
    assert(hx > 0.0 && hy > 0.0)
    assert(mi <= math.min(hx, hy) + 1e-9)
    val nmi = row.getAs[Double]("nmi")
    assert(nmi >= -1e-9 && nmi <= 1.0 + 1e-9)
    assert(row.getAs[Long]("n_docs") ==
      spark.read.parquet(s"$sf/documents.parquet").count())
  }

  test("q161 subsample stability: band contains the center, 64 replicates") {
    val r = Round8Queries.q161SubsampleStability(spark, sf).collect()
    assert(r.length == 1)
    val row = r.head
    assert(row.getAs[Long]("n_replicates") == 64)
    val lo = row.getAs[Double]("band_lo")
    val hi = row.getAs[Double]("band_hi")
    val m = row.getAs[Double]("mean_of_means")
    assert(lo <= m + 1e-9 && m <= hi + 1e-9)
    assert(row.getAs[Double]("band_range") >= hi - lo - 1e-9)
    // half-sample means of a bounded [0,1] score sit inside [0,1]
    assert(lo >= 0.0 && hi <= 1.0)
  }

  test("q162 session paths: ranked journeys, counts bounded by session count") {
    val r = Round8Queries.q162SessionPaths(spark, sf).orderBy("rank").collect()
    assert(r.nonEmpty && r.length <= 5)
    val sessions = graft.ext.Events.sessionize(
      graft.ext.Events.normalizeTs(
        spark.read.parquet(s"$sf/events.parquet")), "user_id", "ts")
      .select("user_id", "session_id").distinct().count()
    val counts = r.map(_.getAs[Long]("n_sessions"))
    assert(counts.zip(counts.tail).forall { case (a, b) => a >= b })
    assert(counts.sum <= sessions)
    r.foreach { row =>
      val j = row.getAs[String]("journey")
      assert(j.split(">").length <= 3 && j.nonEmpty)
    }
  }

  test("q163 unpivot: melt(pivot(events)) ≡ direct per-type aggregation") {
    val r = Round8Queries.q163UnpivotDaily(spark, sf).collect()
    assert(r.nonEmpty)
    val direct = spark.read.parquet(s"$sf/events.parquet")
      .groupBy("event_type").agg(count(lit(1)).as("n"))
      .collect().map(x => x.getAs[String]("event_type") -> x.getAs[Long]("n")).toMap
    r.foreach { row =>
      assert(row.getAs[Long]("total_events") ==
        direct(row.getAs[String]("event_type")))
    }
    assert(r.map(_.getAs[Long]("total_events")).sum == direct.values.sum)
  }

  test("q164 retention decay: slopes finite, half-life positive iff decaying") {
    val r = Round8Queries.q164RetentionDecay(spark, sf).collect()
    assert(r.nonEmpty)
    r.foreach { row =>
      assert(row.getAs[Long]("n_offsets") >= 3)
      assert(row.getAs[Long]("cohort_size") > 0)
      val b = row.getAs[Double]("decay_rate")
      assert(!b.isNaN && !b.isInfinite)
      val hl = row.getAs[java.lang.Double]("half_life_weeks")
      if (b < 0) { assert(hl != null && hl > 0.0) } else assert(hl == null)
    }
  }

  test("q165 point-in-time: intervals partition the timeline — every purchase" +
    " matches exactly one version") {
    val r = Round8Queries.q165PointInTime(spark, sf).collect()
    assert(r.nonEmpty)
    val matched = r.map(_.getAs[Long]("n_purchases")).sum
    val purchases = spark.read.parquet(s"$sf/events.parquet")
      .filter(col("event_type") === "purchase").count()
    assert(matched == purchases, s"matched $matched of $purchases purchases")
    // a purchase that opens its own run is enriched with the 'purchase'
    // regime, so that regime must appear
    assert(r.exists(_.getAs[String]("regime") == "purchase"))
    r.foreach(row => assert(row.getAs[Double]("total_value") >=
      row.getAs[Double]("avg_value") - 1e-9))
  }

  test("q166 lead-lag: 7 lags, correlations in [-1,1], lag-0 day counts full") {
    val r = Round8Queries.q166LeadLag(spark, sf).orderBy("lag_days").collect()
    assert(r.map(_.getAs[Long]("lag_days")).toSeq == (-3L to 3L).toSeq)
    r.foreach { row =>
      val c = row.getAs[Double]("xcorr")
      assert(c >= -1.0 - 1e-9 && c <= 1.0 + 1e-9)
      assert(row.getAs[Long]("n_days") >= 2)
    }
    // |lag| shrinks the overlap: lag 0 has at least as many days as lag ±3
    val byLag = r.map(row => row.getAs[Long]("lag_days") -> row.getAs[Long]("n_days")).toMap
    assert(byLag(0L) >= byLag(3L) && byLag(0L) >= byLag(-3L))
  }

  test("round-8 plans: keyed shuffles and broadcast sides only — no shuffled" +
    " cartesian, no unbounded global window over row-level data") {
    val sfDir = sf
    // q142's corpus side must not shuffle: the only join is broadcast
    val plan142 = Round8Queries.q142SemanticDecontam(spark, sfDir)
      .queryExecution.executedPlan.toString
    assert(plan142.contains("BroadcastNestedLoopJoin") ||
      plan142.contains("BroadcastExchange"), plan142.take(500))
    // q146's span join is a keyed equi-join (semi), never nested-loop
    val plan146 = Round8Queries.q146SplitLeakage(spark, sfDir)
      .queryExecution.executedPlan.toString
    assert(!plan146.contains("CartesianProduct"))
    assert(plan146.contains("LeftSemi"), plan146.take(800))
    // q144 aggregates through the bounded TopKAgg, not a row_number window
    val plan144 = Round8Queries.q144DomainCap(spark, sfDir)
      .queryExecution.executedPlan.toString
    assert(plan144.contains("ObjectHashAggregate"), plan144.take(500))
    assert(!plan144.toLowerCase.contains("window"), plan144.take(800))
    // q147 uses partition-local windows only (the distributed rank)
    val plan147 = Round8Queries.q147LengthCurriculum(spark, sfDir)
      .queryExecution.executedPlan.toString
    assert(!plan147.contains("CartesianProduct"))
  }
}
