package graft

import org.apache.spark.sql.functions._

import graft.queries.Round9Queries

/** Invariant + plan guards for the round-9 families: TPC-H-shape join
  * planning (q167-q172) and distribution-audit statistics (q173-q178).
  * Correctness vs DuckDB is the driver gate's job; these tests pin the
  * conservation laws and the physical shapes that must survive refactors.
  */
class Round9Spec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  test("q167 local supplier volume: ASIA nations only, broadcast dims, no cartesian") {
    val df = Round9Queries.q167LocalSupplierVolume(spark, sf)
    val rows = df.collect()
    assert(rows.nonEmpty && rows.length <= 5, s"ASIA holds at most 5 nations, got ${rows.length}")
    rows.foreach { r =>
      assert(r.getAs[Double]("revenue") > 0 && r.getAs[Long]("n_items") > 0)
    }
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"), s"cartesian in q167: $plan")
    assert("BroadcastHashJoin".r.findAllIn(plan).length >= 2,
      s"dimension hops should broadcast: $plan")
  }

  test("q168 market share: share in [0,1] and nation7 <= market revenue") {
    Round9Queries.q168MarketShare(spark, sf).collect().foreach { r =>
      val share = r.getAs[Double]("mkt_share")
      assert(share >= 0.0 && share <= 1.0, s"share $share")
      assert(r.getAs[Double]("nation7_revenue") <= r.getAs[Double]("market_revenue") + 1e-6)
    }
  }

  test("q169 returned items: bounded top-k plans TakeOrderedAndProject, ordered output") {
    val df = Round9Queries.q169ReturnedItems(spark, sf)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"),
      s"top-20 should be a bounded heap, not a global sort: $plan")
    val revs = df.collect().map(_.getAs[Double]("lost_revenue"))
    assert(revs.length <= 20)
    assert(revs.sameElements(revs.sortBy(-_)), "not revenue-descending")
  }

  test("q170 promo share: percentages in [0,100], twelve months at most") {
    val rows = Round9Queries.q170PromoShare(spark, sf).collect()
    assert(rows.length <= 12)
    rows.foreach { r =>
      val pct = r.getAs[Double]("promo_pct")
      assert(pct >= 0.0 && pct <= 100.0, s"pct $pct")
    }
  }

  test("q171 small-quantity outliers: cut is strictly below the per-part mean") {
    // every counted lineitem has quantity < 0.5*avg of its part, so the
    // brand-level count can never exceed the total lineitems of that brand,
    // and a one-lineitem part can never qualify (its qty IS the avg)
    val li = spark.read.parquet(s"$sf/lineitem.parquet")
    val singles = li.groupBy("l_partkey").count().filter(col("count") === 1)
      .join(li, "l_partkey")
      .filter(col("l_quantity") < lit(0.5) * col("l_quantity"))
    assert(singles.count() == 0)
    val rows = Round9Queries.q171SmallQuantityOutliers(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach(r => assert(r.getAs[Long]("n_small") > 0))
  }

  test("q172 order fanout: buckets conserve both orders and lineitems") {
    val rows = Round9Queries.q172OrderFanout(spark, sf).collect()
      .map(r => r.getAs[Long]("fanout") -> r.getAs[Long]("n_orders")).toMap
    val nOrders = spark.read.parquet(s"$sf/orders.parquet").count()
    val nLineitems = spark.read.parquet(s"$sf/lineitem.parquet").count()
    // every order lands in exactly one bucket (fanout >= 0)
    assert(rows.filterKeys(_ >= 0).values.sum == nOrders)
    // lineitems of well-formed orders + orphaned lineitems' groups = total
    val sumFan = rows.collect { case (f, n) if f > 0 => f * n }.sum
    val orphanGroups = rows.getOrElse(-1L, 0L)
    assert(orphanGroups == 0, "testdata should have no orphaned lineitems")
    assert(sumFan == nLineitems, s"fanout-weighted sum $sumFan != $nLineitems")
  }

  test("q173 Mann-Whitney: U in [0, nw*nd] and counts conserve purchases") {
    val r = Round9Queries.q173MannWhitney(spark, sf).head()
    val nw = r.getAs[Long]("n_weekend"); val nd = r.getAs[Long]("n_weekday")
    val u = r.getAs[Double]("u_stat")
    assert(u >= 0.0 && u <= nw.toDouble * nd, s"U=$u outside [0, ${nw * nd}]")
    assert(!r.getAs[Double]("z_score").isNaN)
    val purchases = spark.read.parquet(s"$sf/events.parquet")
      .filter(col("event_type") === "purchase").count()
    assert(nw + nd == purchases)
  }

  test("q174 Wasserstein-1: bounded by the sup-gap times the support range") {
    val r = Round9Queries.q174WassersteinShift(spark, sf).head()
    val w1 = r.getAs[Double]("w1_distance")
    val sup = r.getAs[Double]("ks_companion")
    assert(w1 >= 0.0 && sup >= 0.0 && sup <= 1.0)
    // W1 = ∫|F1-F2| ≤ sup|F1-F2| · |support range| (quality spans ≤ 1.0)
    assert(w1 <= sup * 1.0 + 1e-9, s"w1 $w1 exceeds sup-gap bound $sup")
  }

  test("q175 decile drift: ten bins conserve the event count, early bins ~decile-sized") {
    val rows = Round9Queries.q175DecileDrift(spark, sf).collect()
    assert(rows.map(_.getAs[Int]("bin")).toSet.subsetOf((0 to 9).toSet))
    val nEvents = spark.read.parquet(s"$sf/events.parquet").count()
    val total = rows.map(r => r.getAs[Long]("n_early") + r.getAs[Long]("n_late")).sum
    assert(total == nEvents, s"binned $total of $nEvents events")
    // bin edges come from the early half's deciles: early counts per bin
    // differ by at most the tie mass at an edge — sanity: no bin holds
    // more than half the early rows
    val early = rows.map(_.getAs[Long]("n_early"))
    assert(early.max <= early.sum / 2, s"degenerate early binning: ${early.toSeq}")
  }

  test("q176 Pettitt: K bounded by the pair count, p in (0,1], one row per type") {
    val rows = Round9Queries.q176PettittChangepoint(spark, sf).collect()
    val types = rows.map(_.getAs[String]("event_type"))
    assert(types.distinct.length == types.length && rows.nonEmpty)
    val nDays = spark.read.parquet(s"$sf/events.parquet")
      .select(to_date(col("ts"))).distinct().count()
    rows.foreach { r =>
      val k = r.getAs[Long]("k_stat")
      // |U_t| can never exceed the total number of (i<=t<j) pairs
      assert(k >= 0 && k <= nDays * (nDays - 1) / 2, s"K=$k for T=$nDays")
      val p = r.getAs[Double]("p_approx")
      assert(p > 0.0 && p <= 1.0)
    }
  }

  test("q177 EWMA: baseline stays inside the daily-revenue envelope, day one never flags") {
    val rows = Round9Queries.q177EwmaAnomaly(spark, sf).collect()
    val byType = rows.groupBy(_.getAs[String]("event_type"))
    byType.foreach { case (_, rs) =>
      val sorted = rs.sortBy(_.getAs[String]("day"))
      // first day's flag must be false (no previous baseline)
      assert(!sorted.head.getAs[Boolean]("anomaly"))
      // EWMA is a convex combination of observed revenues
      val revs = sorted.map(_.getAs[Long]("rev_cents").toDouble)
      sorted.zipWithIndex.foreach { case (r, i) =>
        val e = r.getAs[Double]("ewma_cents")
        val seen = revs.take(i + 1)
        assert(e >= seen.min - 1e-6 && e <= seen.max + 1e-6,
          s"ewma $e outside envelope [${seen.min}, ${seen.max}]")
      }
    }
  }

  test("q178 Neyman allocation: caps respected, realized sample = allocation") {
    val rows = Round9Queries.q178NeymanAllocation(spark, sf).collect()
    assert(rows.nonEmpty)
    var allocSum = 0L
    rows.foreach { r =>
      val alloc = r.getAs[Long]("alloc"); val nh = r.getAs[Long]("n_docs")
      assert(alloc <= nh, s"allocation $alloc exceeds stratum $nh")
      assert(r.getAs[Long]("n_sampled") == alloc)
      allocSum += alloc
      if (alloc > 0) {
        val mean = r.getAs[Double]("sample_mean_q")
        assert(mean >= 0.0 && mean <= 1.0, s"sample mean $mean")
      }
    }
    // rounding + caps keep the total near the 100-doc budget, never wild
    assert(allocSum <= 110, s"allocated $allocSum for a 100 budget")
  }

  test("q179 BH-FDR: rejection set is a prefix of the p-value order") {
    val rows = Round9Queries.q179SourceDriftFdr(spark, sf).collect()
    assert(rows.nonEmpty)
    val byRank = rows.sortBy(_.getAs[Long]("p_rank"))
    // p monotone in rank, rejections form a prefix (the BH step-up property)
    val ps = byRank.map(_.getAs[Double]("p_value"))
    assert(ps.zip(ps.tail).forall { case (a, b) => a <= b + 1e-12 })
    val flags = byRank.map(_.getAs[Boolean]("rejected"))
    val firstKeep = flags.indexOf(false)
    if (firstKeep >= 0)
      assert(flags.drop(firstKeep).forall(!_), s"non-prefix rejections: ${flags.toSeq}")
    rows.foreach { r =>
      val p = r.getAs[Double]("p_value")
      assert(p >= 0.0 && p <= 1.0)
    }
  }

  test("q180 Theil-Sen: pair counts are n(n-1)/2 and the median sits inside the band") {
    Round9Queries.q180TheilSen(spark, sf).collect().foreach { r =>
      val pairs = r.getAs[Long]("n_pairs")
      // n days -> n(n-1)/2 pairs; solve back and check integrality
      val n = (1 + math.sqrt(1.0 + 8.0 * pairs)) / 2
      assert(math.abs(n - math.round(n)) < 1e-9, s"pair count $pairs not triangular")
      val m = r.getAs[Double]("theil_sen_slope")
      assert(m >= r.getAs[Double]("slope_p10") - 1e-9 &&
        m <= r.getAs[Double]("slope_p90") + 1e-9)
    }
  }

  test("q181 Gini: bounds [0, 1-1/n], zero-order customers included") {
    val rows = Round9Queries.q181RevenueGini(spark, sf).collect()
    assert(rows.nonEmpty)
    var counted = 0L
    rows.foreach { r =>
      val n = r.getAs[Long]("n_cust"); counted += n
      val g = r.getAs[Double]("gini")
      assert(g >= -1e-9 && g <= 1.0 - 1.0 / n + 1e-9, s"gini $g out of bounds (n=$n)")
      val ts = r.getAs[Double]("top_customer_share")
      assert(ts >= 1.0 / n - 1e-9 && ts <= 1.0)
    }
    // the population is ALL customers, not just those with orders
    assert(counted == spark.read.parquet(s"$sf/customer.parquet").count())
  }

  test("q182 clean suppliers: anti join removes every tainted supplier") {
    val li = spark.read.parquet(s"$sf/lineitem.parquet")
    // tainted = lifetime return rate above 32%, exact integer test (the
    // every-supplier-tainted "ever shipped an R item" predicate made the
    // oracle gate prove only the empty set at every SF)
    val tainted = li.groupBy("l_suppkey")
      .agg(sum(when(col("l_returnflag") === "R", 1L).otherwise(0L)).as("nr"),
        count(lit(1)).as("n"))
      .filter(col("nr") * 100L > col("n") * 32L)
      .select("l_suppkey").collect().map(_.getLong(0)).toSet
    // recompute the clean lineitem set directly and compare totals
    val cleanCount = li.filter(!col("l_suppkey").isin(tainted.toSeq: _*)).count()
    val rows = Round9Queries.q182CleanSupplierAssortment(spark, sf).collect()
    assert(rows.nonEmpty, "fixture must yield clean suppliers (non-degenerate gate)")
    assert(rows.map(_.getAs[Long]("n_lineitems")).sum == cleanCount)
    val plan = Round9Queries.q182CleanSupplierAssortment(spark, sf)
      .queryExecution.executedPlan.toString
    assert(plan.contains("LeftAnti"), s"tainted-supplier exclusion should be an anti join: $plan")
  }

  test("q183 dormant rich: every counted customer has no orders and an above-average balance") {
    val rows = Round9Queries.q183DormantRich(spark, sf).collect()
    val cust = spark.read.parquet(s"$sf/customer.parquet")
    // dormancy = no orders on/after the 1999-01-01 recency cutoff (every
    // fixture customer has SOME order, so "no orders ever" was degenerate)
    val withRecentOrders = spark.read.parquet(s"$sf/orders.parquet")
      .filter(col("o_orderdate") >= lit("1999-01-01").cast("date"))
      .select("o_custkey").distinct().count()
    val nCust = cust.count()
    val dormant = rows.map(_.getAs[Long]("n_dormant")).sum
    assert(dormant > 0, "fixture must yield dormant-rich customers (non-degenerate gate)")
    // dormant customers can never exceed customers without a recent order
    assert(dormant <= nCust - math.min(withRecentOrders, nCust))
    val plan = Round9Queries.q183DormantRich(spark, sf)
      .queryExecution.executedPlan.toString
    assert(plan.contains("LeftAnti"), s"no-orders should be an anti join: $plan")
  }

  test("round-9 TPC-H joins: no cartesian anywhere, facts meet in keyed joins") {
    Seq(
      Round9Queries.q167LocalSupplierVolume(spark, sf),
      Round9Queries.q168MarketShare(spark, sf),
      Round9Queries.q169ReturnedItems(spark, sf),
      Round9Queries.q170PromoShare(spark, sf),
      Round9Queries.q171SmallQuantityOutliers(spark, sf),
      Round9Queries.q172OrderFanout(spark, sf)).foreach { df =>
      val plan = df.queryExecution.executedPlan.toString
      assert(!plan.contains("CartesianProduct"), s"cartesian: $plan")
      assert(!plan.contains("BroadcastNestedLoop"), s"BNLJ: $plan")
    }
  }
}
