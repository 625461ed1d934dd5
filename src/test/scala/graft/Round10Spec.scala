package graft

import org.apache.spark.sql.functions._

import graft.queries.Round10Queries

/** Invariant + plan guards for the round-10 families: the remaining TPC-H
  * join shapes (q184-q189), exact-integer time-series diagnostics over the
  * hourly revenue grid (q190-q193), and rank/nonparametric statistics
  * (q194-q197). Correctness vs DuckDB is the driver gate's job; these pin
  * conservation laws, statistical-range invariants, and the physical plan
  * shapes that must survive refactors.
  */
class Round10Spec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  test("q184 priority wait: left-semi keyed join, counts bounded by orders") {
    val df = Round10Queries.q184PriorityWait(spark, sf)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("LeftSemi"), s"expected a semi join, got: $plan")
    assert(!plan.contains("CartesianProduct"), s"cartesian in q184: $plan")
    val rows = df.collect()
    assert(rows.nonEmpty && rows.length <= 5)
    val totalOrders = spark.read.parquet(s"$sf/orders.parquet").count()
    assert(rows.map(_.getAs[Long]("n_late_orders")).sum <= totalOrders)
    rows.foreach(r =>
      assert(r.getAs[Long]("n_customers") <= r.getAs[Long]("n_late_orders")))
  }

  test("q185 nation pairs: directed, irreflexive, one fact shuffle + broadcast dims") {
    val df = Round10Queries.q185NationPairVolume(spark, sf)
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"), s"cartesian in q185: $plan")
    assert("BroadcastHashJoin".r.findAllIn(plan).length >= 2,
      s"supplier/customer lookups should broadcast: $plan")
    val rows = df.collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[String]("supp_nation") != r.getAs[String]("cust_nation"))
      assert(r.getAs[Long]("n_items") > 0)
    }
  }

  test("q186 product profit: part filter before the fact join, items conserve") {
    val df = Round10Queries.q186ProductProfit(spark, sf)
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"), s"cartesian in q186: $plan")
    // the 'red' name filter must prune at the part scan, not post-join
    assert(plan.contains("Contains(p_name") || plan.contains("contains(p_name"),
      s"part-name filter should push to the dimension side: $plan")
    val nItems = df.collect().map(_.getAs[Long]("n_items")).sum
    val li = spark.read.parquet(s"$sf/lineitem.parquet")
    val redParts = spark.read.parquet(s"$sf/part.parquet")
      .filter(col("p_name").contains("red"))
    val expected = li.join(redParts, col("l_partkey") === col("p_partkey")).count()
    assert(nItems == expected, s"profit rollup dropped items: $nItems != $expected")
  }

  test("q187 above-share nations: every kept share exceeds the 1.5/25 cut") {
    val rows = Round10Queries.q187AboveShareNations(spark, sf).collect()
    assert(rows.nonEmpty, "some nation always exceeds 1.5x the equal share")
    val shares = rows.map(_.getAs[Double]("share"))
    shares.foreach(s => assert(s > 1.5 / 25 - 1e-9 && s <= 1.0, s"share $s"))
    assert(shares.sum <= 1.0 + 1e-9)
  }

  test("q188 large-volume customers: kept iff total_qty > 2x the customer average") {
    val li = spark.read.parquet(s"$sf/lineitem.parquet")
    val o = spark.read.parquet(s"$sf/orders.parquet")
    val perCust = li.join(o, col("l_orderkey") === col("o_orderkey"))
      .groupBy("o_custkey").agg(sum(col("l_quantity").cast("long")).as("q"))
    val stats = perCust.agg(sum("q").as("t"), count(lit(1)).as("c")).head()
    val cut = 2.0 * stats.getAs[Long]("t").toDouble / stats.getAs[Long]("c")
    val expected = perCust.filter(col("q").cast("double") > cut).count()
    val rows = Round10Queries.q188LargeVolumeCustomers(spark, sf).collect()
    assert(rows.length == expected, s"${rows.length} != $expected")
    rows.foreach(r => assert(r.getAs[Long]("total_qty").toDouble > cut))
  }

  test("q189 lag buckets conserve the joined lineitems") {
    val rows = Round10Queries.q189ShipLagPriorityMix(spark, sf).collect()
    assert(rows.nonEmpty && rows.length <= 9, "buckets clamp to [-4, 4]")
    val total = rows.map(r =>
      r.getAs[Long]("n_high_priority") + r.getAs[Long]("n_low_priority")).sum
    val li = spark.read.parquet(s"$sf/lineitem.parquet")
    val o = spark.read.parquet(s"$sf/orders.parquet")
    val joined = li.join(o, col("l_orderkey") === col("o_orderkey")).count()
    assert(total == joined, s"bucket counts $total != joined lineitems $joined")
  }

  test("q190 Durbin-Watson: full grid per type, dw within [0, 4]") {
    val rows = Round10Queries.q190DurbinWatson(spark, sf).collect()
    assert(rows.nonEmpty)
    val ns = rows.map(_.getAs[Long]("n")).distinct
    assert(ns.length == 1, s"all types share one zero-filled grid, got $ns")
    rows.foreach { r =>
      val dw = r.getAs[Double]("dw")
      assert(dw >= 0.0 && dw <= 4.0, s"dw $dw out of range")
      assert(r.getAs[Double]("mean_hourly_rev") >= 0.0)
    }
  }

  test("q191 Ljung-Box: |rho| <= 1 and Q nondecreasing in lag") {
    val rows = Round10Queries.q191LjungBox(spark, sf).collect().sortBy(_.getAs[Int]("lag"))
    assert(rows.map(_.getAs[Int]("lag")).toSeq == Seq(1, 2, 3, 4, 5))
    rows.foreach(r => assert(math.abs(r.getAs[Double]("rho")) <= 1.0))
    val qs = rows.map(_.getAs[Double]("lb_q"))
    assert(qs.zip(qs.tail).forall { case (a, b) => b >= a - 1e-9 },
      s"LB Q must accumulate: ${qs.toSeq}")
    assert(qs.head >= 0.0)
  }

  test("q192 variance ratio: positive variances, base lag excluded") {
    val rows = Round10Queries.q192VarianceRatio(spark, sf).collect()
    assert(rows.map(_.getAs[Int]("q")).sorted.toSeq == Seq(2, 4, 8))
    rows.foreach { r =>
      assert(r.getAs[Double]("var_q_dollars2") > 0.0)
      assert(r.getAs[Double]("vr") > 0.0)
    }
  }

  test("q193 diurnal harmonic: amplitude dominates coefficients, energy share in [0,1]") {
    val r = Round10Queries.q193DiurnalHarmonic(spark, sf).head()
    val (b, c) = (r.getAs[Double]("cos_coef"), r.getAs[Double]("sin_coef"))
    val amp = r.getAs[Double]("amplitude")
    assert(amp >= math.abs(b) - 1e-6 && amp >= math.abs(c) - 1e-6)
    assert(amp <= math.abs(b) + math.abs(c) + 1e-6)
    val es = r.getAs[Double]("energy_share")
    assert(es >= 0.0 && es <= 1.0, s"energy share $es")
  }

  test("q194 Spearman machinery matches a driver-side exact computation") {
    val r = Round10Queries.q194SpearmanPearson(spark, sf).head()
    val rho = r.getAs[Double]("spearman_rho")
    assert(math.abs(rho) <= 1.0 && math.abs(r.getAs[Double]("pearson_r")) <= 1.0)
    // independent oracle: textbook average-rank Spearman on the collected
    // column pair (sf0.001 is small enough to rank on the driver)
    val xy = spark.read.parquet(s"$sf/lineitem.parquet")
      .select(col("l_quantity").cast("long"),
        round(col("l_extendedprice") * (lit(1.0) - col("l_discount")) * 100, 0)
          .cast("long"))
      .collect().map(r0 => (r0.getLong(0), r0.getLong(1)))
    def avgRanks(v: Array[Long]): Array[Double] = {
      val sorted = v.zipWithIndex.sortBy(_._1)
      val out = new Array[Double](v.length)
      var i = 0
      while (i < sorted.length) {
        var j = i
        while (j < sorted.length && sorted(j)._1 == sorted(i)._1) j += 1
        val r = (i + 1 + j).toDouble / 2.0 // mean of ranks i+1..j
        (i until j).foreach(k => out(sorted(k)._2) = r)
        i = j
      }
      out
    }
    val rx = avgRanks(xy.map(_._1))
    val ry = avgRanks(xy.map(_._2))
    val n = rx.length.toDouble
    val (mx, my) = (rx.sum / n, ry.sum / n)
    val cov = rx.zip(ry).map { case (a, b) => (a - mx) * (b - my) }.sum
    val vx = rx.map(a => (a - mx) * (a - mx)).sum
    val vy = ry.map(b => (b - my) * (b - my)).sum
    val expected = cov / math.sqrt(vx * vy)
    assert(math.abs(rho - expected) < 1e-6, s"spark $rho vs driver $expected")
  }

  test("q195 Kruskal-Wallis: tie correction only inflates H, mean ranks bounded") {
    val r = Round10Queries.q195KruskalWallis(spark, sf).head()
    assert(r.getAs[Long]("n_groups") == 5)
    val h = r.getAs[Double]("h")
    assert(h >= 0.0)
    assert(r.getAs[Double]("h_tie_corrected") >= h - 1e-9)
    val n = r.getAs[Long]("n")
    val mr = r.getAs[Double]("max_mean_rank")
    assert(mr >= 1.0 && mr <= n.toDouble, s"mean rank $mr outside [1, $n]")
  }

  test("q196 Brown-Forsythe: F >= 0, degrees of freedom consistent") {
    val r = Round10Queries.q196BrownForsythe(spark, sf).head()
    assert(r.getAs[Double]("f_stat") >= 0.0)
    assert(r.getAs[Long]("df1") == 2) // 3 return flags
    assert(r.getAs[Long]("df2") == r.getAs[Long]("n") - 3)
  }

  test("q197 Kendall tau-b: pair counts bounded by n-choose-2, |tau| <= 1") {
    val r = Round10Queries.q197KendallTau(spark, sf).head()
    val n = r.getAs[Long]("n")
    val pairs = n * (n - 1) / 2
    val (c, d) = (r.getAs[Long]("concordant"), r.getAs[Long]("discordant"))
    assert(c >= 0 && d >= 0 && c + d <= pairs)
    assert(math.abs(r.getAs[Double]("tau_b")) <= 1.0)
  }

  test("q198 sole blame: blamed orders are a subset of multi-supplier orders") {
    val rows = Round10Queries.q198SoleBlameSupplier(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach(r =>
      assert(r.getAs[Long]("n_suppliers") <= r.getAs[Long]("n_blamed_orders")))
    val li = spark.read.parquet(s"$sf/lineitem.parquet")
    val multi = li.groupBy("l_orderkey")
      .agg(countDistinct("l_suppkey").as("ns")).filter(col("ns") >= 2).count()
    assert(rows.map(_.getAs[Long]("n_blamed_orders")).sum <= multi)
  }

  test("q199 top suppliers: per year all kept rows tie at the year maximum") {
    val rows = Round10Queries.q199TopSupplierPerYear(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.groupBy(_.getAs[Int]("ship_year")).foreach { case (_, ties) =>
      assert(ties.map(_.getAs[Double]("revenue")).distinct.length == 1,
        "kept rows within a year must share the max revenue")
    }
  }

  test("q200 Poisson bootstrap: deterministic, ordered CI bracketing the point") {
    val a = Round10Queries.q200PoissonBootstrap(spark, sf).head()
    val b = Round10Queries.q200PoissonBootstrap(spark, sf).head()
    assert(a == b, "md5-derived bootstrap must be bit-deterministic")
    val (lo, mid, hi) = (a.getAs[Double]("boot_p025"),
      a.getAs[Double]("boot_median"), a.getAs[Double]("boot_p975"))
    assert(lo <= mid && mid <= hi)
    val point = a.getAs[Double]("point_mean")
    assert(point > lo && point < hi,
      s"point $point outside bootstrap CI [$lo, $hi]")
  }

  test("q201 jackknife: one block per populated nation, nonnegative SE") {
    val r = Round10Queries.q201NationJackknife(spark, sf).head()
    // blocks = nations that actually supplied lineitems at this sf
    val li = spark.read.parquet(s"$sf/lineitem.parquet").select("l_suppkey")
    val s2n = spark.read.parquet(s"$sf/supplier.parquet")
      .select(col("s_suppkey"), col("s_nationkey"))
    val populated = li.join(s2n, col("l_suppkey") === col("s_suppkey"))
      .select("s_nationkey").distinct().count()
    assert(r.getAs[Long]("g") == populated)
    assert(r.getAs[Double]("theta_hat") > 0)
    assert(r.getAs[Double]("jackknife_se") >= 0)
    assert(r.getAs[Double]("max_influence") >= 0)
  }

  test("q202 diversity: effective langs bounded by lang count, Simpson in range") {
    val rows = Round10Queries.q202LangDiversity(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val k = r.getAs[Long]("n_langs").toDouble
      assert(r.getAs[Double]("effective_langs") <= k + 1e-6)
      val s = r.getAs[Double]("simpson")
      assert(s >= 1.0 / k - 1e-9 && s <= 1.0 + 1e-9)
      assert(r.getAs[Double]("shannon_h") <= math.log(k) + 1e-6)
    }
  }

  test("q203 LSH audit: 4x4 candidates nest inside 8x2, rates bounded") {
    val rows = Round10Queries.q203LshQualityAudit(spark, sf).collect()
      .map(r => r.getAs[Int]("bands") ->
        (r.getAs[Long]("n_candidates"), r.getAs[Long]("n_tp"),
          r.getAs[Long]("n_truth"), r.getAs[Double]("precision"),
          r.getAs[Double]("recall"))).toMap
    assert(rows.keySet == Set(4, 8))
    val (c8, tp8, t8, p8, r8) = rows(8)
    val (c4, tp4, t4, p4, r4) = rows(4)
    assert(t8 == t4, "both configs audit the same truth set")
    // a full 4-slice band match contains two matching 2-slice bands, so
    // the 4x4 candidate set nests inside 8x2 — counts and recall monotone
    assert(c4 <= c8 && tp4 <= tp8)
    Seq(p8, r8, p4, r4).foreach(v => assert(v >= 0.0 && v <= 1.0))
    assert(r4 <= r8 + 1e-9)
  }

  test("q204 closed-form OLS matches a driver-side normal-equation solve") {
    val r = Round10Queries.q204MultipleRegression(spark, sf).head()
    val r2 = r.getAs[Double]("r2")
    assert(r2 >= 0.0 && r2 <= 1.0, s"r2 $r2")
    Seq("partial_qty", "partial_disc").foreach { c =>
      val v = r.getAs[Double](c)
      assert(v >= -1.0 && v <= 1.0, s"$c $v")
    }
    // independent driver-side solve on the collected rows (dollars scale)
    val rows = spark.read.parquet(s"$sf/lineitem.parquet")
      .select(col("l_quantity").cast("double"),
        round(col("l_discount") * 100, 0).cast("double"),
        round(col("l_extendedprice") * (lit(1.0) - col("l_discount")) * 100, 0)
          .cast("double"))
      .collect().map(x => (x.getDouble(0), x.getDouble(1), x.getDouble(2)))
    val n = rows.length.toDouble
    var (sq, sd2, sy, sqq, sdd, sqd, sqy, sdy) = (0d, 0d, 0d, 0d, 0d, 0d, 0d, 0d)
    rows.foreach { case (q, d, y) =>
      sq += q; sd2 += d; sy += y; sqq += q * q; sdd += d * d
      sqd += q * d; sqy += q * y; sdy += d * y
    }
    val det = n * (sqq * sdd - sqd * sqd) - sq * (sq * sdd - sqd * sd2) +
      sd2 * (sq * sqd - sqq * sd2)
    val detB1 = n * (sqy * sdd - sdy * sqd) - sy * (sq * sdd - sqd * sd2) +
      sd2 * (sq * sdy - sqy * sd2)
    val expB1 = detB1 / det / 100.0
    assert(math.abs(r.getAs[Double]("beta_qty") - expB1) < 1e-4,
      s"beta_qty ${r.getAs[Double]("beta_qty")} vs driver $expB1")
  }

  test("q194 rank machinery avoids cartesians on the data-sized path") {
    // the distinct-value rank scans run through withGlobalOffset's range
    // partitioning and join back as keyed/broadcast joins — nothing
    // data-sized may cartesian. (q197 is exempt from this guard: its
    // concordance join is an inequality self-join of the ≤100-cell
    // contingency table — bounded by construction, so the planner's
    // nested-loop/cartesian there is the intended shape.)
    val plan = Round10Queries.q194SpearmanPearson(spark, sf)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"), s"cartesian: $plan")
  }
}
