package graft.reports

import java.sql.{Date, Timestamp}
import java.time.LocalDate

import org.apache.spark.sql.{Column, DataFrame, Row, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{StringType, StructField, StructType}

import graft.api.{GroupedStats, SeriesFrame}
import graft.core.{Dist, Exprs, ReturnsFrame}
import graft.core.Exprs.fdiv
import graft.functions.GraftProduct.product
import graft.stats.Smart

/** QuantStats-style metrics table (reference: alphastats/reports.py:22-290).
  *
  * Semantics preserved from the reference:
  *  - strategy columns renamed to titles; benchmark inner/left-joined on the
  *    temporal column (reports.py:357-371);
  *  - NaN→null then **null→0** on every metric series (reports.py:376-378) —
  *    report metrics see zero-filled series, unlike bare Stats calls;
  *  - duration/streak rows are computed on bare series (no time axis), so
  *    episode lengths are ROW COUNTS in the report (reports.py:397-414);
  *  - percent rows ×100; cells rounded to 2, NaN/±Inf → "-", benchmark-only
  *    cells "-" (reports.py:411, 539-553);
  *  - exact row orders: basic 36 / full 70 (tests/test_quantstats_parity.py:57-167).
  *
  * Execution is restructured Spark-first (SURVEY.md §3 note): instead of the
  * reference's ~40 sequential one-metric queries per column, metrics are
  * batched into a fixed number of aggregation passes whose count does NOT
  * grow with the column count: one wide scalar pass, one stacked long-format
  * pass each for drawdown stats (+ autocorr penalties), episodes, and
  * streaks — all with windows partitioned by asset, never a global
  * single-partition window — plus one calendar-bucket pass per bucket
  * granularity and one benchmark pass. A full 10-asset report is ~9 jobs.
  *
  * Those passes are mutually independent once the two cached frames (the
  * zero-filled wide frame and the melted drawdown frame) are materialized,
  * so they are SUBMITTED CONCURRENTLY from a small driver-side pool: the
  * report's wall-clock is the slowest single pass, not the sum of ~9
  * scheduler floors. On a real cluster this is the same win — concurrent
  * jobs pipeline into free executor slots. The frames are count()-forced
  * BEFORE forking so concurrent consumers share one cache materialization
  * instead of racing to compute it.
  */
object Reports {

  /** Shared driver-side pool for concurrent pass submission — bounded at 8
    * across ALL in-flight metrics() calls (a bench pool of parallel report
    * queries shares it rather than multiplying threads), daemon so it never
    * blocks JVM exit, and process-lifetime so there is no per-call shutdown
    * path to leak on a failed pass.
    */
  private lazy val passEc: scala.concurrent.ExecutionContext =
    scala.concurrent.ExecutionContext.fromExecutorService(
      java.util.concurrent.Executors.newFixedThreadPool(8,
        new java.util.concurrent.ThreadFactory {
          private val n = new java.util.concurrent.atomic.AtomicInteger(0)
          def newThread(r: Runnable): Thread = {
            val t = new Thread(r, s"graft-report-pass-${n.getAndIncrement()}")
            t.setDaemon(true); t
          }
        }))

  def metrics(
      returns: DataFrame,
      benchmark: Option[DataFrame] = None,
      rf: Double = 0.0,
      mode: String = "basic",
      sep: Boolean = false,
      compounded: Boolean = true,
      periodsPerYear: Int = 252,
      matchDates: Boolean = true,
      strategyTitle: Option[Seq[String]] = None,
      benchmarkTitle: String = "Benchmark",
      asPct: Boolean = true,
      display: Boolean = false): DataFrame = {

    val spark = returns.sparkSession
    val pct: Double = if (asPct) 100.0 else 1.0
    val full = mode.toLowerCase == "full"

    // ---- prepare frame (reports.py:311-379) ----
    val rfm = ReturnsFrame(returns)
    val temporal = rfm.temporalCol
    val strategyNames = rfm.numericCols
    require(strategyNames.nonEmpty, "`returns` must contain at least one numeric return column")
    val strategyOut: Seq[String] = strategyTitle match {
      case Some(ts) =>
        require(ts.length == strategyNames.length,
          "`strategyTitle` must match the number of strategy return columns")
        ts
      case None => if (strategyNames.length == 1) Seq("Strategy") else strategyNames
    }
    var frame = rfm.df.select(
      temporal.map(col).toSeq ++
        strategyNames.zip(strategyOut).map { case (n, o) => col(n).as(o) }: _*)

    var outputNames = strategyOut
    var benchName: Option[String] = None
    benchmark.foreach { b =>
      val bm = ReturnsFrame.prepareBenchmark(b)
      benchName = Some(benchmarkTitle)
      val bdf = bm.df.select(
        bm.temporalCol.map(col).toSeq :+ col(ReturnsFrame.BenchmarkCol).as(benchmarkTitle): _*)
      frame = (temporal, bm.temporalCol) match {
        case (Some(lt), Some(rt)) =>
          val how = if (matchDates) "inner" else "left"
          frame.join(bdf.withColumnRenamed(rt, lt), Seq(lt), how)
        case _ => graft.core.AsOfJoin.positional(frame, bdf.select(col(benchmarkTitle)))
      }
      outputNames = benchmarkTitle +: strategyOut
    }
    frame = frame.cache()

    val ord: Column = temporal.map(col).getOrElse(monotonically_increasing_id())
    val names = outputNames

    // ---- P0: start/end dates per column + max date (raw temporal scalar:
    // time-of-day must survive for the trailing-window boundaries) ----
    val (startDates, endDates, maxRawOpt): (Map[String, Any], Map[String, Any], Option[Any]) =
      temporal match {
        case None => (Map.empty, Map.empty, None)
        case Some(t) =>
          val aggs = names.flatMap(n => Seq(
            min(when(col(n).isNotNull, col(t))).as(s"__s_$n"),
            max(when(col(n).isNotNull, col(t))).as(s"__e_$n"))) :+ max(col(t)).as("__mx")
          val row = frame.agg(aggs.head, aggs.tail: _*).head()
          val s = names.map(n => n -> row.getAs[Any](s"__s_$n")).toMap
          val e = names.map(n => n -> row.getAs[Any](s"__e_$n")).toMap
          (s, e, Option(row.getAs[Any]("__mx")))
      }

    // ---- zero-filled metric frame (reports.py:378) ----
    val zf = frame.select(
      (temporal.map(col).toSeq :+ ord.as("__ord")) ++
        names.map(n => coalesce(col(n).cast("double"), lit(0.0)).as(n)): _*).cache()

    /** max(ts) shifted by calendar months/years, same temporal type —
      * matches the reference's offset_by (keeps time-of-day on timestamps).
      */
    def boundary(mx: Any, months: Int, years: Int): Column =
      lit(graft.stats.Calendar.shift(mx, months, years))

    // ---- P1: one wide scalar-aggregate pass ----
    case class P1(n: String) {
      val c: Column = col(n)
      def x: Column = Exprs.excess(c, rf)
      def condProd(cond: Column): Column =
        product(when(cond, c + lit(1.0)).otherwise(lit(1.0))) - lit(1.0)
      def condCagr(cond: Column): Column =
        pow(product(when(cond, c + lit(1.0)).otherwise(lit(1.0))),
          lit(periodsPerYear.toDouble) / sum(when(cond, 1).otherwise(0))) - lit(1.0)
      def exprs: Seq[Column] = {
        val t = temporal.map(col).orNull
        val base = Seq(
          Exprs.exposure(c).as(s"exposure__$n"),
          Exprs.comp(c).as(s"comp__$n"),
          sum(c).as(s"sum__$n"),
          Exprs.cagr(c, rf, compounded, periodsPerYear).as(s"cagr__$n"),
          Exprs.cagr(c, 0.0, compounded, periodsPerYear).as(s"cagr0__$n"),
          Exprs.sharpe(c, rf, periodsPerYear, annualize = true).as(s"sharpe__$n"),
          // PSR base: NO rf here — the reference's probabilistic_sharpe_ratio
          // uses a no-rf Sharpe and subtracts rf once in the CDF argument
          // (alphastats/stats.py:277,295)
          Exprs.sharpe(c, 0.0, periodsPerYear, annualize = false).as(s"sharpe_na__$n"),
          Exprs.sortino(c, rf, periodsPerYear, annualize = true).as(s"sortino__$n"),
          Exprs.omega(c, 0.0).as(s"omega__$n"),
          Exprs.gainToPain(c, rf).as(s"g2p__$n"),
          Exprs.payoffRatio(c).as(s"payoff__$n"),
          Exprs.profitFactor(c).as(s"pf__$n"),
          Exprs.commonSenseRatio(c).as(s"csr__$n"),
          Exprs.cpcIndex(c).as(s"cpc__$n"),
          Exprs.tailRatio(c, 0.95).as(s"tail__$n"),
          Exprs.outlierWinRatio(c, 0.99).as(s"owr__$n"),
          Exprs.outlierLossRatio(c, 0.01).as(s"olr__$n"),
          Exprs.skew(c).as(s"skew__$n"),
          Exprs.kurtosis(c).as(s"kurt__$n"),
          Exprs.expectedReturn(c).as(s"expd__$n"),
          Exprs.kellyCriterion(c).as(s"kelly__$n"),
          Exprs.riskOfRuin(c).as(s"ror__$n"),
          Exprs.valueAtRisk(c, 1.0, 0.95).as(s"var__$n"),
          Exprs.volatility(c, periodsPerYear, annualize = true).as(s"vol__$n"),
          Exprs.winRate(c).as(s"windays__$n"),
          max(c).as(s"best__$n"),
          min(c).as(s"worst__$n"),
          count(c).as(s"count__$n"))
        val windows = (temporal, maxRawOpt) match {
          case (Some(_), Some(mx)) =>
            val (my, mm) = graft.stats.Calendar.yearMonth(mx)
            Seq(
              condProd(year(t) === my && month(t) === mm).as(s"mtd__$n"),
              condProd(t >= boundary(mx, -3, 0)).as(s"m3__$n"),
              condProd(t >= boundary(mx, -6, 0)).as(s"m6__$n"),
              condProd(year(t) === my).as(s"ytd__$n"),
              condProd(t >= boundary(mx, 0, -1)).as(s"y1__$n"),
              condCagr(t >= boundary(mx, 0, -3)).as(s"y3__$n"),
              condCagr(t >= boundary(mx, 0, -5)).as(s"y5__$n"),
              condCagr(t >= boundary(mx, 0, -10)).as(s"y10__$n"))
          case _ => Nil
        }
        base ++ windows
      }
    }
    // ---- concurrent pass submission: materialize the shared caches ONCE on
    // this thread, then submit every independent aggregation pass from a
    // bounded pool — the report costs max(pass), not sum(passes) ----
    zf.count()
    implicit val passEc: scala.concurrent.ExecutionContext = Reports.passEc
    def await[T](f: scala.concurrent.Future[T]): T =
      scala.concurrent.Await.result(f, scala.concurrent.duration.Duration.Inf)

    val p1Exprs = names.flatMap(n => P1(n).exprs)
    val p1F = scala.concurrent.Future { zf.agg(p1Exprs.head, p1Exprs.tail: _*).head() }
    lazy val p1 = await(p1F)
    def g(k: String, n: String): Double = {
      val i = p1.fieldIndex(s"${k}__$n")
      if (p1.isNullAt(i)) Double.NaN else p1.getAs[Any](i) match {
        case d: Double => d
        case l: java.lang.Long => l.toDouble
      }
    }

    // ---- stacked long format: the multi-pass families (drawdown stats +
    // autocorr penalties, episodes, streaks) melt the zero-filled frame ONCE
    // into (asset, __ord, r) and run key-partitioned windows — one
    // aggregation per family for ALL columns, no per-column jobs and no
    // global single-partition windows (this is Reports' internal use of the
    // GroupedStats scale core).
    val stacked = zf.select(col("__ord"), explode(map(
      names.flatMap(n => Seq(lit(n), zf(n))): _*)).as(Seq("__asset", "__r")))
    val ddf = GroupedStats.withDrawdown(
      SeriesFrame(stacked, Seq("__asset"), "__ord", "__r")).df.cache()
    // materialize before forking P2/P3/P4 — three concurrent consumers must
    // share one cache build, not race to compute the window three times
    ddf.count()
    val rr = col("__r")
    val ddc = col("__dd")

    // ---- P2: drawdown pass (max dd, ulcer, recovery, serenity, cvar) for
    // all columns in one aggregation; in full mode the smart-ratio lag pairs
    // ride along on the same asset partitioning ----
    val z05 = Dist.invCdf(0.05)
    val wholeA = Window.partitionBy(col("__asset"))
    val prevW = Window.partitionBy(col("__asset")).orderBy(col("__ord"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val s3 = ddf
      .withColumn("__ddvar", avg(ddc).over(wholeA) + lit(z05) * stddev_samp(ddc).over(wholeA))
      .withColumn("__rvar", avg(rr).over(wholeA) + lit(z05) * stddev_samp(rr).over(wholeA))
      .withColumn("__prev",
        if (full) last(rr, ignoreNulls = true).over(prevW) else lit(null))
    val ddCvar = coalesce(avg(when(ddc < col("__ddvar"), ddc)), first(col("__ddvar")))
    val ulcer = sqrt(sum(ddc * ddc) / (count(rr) - lit(1)))
    val p2df = s3.groupBy(col("__asset")).agg(
      min(ddc).as("maxdd"),
      ulcer.as("ulcer"),
      fdiv(abs(sum(rr) - lit(0.0)), abs(min(ddc))).as("recovery"),
      fdiv(sum(rr) - lit(rf), ulcer * fdiv(-ddCvar, stddev_samp(rr))).as("serenity"),
      coalesce(avg(when(rr < col("__rvar"), rr)), first(col("__rvar"))).as("cvar"),
      count(rr).as("n"),
      corr(col("__prev"), rr).as("rho"))
    val p2rowsF = scala.concurrent.Future {
      p2df.collect().map(r => r.getAs[String]("__asset") -> r).toMap
    }
    lazy val p2rows: Map[String, Row] = await(p2rowsF)
    def g2(k: String, n: String): Double = {
      val row = p2rows(n)
      val i = row.fieldIndex(k)
      if (row.isNullAt(i)) Double.NaN else row.getDouble(i)
    }

    // ---- P3/P4: episodes + streaks, all columns per pass (row-count
    // semantics, because the reference passes bare series — reports.py:397-414) ----
    val wA = Window.partitionBy(col("__asset")).orderBy(col("__ord"))
    val wIn = Window.partitionBy(col("__asset"), col("__in")).orderBy(col("__ord"))
    val episodeRowsF = scala.concurrent.Future { ddf
      .withColumn("__in", ddc.isNotNull && ddc < 0)
      .withColumn("__island", row_number().over(wA) - row_number().over(wIn))
      .filter(col("__in"))
      .groupBy(col("__asset"), col("__island"))
      .agg(count(lit(1)).as("__len"), min(ddc).as("__depth"))
      .groupBy(col("__asset"))
      .agg(max("__len").as("maxlen"), avg("__len").as("avglen"),
        avg("__depth").as("avgdepth"))
      .collect()
      .map(r => r.getAs[String]("__asset") ->
        ((r.getAs[Long]("maxlen"), r.getAs[Double]("avglen"), r.getAs[Double]("avgdepth"))))
      .toMap
    }
    lazy val episodeRows: Map[String, (Long, Double, Double)] = await(episodeRowsF)
    // an asset with no drawdown episodes has no aggregate row — zeros, as the
    // reference's empty-episode frame yields
    def episode(n: String): (Long, Double, Double) =
      episodeRows.getOrElse(n, (0L, 0.0, 0.0))

    val streakRowsF = scala.concurrent.Future {
      if (!full) Map.empty[String, (Long, Long)]
      else GroupedStats.streaks(SeriesFrame(ddf, Seq("__asset"), "__ord", "__r"))
        .collect()
        .map(r => r.getAs[String]("__asset") ->
          ((r.getAs[Long]("consecutive_wins"), r.getAs[Long]("consecutive_losses"))))
        .toMap
    }
    lazy val streakRows: Map[String, (Long, Long)] = await(streakRowsF)

    // ---- P5: ONE calendar pass for all three bucket granularities ----
    // r13 (optimization guide §2.3/§2.4): the monthly/quarterly/yearly
    // bucket families each scanned zf separately (three jobs, three full
    // scans at cluster scale). GROUPING SETS ((y,m),(y,q),(y)) computes
    // every grain's bucket values in one scan — the Expand triples rows
    // before the partial aggregate, but the exchange still carries only
    // bucket-level rows — and the per-grain finals run as ONE aggregation
    // over the bounded keyed frame, each final fed `when(gid = grain)` so
    // it sees exactly its grain's rows (every final is a null-skipping
    // aggregate: product/sum/avg/min/max/conditional counts). Bucket
    // values per grain are the identical Π(1+r)/Σr over the identical row
    // sets the per-grain groupBys produced.
    val t = temporal.map(col).orNull
    // grouping-set ids for grouping columns (__y, __m, __q):
    // (y,m) -> q aggregated -> 1; (y,q) -> m aggregated -> 2; (y) -> 3
    val monthlyFinals: Seq[(String, Column => Column, Boolean)] =
      ("g2p1m", (c: Column) => Exprs.gainToPain(c, rf), false) +: (if (full) Seq(
        ("expm", Exprs.expectedReturn: Column => Column, true),
        ("bestm", (c: Column) => max(c), true),
        ("worstm", (c: Column) => min(c), true),
        ("avgup", Exprs.avgWin: Column => Column, true),
        ("avgdown", Exprs.avgLoss: Column => Column, true),
        ("winm", Exprs.winRate: Column => Column, true)) else Nil)
    val yearlyFinals: Seq[(String, Column => Column, Boolean)] =
      if (!full) Nil else Seq(
        ("expy", Exprs.expectedReturn: Column => Column, true),
        ("besty", (c: Column) => max(c), true),
        ("worsty", (c: Column) => min(c), true),
        ("winy", Exprs.winRate: Column => Column, true))
    val quarterlyFinals: Seq[(String, Column => Column, Boolean)] =
      if (!full) Nil else Seq(("winq", Exprs.winRate: Column => Column, true))
    val calendarRowF = scala.concurrent.Future {
      temporal.map { _ =>
        val allFinals = monthlyFinals ++ yearlyFinals ++ quarterlyFinals
        val bucketVals =
          (if (allFinals.exists(_._3)) names.map(n => Exprs.comp(zf(n)).as(s"__c__$n")) else Nil) ++
            (if (allFinals.exists(!_._3)) names.map(n => sum(zf(n)).as(s"__s__$n")) else Nil)
        val zb = zf.withColumn("__y", year(t)).withColumn("__m", month(t))
          .withColumn("__q", quarter(t))
        val sets: Seq[Seq[Column]] =
          Seq(Seq(col("__y"), col("__m"))) ++
            (if (full) Seq(Seq(col("__y"), col("__q")), Seq(col("__y"))) else Nil)
        val keyed = zb.groupingSets(sets, col("__y"), col("__m"), col("__q"))
          .agg(grouping_id().as("__gid"), bucketVals: _*)
        def grainExprs(gid: Int,
            finals: Seq[(String, Column => Column, Boolean)]): Seq[Column] =
          names.flatMap(n => finals.map { case (k, f, compounded) =>
            f(when(col("__gid") === gid,
              keyed(if (compounded) s"__c__$n" else s"__s__$n"))).as(s"${k}__$n")
          })
        val aggExprs = grainExprs(1, monthlyFinals) ++
          grainExprs(2, quarterlyFinals) ++ grainExprs(3, yearlyFinals)
        keyed.agg(aggExprs.head, aggExprs.tail: _*).head()
      }
    }
    // all three grain views read the SAME combined row (field names are
    // disjoint across grains); basic mode never looks at yearly/quarterly
    lazy val monthly = await(calendarRowF)
    lazy val yearly = if (full) await(calendarRowF) else None
    lazy val quarterly = if (full) await(calendarRowF) else None

    def gb(m: Option[Row], k: String, n: String): Any = m match {
      case None => "-"
      case Some(row) =>
        val i = row.fieldIndex(s"${k}__$n")
        if (row.isNullAt(i)) Double.NaN else row.getAs[Any](i)
    }

    // ---- P8: benchmark metrics pass ----
    val benchRowF = scala.concurrent.Future { benchName.map { bn =>
      val b = col(bn)
      val exprs = strategyOut.flatMap { n =>
        val c = col(n)
        val beta = fdiv(covar_samp(c, b), var_samp(b))
        val corrC = corr(c, b)
        val active = c - b
        Seq(
          (corrC * corrC).as(s"r2__$n"),
          fdiv(avg(active), stddev_samp(active)).as(s"ir__$n"),
          beta.as(s"beta__$n"),
          // the reference's Alpha row calls stats.greeks with its DEFAULT
          // periods=252 regardless of periods_per_year (reports.py _greek) —
          // preserve the quirk
          ((avg(c) - beta * avg(b)) * 252).as(s"alpha__$n"),
          corrC.as(s"corr__$n"),
          fdiv(Exprs.comp(c) - lit(rf), beta).as(s"treynor__$n"))
      }
      zf.agg(exprs.head, exprs.tail: _*).head()
    } }
    lazy val benchRow: Option[Row] = await(benchRowF)
    def gbm(k: String, n: String): Any =
      if (benchName.contains(n)) "-"
      else benchRow.map { row =>
        val i = row.fieldIndex(s"${k}__$n")
        if (row.isNullAt(i)) Double.NaN else row.getDouble(i)
      }.getOrElse("-")

    // ---- autocorr penalties (full mode): the lag-1 corr was collected in
    // the P2 aggregation; only the closed-form decay sum runs driver-side ----
    def penalty(n: String): Double = {
      val row = p2rows(n)
      val i = row.fieldIndex("rho")
      Smart.penaltyOf(row.getAs[Long]("n"),
        if (row.isNullAt(i)) None else Some(row.getDouble(i)))
    }

    // ---- assemble rows ----
    val rows = scala.collection.mutable.ArrayBuffer.empty[(String, Map[String, Any])]
    def add(label: String, f: String => Any): Unit =
      rows += label -> names.map(n => n -> f(n)).toMap
    def addSep(): Unit = if (sep) rows += "" -> names.map(_ -> ("": Any)).toMap

    def fmtDate(v: Any): String = v match {
      case null => "-"
      case d: Date => d.toLocalDate.toString
      case ts: Timestamp => ts.toLocalDateTime.toLocalDate.toString
      case other => other.toString
    }

    def psrOf(n: String): Double = {
      val b = g("sharpe_na", n)
      val sk = g("skew", n)
      val ku = g("kurt", n)
      val cnt = g("count", n)
      val sigma = math.sqrt((1 + 0.5 * b * b - sk * b + ((ku - 3) / 4) * b * b) / (cnt - 1))
      Dist.cdf((b - rf) / sigma)
    }

    add("Start Period", n => fmtDate(startDates.getOrElse(n, null)))
    add("End Period", n => fmtDate(endDates.getOrElse(n, null)))
    add("Risk-Free Rate", _ => rf * pct)
    add("Time in Market", n => g("exposure", n) * pct)
    addSep()
    if (compounded) add("Cumulative Return", n => g("comp", n) * pct)
    else add("Total Return", n => g("sum", n) * pct)
    add("CAGR﹪", n => g("cagr", n) * pct)
    addSep()
    add("Sharpe", n => g("sharpe", n))
    add("Prob. Sharpe Ratio", n => psrOf(n) * pct)
    if (full) add("Smart Sharpe", n => g("sharpe", n) / penalty(n))
    add("Sortino", n => g("sortino", n))
    if (full) add("Smart Sortino", n => g("sortino", n) / penalty(n))
    add("Sortino/√2", n => g("sortino", n) / math.sqrt(2.0))
    if (full) add("Smart Sortino/√2", n => g("sortino", n) / penalty(n) / math.sqrt(2.0))
    add("Omega", n => g("omega", n))
    addSep()
    add("Max Drawdown", n => g2("maxdd", n) * pct)
    add("Longest DD Days", n => episode(n)._1)
    if (full) {
      addSep()
      add("Volatility (ann.)", n => g("vol", n) * pct)
      if (benchName.isDefined) {
        add("R^2", n => gbm("r2", n))
        add("Information Ratio", n => gbm("ir", n))
      }
      add("Calmar", n => {
        val mdd = math.abs(g2("maxdd", n))
        if (mdd == 0) Double.NaN else g("cagr0", n) / mdd
      })
      add("Skew", n => g("skew", n))
      add("Kurtosis", n => g("kurt", n))
      add("Expected Daily", n => g("expd", n) * pct)
      add("Expected Monthly", n => numOrDash(gb(monthly, "expm", n), pct))
      add("Expected Yearly", n => numOrDash(gb(yearly, "expy", n), pct))
      add("Kelly Criterion", n => g("kelly", n) * pct)
      add("Risk of Ruin", n => g("ror", n))
      add("Daily Value-at-Risk", n => g("var", n) * pct)
      add("Expected Shortfall (cVaR)", n => g2("cvar", n) * pct)
      add("Max Consecutive Wins", n => streakRows(n)._1)
      add("Max Consecutive Losses", n => streakRows(n)._2)
    }
    addSep()
    add("Gain/Pain Ratio", n => g("g2p", n))
    add("Gain/Pain (1M)", n => numOrDash(gb(monthly, "g2p1m", n), 1.0))
    addSep()
    add("Payoff Ratio", n => g("payoff", n))
    add("Profit Factor", n => g("pf", n))
    add("Common Sense Ratio", n => g("csr", n))
    add("CPC Index", n => g("cpc", n))
    add("Tail Ratio", n => g("tail", n))
    add("Outlier Win Ratio", n => g("owr", n))
    add("Outlier Loss Ratio", n => g("olr", n))
    addSep()
    def windowRow(k: String, n: String): Any =
      if (temporal.isEmpty || maxRawOpt.isEmpty) "-" else g(k, n) * pct
    add("MTD", n => windowRow("mtd", n))
    add("3M", n => windowRow("m3", n))
    add("6M", n => windowRow("m6", n))
    add("YTD", n => windowRow("ytd", n))
    add("1Y", n => windowRow("y1", n))
    add("3Y (ann.)", n => windowRow("y3", n))
    add("5Y (ann.)", n => windowRow("y5", n))
    add("10Y (ann.)", n => windowRow("y10", n))
    add("All-time (ann.)", n => g("cagr0", n) * pct)
    if (full) {
      addSep()
      add("Best Day", n => g("best", n) * pct)
      add("Worst Day", n => g("worst", n) * pct)
      add("Best Month", n => numOrDash(gb(monthly, "bestm", n), pct))
      add("Worst Month", n => numOrDash(gb(monthly, "worstm", n), pct))
      add("Best Year", n => numOrDash(gb(yearly, "besty", n), pct))
      add("Worst Year", n => numOrDash(gb(yearly, "worsty", n), pct))
    }
    addSep()
    add("Avg. Drawdown", n => episode(n)._3 * pct)
    add("Avg. Drawdown Days", n => episode(n)._2)
    add("Recovery Factor", n => g2("recovery", n))
    add("Ulcer Index", n => g2("ulcer", n))
    add("Serenity Index", n => g2("serenity", n))
    if (full) {
      addSep()
      add("Avg. Up Month", n => numOrDash(gb(monthly, "avgup", n), pct))
      add("Avg. Down Month", n => numOrDash(gb(monthly, "avgdown", n), pct))
      add("Win Days", n => g("windays", n) * pct)
      add("Win Month", n => numOrDash(gb(monthly, "winm", n), pct))
      add("Win Quarter", n => numOrDash(gb(quarterly, "winq", n), pct))
      add("Win Year", n => numOrDash(gb(yearly, "winy", n), pct))
      if (benchName.isDefined) {
        addSep()
        add("Beta", n => gbm("beta", n))
        add("Alpha", n => gbm("alpha", n))
        add("Correlation", n => gbm("corr", n) match {
          case d: Double => d * pct
          case other => other
        })
        add("Treynor Ratio", n => gbm("treynor", n) match {
          case d: Double => d * pct
          case other => other
        })
      }
    }

    // every pass future must be complete before the caches go away — a pass
    // that was never awaited during row assembly (e.g. the benchmark pass in
    // basic mode) would otherwise still be running against an unpersisting
    // frame (correct but recomputes), and its failure would be swallowed
    Seq[scala.concurrent.Future[Any]](p1F, p2rowsF, episodeRowsF, streakRowsF,
      calendarRowF, benchRowF).foreach(await)
    frame.unpersist()
    zf.unpersist()
    ddf.unpersist()
    val out = buildOutput(spark, rows.toSeq, names)
    if (!display) out
    else {
      // reference parity: display=True PRINTS the table and returns None
      // (alphastats/reports.py:287-290) — here, an empty frame of the same
      // schema as the None-equivalent
      out.show(rows.size, truncate = false)
      spark.createDataFrame(spark.sparkContext.emptyRDD[Row], out.schema)
    }
  }

  private def numOrDash(v: Any, mult: Double): Any = v match {
    case d: Double => d * mult
    case other => other
  }

  /** Python-parity cell formatting (reports.py:539-553). */
  def formatValue(v: Any): String = v match {
    case null => "-"
    case s: String => s
    case l: Long => l.toString
    case i: Int => i.toString
    case d: Double =>
      if (d.isNaN || d.isInfinite) "-"
      else {
        // Python round() operates on the EXACT binary expansion of the
        // double (12.345 is stored as 12.34500000000000064 → "12.35");
        // java BigDecimal.valueOf / scala BigDecimal(Double) would use the
        // shortest repr and round the other way.
        val rounded = new java.math.BigDecimal(d)
          .setScale(2, java.math.RoundingMode.HALF_EVEN).doubleValue()
        if (rounded == 0.0) "0"
        else {
          // matches Python str(): shortest repr, ".0" kept — but Java's
          // Double.toString switches to E-notation at |x| ≥ 1e7 where
          // Python stays positional until 1e16 ("10000000.57", not
          // "1.000000057E7"). Re-render the SAME shortest-repr digits
          // positionally; values ≥ 1e16 (Python goes scientific with a
          // different spelling) don't occur in a 2dp-rounded report cell
          // a human reads, and fall back to the Java spelling.
          val s = rounded.toString
          if (!s.contains("E") || math.abs(rounded) >= 1e16) s
          else {
            val plain = new java.math.BigDecimal(s).toPlainString
            if (plain.contains(".")) plain else plain + ".0"
          }
        }
      }
    case other => other.toString
  }

  private def buildOutput(spark: SparkSession, rows: Seq[(String, Map[String, Any])],
      names: Seq[String]): DataFrame = {
    val schema = StructType(StructField("Metric", StringType, nullable = false) +:
      names.map(n => StructField(n, StringType, nullable = false)))
    val data = rows.map { case (label, values) =>
      Row.fromSeq(label +: names.map(n => formatValue(values.getOrElse(n, "-"))))
    }
    spark.createDataFrame(spark.sparkContext.parallelize(data, 1), schema)
  }
}
