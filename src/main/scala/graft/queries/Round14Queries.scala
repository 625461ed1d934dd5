package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.ext.{Dedup, Incremental, Layout, Similarity}

/** Round-14 queries: the warehouse-operations layer — zone-map pruning
  * audit over four physical layouts incl. Z-order and Hilbert (q218),
  * join-size estimation from coordinated key-hash sketches (q219) and its
  * end-biased MCV upgrade (q223), incremental aggregate maintenance over
  * a CDC delta (q220) and incremental JOIN-view maintenance via the
  * bilinear delta expansion (q222), hard-negative mining over the
  * embedding corpus (q221), per-group A-ES weighted sampling (q224), a
  * numeric ε-band join with histogram range-join selectivity (q225), and
  * KMV distinct sketches with union/intersection estimates (q226).
  */
object Round14Queries {

  private def tbl(spark: SparkSession, sfDir: String, name: String): DataFrame =
    spark.read.parquet(s"$sfDir/$name.parquet")

  // ---- q218 Z-order layout + zone-map pruning audit ---------------------------

  private val ZFiles = 64
  private val ZBits = 12
  private val ZLevels = 1 << ZBits // 4096

  /** Zone-map pruning audit across four physical layouts of `orders`:
    * natural (orderkey) order, date-sorted, Morton/Z-ordered, and
    * Hilbert-ordered on (custkey, orderdate). Rows are assigned to 64
    * equal files per layout ([[Layout.fileAssign]] — the distributed
    * prefix-sum rank, no single-partition window), per-file min/max zone
    * maps are one keyed aggregation, and a fixed 24-predicate workload
    * (4 custkey quarters, 4 date quarters, 16 cust×date cells) is
    * evaluated against the maps: a file is scanned iff its [min,max] box
    * intersects the predicate. The output is the design lesson made
    * measurable: the date-sorted layout prunes date ranges perfectly and
    * custkey ranges not at all, natural order prunes (almost) nothing,
    * and the space-filling curves bound BOTH dimensions in every file —
    * with Hilbert's unit-step locality (no Z seam jumps) tightening the
    * boxes at file boundaries. All arithmetic is exact integers
    * (quantization by integer division, bit interleaving / the xy2d
    * quadrant walk, rank·F div n file ids), so DuckDB replays layouts,
    * maps, and every pruning decision bit-for-bit — the Hilbert state
    * machine as one CTE per level. At 100 TB this audit is how you
    * CHOOSE a layout before rewriting a table: it costs one rank + one
    * aggregation per candidate layout, while the scan savings it
    * predicts apply to every future query.
    */
  def q218ZorderPruning(spark: SparkSession, sfDir: String): DataFrame = {
    val o0 = tbl(spark, sfDir, "orders").select(
      col("o_orderkey").as("k"),
      col("o_custkey").as("c"),
      datediff(col("o_orderdate").cast("date"),
        to_date(lit("1970-01-01"))).cast("long").as("d"))
    val Array(bounds) = o0.agg(
      min("c").as("clo"), max("c").as("chi"),
      min("d").as("dlo"), max("d").as("dhi"),
      count(lit(1)).as("n"), max("k").as("maxK")).collect()
    val (clo, chi, dlo, dhi, n) = (bounds.getLong(0), bounds.getLong(1),
      bounds.getLong(2), bounds.getLong(3), bounds.getLong(4))
    val maxK = bounds.getLong(5)
    // k (o_orderkey) is packed into the low bits of dk/zk/hk, so the pack
    // base must exceed max(k) — and a FIXED base caps the table at that many
    // orders (the sf1 sweep's 1.5M orderkeys overflow a 2^20 constant). Size
    // it from the data instead: the smallest power of two above max(k),
    // identical to the oracle's 1 << LENGTH(bin(maxk)). Headroom: the curve
    // value is < 2^(2*ZBits) = 2^24, so curve*pack+k stays in a signed long
    // while maxK < 2^38 — a 274-billion-order table; beyond that, raise.
    require(maxK > 0 && maxK < (1L << 38) && n > ZFiles,
      s"q218 packing precondition: maxK=$maxK n=$n")
    val pack = 1L << (64 - java.lang.Long.numberOfLeadingZeros(maxK))

    val qc = Layout.quantize(col("c"), lit(clo), lit(chi), ZLevels)
    val qd = Layout.quantize(col("d"), lit(dlo), lit(dhi), ZLevels)
    // materialized once: all four layout ranks re-read these 7 columns, and
    // the Hilbert walk (an interpreted bindOnce chain — HOFs don't codegen)
    // must not re-evaluate per layout × per min-of-2 pass.
    // r13 (guide §2.5): repartition to the session shuffle width BEFORE the
    // curve projections — the single-row-group orders file scans as one
    // partition, so the interpreted 12-level Hilbert walk otherwise runs
    // single-threaded into the checkpoint; one narrow-row exchange buys a
    // parallel encode. Row order is irrelevant: every downstream consumer
    // keys on the (unique) packed curve values.
    // r14 (guide §2.2, verdict item 4): widths are SIZE-GATED from the
    // already-collected row count n instead of pinned at the session width —
    // at sf0.1 (n≈150k) the fixed 32-way encode + four concurrent 32-wide
    // range shuffles made q218 slower at 32 cores than at 8 (scaling 0.75);
    // A/B at 32c (min-of-2 warm): {ew=32,rw=32}=2.52 s, {16,8}=1.74 s,
    // {8,4}=1.87 s. Targets: ~8k rows/task for the interpreted Hilbert
    // encode (heavy per row), ~16k rows/task for the narrow-row rank
    // shuffles; a cluster-scale n saturates sessionParallelism via the min.
    val ew = ExtQueries.boundedParallelism(spark, n, 8192)
    val base = o0.repartition(ew)
      .select(col("k"), col("c"), col("d"),
      col("k").as("nk"),
      (col("d") * pack + col("k")).as("dk"),
      (Layout.zValue(qc, qd, ZBits) * pack + col("k")).as("zk"),
      (Layout.hilbertValue(qc, qd, ZBits) * pack + col("k")).as("hk"))
      .localCheckpoint()

    val rw = ExtQueries.boundedParallelism(spark, n, 16384)
    def zm(key: String, name: String): DataFrame =
      Layout.zoneMap(Layout.fileAssign(base, key, n, ZFiles, "f", rw), "f",
          Seq("c", "d"))
        .withColumn("layout", lit(name))
    // the four layout ranks are independent eager pipelines (fileAssign's
    // range-shuffle → localCheckpoint → per-partition-count collect each
    // submit 2 driver-blocking jobs): submit them CONCURRENTLY so the audit
    // pays the slowest layout, not the sum of four (optimization guide
    // §2.6 — r13: measured 4.7 s → after; the checkpointed `base` all four
    // read is already materialized above, so there is no cache race)
    import scala.concurrent.{Await, Future}
    import scala.concurrent.duration.Duration
    implicit val zmEc: scala.concurrent.ExecutionContext =
      scala.concurrent.ExecutionContext.global
    val zmF = Seq(("nk", "nat"), ("dk", "date"), ("zk", "z"), ("hk", "hilbert"))
      .map { case (k, nm) =>
        if (ExtQueries.sequentialCheckpoints(spark)) // AbOverlap toggle
          Future.successful(zm(k, nm))
        else Future(scala.concurrent.blocking { zm(k, nm) })
      }
    val zms = Await.result(Future.sequence(zmF), Duration.Inf)
      .reduce(_.unionByName(_))

    // the 24-predicate workload, exact integer quarter boundaries
    def q4(lo: Long, hi: Long, i: Long): (Long, Long) = {
      val span = hi - lo + 1
      (lo + i * span / 4, lo + (i + 1) * span / 4 - 1)
    }
    val preds: Seq[(Long, String, Long, Long, Long, Long)] =
      (0L until 4L).map { i =>
        val (a, b) = q4(clo, chi, i); (i, "cust", a, b, dlo, dhi)
      } ++ (0L until 4L).map { j =>
        val (a, b) = q4(dlo, dhi, j); (4L + j, "date", clo, chi, a, b)
      } ++ (for (i <- 0L until 4L; j <- 0L until 4L) yield {
        val (ca, cb) = q4(clo, chi, i); val (da, db) = q4(dlo, dhi, j)
        (8L + i * 4 + j, "both", ca, cb, da, db)
      })
    import spark.implicits._
    val predDf = preds.toDF("pred_id", "kind", "c_lo", "c_hi", "d_lo", "d_hi")

    val scanned = predDf.join(broadcast(zms),
        col("c_min") <= col("c_hi") && col("c_max") >= col("c_lo") &&
          col("d_min") <= col("d_hi") && col("d_max") >= col("d_lo"))
      .groupBy("pred_id").agg(
        sum(when(col("layout") === "nat", 1L).otherwise(0L)).as("files_nat"),
        sum(when(col("layout") === "date", 1L).otherwise(0L)).as("files_date"),
        sum(when(col("layout") === "z", 1L).otherwise(0L)).as("files_z"),
        sum(when(col("layout") === "hilbert", 1L).otherwise(0L)).as("files_hilbert"))
    val matched = o0.join(broadcast(predDf),
        col("c").between(col("c_lo"), col("c_hi")) &&
          col("d").between(col("d_lo"), col("d_hi")))
      .groupBy("pred_id").agg(count(lit(1)).as("rows_match"))

    predDf
      .join(matched, Seq("pred_id"), "left")
      .join(scanned, Seq("pred_id"), "left")
      .select(col("pred_id"), col("kind"), col("c_lo"), col("c_hi"),
        col("d_lo"), col("d_hi"),
        coalesce(col("rows_match"), lit(0L)).as("rows_match"),
        coalesce(col("files_nat"), lit(0L)).as("files_nat"),
        coalesce(col("files_date"), lit(0L)).as("files_date"),
        coalesce(col("files_z"), lit(0L)).as("files_z"),
        coalesce(col("files_hilbert"), lit(0L)).as("files_hilbert"))
      .orderBy("pred_id")
  }

  val q218Sql: String = {
    val z = Layout.zValueSql("qc", "qd", ZBits)
    // one CTE per Hilbert level, MSB first (the SQL twin of the
    // hilbertValue fold; each level rewrites the (hx, hy, hd) state)
    val hilbertChain = (ZBits - 1 to 0 by -1).zipWithIndex.map {
      case (lvl, i) =>
        val (nx, ny, nd) = Layout.hilbertLevelSql(1L << lvl)
        s"""h${i + 1} AS (
           |  SELECT k, c, d, n, qc, qd,
           |    $nx AS hx,
           |    $ny AS hy,
           |    $nd AS hd
           |  FROM h$i)""".stripMargin
    }.mkString(",\n|")
    s"""WITH o AS (
       |  SELECT o_orderkey AS k, o_custkey AS c,
       |    date_diff('day', DATE '1970-01-01', CAST(o_orderdate AS DATE)) AS d
       |  FROM orders),
       |b AS (SELECT MIN(c) AS clo, MAX(c) AS chi, MIN(d) AS dlo, MAX(d) AS dhi,
       |        COUNT(*) AS n FROM o),
       |qz AS (
       |  SELECT o.k, o.c, o.d, b.n,
       |    ((o.c - b.clo) * $ZLevels) // (b.chi - b.clo + 1) AS qc,
       |    ((o.d - b.dlo) * $ZLevels) // (b.dhi - b.dlo + 1) AS qd
       |  FROM o CROSS JOIN b),
       |h0 AS (SELECT k, c, d, n, qc, qd, qc AS hx, qd AS hy,
       |       CAST(0 AS BIGINT) AS hd FROM qz),
       |$hilbertChain,
       |pk AS (SELECT 1::BIGINT << LENGTH(bin(MAX(k))) AS pack FROM o),
       |keys AS (
       |  SELECT k, c, d, n, k AS nk, d * pack + k AS dk,
       |    ($z) * pack + k AS zk, hd * pack + k AS hk
       |  FROM h$ZBits CROSS JOIN pk),
       |fid AS (
       |  SELECT k, c, d,
       |    ((ROW_NUMBER() OVER (ORDER BY nk) - 1) * $ZFiles) // n AS f_nat,
       |    ((ROW_NUMBER() OVER (ORDER BY dk) - 1) * $ZFiles) // n AS f_date,
       |    ((ROW_NUMBER() OVER (ORDER BY zk) - 1) * $ZFiles) // n AS f_z,
       |    ((ROW_NUMBER() OVER (ORDER BY hk) - 1) * $ZFiles) // n AS f_hilbert
       |  FROM keys),
       |zm AS (
       |  SELECT 'nat' AS layout, f_nat AS f, MIN(c) AS cmin, MAX(c) AS cmax,
       |         MIN(d) AS dmin, MAX(d) AS dmax FROM fid GROUP BY 2
       |  UNION ALL
       |  SELECT 'date', f_date, MIN(c), MAX(c), MIN(d), MAX(d) FROM fid GROUP BY 2
       |  UNION ALL
       |  SELECT 'z', f_z, MIN(c), MAX(c), MIN(d), MAX(d) FROM fid GROUP BY 2
       |  UNION ALL
       |  SELECT 'hilbert', f_hilbert, MIN(c), MAX(c), MIN(d), MAX(d) FROM fid GROUP BY 2),
       |g(i) AS (VALUES (0), (1), (2), (3)),
       |preds AS (
       |  SELECT CAST(g.i AS BIGINT) AS pred_id, 'cust' AS kind,
       |    b.clo + (g.i * (b.chi - b.clo + 1)) // 4 AS c_lo,
       |    b.clo + ((g.i + 1) * (b.chi - b.clo + 1)) // 4 - 1 AS c_hi,
       |    b.dlo AS d_lo, b.dhi AS d_hi
       |  FROM g CROSS JOIN b
       |  UNION ALL
       |  SELECT CAST(4 + g.i AS BIGINT), 'date', b.clo, b.chi,
       |    b.dlo + (g.i * (b.dhi - b.dlo + 1)) // 4,
       |    b.dlo + ((g.i + 1) * (b.dhi - b.dlo + 1)) // 4 - 1
       |  FROM g CROSS JOIN b
       |  UNION ALL
       |  SELECT CAST(8 + gi.i * 4 + gj.i AS BIGINT), 'both',
       |    b.clo + (gi.i * (b.chi - b.clo + 1)) // 4,
       |    b.clo + ((gi.i + 1) * (b.chi - b.clo + 1)) // 4 - 1,
       |    b.dlo + (gj.i * (b.dhi - b.dlo + 1)) // 4,
       |    b.dlo + ((gj.i + 1) * (b.dhi - b.dlo + 1)) // 4 - 1
       |  FROM g gi CROSS JOIN g gj CROSS JOIN b),
       |sc AS (
       |  SELECT p.pred_id,
       |    CAST(SUM(CASE WHEN z.layout = 'nat' THEN 1 ELSE 0 END) AS BIGINT) AS files_nat,
       |    CAST(SUM(CASE WHEN z.layout = 'date' THEN 1 ELSE 0 END) AS BIGINT) AS files_date,
       |    CAST(SUM(CASE WHEN z.layout = 'z' THEN 1 ELSE 0 END) AS BIGINT) AS files_z,
       |    CAST(SUM(CASE WHEN z.layout = 'hilbert' THEN 1 ELSE 0 END) AS BIGINT) AS files_hilbert
       |  FROM preds p JOIN zm z
       |    ON z.cmin <= p.c_hi AND z.cmax >= p.c_lo
       |   AND z.dmin <= p.d_hi AND z.dmax >= p.d_lo
       |  GROUP BY 1),
       |rm AS (
       |  SELECT p.pred_id, CAST(COUNT(o.k) AS BIGINT) AS rows_match
       |  FROM preds p LEFT JOIN o
       |    ON o.c BETWEEN p.c_lo AND p.c_hi AND o.d BETWEEN p.d_lo AND p.d_hi
       |  GROUP BY 1)
       |SELECT p.pred_id, p.kind, p.c_lo, p.c_hi, p.d_lo, p.d_hi,
       |  COALESCE(rm.rows_match, 0) AS rows_match,
       |  COALESCE(sc.files_nat, 0) AS files_nat,
       |  COALESCE(sc.files_date, 0) AS files_date,
       |  COALESCE(sc.files_z, 0) AS files_z,
       |  COALESCE(sc.files_hilbert, 0) AS files_hilbert
       |FROM preds p LEFT JOIN rm ON p.pred_id = rm.pred_id
       |LEFT JOIN sc ON p.pred_id = sc.pred_id
       |ORDER BY p.pred_id""".stripMargin
  }

  // ---- q219 join-size estimation from coordinated key sketches ----------------

  private val JseMod = 16

  /** Coordinated key-hash bucket (same hash both sides — the coordination
    * is what makes per-key frequency PRODUCTS estimable from a sample of
    * keys).
    */
  private def jseBucket(key: Column): Column =
    pmod(Dedup.portableTokenHash(concat(lit("jse:"), key.cast("string"))),
      lit(JseMod))

  /** Join-size estimation without running the join: |A ⋈ B on k| =
    * Σ_k f_A(k)·f_B(k), estimated from a COORDINATED sample — both sides
    * keep only keys whose shared md5-hash falls in bucket 0 (a 1/16 key
    * sample), and the estimate is 16·Σ_sampled f_A·f_B. Because the
    * same keys survive on both sides, the product Σ is sampled at the
    * KEY level (an unbiased Horvitz-Thompson estimate of the frequency
    * inner product); independent per-side row samples would almost never
    * retain matching pairs. Audited on three join shapes: the orderkey
    * FK join (every lineitem matches exactly one order), the partkey
    * self-join (Σ f², ~30× fan-out), and the user_id event self-join
    * (hot-key regime). At 100 TB the hash predicate pushes to the scan
    * (it is a pure function of the key column), so the estimator reads
    * 1/16 of each side and shuffles only the sampled keys' counts — this
    * is how a planner sizes a shuffle join before committing to it.
    * Deterministic md5 arithmetic; DuckDB replays exact counts, sampled
    * counts, and the estimate bit-for-bit.
    */
  def q219JoinSizeEst(spark: SparkSession, sfDir: String): DataFrame = {
    val li = tbl(spark, sfDir, "lineitem")
    val or = tbl(spark, sfDir, "orders")
    val ev = ExtQueries.events(spark, sfDir)

    def counts(df: DataFrame, key: String): DataFrame =
      df.groupBy(col(key).as("k")).agg(count(lit(1)).as("f"))
    // r13 (optimization guide §2.3): the sampled estimator's term is the
    // SAME per-key count frame restricted to bucket-0 keys — the hash is a
    // pure key function, so filtering the aggregated frame is identical to
    // aggregating the filtered scan. Computing exact and sampled terms as
    // two conditional sums of ONE aggregation (after ONE join for the
    // two-sided pair) halves every scan and join in the panel: the old
    // shape scanned each side twice (full + sampled counts) and ran two
    // joins per two-sided pair. A SELF-join's size is Σ f² — one
    // aggregation over the count frame, no join at all.
    def pair(name: String, a: DataFrame, ka: String,
        b: Option[(DataFrame, String)]): DataFrame = {
      val s0 = jseBucket(col("k")) === 0
      val both = b match {
        case None =>
          counts(a, ka).agg(
            coalesce(sum(col("f") * col("f")), lit(0L)).as("exact_rows"),
            (coalesce(sum(when(s0, col("f") * col("f"))), lit(0L)) * JseMod)
              .as("est_rows"))
        case Some((bb, kb)) =>
          counts(a, ka)
            .join(counts(bb, kb).select(col("k"), col("f").as("g")), "k")
            .agg(
              coalesce(sum(col("f") * col("g")), lit(0L)).as("exact_rows"),
              (coalesce(sum(when(s0, col("f") * col("g"))), lit(0L)) * JseMod)
                .as("est_rows"))
      }
      both.select(
        lit(name).as("pair"), col("exact_rows"), col("est_rows"),
        round(abs(col("est_rows") - col("exact_rows")) /
          col("exact_rows").cast("double"), 6).as("rel_err"))
    }

    pair("li_orders_orderkey", li, "l_orderkey", Some((or, "o_orderkey")))
      .unionByName(pair("li_li_partkey", li, "l_partkey", None))
      .unionByName(pair("ev_ev_userid", ev, "user_id", None))
      .orderBy("pair")
  }

  val q219Sql: String = {
    def h(key: String) =
      s"CAST('0x' || substr(md5('jse:' || CAST($key AS VARCHAR)), 1, 15) AS BIGINT) % $JseMod"
    def cnt(table: String, key: String, sampled: Boolean) = {
      val w = if (sampled) s"WHERE ${h(key)} = 0" else ""
      s"SELECT $key AS k, COUNT(*) AS f FROM $table $w GROUP BY 1"
    }
    def pair(name: String, ta: String, ka: String, tb: String, kb: String) =
      s"""SELECT '$name' AS pair,
         |  CAST((SELECT COALESCE(SUM(a.f * b.f), 0)
         |        FROM (${cnt(ta, ka, false)}) a
         |        JOIN (${cnt(tb, kb, false)}) b ON a.k = b.k) AS BIGINT) AS exact_rows,
         |  CAST($JseMod * (SELECT COALESCE(SUM(a.f * b.f), 0)
         |        FROM (${cnt(ta, ka, true)}) a
         |        JOIN (${cnt(tb, kb, true)}) b ON a.k = b.k) AS BIGINT) AS est_rows""".stripMargin
    s"""WITH p AS (
       |${pair("li_orders_orderkey", "lineitem", "l_orderkey", "orders", "o_orderkey")}
       |UNION ALL
       |${pair("li_li_partkey", "lineitem", "l_partkey", "lineitem", "l_partkey")}
       |UNION ALL
       |${pair("ev_ev_userid", "events", "user_id", "events", "user_id")})
       |SELECT pair, exact_rows, est_rows,
       |  ROUND(ABS(est_rows - exact_rows) / CAST(exact_rows AS DOUBLE), 6) AS rel_err
       |FROM p ORDER BY pair""".stripMargin
  }

  // ---- q220 incremental aggregate maintenance ---------------------------------

  /** Incremental aggregate maintenance audit: events are split at
    * `max(ts) − 7 days` into a BASE (the history a store would already
    * hold aggregated) and a CDC DELTA (the last week of inserts); the
    * maintained answer is `merge(state(base), state(delta))`
    * ([[Incremental]] — count/sum/min/max monoid, sums as exact
    * micro-units), asserted EQUAL per event type against the full
    * recompute. At 100 TB the full path scans all history every refresh
    * while the maintained path scans 7 days and merges a key-domain-
    * bounded state frame — same answer, structurally less IO; the
    * streaming twin is update-mode stateful aggregation. DuckDB replays
    * both paths and the equality.
    */
  def q220IncrementalAgg(spark: SparkSession, sfDir: String): DataFrame = {
    val ev = ExtQueries.events(spark, sfDir)
    val cut = ev.agg(
      (max(col("ts")) - expr("INTERVAL 7 DAYS")).as("cut"))
    val withCut = ev.crossJoin(broadcast(cut))
    val base = withCut.filter(col("ts") < col("cut"))
    val delta = withCut.filter(col("ts") >= col("cut"))
    val keys = Seq("event_type")
    val full = Incremental.state(ev, keys, "value").select(
      col("event_type"), col("n").as("full_n"),
      col("sum_micros").as("full_sum"), col("min_micros").as("full_min"),
      col("max_micros").as("full_max"))
    val incr = Incremental.merge(
      Incremental.state(base, keys, "value"),
      Incremental.state(delta, keys, "value"), keys).select(
      col("event_type"), col("n").as("incr_n"),
      col("sum_micros").as("incr_sum"), col("min_micros").as("incr_min"),
      col("max_micros").as("incr_max"))
    full.join(incr, "event_type")
      .withColumn("all_match",
        col("full_n") === col("incr_n") && col("full_sum") === col("incr_sum") &&
          col("full_min") === col("incr_min") && col("full_max") === col("incr_max"))
      .orderBy("event_type")
  }

  val q220Sql: String =
    """WITH c AS (SELECT MAX(ts) - INTERVAL 7 DAY AS cut FROM events),
      |m AS (SELECT event_type, ts, CAST(ROUND(value * 1e6, 0) AS BIGINT) AS v
      |      FROM events),
      |full_s AS (
      |  SELECT event_type, COUNT(*) AS full_n, SUM(v) AS full_sum,
      |         MIN(v) AS full_min, MAX(v) AS full_max
      |  FROM m GROUP BY 1),
      |base_s AS (
      |  SELECT event_type, COUNT(*) AS n, SUM(v) AS s, MIN(v) AS mn, MAX(v) AS mx
      |  FROM m CROSS JOIN c WHERE ts < cut GROUP BY 1),
      |delta_s AS (
      |  SELECT event_type, COUNT(*) AS n, SUM(v) AS s, MIN(v) AS mn, MAX(v) AS mx
      |  FROM m CROSS JOIN c WHERE ts >= cut GROUP BY 1),
      |incr AS (
      |  SELECT COALESCE(b.event_type, d.event_type) AS event_type,
      |    COALESCE(b.n, 0) + COALESCE(d.n, 0) AS incr_n,
      |    COALESCE(b.s, 0) + COALESCE(d.s, 0) AS incr_sum,
      |    LEAST(COALESCE(b.mn, d.mn), COALESCE(d.mn, b.mn)) AS incr_min,
      |    GREATEST(COALESCE(b.mx, d.mx), COALESCE(d.mx, b.mx)) AS incr_max
      |  FROM base_s b FULL OUTER JOIN delta_s d ON b.event_type = d.event_type)
      |SELECT f.event_type,
      |  CAST(f.full_n AS BIGINT) AS full_n, CAST(f.full_sum AS BIGINT) AS full_sum,
      |  f.full_min, f.full_max,
      |  CAST(i.incr_n AS BIGINT) AS incr_n, CAST(i.incr_sum AS BIGINT) AS incr_sum,
      |  i.incr_min, i.incr_max,
      |  (f.full_n = i.incr_n AND f.full_sum = i.incr_sum
      |   AND f.full_min = i.incr_min AND f.full_max = i.incr_max) AS all_match
      |FROM full_s f JOIN incr i ON f.event_type = i.event_type
      |ORDER BY f.event_type""".stripMargin

  // ---- q221 hard-negative mining -----------------------------------------------

  private val HnAnchors = 16
  private val HnK = 5

  /** Hard-negative mining for contrastive training: for each of 16 anchor
    * embeddings, the 5 most-similar vectors with a DIFFERENT label —
    * exactly the negatives that teach a model the most (high similarity,
    * wrong class; random negatives are trivially separable). Shape: the
    * bounded anchor set broadcasts, the corpus is scanned ONCE for all
    * anchors (cosine via the codegen'd VectorDot/VectorNorm2, rounded to
    * 6 dp BEFORE ranking so both engines rank identical keys), and the
    * per-anchor top-k aggregates through the bounded TopKAgg — the
    * exchange carries ≤ k·anchors·partitions entries, never the n·anchors
    * rows a window would ship. At corpus scale the same shape runs over a
    * q216-style ANN shortlist instead of the exact scan; here the exact
    * scan IS the gate. The oracle is the textbook window formulation.
    */
  def q221HardNegatives(spark: SparkSession, sfDir: String): DataFrame = {
    val e = ExtQueries.emb(spark, sfDir).select(
      col("vec_id"), col("label"),
      col("embedding").cast("array<double>").as("v"))
    val anchors = e.filter(col("vec_id") < HnAnchors).select(
      col("vec_id").as("anchor_id"), col("label").as("anchor_label"),
      col("v").as("av"))
    val cos = round(
      Similarity.dot(col("v"), col("av")) /
        (sqrt(Similarity.norm2(col("v"))) * sqrt(Similarity.norm2(col("av")))),
      6)
    val mined = e.crossJoin(broadcast(anchors))
      .filter(col("label") =!= col("anchor_label"))
      .select(col("anchor_id"), col("anchor_label"),
        col("vec_id"), cos.as("cos"))
      .groupBy("anchor_id", "anchor_label")
      .agg(graft.functions.TopKAgg.topK(col("cos"), col("vec_id"), HnK).as("tk"))
      .select(col("anchor_id"), col("anchor_label"), posexplode(col("tk")))
      .select(col("anchor_id"), col("anchor_label"),
        (col("pos") + 1).cast("long").as("rank"),
        col("col.id").as("neighbor_id"), col("col.score").as("cos"))
    mined.join(e.select(col("vec_id").as("neighbor_id"),
        col("label").as("neighbor_label")), "neighbor_id")
      .select(col("anchor_id"), col("anchor_label"), col("rank"),
        col("neighbor_id"), col("neighbor_label"), col("cos"))
      .orderBy("anchor_id", "rank")
  }

  val q221Sql: String =
    s"""WITH e AS (
       |  SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS v,
       |    SQRT(list_sum(list_transform(CAST(embedding AS DOUBLE[]), x -> x * x))) AS nrm
       |  FROM embeddings),
       |a AS (SELECT vec_id AS anchor_id, label AS anchor_label, v AS av, nrm AS anrm
       |      FROM e WHERE vec_id < $HnAnchors),
       |p AS (
       |  SELECT a.anchor_id, a.anchor_label, e.vec_id AS neighbor_id,
       |    e.label AS neighbor_label,
       |    ROUND(list_dot_product(e.v, a.av) / (e.nrm * a.anrm), 6) AS cos
       |  FROM e JOIN a ON e.label <> a.anchor_label),
       |r AS (
       |  SELECT *, ROW_NUMBER() OVER (
       |    PARTITION BY anchor_id ORDER BY cos DESC, neighbor_id) AS rank
       |  FROM p)
       |SELECT anchor_id, anchor_label, CAST(rank AS BIGINT) AS rank,
       |  neighbor_id, neighbor_label, cos
       |FROM r WHERE rank <= $HnK ORDER BY anchor_id, rank""".stripMargin

  // ---- q222 incremental JOIN-result maintenance --------------------------------

  /** Incremental maintenance of a JOIN view: the per-priority (count,
    * revenue) panel over orders ⋈ lineitem, where BOTH sides receive CDC
    * inserts (orders split at `max(o_orderdate) − 90 days`, lineitems at
    * the same calendar cutoff on l_shipdate — realistically, an order row
    * lands before its shipments). The delta algebra for a join view is
    * the standard bilinear expansion (DBToaster-style delta queries):
    * (O∪ΔO) ⋈ (L∪ΔL) = O⋈L + O⋈ΔL + ΔO⋈L + ΔO⋈ΔL — the maintained
    * answer merges the STORED base aggregate with three delta terms, each
    * of which joins a delta (small) against one full side, never
    * re-joining fact against fact. Asserted EQUAL per priority against
    * the full recompute; revenue in exact cents so the equality is exact.
    * At 100 TB: the full path re-joins all history every refresh; the
    * maintained path's work is delta-sized (the full-side probes are
    * keyed lookups a cluster serves from a bucketed/indexed layout).
    */
  def q222IncrementalJoin(spark: SparkSession, sfDir: String): DataFrame = {
    val o = tbl(spark, sfDir, "orders")
    val l = tbl(spark, sfDir, "lineitem")
    val cut = o.agg((max(col("o_orderdate")) - expr("INTERVAL 90 DAYS")).as("cut"))
    val oc = o.crossJoin(broadcast(cut))
    val lc = l.crossJoin(broadcast(cut))
    val (oB, oD) = (oc.filter(col("o_orderdate") < col("cut")),
      oc.filter(col("o_orderdate") >= col("cut")))
    val (lB, lD) = (lc.filter(col("l_shipdate") < col("cut")),
      lc.filter(col("l_shipdate") >= col("cut")))
    val cents = graft.core.Exprs.roundHalfUpLong(col("l_extendedprice") * (lit(1.0) - col("l_discount")) * 100)
    // shuffled-hash hints: all five audit joins shuffle on the order key
    // regardless; SHJ (orders side builds) skips sort-merge's sort of the
    // lineitem side in each term — the audit's dominant cost at sf10
    def agg(os: DataFrame, ls: DataFrame): DataFrame =
      os.select(col("o_orderkey"), col("o_orderpriority")).hint("shuffle_hash")
        .join(ls.select(col("l_orderkey"), cents.as("cents")),
          col("o_orderkey") === col("l_orderkey"))
        .groupBy("o_orderpriority")
        .agg(count(lit(1)).as("n"), sum(col("cents")).as("rev"))
    val full = agg(oc, lc).select(col("o_orderpriority"),
      col("n").as("full_n"), col("rev").as("full_rev"))
    val incr = agg(oB, lB).unionByName(agg(oB, lD))
      .unionByName(agg(oD, lB)).unionByName(agg(oD, lD))
      .groupBy("o_orderpriority")
      .agg(sum(col("n")).as("incr_n"), sum(col("rev")).as("incr_rev"))
    full.join(incr, "o_orderpriority")
      .withColumn("all_match",
        col("full_n") === col("incr_n") && col("full_rev") === col("incr_rev"))
      .orderBy("o_orderpriority")
  }

  val q222Sql: String = {
    def agg(ow: String, lw: String) =
      s"""SELECT o.o_orderpriority, COUNT(*) AS n,
         |    SUM(CAST(ROUND(l.l_extendedprice * (1.0 - l.l_discount) * 100) AS BIGINT)) AS rev
         |  FROM orders o CROSS JOIN c
         |  JOIN lineitem l ON o.o_orderkey = l.l_orderkey
         |  WHERE o.o_orderdate $ow c.cut AND l.l_shipdate $lw c.cut
         |  GROUP BY 1""".stripMargin
    s"""WITH c AS (SELECT MAX(o_orderdate) - INTERVAL 90 DAY AS cut FROM orders),
       |full_v AS (
       |  SELECT o.o_orderpriority, COUNT(*) AS full_n,
       |    SUM(CAST(ROUND(l.l_extendedprice * (1.0 - l.l_discount) * 100) AS BIGINT)) AS full_rev
       |  FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
       |  GROUP BY 1),
       |parts AS (
       |${agg("<", "<")}
       |UNION ALL
       |${agg("<", ">=")}
       |UNION ALL
       |${agg(">=", "<")}
       |UNION ALL
       |${agg(">=", ">=")}),
       |incr AS (
       |  SELECT o_orderpriority, SUM(n) AS incr_n, SUM(rev) AS incr_rev
       |  FROM parts GROUP BY 1)
       |SELECT f.o_orderpriority,
       |  CAST(f.full_n AS BIGINT) AS full_n, CAST(f.full_rev AS BIGINT) AS full_rev,
       |  CAST(i.incr_n AS BIGINT) AS incr_n, CAST(i.incr_rev AS BIGINT) AS incr_rev,
       |  (f.full_n = i.incr_n AND f.full_rev = i.incr_rev) AS all_match
       |FROM full_v f JOIN incr i ON f.o_orderpriority = i.o_orderpriority
       |ORDER BY f.o_orderpriority""".stripMargin
  }

  // ---- q223 end-biased join-size estimation -------------------------------------

  private val EbHeavy = 20

  /** End-biased join-size estimation (Estan–Naughton): split the key
    * domain into the MCV head — the exact top-20 by frequency, the
    * most-common-values list every warehouse keeps as table statistics,
    * computed as a bounded TakeOrderedAndProject, never a window — and a
    * light tail estimated from the 1/16 coordinated sample (head keys
    * excluded from both the sampled term and its scale-up). The head's
    * contribution to Σ f² is EXACT, so the estimator's error comes ONLY
    * from the tail. The three fixture domains show the three regimes
    * honestly: `event_type` (5 keys — the MCV list covers the whole
    * domain, the end-biased estimate is EXACT, while the plain 1/16 key
    * sample is useless on a domain smaller than 16: this is WHY planners
    * keep MCV statistics for low-cardinality columns), `user_id` (~1.5k
    * near-uniform keys — no head to capture, both estimators carry the
    * same tail variance), and `l_partkey` (~20k uniform keys — both
    * small). Deterministic md5 arithmetic + (f DESC, key ASC)
    * tie-breaks, so DuckDB replays both estimators and both error
    * columns bit-for-bit.
    */
  def q223EndBiasedEst(spark: SparkSession, sfDir: String): DataFrame = {
    val li = tbl(spark, sfDir, "lineitem")
    val ev = ExtQueries.events(spark, sfDir)

    def panel(name: String, df: DataFrame, key: String): DataFrame = {
      // r13 (optimization guide §2.3): exact + plain-sample terms share ONE
      // aggregation — the sample filter is a pure key function, so a
      // conditional sum over the full key-count frame is identical to
      // aggregating the filtered scan; one base-table scan per panel is
      // gone. (A localCheckpoint of the count frame was A/B-measured and
      // REJECTED: its three eager build jobs serialize at ~0.15 s each and
      // cost more than the intra-job rescans they save — 1.46 s vs 1.00 s
      // baseline at sf0.1; the remaining consumers stay lazy in one job.)
      val c = df.groupBy(col(key).as("k")).agg(count(lit(1)).as("f"))
      val base = c.agg(
        sum(col("f") * col("f")).as("exact_rows"),
        (coalesce(sum(when(jseBucket(col("k")) === 0, col("f") * col("f"))),
          lit(0L)) * JseMod).as("est_plain"))
      // MCV list: exact top-EbHeavy by (f DESC, k ASC) — TakeOrderedAndProject
      val heavy = c.orderBy(col("f").desc, col("k")).limit(EbHeavy)
      val heavyTerm = heavy.agg(
        coalesce(sum(col("f") * col("f")), lit(0L)).as("heavy_sq"))
      val lightTerm = c.join(heavy.select("k"), Seq("k"), "left_anti")
        .filter(jseBucket(col("k")) === 0)
        .agg((coalesce(sum(col("f") * col("f")), lit(0L)) * JseMod).as("light_est"))
      base.crossJoin(heavyTerm).crossJoin(lightTerm)
        .select(
          lit(name).as("pair"), col("exact_rows"), col("est_plain"),
          (col("heavy_sq") + col("light_est")).as("est_endbiased"),
          round(abs(col("est_plain") - col("exact_rows")) /
            col("exact_rows").cast("double"), 6).as("rel_err_plain"),
          round(abs(col("heavy_sq") + col("light_est") - col("exact_rows")) /
            col("exact_rows").cast("double"), 6).as("rel_err_endbiased"))
    }
    panel("ev_ev_eventtype", ev, "event_type")
      .unionByName(panel("ev_ev_userid", ev, "user_id"))
      .unionByName(panel("li_li_partkey", li, "l_partkey"))
      .orderBy("pair")
  }

  val q223Sql: String = {
    def h(k: String) =
      s"CAST('0x' || substr(md5('jse:' || CAST($k AS VARCHAR)), 1, 15) AS BIGINT) % $JseMod"
    def panel(name: String) =
      s"""SELECT '$name' AS pair,
         |  (SELECT SUM(f * f) FROM cnt_$name) AS exact_rows,
         |  $JseMod * (SELECT COALESCE(SUM(f * f), 0) FROM cnt_$name
         |             WHERE ${h("k")} = 0) AS est_plain,
         |  (SELECT COALESCE(SUM(f * f), 0) FROM hv_$name)
         |  + $JseMod * (SELECT COALESCE(SUM(f * f), 0) FROM cnt_$name c
         |               WHERE ${h("c.k")} = 0
         |                 AND NOT EXISTS (SELECT 1 FROM hv_$name v WHERE v.k = c.k))
         |    AS est_endbiased""".stripMargin
    s"""WITH cnt_ev_ev_eventtype AS (
       |  SELECT event_type AS k, COUNT(*) AS f FROM events GROUP BY 1),
       |hv_ev_ev_eventtype AS (
       |  SELECT k, f FROM cnt_ev_ev_eventtype ORDER BY f DESC, k LIMIT $EbHeavy),
       |cnt_ev_ev_userid AS (
       |  SELECT user_id AS k, COUNT(*) AS f FROM events GROUP BY 1),
       |hv_ev_ev_userid AS (
       |  SELECT k, f FROM cnt_ev_ev_userid ORDER BY f DESC, k LIMIT $EbHeavy),
       |cnt_li_li_partkey AS (
       |  SELECT l_partkey AS k, COUNT(*) AS f FROM lineitem GROUP BY 1),
       |hv_li_li_partkey AS (
       |  SELECT k, f FROM cnt_li_li_partkey ORDER BY f DESC, k LIMIT $EbHeavy),
       |p AS (
       |${panel("ev_ev_eventtype")}
       |UNION ALL
       |${panel("ev_ev_userid")}
       |UNION ALL
       |${panel("li_li_partkey")})
       |SELECT pair, CAST(exact_rows AS BIGINT) AS exact_rows,
       |  CAST(est_plain AS BIGINT) AS est_plain,
       |  CAST(est_endbiased AS BIGINT) AS est_endbiased,
       |  ROUND(ABS(est_plain - exact_rows) / CAST(exact_rows AS DOUBLE), 6)
       |    AS rel_err_plain,
       |  ROUND(ABS(est_endbiased - exact_rows) / CAST(exact_rows AS DOUBLE), 6)
       |    AS rel_err_endbiased
       |FROM p ORDER BY pair""".stripMargin
  }

  // ---- q224 per-group weighted sampling ------------------------------------------

  private val GsK = 5

  /** Per-(source, lang) Efraimidis–Spirakis sample — 5 docs per cell,
    * weight = n_chars — through [[graft.ext.Splits.weightedSamplePerGroup]]:
    * the same md5-exponential race as the global q215, but the per-group
    * top-k aggregates through the bounded TopKAgg, so the exchange
    * carries ≤ k·groups·partitions entries where a per-group window
    * would ship every row to its group's reducer. This is how a mixture
    * pipeline draws its per-source/per-language quota deterministically:
    * no RNG state, any partitioning, any engine. The oracle is the
    * textbook per-group window over the identical race keys.
    */
  def q224GroupSample(spark: SparkSession, sfDir: String): DataFrame = {
    val d = ExtQueries.docs(spark, sfDir)
    val sampled = graft.ext.Splits.weightedSamplePerGroup(
      d, Seq("source", "lang"), "doc_id", "n_chars", GsK)
    sampled.join(d.select(col("doc_id"), col("n_chars")), "doc_id")
      .select(col("source"), col("lang"), col("rank"), col("doc_id"),
        col("n_chars"), col("__key").as("race_key"))
      .orderBy("source", "lang", "rank")
  }

  val q224Sql: String =
    s"""WITH s AS (
       |  SELECT doc_id, source, lang, n_chars,
       |    ROUND(-LN((CAST(CAST('0x' || substr(md5('wsample:' || CAST(doc_id AS VARCHAR)), 1, 15) AS BIGINT) AS DOUBLE) + 0.5)
       |              / 1152921504606846976.0) / n_chars, 6) AS race_key
       |  FROM documents),
       |r AS (
       |  SELECT *, ROW_NUMBER() OVER (
       |    PARTITION BY source, lang ORDER BY race_key, doc_id) AS rank
       |  FROM s)
       |SELECT source, lang, CAST(rank AS BIGINT) AS rank, doc_id, n_chars, race_key
       |FROM r WHERE rank <= $GsK ORDER BY source, lang, rank""".stripMargin

  // ---- q225 numeric band join + histogram selectivity --------------------------

  /** Numeric ε-band self-join with a histogram selectivity estimate —
    * the RANGE-join counterpart of q219/q223's equi-join sizing. Exact
    * side: per event type, the count of (id1 < id2) pairs with
    * |v1 − v2| ≤ ε (ε = value-range/1000) via BUCKET CO-LOCATION — each
    * probe row explodes its 3 candidate ε-buckets and joins keyed on
    * (type, bucket), so candidates are bounded by ε-locality and the
    * plan never goes n² (the same banding idea the LSH/simhash joins use,
    * applied to a numeric axis; this is how you size or execute an
    * interval join at 100 TB). Estimate side: a 100-bucket equi-width
    * histogram per type and the textbook uniform-within-bucket formulas —
    * P(|u1−u2| ≤ t) = 2t − t² within a bucket, t²/2 across adjacent
    * buckets (t = ε/width) — with per-bucket expected counts quantized to
    * micro-units so the sums are exact integers in both engines. The
    * fixture's exponential-ish value distribution gives the estimator
    * honest skew error (the histogram assumes within-bucket uniformity);
    * every number is oracle-replayed bit-for-bit.
    */
  def q225BandJoin(spark: SparkSession, sfDir: String): DataFrame = {
    val ev = ExtQueries.events(spark, sfDir).select(
      col("event_type").as("t"), col("event_id").as("id"), col("value").as("v"))
    val bounds = ev.groupBy("t").agg(
      min("v").as("vmin"), max("v").as("vmax"), count(lit(1)).as("n"))
    val w = bounds
      .withColumn("eps", (col("vmax") - col("vmin")) / 1000.0)
      .withColumn("wdt", (col("vmax") - col("vmin")) / 100.0)
      .withColumn("tt",
        ((col("vmax") - col("vmin")) / 1000.0) / ((col("vmax") - col("vmin")) / 100.0))
    val eb = ev.join(broadcast(w), "t")
      .withColumn("bk", floor((col("v") - col("vmin")) / col("eps")).cast("long"))

    // r13 (optimization guide §2.3): ONE-SIDED candidate generation — the
    // probe explodes {bk, bk+1} instead of {bk−1, bk, bk+1}. A same-bucket
    // unordered pair still appears twice (kept once by id < id2); a
    // cross-bucket pair appears exactly once, as (lower-bucket probe,
    // upper-bucket build), with NO id-order condition — the same unordered
    // pair set the symmetric ±1 explode counted, at ~2/3 the candidate
    // volume (measured 28M → 19M candidate rows at sf0.1) and 2n instead
    // of 3n exploded probe rows through the exchange.
    // r14 (guide §3, round-13 verdict item 1): the exact band join is a
    // SHUFFLE-HASH join on the (t, pb) equi-keys. The r13 shape pinned the
    // build side with an unconditional broadcast(eb) — right at fixture
    // scale (it stopped the planner broadcasting the exploded probe and
    // serializing the 19M-row expansion onto one core), but a hint bypasses
    // autoBroadcastJoinThreshold and eb is the FULL events-scaled frame: at
    // 100 TB that broadcast OOMs the driver. Both sides here are
    // events-scaled, so neither may be broadcast; the SHUFFLE_HASH hint
    // shuffles both by (t, pb) — ε-bucket keys, so the 19M-candidate
    // expansion and band filter run at the shuffle width (the explode
    // itself is a cheap 2× row fan-out on the narrow pre-join rows), and
    // the r13 probe-side repartition becomes a redundant exchange and is
    // dropped. Hash (not sort-merge): the per-(t,pb) build groups are
    // ε-locality-bounded, and AQE skew-join can still split an oversized
    // bucket at runtime.
    val probe = eb
      .select(col("t"), col("id"), col("v"), col("eps"),
        col("bk"), explode(array(col("bk"), col("bk") + 1)).as("pb"))
    val build = eb.select(col("t"), col("id").as("id2"),
      col("v").as("v2"), col("bk").as("pb")).hint("shuffle_hash")
    val exact = probe.join(build, Seq("t", "pb"))
      .filter(
        when(col("pb") === col("bk"), col("id") < col("id2")).otherwise(lit(true))
          && abs(col("v") - col("v2")) <= col("eps"))
      .groupBy("t").agg(count(lit(1)).as("exact_pairs"))

    // histogram estimate: the adjacent-bucket product term comes from a
    // LAG window over the (t, hb)-keyed counts instead of a second hist
    // aggregation + self-join (the r13 plan cut: 2 hist builds + 1 join →
    // 1 build + 1 keyed window), and both terms reduce in ONE aggregation.
    // Per-row ROUND(...·1e6) before the integer sums is unchanged, so the
    // micro-unit totals stay bit-identical to the oracle's two-CTE form.
    val hist = eb.select(col("t"),
        least(floor((col("v") - col("vmin")) / col("wdt")).cast("long"), lit(99L))
          .as("hb"))
      .groupBy("t", "hb").agg(count(lit(1)).as("c"))
    val wHist = Window.partitionBy("t").orderBy("hb")
    val est = hist.join(broadcast(w.select("t", "tt")), "t")
      .withColumn("prev_hb", lag(col("hb"), 1).over(wHist))
      .withColumn("prev_c", lag(col("c"), 1).over(wHist))
      .groupBy("t").agg(
        sum(graft.core.Exprs.roundHalfUpLong(
          (col("c") * (col("c") - lit(1L))).cast("double") * lit(0.5) *
            (lit(2.0) * col("tt") - col("tt") * col("tt")) * lit(1e6))).as("m_same"),
        sum(when(col("prev_hb") === col("hb") - 1, graft.core.Exprs.roundHalfUpLong(
          (col("prev_c") * col("c")).cast("double") *
            (col("tt") * col("tt") * lit(0.5)) * lit(1e6)))).as("m_adj"))

    w.select(col("t"), col("n"))
      .join(exact, "t")
      .join(est, Seq("t"), "left")
      .withColumn("micro",
        coalesce(col("m_same"), lit(0L)) + coalesce(col("m_adj"), lit(0L)))
      .select(col("t").as("event_type"), col("n"), col("exact_pairs"),
        round(col("micro") / 1e6, 3).as("est_pairs"),
        round(abs(col("micro") / 1e6 - col("exact_pairs").cast("double")) /
          col("exact_pairs").cast("double"), 6).as("rel_err"))
      .orderBy("event_type")
  }

  val q225Sql: String =
    """WITH e AS (SELECT event_type AS t, event_id AS id, value AS v FROM events),
      |b AS (SELECT t, MIN(v) AS vmin, MAX(v) AS vmax, COUNT(*) AS n FROM e GROUP BY 1),
      |w AS (SELECT t, vmin, vmax, n, (vmax - vmin) / 1000.0 AS eps,
      |        (vmax - vmin) / 100.0 AS wdt,
      |        ((vmax - vmin) / 1000.0) / ((vmax - vmin) / 100.0) AS tt
      |      FROM b),
      |eb AS (SELECT e.t, e.id, e.v, w.eps, w.vmin, w.wdt,
      |         CAST(FLOOR((e.v - w.vmin) / w.eps) AS BIGINT) AS bk
      |       FROM e JOIN w USING (t)),
      |ex AS (
      |  SELECT a.t, CAST(COUNT(*) AS BIGINT) AS exact_pairs
      |  FROM eb a JOIN eb b2 ON a.t = b2.t
      |    AND b2.bk BETWEEN a.bk - 1 AND a.bk + 1
      |    AND a.id < b2.id AND ABS(a.v - b2.v) <= a.eps
      |  GROUP BY 1),
      |h AS (SELECT t, LEAST(CAST(FLOOR((v - vmin) / wdt) AS BIGINT), 99) AS hb,
      |        COUNT(*) AS c
      |      FROM eb GROUP BY 1, 2),
      |sm AS (
      |  SELECT h.t, SUM(CAST(ROUND(
      |    (h.c * (h.c - 1)) * 0.5 * (2.0 * w.tt - w.tt * w.tt) * 1e6) AS BIGINT)) AS m_same
      |  FROM h JOIN w USING (t) GROUP BY 1),
      |ad AS (
      |  SELECT h1.t, SUM(CAST(ROUND(
      |    (h1.c * h2.c) * (w.tt * w.tt * 0.5) * 1e6) AS BIGINT)) AS m_adj
      |  FROM h h1 JOIN h h2 ON h1.t = h2.t AND h2.hb = h1.hb + 1
      |  JOIN w ON w.t = h1.t GROUP BY 1)
      |SELECT w.t AS event_type, CAST(w.n AS BIGINT) AS n, ex.exact_pairs,
      |  ROUND((COALESCE(sm.m_same, 0) + COALESCE(ad.m_adj, 0)) / 1e6, 3) AS est_pairs,
      |  ROUND(ABS((COALESCE(sm.m_same, 0) + COALESCE(ad.m_adj, 0)) / 1e6
      |        - CAST(ex.exact_pairs AS DOUBLE)) / CAST(ex.exact_pairs AS DOUBLE), 6)
      |    AS rel_err
      |FROM w JOIN ex ON w.t = ex.t
      |LEFT JOIN sm ON w.t = sm.t LEFT JOIN ad ON w.t = ad.t
      |ORDER BY event_type""".stripMargin

  // ---- q226 KMV distinct sketch with set-operation estimates ---------------------

  private val KmvK = 64
  private val KmvNorm = 281474976710656.0 // 2^48

  /** KMV (k-minimum-values / bottom-k theta) distinct sketches with
    * UNION and INTERSECTION estimates — the set operations an HLL cannot
    * deliver (q62's register max gives union only; intersection via
    * inclusion-exclusion explodes in error). Per day, the sketch is the
    * k=64 smallest 48-bit md5 hashes of that day's DISTINCT users —
    * 48 bits so the hash order survives a double-typed aggregation
    * buffer exactly — collected through the bounded TopKAgg (score =
    * −hash; ≤ k·days·partitions exchange). Sketches COMPOSE row-locally:
    * the union sketch of two days is the k smallest of the merged hash
    * lists, the union estimate is the order-statistic (k−1)·2⁴⁸/h₍ₖ₎
    * (exact count when the merged sample is complete), and the
    * intersection estimate is the Jaccard fraction of the union sample
    * present in BOTH sides times the union estimate. Audited on adjacent
    * active-day pairs against exact |A|, |B|, |A∪B| (the shifted-union
    * trick — one keyed distinct, no pair join), |A∩B| by
    * inclusion-exclusion. Every estimate is a pure function of md5 order
    * statistics, so DuckDB replays sketches, estimates, and errors
    * bit-for-bit. At 100 TB this is how warehouse overlap/retention
    * matrices are maintained: per-bucket sketches of bounded size merge
    * associatively; the exact columns here are the audit, not the plan.
    */
  def q226KmvOverlap(spark: SparkSession, sfDir: String): DataFrame = {
    val du = ExtQueries.events(spark, sfDir)
      .select(to_date(col("ts")).as("d"), col("user_id")).distinct()
    val dh = du.withColumn("h",
      conv(substring(md5(concat(lit("kmv:"), col("user_id").cast("string"))
        .cast("binary")), 1, 12), 16, 10).cast("long"))
    val sk = dh.groupBy("d")
      .agg(graft.functions.TopKAgg.topK(-col("h").cast("double"), col("h"), KmvK)
        .as("tk"))
      .select(col("d"), transform(col("tk"), e => e.getField("id")).as("hs"))
    val dc = du.groupBy("d").agg(count(lit(1)).as("n"))
    val un = du.select(col("d"), col("user_id"))
      .unionByName(du.select(date_sub(col("d"), 1).as("d"), col("user_id")))
      .distinct().groupBy("d").agg(count(lit(1)).as("nu"))

    val pairs = sk.as("a").join(sk.as("b"),
        col("b.d") === date_add(col("a.d"), 1))
      .select(col("a.d").as("d"), col("a.hs").as("ha"), col("b.hs").as("hb"))
    val withU = pairs
      .withColumn("u", array_sort(array_distinct(concat(col("ha"), col("hb")))))
      .withColumn("ke", least(size(col("u")), lit(KmvK)))
      .withColumn("u64", slice(col("u"), lit(1), col("ke")))
    val est = withU
      .withColumn("est_union_raw",
        when(size(col("u64")) < KmvK, size(col("u64")).cast("double"))
          .otherwise(lit((KmvK - 1).toDouble) * KmvNorm /
            element_at(col("u64"), KmvK)))
      .withColumn("nboth",
        size(array_intersect(array_intersect(col("u64"), col("ha")), col("hb"))))

    est
      .join(dc.select(col("d"), col("n").as("exact_a")), "d")
      .join(dc.select(date_sub(col("d"), 1).as("d"), col("n").as("exact_b")), "d")
      .join(un.select(col("d"), col("nu").as("exact_union")), "d")
      .select(date_format(col("d"), "yyyy-MM-dd").as("day"),
        col("exact_a"), col("exact_b"),
        col("exact_union"),
        (col("exact_a") + col("exact_b") - col("exact_union")).as("exact_inter"),
        round(col("est_union_raw"), 3).as("est_union"),
        round(col("nboth").cast("double") * col("est_union_raw") / col("ke"), 3)
          .as("est_inter"),
        round(abs(col("est_union_raw") - col("exact_union")) / col("exact_union"),
          6).as("rel_err_union"),
        // exact_inter can be 0 when adjacent active days share no users; Spark
        // (non-ANSI) would yield NULL on /0 while DuckDB yields inf — guard
        // both engines to NULL so the degenerate case agrees.
        when(col("exact_a") + col("exact_b") - col("exact_union") === 0L,
          lit(null).cast("double"))
          .otherwise(
            round(abs(col("nboth").cast("double") * col("est_union_raw") /
              col("ke") -
              (col("exact_a") + col("exact_b") - col("exact_union"))) /
              (col("exact_a") + col("exact_b") - col("exact_union")), 6))
          .as("rel_err_inter"))
      .orderBy("day")
  }

  val q226Sql: String =
    s"""WITH du AS (
       |  SELECT DISTINCT CAST(date_trunc('day', ts) AS DATE) AS d, user_id
       |  FROM events),
       |dh AS (
       |  SELECT d, CAST('0x' || substr(md5('kmv:' || CAST(user_id AS VARCHAR)), 1, 12) AS BIGINT) AS h
       |  FROM du),
       |dc AS (SELECT d, COUNT(*) AS n FROM du GROUP BY 1),
       |un AS (
       |  SELECT d, COUNT(*) AS nu FROM (
       |    SELECT DISTINCT d, user_id FROM (
       |      SELECT d, user_id FROM du
       |      UNION ALL SELECT d - 1 AS d, user_id FROM du))
       |  GROUP BY 1),
       |rk AS (SELECT d, h, ROW_NUMBER() OVER (PARTITION BY d ORDER BY h) AS rn FROM dh),
       |sl AS (SELECT d, list(h ORDER BY h) AS hs FROM rk WHERE rn <= $KmvK GROUP BY 1),
       |pairs AS (
       |  SELECT a.d AS d, a.hs AS ha, b.hs AS hb
       |  FROM sl a JOIN sl b ON b.d = a.d + 1),
       |comp AS (
       |  SELECT d, ha, hb,
       |    list_sort(list_distinct(list_concat(ha, hb))) AS u
       |  FROM pairs),
       |est AS (
       |  SELECT d, ha, hb, LEAST(len(u), $KmvK) AS ke,
       |    u[1:LEAST(len(u), $KmvK)] AS u64
       |  FROM comp),
       |fin AS (
       |  SELECT d, ke,
       |    CASE WHEN len(u64) < $KmvK THEN CAST(len(u64) AS DOUBLE)
       |         ELSE ${(KmvK - 1).toDouble} * $KmvNorm / u64[$KmvK] END AS est_union_raw,
       |    len(list_intersect(list_intersect(u64, ha), hb)) AS nboth
       |  FROM est)
       |SELECT CAST(f.d AS VARCHAR) AS day, da.n AS exact_a, db.n AS exact_b, un.nu AS exact_union,
       |  da.n + db.n - un.nu AS exact_inter,
       |  ROUND(f.est_union_raw, 3) AS est_union,
       |  ROUND(CAST(f.nboth AS DOUBLE) * f.est_union_raw / f.ke, 3) AS est_inter,
       |  ROUND(ABS(f.est_union_raw - un.nu) / un.nu, 6) AS rel_err_union,
       |  ROUND(ABS(CAST(f.nboth AS DOUBLE) * f.est_union_raw / f.ke
       |        - (da.n + db.n - un.nu)) / NULLIF(da.n + db.n - un.nu, 0), 6) AS rel_err_inter
       |FROM fin f
       |JOIN dc da ON da.d = f.d
       |JOIN dc db ON db.d = f.d + 1
       |JOIN un ON un.d = f.d
       |ORDER BY day""".stripMargin

  val all: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q218_zorder_pruning" -> (q218ZorderPruning _),
    "q219_join_size_est" -> (q219JoinSizeEst _),
    "q220_incremental_agg" -> (q220IncrementalAgg _),
    "q221_hard_negatives" -> (q221HardNegatives _),
    "q222_incremental_join" -> (q222IncrementalJoin _),
    "q223_endbiased_est" -> (q223EndBiasedEst _),
    "q224_group_sample" -> (q224GroupSample _),
    "q225_band_join" -> (q225BandJoin _),
    "q226_kmv_overlap" -> (q226KmvOverlap _))

  val oracles: Map[String, String] = Map(
    "q218_zorder_pruning" -> q218Sql,
    "q219_join_size_est" -> q219Sql,
    "q220_incremental_agg" -> q220Sql,
    "q221_hard_negatives" -> q221Sql,
    "q222_incremental_join" -> q222Sql,
    "q223_endbiased_est" -> q223Sql,
    "q224_group_sample" -> q224Sql,
    "q225_band_join" -> q225Sql,
    "q226_kmv_overlap" -> q226Sql)
}
