package graft

import org.apache.spark.sql.functions._

import graft.ext.{Incremental, Layout}

/** Round-14 family: Z-order layout + zone-map pruning, coordinated
  * join-size estimation, incremental aggregate maintenance, hard-negative
  * mining. Each suite pins (a) exact agreement with an independent
  * reference formulation, (b) partition invariance, and (c) the
  * operator's semantic contract (pruning dominance, estimator identity,
  * maintenance equality, label constraint).
  */
class Round14Spec extends SparkSpec {
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"

  // ---- Layout primitives -------------------------------------------------------

  test("zValue matches a bit-twiddling reference interleave") {
    def ref(x: Long, y: Long, bits: Int): Long =
      (0 until bits).map(i => (((x >> i) & 1L) << (2 * i)) |
        (((y >> i) & 1L) << (2 * i + 1))).sum
    val pairs = for (x <- 0L to 40L; y <- Seq(0L, 1L, 7L, 255L, 4095L)) yield (x, y)
    val got = pairs.toDF("x", "y")
      .select(col("x"), col("y"), Layout.zValue(col("x"), col("y"), 12).as("z"))
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    pairs.foreach { case (x, y) =>
      assert(got((x, y)) == ref(x, y, 12), s"z($x,$y)")
    }
    // interleaving is monotone box-wise: the max z of a quadrant is below
    // the min z of the next diagonal quadrant
    assert(ref(2047, 2047, 12) < ref(2048, 2048, 12))
  }

  test("idiv is exact floor division where cast(a/b) would round up") {
    // 10^15 + 1 over 3: double division rounds the quotient UP across the
    // integer boundary for some magnitudes; idiv must stay exact
    val cases = Seq((1000000000000001L, 3L), (9007199254740993L - 1, 7L),
      (149999L * 64, 150000L), (0L, 5L), (63L, 64L))
    val got = cases.toDF("a", "b")
      .select(Layout.idiv(col("a"), col("b")).as("d")).collect().map(_.getLong(0))
    cases.zip(got).foreach { case ((a, b), d) =>
      assert(d == a / b, s"idiv($a,$b)=$d want ${a / b}")
    }
  }

  test("quantize maps bounds to [0, levels) with monotone exact boundaries") {
    val lo = 17L; val hi = 15016L // span 15000
    val vals = Seq(lo, lo + 1, (lo + hi) / 2, hi - 1, hi)
    val q = vals.toDF("v")
      .select(Layout.quantize(col("v"), lit(lo), lit(hi), 4096).as("q"))
      .collect().map(_.getLong(0))
    assert(q.head == 0L && q.last == 4095L, q.toSeq.toString)
    assert(q.sliding(2).forall(p => p(0) <= p(1)), "monotone")
  }

  test("fileAssign is partition-invariant, covers exactly F balanced files") {
    val base = spark.range(1000).select(
      col("id"), (col("id") * 7919 % 1000).as("key"))
    def files(parts: Int) =
      Layout.fileAssign(base.repartition(parts), "key", 1000L, 16, "f")
        .groupBy("f").agg(count(lit(1)).as("c"),
          min("key").as("mn")).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sortBy(_._1)
    val a = files(3); val b = files(11)
    assert(a.toSeq == b.toSeq, "partitioning changed file assignment")
    val sizes = a.map(_._2)
    assert(a.length == 16 && sizes.sum == 1000L &&
      sizes.max - sizes.min <= 1, s"unbalanced files: ${sizes.toSeq}")
    // file boundaries follow key order: min keys strictly increase
    assert(a.map(_._3).sliding(2).forall(p => p(0) < p(1)))
  }

  // ---- q218 pruning contract ----------------------------------------------------

  test("q218: curve layouts dominate on the mixed workload; date layout wins date-only") {
    val rows = graft.queries.Round14Queries.q218ZorderPruning(spark, sf)
      .collect().map(r => (r.getString(1), r.getLong(7), r.getLong(8),
        r.getLong(9), r.getLong(10)))
    val both = rows.filter(_._1 == "both")
    assert(both.length == 16)
    val (natSum, dateSum, zSum, hSum) = (both.map(_._2).sum,
      both.map(_._3).sum, both.map(_._4).sum, both.map(_._5).sum)
    assert(zSum < natSum && zSum < dateSum,
      s"z=$zSum must beat nat=$natSum and date=$dateSum on mixed predicates")
    assert(hSum < natSum && hSum < dateSum,
      s"hilbert=$hSum must beat nat=$natSum and date=$dateSum on mixed predicates")
    val dateOnly = rows.filter(_._1 == "date")
    assert(dateOnly.map(_._3).sum <= dateOnly.map(_._4).sum,
      "date-sorted layout must prune date ranges at least as well as Z")
    // natural order prunes nothing on custkey ranges (orderkey ⟂ custkey)
    val custOnly = rows.filter(_._1 == "cust")
    assert(custOnly.forall(_._2 == 64L), "unexpected natural-layout pruning")
  }

  test("hilbertValue equals the xy2d reference over a grid") {
    val pairs = for (x <- 0L to 35L; y <- Seq(0L, 1L, 5L, 63L, 2048L, 4095L))
      yield (x, y)
    val got = pairs.toDF("x", "y")
      .select(col("x"), col("y"), Layout.hilbertValue(col("x"), col("y"), 12).as("h"))
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    pairs.foreach { case (x, y) =>
      assert(got((x, y)) == Layout.hilbertRef(x, y, 12), s"h($x,$y)")
    }
  }

  test("Hilbert walk has unit-step locality everywhere; Z does not") {
    // bits=3: enumerate all 64 cells, invert d -> (x, y), check every
    // consecutive pair of curve positions is 4-adjacent — the locality
    // property that tightens zone-map boxes at file seams
    val cells = for (x <- 0L until 8L; y <- 0L until 8L) yield (x, y)
    val byD = cells.map { case (x, y) => Layout.hilbertRef(x, y, 3) -> ((x, y)) }
      .sortBy(_._1)
    assert(byD.map(_._1) == (0L until 64L), "hilbert indices not a permutation")
    byD.sliding(2).foreach { case Seq((_, (x1, y1)), (_, (x2, y2))) =>
      assert(math.abs(x1 - x2) + math.abs(y1 - y2) == 1,
        s"non-adjacent hilbert step ($x1,$y1)->($x2,$y2)")
    }
    // the Z curve breaks unit-step locality (the quadrant seam jump)
    def zRef(x: Long, y: Long) = (0 until 3).map(i =>
      (((x >> i) & 1L) << (2 * i)) | (((y >> i) & 1L) << (2 * i + 1))).sum
    val zByD = cells.map { case (x, y) => zRef(x, y) -> ((x, y)) }.sortBy(_._1)
    val zJumps = zByD.sliding(2).count { case Seq((_, (x1, y1)), (_, (x2, y2))) =>
      math.abs(x1 - x2) + math.abs(y1 - y2) > 1 }
    assert(zJumps > 0, "expected Z-curve seam jumps")
  }

  // ---- q219 estimator identity ----------------------------------------------------

  test("q219: FK join exact size = |lineitem|; key-sampling commutes with counting") {
    val li = spark.read.parquet(s"$sf/lineitem.parquet")
    val out = graft.queries.Round14Queries.q219JoinSizeEst(spark, sf)
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(out("li_orders_orderkey")._1 == li.count(),
      "every lineitem must match exactly one order")
    out.values.foreach { case (exact, est) =>
      assert(est > 0 && exact > 0)
      assert(est.toDouble / exact < 4 && exact.toDouble / est < 4,
        s"estimate $est implausibly far from $exact on this fixture")
    }
    // the coordination property that makes the estimator work: filtering
    // keys BEFORE counting equals filtering AFTER counting (the hash keeps
    // or drops a key with ALL its rows — it is a key sample, not a row
    // sample)
    val h = pmod(graft.ext.Dedup.portableTokenHash(
      concat(lit("jse:"), col("l_partkey").cast("string"))), lit(16))
    val before = li.filter(h === 0).groupBy("l_partkey").count()
    val after = li.groupBy("l_partkey").count().filter(
      pmod(graft.ext.Dedup.portableTokenHash(
        concat(lit("jse:"), col("l_partkey").cast("string"))), lit(16)) === 0)
    assert(before.orderBy("l_partkey").collect().toSeq ==
      after.orderBy("l_partkey").collect().toSeq)
  }

  // ---- q220 maintenance algebra ---------------------------------------------------

  test("q220: maintained state equals full recompute on every event type") {
    val rows = graft.queries.Round14Queries.q220IncrementalAgg(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach(r => assert(r.getBoolean(r.length - 1), s"mismatch: $r"))
  }

  test("Incremental.merge handles keys present on only one side") {
    val a = Seq(("x", 0.5), ("x", 1.5), ("y", 2.0)).toDF("k", "v")
    val b = Seq(("y", -1.0), ("z", 4.0)).toDF("k", "v")
    val merged = Incremental.merge(
      Incremental.state(a, Seq("k"), "v"),
      Incremental.state(b, Seq("k"), "v"), Seq("k"))
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    assert(merged("x") == ((2L, 2000000L, 500000L, 1500000L)))
    assert(merged("y") == ((2L, 1000000L, -1000000L, 2000000L)))
    assert(merged("z") == ((1L, 4000000L, 4000000L, 4000000L)))
    // merge ≡ recompute over the union (monoid associativity)
    val whole = Incremental.state(a.unionAll(b), Seq("k"), "v")
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    assert(merged == whole)
  }

  // ---- q221 mining contract --------------------------------------------------------

  test("q221: TopKAgg path equals the window formulation; labels always differ") {
    val out = graft.queries.Round14Queries.q221HardNegatives(spark, sf)
    val rows = out.collect()
    assert(rows.length == 16 * 5)
    rows.foreach(r => assert(r.getInt(1) != r.getInt(4),
      s"hard negative shares the anchor label: $r"))
    // independent window formulation over the same rounded cosine
    val e = spark.read.parquet(s"$sf/embeddings.parquet").select(
      col("vec_id"), col("label"), col("embedding").cast("array<double>").as("v"))
    val anchors = e.filter(col("vec_id") < 16).select(
      col("vec_id").as("anchor_id"), col("label").as("anchor_label"),
      col("v").as("av"))
    val cos = round(graft.ext.Similarity.dot(col("v"), col("av")) /
      (sqrt(graft.ext.Similarity.norm2(col("v"))) *
        sqrt(graft.ext.Similarity.norm2(col("av")))), 6)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("anchor_id").orderBy(col("cos").desc, col("vec_id"))
    val ref = e.crossJoin(broadcast(anchors))
      .filter(col("label") =!= col("anchor_label"))
      .select(col("anchor_id"), col("vec_id"), cos.as("cos"))
      .withColumn("rank", row_number().over(w)).filter(col("rank") <= 5)
      .select(col("anchor_id"), col("rank").cast("long").as("rank"),
        col("vec_id").as("neighbor_id"), col("cos"))
      .orderBy("anchor_id", "rank").collect()
    val got = out.select("anchor_id", "rank", "neighbor_id", "cos")
      .orderBy("anchor_id", "rank").collect()
    assert(got.toSeq == ref.toSeq)
  }

  test("q222: delta-join expansion equals the full join recompute per priority") {
    val rows = graft.queries.Round14Queries.q222IncrementalJoin(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach(r => assert(r.getBoolean(r.length - 1), s"mismatch: $r"))
    // the four terms partition the full join: totals agree with one keyed join
    val o = spark.read.parquet(s"$sf/orders.parquet")
    val l = spark.read.parquet(s"$sf/lineitem.parquet")
    val n = o.join(l, col("o_orderkey") === col("l_orderkey")).count()
    assert(rows.map(_.getLong(1)).sum == n)
  }

  test("q223: MCV head exact on the small domain; plain sample useless there") {
    val out = graft.queries.Round14Queries.q223EndBiasedEst(spark, sf)
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(5)))).toMap
    val (exact, plain, eb, ebErr) = out("ev_ev_eventtype")
    // 5-key domain: the 20-entry MCV list covers it entirely → end-biased
    // is EXACT; a 1/16 key sample on a 5-key domain samples (for this
    // fixture's hashes) nothing
    assert(eb == exact && ebErr == 0.0, s"end-biased not exact: $eb vs $exact")
    assert(plain == 0L, "fixture drift: a 5-key domain key landed in bucket 0")
    out.values.foreach { case (ex, _, e, _) => assert(ex > 0 && e > 0) }
  }

  test("q224: per-group TopKAgg sample equals the per-group window formulation") {
    val d = spark.read.parquet(s"$sf/documents.parquet")
    val keyed = d.select(col("source"), col("lang"), col("doc_id"),
      graft.ext.Splits.weightedSampleKey(col("doc_id"), col("n_chars")).as("k"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("source", "lang").orderBy(col("k"), col("doc_id"))
    val ref = keyed.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= 5)
      .select(col("source"), col("lang"), col("rank").cast("long").as("rank"),
        col("doc_id"), col("k"))
      .orderBy("source", "lang", "rank").collect()
    val got = graft.queries.Round14Queries.q224GroupSample(spark, sf)
      .select(col("source"), col("lang"), col("rank"), col("doc_id"),
        col("race_key"))
      .orderBy("source", "lang", "rank").collect()
    assert(got.toSeq == ref.toSeq)
    // every (source, lang) cell present in the corpus is represented
    val cells = d.select("source", "lang").distinct().count()
    assert(got.map(r => (r.getString(0), r.getString(1))).distinct.length == cells)
  }

  test("q225: bucket co-location finds exactly the brute-force band pairs") {
    val ev = spark.read.parquet(s"$sf/events.parquet")
      .select(col("event_type").as("t"), col("event_id").as("id"),
        col("value").as("v"))
    // brute-force truth per type (fixture-sized only)
    val brute = ev.as("a").join(ev.as("b"),
        col("a.t") === col("b.t") && col("a.id") < col("b.id"))
      .join(ev.groupBy("t").agg(
        ((max("v") - min("v")) / 1000.0).as("eps")).withColumnRenamed("t", "tt"),
        col("a.t") === col("tt"))
      .filter(abs(col("a.v") - col("b.v")) <= col("eps"))
      .groupBy(col("a.t")).count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val got = graft.queries.Round14Queries.q225BandJoin(spark, sf)
      .collect().map(r => r.getString(0) -> r.getLong(2)).toMap
    assert(got == brute, s"got $got want $brute")
  }

  test("q226: complete KMV samples give EXACT set estimates (sf0.001: 15 users < k)") {
    val rows = graft.queries.Round14Queries.q226KmvOverlap(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      // with the whole hash population inside the sketch the estimator
      // must degrade to exact counting: est == exact, both errors 0
      assert(r.getDouble(5) == r.getLong(3).toDouble, s"union not exact: $r")
      assert(r.getDouble(6) == r.getLong(4).toDouble, s"inter not exact: $r")
      assert(r.getDouble(7) == 0.0 && r.getDouble(8) == 0.0, s"nonzero err: $r")
    }
  }

  // ---- plan guards -----------------------------------------------------------------

  test("q219/q220 plan keyed joins only — no cartesian beyond the 1-row scalar attach") {
    val p219 = graft.queries.Round14Queries.q219JoinSizeEst(spark, sf)
      .queryExecution.executedPlan.toString
    assert(!p219.contains("CartesianProduct"), s"cartesian in q219: $p219")
    val p220 = graft.queries.Round14Queries.q220IncrementalAgg(spark, sf)
      .queryExecution.executedPlan.toString
    assert(!p220.contains("CartesianProduct"), s"cartesian in q220: $p220")
  }

  test("q218 file assignment plans no single-partition exchange") {
    val o = spark.read.parquet(s"$sf/orders.parquet").select(
      col("o_orderkey").as("k"))
    val plan = Layout.fileAssign(o, "k", 1500L, 16, "f")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("SinglePartition"), s"global window in: $plan")
  }
}
