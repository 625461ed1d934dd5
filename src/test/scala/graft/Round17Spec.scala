package graft

import org.apache.spark.sql.functions._

import graft.ext.Pq
import graft.functions.VectorExprs

/** Round-17 family (driver round 12): the IVF × PQ composition and the
  * certified sketch-quantile panel, plus the null-element PQ-encode
  * contract fixed this round.
  */
class Round17Spec extends SparkSpec {
  import spark.implicits._

  private val rnd = new scala.util.Random(17001)
  private def randVec(dim: Int): Array[Double] =
    Array.fill(dim)(rnd.nextDouble() * 4 - 2)

  private def randCb(m: Int, k: Int, subDim: Int): Pq.Codebook =
    Pq.Codebook(m, k, subDim,
      Array.fill(m)(Array.fill(k)(Array.fill(subDim)(rnd.nextDouble() * 4 - 2))))

  // ---- PqAdcSelect ------------------------------------------------------------

  test("PqAdcSelect equals the PqAdcBatch element it selects") {
    val m = 8; val k = 16
    val cb = randCb(m, k, 4)
    val luts = Array.fill(5)(Pq.queryLut(randVec(32), cb))
    val rows = (0 until 200).map { i =>
      (i.toLong, Array.fill(m)(rnd.nextInt(k)).toSeq, i % luts.length)
    }.toDF("id", "codes", "qi")
    val got = rows.select(col("id"),
      VectorExprs.pqAdcSelect(col("codes"), col("qi"), luts).as("one"),
      element_at(VectorExprs.pqAdcBatch(col("codes"), luts),
        col("qi") + 1).as("batch"))
      .collect()
    got.foreach { r =>
      assert(r.getDouble(1) == r.getDouble(2),
        s"row ${r.getLong(0)}: select ${r.getDouble(1)} != batch ${r.getDouble(2)}")
    }
  }

  test("PqAdcSelect null propagation (null codes or null index)") {
    val luts = Array.fill(2)(Pq.queryLut(randVec(8), randCb(2, 4, 4)))
    val df = Seq(
      (Some(Seq(1, 2)), Some(0)),
      (None, Some(1)),
      (Some(Seq(0, 3)), None)
    ).toDF("codes", "qi")
    val got = df.select(VectorExprs.pqAdcSelect(col("codes"), col("qi"), luts))
      .collect().map(r => r.isNullAt(0))
    assert(got.toSeq == Seq(false, true, true))
  }

  test("PqAdcSelect fails loudly on codebook-contract violations (not AIOOBE / partial sums)") {
    val luts = Array.fill(2)(Pq.queryLut(randVec(8), randCb(2, 4, 4)))
    def msgFor(codes: Seq[Int], qi: Int): String = {
      val e = intercept[Exception] { // bare IAE in local mode, task-wrapped on a cluster
        Seq((codes, qi)).toDF("codes", "qi")
          .select(VectorExprs.pqAdcSelect(col("codes"), col("qi"), luts))
          .collect()
      }
      // root cause is the typed IllegalArgumentException, possibly wrapped
      var c: Throwable = e
      while (c.getCause != null) c = c.getCause
      assert(c.isInstanceOf[IllegalArgumentException], s"got $c")
      c.getMessage
    }
    assert(msgFor(Seq(1, 2), 7).contains("outside LUT batch"))          // bad qi
    assert(msgFor(Seq(1, 2, 3), 0).contains("mixed codebooks"))         // m mismatch
    assert(msgFor(Seq(1), 0).contains("mixed codebooks"))               // m mismatch (short)
    assert(msgFor(Seq(1, 9), 0).contains("outside codebook"))           // code >= k
  }

  // ---- PqEncodeRounded null elements -------------------------------------------

  test("PqEncodeRounded emits code 0 for a subspace touching a null element, matching the unrolled form") {
    val cb = randCb(3, 4, 2)
    // subspace 1 (indices 2,3) carries the null; 0 and 2 stay clean
    val vecs = Seq(
      Seq[java.lang.Double](0.1, -0.2, null, 0.4, 0.5, -0.6),
      Seq[java.lang.Double](0.3, 0.3, 0.3, 0.3, 0.3, 0.3))
      .toDF("v").select(col("v").cast("array<double>").as("v"))
    val got = vecs.select(
      Pq.encodeRounded(col("v"), cb).as("fused"),
      Pq.encodeRoundedUnrolled(col("v"), cb).as("unrolled")).collect()
    val fusedNull = got(0).getSeq[Int](0)
    val unrolledNull = got(0).getSeq[Int](1)
    assert(fusedNull(1) == 0, s"null-touching subspace must code 0, got $fusedNull")
    assert(fusedNull == unrolledNull,
      s"fused $fusedNull != unrolled $unrolledNull on null-element vector")
    assert(got(1).getSeq[Int](0) == got(1).getSeq[Int](1))
  }

  // ---- q240 panel coherence ----------------------------------------------------

  test("q240 panel: recall bounded by ceiling, scanned_frac consistent, values sane") {
    val df = graft.queries.Round17Queries.q240IvfPqAdc(spark,
      "/root/testdata/sf0.001").collect()
    assert(df.length == 10)
    df.foreach { r =>
      val (ns, frac) = (r.getLong(1), r.getDouble(2))
      val (ceil, adcRec, rec) = (r.getLong(3), r.getLong(4), r.getLong(5))
      assert(ns > 0 && frac > 0.0 && frac < 1.0)
      assert(rec <= ceil, s"recall10 $rec exceeds pruning ceiling $ceil")
      assert(adcRec <= ceil, s"adc_recall10 $adcRec exceeds ceiling $ceil")
      assert(ceil <= 10 && rec >= 0)
    }
    // pruning must actually prune: mean scanned fraction well under 1
    val meanFrac = df.map(_.getDouble(2)).sum / df.length
    assert(meanFrac < 0.5, s"mean scanned_frac $meanFrac — not pruning")
  }

  // ---- q241 sketch certification ------------------------------------------------

  test("q241 panel: sketch honors its certified bounds on real returns") {
    val got = graft.queries.Round17Queries.q241SketchTails(spark,
      "/root/testdata/sf0.001").collect()
    assert(got.nonEmpty)
    got.foreach { r =>
      assert(r.getBoolean(5), s"ok_p05 false for ${r.getString(0)}")
      assert(r.getBoolean(6), s"ok_p95 false for ${r.getString(0)}")
      assert(r.getBoolean(7), s"ok_tail false for ${r.getString(0)}")
      assert(r.getBoolean(8), s"buckets_ok false for ${r.getString(0)}")
      assert(r.getDouble(2) < 0 && r.getDouble(3) > 0,
        "returns tails should straddle zero")
    }
  }

  // ---- q242 longest shared runs --------------------------------------------------

  test("longestSharedRuns equals brute-force longest-common-substring on planted passages") {
    val k = 8
    val vocabRnd = new scala.util.Random(42017)
    def uniq(n: Int): Seq[String] = Seq.fill(n)(f"u${vocabRnd.nextLong()}%x")
    val p1 = (1 to 30).map(i => s"p$i")        // 30-token shared passage (A,B)
    val p2 = (1 to 12).map(i => s"q$i")        // 12-token passage (A,C)
    val p3 = (1 to 20).map(i => s"r$i")        // 20-token passage (C,D)
    val p4 = (1 to 15).map(i => s"s$i")        // second (A,C) passage → 2 islands
    val docA = (uniq(10) ++ p1 ++ uniq(7) ++ p2 ++ uniq(5) ++ p4 ++ uniq(3)).mkString(" ")
    val docB = (uniq(6) ++ p1 ++ uniq(9)).mkString(" ")
    val docC = (p2 ++ uniq(8) ++ p3 ++ uniq(4) ++ p4).mkString(" ")
    val docD = (uniq(12) ++ p3 ++ uniq(3)).mkString(" ")
    val docE = uniq(40).mkString(" ")          // shares nothing
    val docs = Seq((1L, docA), (2L, docB), (3L, docC), (4L, docD), (5L, docE))
    val got = graft.ext.Dedup.longestSharedRuns(
      docs.toDF("doc_id", "text"), "doc_id", "text", k = k, maxDf = 64, minRun = k)
      .collect().map(r => (r.getLong(0), r.getLong(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    // brute-force longest common contiguous token run per pair
    def lcsRun(a: Seq[String], b: Seq[String]): Int = {
      val dp = Array.ofDim[Int](a.length + 1, b.length + 1)
      var best = 0
      for (i <- 1 to a.length; j <- 1 to b.length)
        if (a(i - 1) == b(j - 1)) {
          dp(i)(j) = dp(i - 1)(j - 1) + 1
          best = math.max(best, dp(i)(j))
        }
      best
    }
    val toks = docs.map { case (id, t) => id -> t.toLowerCase.split("\\s+").toSeq }.toMap
    for (i <- docs.map(_._1); j <- docs.map(_._1) if i < j) {
      val expect = lcsRun(toks(i), toks(j))
      if (expect >= k)
        assert(got.get((i, j)).map(_._1).contains(expect.toLong),
          s"pair ($i,$j): got ${got.get((i, j))}, brute-force run $expect")
      else
        assert(!got.contains((i, j)), s"pair ($i,$j) below minRun but reported")
    }
    // the two-passage pair (A,C) must report exactly two islands
    assert(got((1L, 3L))._2 == 2L, s"(A,C) n_runs: ${got((1L, 3L))}")
    // n_matched on the clean 30-token passage pair = 30 - k + 1 windows
    assert(got((1L, 2L))._3 == (30 - k + 1).toLong, s"(A,B): ${got((1L, 2L))}")
  }

  test("longestSharedRuns maxDf cap interrupts but never invents runs") {
    // 3 docs share one boilerplate passage; with maxDf = 2 its k-grams
    // (df = 3) are dropped, so NO pair is reported — conservative, not wrong
    val p = (1 to 20).map(i => s"b$i").mkString(" ")
    val rnd2 = new scala.util.Random(7)
    def u(n: Int) = Seq.fill(n)(f"z${rnd2.nextLong()}%x").mkString(" ")
    val docs = Seq((1L, s"${u(5)} $p ${u(5)}"), (2L, s"${u(4)} $p"), (3L, s"$p ${u(6)}"))
      .toDF("doc_id", "text")
    val capped = graft.ext.Dedup.longestSharedRuns(docs, "doc_id", "text",
      k = 8, maxDf = 2, minRun = 8).count()
    val full = graft.ext.Dedup.longestSharedRuns(docs, "doc_id", "text",
      k = 8, maxDf = 64, minRun = 8).collect()
    assert(capped == 0L, "df=3 k-grams must be dropped at maxDf=2")
    assert(full.length == 3 && full.forall(_.getLong(2) == 20L),
      s"all 3 pairs share the 20-token passage: ${full.mkString(";")}")
  }

  // ---- q243 filter agreement ------------------------------------------------------

  test("q243 agreement panel: counts partition n, kappa recomputes from the cells") {
    val got = graft.queries.Round17Queries.q243FilterAgreement(spark,
      "/root/testdata/sf0.001").collect()
    assert(got.nonEmpty)
    got.foreach { r =>
      val (n, n11, n10, n01, n00) =
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))
      assert(n11 + n10 + n01 + n00 == n, s"cells don't partition n for ${r.getString(0)}")
      val po = (n11 + n00).toDouble / n
      val pe = ((n11 + n10).toDouble * (n11 + n01) +
        (n01 + n00).toDouble * (n10 + n00)) / (n.toDouble * n)
      assert(math.abs(r.getDouble(6) - BigDecimal(po).setScale(6,
        BigDecimal.RoundingMode.HALF_UP).toDouble) < 1e-12)
      if (!r.isNullAt(8)) {
        val kappa = (po - pe) / (1.0 - pe)
        assert(kappa >= -1.0 - 1e-9 && kappa <= 1.0 + 1e-9)
        assert(math.abs(r.getDouble(8) - BigDecimal(kappa).setScale(6,
          BigDecimal.RoundingMode.HALF_UP).toDouble) < 1e-12,
          s"kappa mismatch for ${r.getString(0)}")
      }
    }
  }

  test("q244 Fleiss kappa equals an independent driver-side recompute of all three raters") {
    def r6(x: Double): Double =
      BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    // independent recompute: plain-Scala raters over the raw parquet text
    val rows = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select("source", "text").collect()
      .map(r => (r.getString(0), r.getString(1)))
    def np(text: String): Long = {
      val t = text.split(" ", -1)
      val words = t.length
      val chars = text.length
      val meanLen = (chars - (words - 1)).toDouble / words
      val stops = t.count(w => w == "the" || w == "a")
      val ttr = t.distinct.length.toDouble / words
      val gopher = !(words < 20) && !(words > 100) &&
        !(meanLen < 3.0 || meanLen > 7.0) && !(stops < 1) && !(ttr < 0.25)
      val noSpace = text.replace(" ", "")
      val tokensSimple = (chars - noSpace.length) + 1
      val awl = noSpace.length.toDouble / tokensSimple
      val punct = (chars - text.replaceAll("\\p{Punct}", "").length).toDouble /
        math.max(chars, 1)
      val q = math.min(chars / 500.0, 1.0) * 0.4 +
        (if (awl >= 3.0 && awl <= 10.0) 1.0 else 0.5) * 0.4 +
        (1.0 - math.min(punct * 5.0, 1.0)) * 0.2
      val score = BigDecimal(q).setScale(3, BigDecimal.RoundingMode.HALF_UP)
        .toDouble >= 0.85
      val diverse = ttr >= 0.5
      Seq(gopher, score, diverse).count(identity).toLong
    }
    val expect = rows.groupBy(_._1).map { case (src, docs) =>
      val nps = docs.map(d => np(d._2))
      val n = nps.length
      val npt = nps.sum
      val pnum = nps.map(x => x * x + (3 - x) * (3 - x) - 3).sum
      val pp = npt.toDouble / (3.0 * n)
      val pbar = pnum.toDouble / (6.0 * n)
      val pe = pp * pp + (1.0 - pp) * (1.0 - pp)
      src -> (n.toLong, npt, r6(pp), r6(pbar), r6(pe),
        if (pe == 1.0) None else Some(r6((pbar - pe) / (1.0 - pe))))
    }
    val got = graft.queries.Round17Queries.q244FleissKappa(spark,
      "/root/testdata/sf0.001").collect()
    assert(got.length == expect.size)
    got.foreach { r =>
      val e = expect(r.getString(0))
      assert(r.getLong(1) == e._1 && r.getLong(2) == e._2,
        s"${r.getString(0)}: counts ${r.getLong(1)}/${r.getLong(2)} vs $e")
      assert(r.getDouble(3) == e._3 && r.getDouble(4) == e._4 && r.getDouble(5) == e._5,
        s"${r.getString(0)}: p components differ")
      e._6 match {
        case Some(k) => assert(r.getDouble(6) == k, s"${r.getString(0)}: kappa ${r.getDouble(6)} != $k")
        case None => assert(r.isNullAt(6))
      }
    }
  }

  test("DDSketch certifies random heavy-tailed frames against exact order statistics") {
    val alpha = 0.02
    val qs = Seq(0.05, 0.5, 0.95)
    val agg = udaf(new graft.functions.DDSketchAgg.Quantiles(alpha, qs),
      org.apache.spark.sql.Encoders.scalaDouble)
    val frames = (0 until 20).map { f =>
      val n = 50 + rnd.nextInt(2000)
      // heavy tails: exponentiate a normal, randomize sign and scale
      val xs = Array.fill(n)(math.exp(rnd.nextGaussian() * 2) *
        (if (rnd.nextBoolean()) 1 else -1) * math.pow(10, rnd.nextInt(5) - 2))
      (f, xs)
    }
    val df = frames.flatMap { case (f, xs) => xs.map(x => (f, x)) }.toDF("f", "x")
    val est = df.groupBy("f").agg(agg(col("x")).as("dd")).collect()
      .map(r => r.getInt(0) -> r.getSeq[Double](1)).toMap
    frames.foreach { case (f, xs) =>
      val sorted = xs.sorted
      qs.zipWithIndex.foreach { case (q, i) =>
        val exact = sorted(math.floor(q * (xs.length - 1)).toInt)
        val e = est(f)(i)
        assert(math.abs(e / exact - 1.0) <= alpha + 1e-12,
          s"frame $f q=$q: est $e vs exact $exact breaks the $alpha bound")
      }
    }
  }
}
