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
