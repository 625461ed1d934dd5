package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.ext.{NgramLm, Pq, QualityModel, Splits}

/** Round-13 family: trigram stupid-backoff LM, Efraimidis–Spirakis
  * weighted sampling, product quantization, in-engine logistic
  * regression. Each suite pins (a) exact agreement between the
  * distributed path and an in-memory reference, (b) partition
  * invariance, and (c) the operator's semantic contract.
  */
class Round13Spec extends SparkSpec {
  import spark.implicits._

  // ---- NgramLm ---------------------------------------------------------------

  private val trainDocs = Seq(
    1L -> "the cat sat on the mat",
    2L -> "the cat ran to the house",
    3L -> "a dog sat on the mat",
    4L -> "the dog ran to the tree")
  private val scoreDocs = Seq(
    10L -> "the cat sat on the mat",     // all trigrams seen
    11L -> "the cat sat to the tree",    // mixes contexts → backoffs
    12L -> "the cat zebra on the mat",   // OOV word at a scored position
    13L -> "ran the",                    // < 3 tokens → zero-scored
    14L -> "dog on a cat ran house")     // scrambled → deep backoffs

  private def lmFrames: (DataFrame, DataFrame) = (
    trainDocs.toDF("doc_id", "text"),
    scoreDocs.toDF("doc_id", "text"))

  test("NgramLm DataFrame path equals the in-memory reference scorer") {
    val (tr, sc) = lmFrames
    val got = NgramLm.scoreDocs(tr, sc, "doc_id", "text")
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5),
          r.getDouble(6)))).toMap
    val want = NgramLm.referenceScore(trainDocs.map(_._2), scoreDocs)
    assert(got.keySet == want.keySet)
    want.foreach { case (id, (n, t, b, u, o, nats)) =>
      val (gn, gt, gb, gu, go, gnats) = got(id)
      assert((gn, gt, gb, gu, go) == ((n, t, b, u, o)), s"doc $id counters")
      assert(math.abs(gnats - nats) < 1e-9, s"doc $id nats $gnats vs $nats")
    }
  }

  test("NgramLm backoff levels hit the expected branches") {
    val (tr, sc) = lmFrames
    val rows = NgramLm.scoreDocs(tr, sc, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r).toMap
    // fully in-model doc: every position a trigram hit
    assert(rows(10L).getLong(2) == rows(10L).getLong(1))
    // OOV word present → at least one OOV-level token
    assert(rows(12L).getLong(5) >= 1)
    // short doc zero-scored
    assert(rows(13L).getLong(1) == 0 && rows(13L).getDouble(6) == 0.0)
    // scrambled doc never sees a full trigram
    assert(rows(14L).getLong(2) == 0)
    // seen text scores fewer nats/token than scrambled text
    def npt(id: Long) = rows(id).getDouble(6) / rows(id).getLong(1)
    assert(npt(10L) < npt(14L))
  }

  test("NgramLm is partition-invariant") {
    val (tr, sc) = lmFrames
    val base = NgramLm.scoreDocs(tr, sc, "doc_id", "text")
      .orderBy("doc_id").collect().toSeq
    val shuffled = NgramLm.scoreDocs(tr.repartition(7), sc.repartition(5),
      "doc_id", "text").orderBy("doc_id").collect().toSeq
    assert(base == shuffled)
  }

  // ---- weighted sampling -----------------------------------------------------

  test("weightedSample is deterministic across partitionings and honors k") {
    val df = (1L to 500L).map(i => (i, (i % 7 + 1) * 10L)).toDF("id", "w")
    val a = Splits.weightedSample(df, "id", "w", 20)
      .select("id").as[Long].collect().toSeq.sorted
    val b = Splits.weightedSample(df.repartition(13), "id", "w", 20)
      .select("id").as[Long].collect().toSeq.sorted
    assert(a == b && a.size == 20 && a.distinct.size == 20)
  }

  test("weightedSample favors heavy rows (dominant-weight inclusion)") {
    // one row carries 10^5× the weight of each of the 999 others: its race
    // key is ~10^5× smaller in expectation; across 30 disjoint id-spaces
    // (fresh md5 draws) it must be selected in the large majority
    val wins = (0 until 30).count { trial =>
      val base = trial * 10000L
      val df = ((base + 1L) to (base + 999L)).map(i => (i, 1L)) :+
        ((base + 1000L, 100000L))
      val picked = Splits.weightedSample(df.toDF("id", "w"), "id", "w", 10)
        .select("id").as[Long].collect()
      picked.contains(base + 1000L)
    }
    assert(wins >= 27, s"heavy row selected in only $wins/30 trials")
  }

  test("weightedSample at k=n returns everything (ranking is total)") {
    val df = (1L to 50L).map(i => (i, i)).toDF("id", "w")
    assert(Splits.weightedSample(df, "id", "w", 50).count() == 50)
  }

  // ---- product quantization --------------------------------------------------

  /** Clustered fixture: `nClusters` centers in 16-d, `perCluster` points
    * jittered deterministically around each — the regime PQ is built for. */
  private def clusteredVecs(nClusters: Int, perCluster: Int, dim: Int = 16)
      : Seq[(Long, Array[Double])] = {
    val rnd = new scala.util.Random(7)
    val centers = Array.fill(nClusters)(Array.fill(dim)(rnd.nextGaussian() * 5))
    (0 until nClusters * perCluster).map { i =>
      val c = centers(i % nClusters)
      i.toLong -> c.map(_ + rnd.nextGaussian() * 0.3)
    }
  }

  test("Pq encode (fused argmin) agrees with referenceEncodeRounded on ties-free data") {
    val data = clusteredVecs(4, 25)
    val cb = Pq.train(data.toDF("id", "v"), "id", "v", m = 4, k = 4,
      sampleSize = 64, iterations = 6)
    val got = data.toDF("id", "v")
      .select(col("id"), Pq.encodeRounded(col("v"), cb).as("c"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Int](1).toSeq).toMap
    data.foreach { case (id, v) =>
      assert(got(id) == Pq.referenceEncodeRounded(v, cb).toSeq, s"vec $id")
    }
  }

  test("Pq reconstruct inverts encode up to quantization distortion") {
    val data = clusteredVecs(4, 25)
    val df = data.toDF("id", "v")
    val cb = Pq.train(df, "id", "v", m = 4, k = 4, sampleSize = 64, iterations = 6)
    val recon = df.select(col("id"),
        Pq.reconstruct(Pq.encode(col("v"), cb), cb).as("r"), col("v"))
      .collect()
    recon.foreach { r =>
      val v = r.getSeq[Double](2); val rec = r.getSeq[Double](1)
      val d2 = v.zip(rec).map { case (a, b) => (a - b) * (a - b) }.sum
      val n2 = v.map(x => x * x).sum
      // cluster std 0.3 vs center spread 5: distortion ≪ signal
      assert(d2 < 0.05 * n2, s"vec ${r.getLong(0)}: d2=$d2 n2=$n2")
    }
  }

  test("Pq ADC+rerank recovers true neighbors on clustered data") {
    val data = clusteredVecs(8, 30)
    val df = data.toDF("id", "v").cache()
    val cb = Pq.refine(df, "v",
      Pq.train(df, "id", "v", m = 4, k = 8, sampleSize = 240, iterations = 6), 1)
    val codes = df.select(col("id"), Pq.encode(col("v"), cb).as("codes"))
    val queries = data.take(5).map { case (id, v) => (id, v) }
    val top = Pq.adcTopK(codes, "id", "codes", queries, cb, k = 10)
      .collect().groupBy(_.getLong(0))
    // ground truth: same-cluster members are the 29 nearest — ADC top-10
    // on well-separated clusters must stay within the query's cluster
    queries.foreach { case (qid, _) =>
      val neigh = top(qid).map(_.getLong(1))
      val sameCluster = neigh.count(n => n % 8 == qid % 8)
      assert(sameCluster >= 9, s"query $qid: only $sameCluster/10 in-cluster")
    }
  }

  test("Pq codes are partition-invariant") {
    val data = clusteredVecs(4, 25)
    val df = data.toDF("id", "v")
    val cb = Pq.train(df, "id", "v", m = 4, k = 4, sampleSize = 64, iterations = 4)
    val a = df.select(col("id"), Pq.encodeRounded(col("v"), cb).as("c"))
      .orderBy("id").collect().map(_.getSeq[Int](1).toSeq).toSeq
    val b = df.repartition(11)
      .select(col("id"), Pq.encodeRounded(col("v"), cb).as("c"))
      .orderBy("id").collect().map(_.getSeq[Int](1).toSeq).toSeq
    assert(a == b)
  }

  // ---- in-engine logistic regression ------------------------------------------

  private def lrFixture: (DataFrame, Seq[(Double, Array[Double])]) = {
    val rnd = new scala.util.Random(11)
    val rows = (0 until 400).map { i =>
      val x1 = rnd.nextDouble()
      val x2 = rnd.nextDouble()
      val y = if (x1 + 0.5 * x2 > 0.75) 1.0 else 0.0
      (y, 1.0, x1, x2)
    }
    (rows.toDF("y", "x0", "x1", "x2"),
      rows.map { case (y, a, b, c) => (y, Array(a, b, c)) })
  }

  test("QualityModel.train equals the in-memory reference trajectory exactly") {
    val (df, rows) = lrFixture
    val got = QualityModel.train(df.cache(), 3, lr = 2.0, steps = 5)
    val want = QualityModel.referenceTrain(rows, lr = 2.0, steps = 5)
    got.zip(want).zipWithIndex.foreach { case ((g, w), i) =>
      assert(g.toSeq == w.toSeq, s"step ${i + 1}")
    }
  }

  test("QualityModel training is partition-invariant (exact weights)") {
    val (df, _) = lrFixture
    val a = QualityModel.train(df.coalesce(1), 3, 2.0, 3).map(_.toSeq)
    val b = QualityModel.train(df.repartition(13), 3, 2.0, 3).map(_.toSeq)
    assert(a == b)
  }

  test("QualityModel log-loss decreases along the trajectory and beats chance") {
    val (df, _) = lrFixture
    val feat = df.cache()
    val traj = QualityModel.train(feat, 3, lr = 2.0, steps = 6)
    val panels = traj.map(w => QualityModel.evalPanel(feat, w).collect()(0))
    val losses = panels.map(_.getAs[Double]("logloss"))
    losses.sliding(2).foreach { case Seq(a, b) => assert(b < a, s"$losses") }
    val last = panels.last
    val acc = (last.getAs[Long]("tp") + last.getAs[Long]("tn")).toDouble / 400
    assert(acc > 0.7, s"accuracy $acc")
  }
}
