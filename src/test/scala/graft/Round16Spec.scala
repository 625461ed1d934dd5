package graft

import java.security.MessageDigest

import org.apache.spark.sql.functions._

import graft.ext.{Dedup, Similarity}

/** Round-16 family (driver round 11, second wave): segment dedup with
  * document reconstruction, winnowing fingerprints, set-containment join,
  * retrieval evaluation. Each operator is pinned against an independent
  * plain-Scala brute-force reference on randomized corpora (deterministic
  * seeds) plus hand-constructed contract cases.
  */
class Round16Spec extends SparkSpec {
  import spark.implicits._

  private def md5hex(s: String): String =
    MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString

  // ---- segment dedup + rebuild ----------------------------------------------

  test("dedupSegmentsRebuild keeps first occurrences and rebuilds text") {
    val docs = Seq(
      (0L, "t1 t2 t3 t4 u1 u2 u3 u4"), // segs: [t1..t4], [u1..u4]
      (1L, "t1 t2 t3 t4 v1 v2"),       // seg0 duplicates doc0's seg0
      (2L, "w1 w2 w3"),                // single short segment, unique
      (3L, "u1 u2 u3 u4")              // whole doc duplicates doc0's seg1
    ).toDF("doc_id", "text")
    val got = Dedup.dedupSegmentsRebuild(docs, "doc_id", "text", segTokens = 4)
      .orderBy("id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
    assert(got(0) == ((0L, 2L, 2L, "t1 t2 t3 t4 u1 u2 u3 u4")))
    assert(got(1) == ((1L, 2L, 1L, "v1 v2")))
    assert(got(2) == ((2L, 1L, 1L, "w1 w2 w3")))
    assert(got(3) == ((3L, 1L, 0L, "")))
  }

  test("dedupSegmentsRebuild matches a plain-Scala reference on a random corpus") {
    val rnd = new scala.util.Random(16001)
    val vocab = Vector("a", "b", "c", "d", "e")
    val docs = (0L until 40L).map { id =>
      val n = 1 + rnd.nextInt(20)
      (id, Seq.fill(n)(vocab(rnd.nextInt(vocab.size))).mkString(" "))
    }
    val seg = 3
    // reference: first occurrence under (id, segIdx) order
    val seen = scala.collection.mutable.Set.empty[String]
    val expect = docs.map { case (id, text) =>
      val segs = text.split(" ", -1).grouped(seg).map(_.mkString(" ")).toVector
      val kept = segs.filter(s => seen.add(md5hex(s)))
      (id, segs.size.toLong, kept.size.toLong, kept.mkString(" "))
    }
    val got = Dedup.dedupSegmentsRebuild(docs.toDF("doc_id", "text"), "doc_id",
      "text", segTokens = seg).orderBy("id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
    assert(got.toSeq == expect)
  }

  // ---- winnowing --------------------------------------------------------------

  /** Plain-Scala winnowing reference: same 40-bit md5 k-gram hash, same
    * key encoding, rightmost-tie window minima.
    */
  private def winnowRef(text: String, k: Int, w: Int): Set[(Int, Long)] = {
    val t = text.split(" ", -1)
    if (t.length < k) return Set.empty
    val keys = (0 to t.length - k).map { i =>
      val hv = java.lang.Long.parseLong(
        md5hex(t.slice(i, i + k).mkString(" ")).take(10), 16)
      hv * 1048576L + (1048575L - i)
    }
    val nk = keys.length
    val sel = (0 to math.max(nk - w, 0)).map(p =>
      keys.slice(p, math.min(p + w, nk)).min).distinct
    sel.map(key => ((1048575L - (key & 1048575L)).toInt, key >> 20)).toSet
  }

  test("winnowFingerprints matches the plain-Scala reference on a random corpus") {
    val rnd = new scala.util.Random(16002)
    val vocab = Vector("x", "y", "z", "p", "q", "r")
    val docs = (0L until 30L).map { id =>
      val n = rnd.nextInt(30) // includes docs shorter than k
      (id, Seq.fill(n)(vocab(rnd.nextInt(vocab.size))).mkString(" "))
    }
    val got = Dedup.winnowFingerprints(docs.toDF("doc_id", "text"), "doc_id",
      "text", k = 4, w = 3).collect()
      .map(r => (r.getLong(0), (r.getInt(1), r.getLong(2))))
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    docs.foreach { case (id, text) =>
      val exp = winnowRef(text, 4, 3)
      assert(got.getOrElse(id, Set.empty) == exp, s"doc $id: '$text'")
    }
  }

  test("winnowing guarantee: a shared (w+k-1)-token run yields a shared fingerprint") {
    // k=5, w=4: any shared run of 8 tokens must share >= 1 fingerprint hash
    val shared = "s1 s2 s3 s4 s5 s6 s7 s8"
    val docs = Seq(
      (0L, s"a1 a2 a3 $shared a4 a5"),
      (1L, s"b1 $shared b2 b3 b4 b5 b6")).toDF("doc_id", "text")
    val fp = Dedup.winnowFingerprints(docs, "doc_id", "text", k = 5, w = 4)
      .collect().map(r => (r.getLong(0), r.getLong(2)))
    val h0 = fp.filter(_._1 == 0L).map(_._2).toSet
    val h1 = fp.filter(_._1 == 1L).map(_._2).toSet
    assert((h0 & h1).nonEmpty)
  }

  test("winnowFingerprints is row-local: no shuffle below the fingerprint rows") {
    val docs = (0L until 8L).map(i => (i, s"t$i u v w x y z")).toDF("doc_id", "text")
    val plan = Dedup.winnowFingerprints(docs, "doc_id", "text")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), plan)
  }

  // ---- containment join -------------------------------------------------------

  test("containmentPairs matches brute force on random sets (t=0.5 and t=0.8)") {
    val rnd = new scala.util.Random(16003)
    val sets = (0L until 50L).map { id =>
      val n = 1 + rnd.nextInt(25)
      (id, Seq.fill(n)(rnd.nextInt(60).toLong).distinct.toArray)
    }
    val df = sets.toDF("id", "sset")
    for (t <- Seq(0.5, 0.8)) {
      // same round-guarded ceiling as the implementation
      def req(sz: Int): Int = math.ceil(BigDecimal(t * sz)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble).toInt
      val expect = (for {
        (a, sa) <- sets; (b, sb) <- sets if a != b
        inter = sa.toSet.intersect(sb.toSet).size
        if inter >= req(sa.length)
      } yield (a, b, sa.length, inter)).toSet
      val got = Dedup.containmentPairs(df, t).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getInt(2), r.getInt(3))).toSet
      assert(got == expect, s"t=$t: got ${got.size}, want ${expect.size}")
    }
  }

  test("containmentPairs finds asymmetric inclusion that Jaccard misses") {
    // A (5 elems) fully inside B (40 elems): containment(A,B)=1, J=0.125
    val a = (0L until 5L).toArray
    val b = (0L until 40L).toArray
    val df = Seq((0L, a), (1L, b)).toDF("id", "sset")
    val pairs = Dedup.containmentPairs(df, 0.9).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(4)))
    assert(pairs.toSeq == Seq((0L, 1L, 1.0))) // only A→B, not B→A
  }

  // ---- conformal calibration contract -------------------------------------------

  test("q239 conformal machinery: q-hat is the exact order statistic and coverage follows") {
    // plain-Scala reference of the calibration rule on synthetic scores
    val rnd = new scala.util.Random(16007)
    val cal = (0L until 97L).map(i => (i, math.rint(rnd.nextDouble() * 1e6) / 1e6))
    val eval = (100L until 300L).map(i => (i, math.rint(rnd.nextDouble() * 1e6) / 1e6))
    val alpha = 0.1
    val k = math.ceil((cal.size + 1) * (1 - alpha)).toInt
    val qHatRef = cal.sortBy(c => (c._2, c._1)).apply(k - 1)._2
    val covRef = eval.count(_._2 <= qHatRef).toDouble / eval.size

    import org.apache.spark.sql.expressions.Window
    val calDf = cal.toDF("doc_id", "s")
    val w = Window.orderBy(col("s"), col("doc_id"))
    val qHat = calDf.withColumn("rn", row_number().over(w))
      .filter(col("rn") === k).select("s").collect().head.getDouble(0)
    assert(qHat == qHatRef)
    val cov = eval.toDF("doc_id", "s")
      .agg(avg((col("s") <= qHat).cast("double"))).collect().head.getDouble(0)
    assert(cov == covRef)
    // the finite-sample guarantee direction: q-hat rank covers >= (1-a) of
    // the calibration scores themselves by construction
    assert(cal.count(_._2 <= qHatRef) >= k - 1)
  }

  // ---- plan pins ----------------------------------------------------------------

  test("containment join plans without cartesian products or nested loops") {
    val rnd = new scala.util.Random(16006)
    val sets = (0L until 200L).map { id =>
      (id, Seq.fill(20)(rnd.nextInt(4000).toLong).distinct.toArray)
    }.toDF("id", "sset")
    val plan = Dedup.containmentPairs(sets, 0.5)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"), plan)
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan)
  }

  test("retrievalEval broadcasts the query side; candidate windows partition per query") {
    val vecs = (0L until 64L).map(i =>
      (i, Array.fill(8)(((i * 31 + 7) % 13).toFloat - 6f))).toDF("vec_id", "embedding")
    val plan = Similarity.retrievalEval(vecs, "vec_id", "embedding",
      col("vec_id") < 4, k = 5, bucketBits = 6)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastExchange"), plan)
    assert(!plan.contains("CartesianProduct"), plan)
    // every Window sorts within a query_id partition, never globally
    assert(!plan.contains("Exchange SinglePartition, ENSURE_REQUIREMENTS"), plan)
  }

  // ---- fused PQ encoder ≡ unrolled reference ----------------------------------

  test("PqEncodeRounded (fused loop) ≡ the unrolled-chain encode on real + random vectors") {
    import graft.ext.Pq
    val e = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
    val cbRows = e.filter(col("vec_id") < 16).orderBy("vec_id")
      .collect().map(_.getSeq[Double](1).toArray)
    val cb = Pq.Codebook(16, 16, 4, Array.tabulate(16)(s =>
      cbRows.map(x => x.slice(s * 4, (s + 1) * 4))))
    val rnd = new scala.util.Random(16004)
    val fuzz = (1000L until 1200L).map(i =>
      (i, Array.fill(64)(rnd.nextDouble() * 4 - 2))).toDF("vec_id", "v")
    // short vectors: truncated subspaces must agree too (both emit code 0)
    val short = (2000L until 2050L).map(i =>
      (i, Array.fill(1 + rnd.nextInt(64))(rnd.nextDouble() * 4 - 2)))
      .toDF("vec_id", "v")
    for (df <- Seq(e, fuzz, short)) {
      val both = df.select(col("vec_id"),
        Pq.encodeRounded(col("v"), cb).as("fused"),
        Pq.encodeRoundedUnrolled(col("v"), cb).as("unrolled"))
        .filter(not(col("fused") === col("unrolled")))
      assert(both.count() == 0)
    }
  }

  // ---- Φ⁻¹ twins ----------------------------------------------------------------

  test("invCdfCol matches the scalar AS241 invCdf across branches") {
    import graft.core.Dist
    val ps = (Seq(1e-12, 1e-9, 1e-6, 2e-4, 0.01, 0.2, 0.499, 0.5, 0.501,
      0.8, 0.99, 1 - 2e-4, 1 - 1e-6, 1 - 1e-9) ++
      (1 to 200).map(i => i / 201.0)).distinct
    val got = ps.toDF("p").select(col("p"), Dist.invCdfCol(col("p")).as("x"))
      .collect().map(r => r.getDouble(0) -> r.getDouble(1)).toMap
    ps.foreach { p =>
      val exp = Dist.invCdf(p)
      if (math.abs(p - 0.5) <= 0.425) {
        // central branch is pure rational arithmetic → bit-exact
        assert(got(p) == exp, s"p=$p: ${got(p)} vs $exp")
      } else {
        // tail branch goes through ln: Spark's Log is StrictMath.log, the
        // scalar uses Math.log — they may differ in the last ulp (the gate
        // tolerance is round-6; this pin is a few ulps)
        assert(math.abs(got(p) - exp) <= 4 * math.ulp(exp),
          s"p=$p: ${got(p)} vs $exp")
      }
    }
  }

  // ---- retrieval eval ----------------------------------------------------------

  test("retrievalEval: perfect retriever scores 1.0 everywhere") {
    // 12 vectors, all in the same 6-bit sign bucket → candidates = corpus
    val vecs = (0L until 12L).map { i =>
      (i, Array(1f, 0.1f * i, 0.5f, 0.5f, 0.5f, 0.5f, 0f, 0f))
    }
    val df = vecs.toDF("vec_id", "embedding")
    val r = Similarity.retrievalEval(df, "vec_id", "embedding",
      col("vec_id") === 0, k = 10, bucketBits = 6).collect().head
    assert(r.getLong(1) == 11L) // n_candidates
    assert(r.getDouble(2) == 1.0 && r.getDouble(3) == 1.0 && r.getDouble(4) == 1.0)
  }

  test("retrievalEval: a bucket miss costs exactly the expected recall/NDCG") {
    // id1 is the top-1 ground-truth neighbor but sits in another sign bucket
    val vecs = (0L until 12L).map { i =>
      val v2 = if (i == 1L) -1e-4f else 0.5f
      (i, Array(1f, 0.1f * i, v2, 0.5f, 0.5f, 0.5f, 0f, 0f))
    }
    // cosine with q=(1,0,...) decreases as i grows → GT = ids 1..10; the
    // bucketed retriever sees ids 2..11, all relevant except 11 at rank 10
    val df = vecs.toDF("vec_id", "embedding")
    val r = Similarity.retrievalEval(df, "vec_id", "embedding",
      col("vec_id") === 0, k = 10, bucketBits = 6).collect().head
    assert(r.getLong(1) == 10L)
    assert(r.getDouble(2) == 0.9) // recall
    assert(r.getDouble(3) == 1.0) // first retrieved is relevant
    def log2(x: Double) = math.log(x) / math.log(2.0)
    val idcg = (1 to 10).map(i => 1.0 / log2(i + 1.0)).sum
    val dcg = (1 to 9).map(i => 1.0 / log2(i + 1.0)).sum
    assert(math.abs(r.getDouble(4) - math.rint(dcg / idcg * 1e6) / 1e6) < 1e-9)
  }
}
