package graft

import org.apache.spark.sql.functions._

import graft.queries.Round7Queries

/** Invariant tests for the round-7 audit queries (q127–q134) over the
  * sf0.001 driver testdata — mathematical properties the oracle compare
  * cannot express (bounds, conservation, statistical identities).
  */
class Round7Spec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  test("q127 gopher rules: fail counts bounded, pass conservation") {
    val r = Round7Queries.q127GopherRules(spark, sf).collect()
    assert(r.nonEmpty)
    r.foreach { row =>
      val n = row.getAs[Long]("n_docs")
      val fails = Seq("fail_short", "fail_long", "fail_wordlen",
        "fail_stopword", "fail_ttr").map(row.getAs[Long])
      val pass = row.getAs[Long]("pass_all")
      fails.foreach(f => assert(f >= 0 && f <= n))
      // a doc passes iff it fails no rule → pass ≥ n − Σfails (union bound)
      assert(pass >= n - fails.sum)
      assert(pass <= n - fails.max)
      assert(math.abs(row.getAs[Double]("pass_rate") - pass.toDouble / n) < 1e-6)
    }
  }

  test("q128 KS drift: statistic within [0,1] and critical value positive") {
    val r = Round7Queries.q128KsDrift(spark, sf).collect()
    assert(r.nonEmpty)
    r.foreach { row =>
      val ks = row.getAs[Double]("ks_stat")
      assert(ks >= 0.0 && ks <= 1.0)
      assert(row.getAs[Double]("crit_05") > 0.0)
    }
  }

  test("q129 Heaps growth: half-vocab ⊆ vocab and β in [0,1] on real text") {
    val r = Round7Queries.q129VocabGrowth(spark, sf).collect()
    assert(r.nonEmpty)
    r.foreach { row =>
      assert(row.getAs[Long]("vocab_half") <= row.getAs[Long]("vocab"))
      val beta = row.getAs[Double]("heaps_beta")
      // vocab never shrinks → β ≥ 0; sub-linear growth → β ≤ 1
      assert(beta >= 0.0 && beta <= 1.0)
    }
  }

  test("q130 CUSUM: deviations sum to zero so max ≥ 0 ≥ min") {
    val r = Round7Queries.q130CusumChangepoint(spark, sf).collect()
    assert(r.nonEmpty)
    r.foreach { row =>
      // S_n = Σ(x−μ) = 0 exactly, so the path touches ≥0 and ≤0
      assert(row.getAs[Double]("s_max") >= -1e-6)
      assert(row.getAs[Double]("s_min") <= 1e-6)
      assert(row.getAs[Double]("cusum_range") >= 0.0)
      assert(row.getAs[String]("changepoint_day").matches("\\d{4}-\\d{2}-\\d{2}"))
    }
  }

  test("q131 padding efficiency: real ≤ padded, naive ≤ best bucket") {
    val rows = Round7Queries.q131PaddingEfficiency(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { row =>
      val real = row.getAs[Long]("real_tokens")
      val padded = row.getAs[Long]("padded_tokens")
      assert(real <= padded)
      val eff = row.getAs[Double]("bucket_efficiency")
      assert(eff > 0.0 && eff <= 1.0)
      // bucketing can only reduce padding vs pad-to-global-max within bucket
      assert(row.getAs[Double]("naive_efficiency") <= 1.0)
    }
    // conservation: Σ real_tokens over buckets = corpus total
    val total = rows.map(_.getAs[Long]("real_tokens")).sum
    val corpus = spark.read.parquet(s"$sf/documents.parquet")
      .select(sum(length(col("text")) -
        length(regexp_replace(col("text"), " ", "")) + lit(1)))
      .head.getLong(0)
    assert(total == corpus)
  }

  test("q132 centroid drift: cosine ≤ 1, halves partition the corpus") {
    val r = Round7Queries.q132CentroidDrift(spark, sf).collect()
    assert(r.length == 10) // 10 labels in driver testdata
    val nTotal = r.map(x =>
      x.getAs[Long]("n_even") + x.getAs[Long]("n_odd")).sum
    val corpus = spark.read.parquet(s"$sf/embeddings.parquet").count()
    assert(nTotal == corpus)
    r.foreach { row =>
      assert(row.getAs[Double]("centroid_cos") <= 1.0 + 1e-9)
      assert(row.getAs[Double]("centroid_l2") >= 0.0)
    }
  }

  test("q133 minhash accuracy: estimates in [0,1], monotone with truth") {
    val r = Round7Queries.q133MinhashAccuracy(spark, sf)
      .orderBy("j_decile").collect()
    assert(r.nonEmpty)
    r.foreach { row =>
      val est = row.getAs[Double]("mean_estimate")
      assert(est >= 0.0 && est <= 1.0)
      assert(row.getAs[Double]("mean_abs_err") <= 1.0)
      assert(row.getAs[Double]("max_abs_err") >= row.getAs[Double]("mean_abs_err"))
    }
    // mean estimate should track mean truth: highest decile ≥ lowest decile
    if (r.length >= 2) {
      assert(r.last.getAs[Double]("mean_estimate") >=
        r.head.getAs[Double]("mean_estimate"))
    }
  }

  test("q135 trimmed A/B: trims ≤ 20%+ε of each cohort, means inside band") {
    val r = Round7Queries.q135TrimmedAb(spark, sf).collect()
    assert(r.nonEmpty)
    r.foreach { row =>
      val na = row.getAs[Long]("n_a"); val ta = row.getAs[Long]("trimmed_a")
      val nb = row.getAs[Long]("n_b"); val tb = row.getAs[Long]("trimmed_b")
      // p10/p90 band keeps ≥ 80% of each cohort (interpolated bounds can
      // exclude at most ~20% plus the boundary ties)
      assert(ta.toDouble / (na + ta) <= 0.25, s"trimmed_a $ta of ${na + ta}")
      assert(tb.toDouble / (nb + tb) <= 0.25, s"trimmed_b $tb of ${nb + tb}")
      assert(math.abs(row.getAs[Double]("lift") -
        (row.getAs[Double]("tmean_a") - row.getAs[Double]("tmean_b"))) < 1e-9)
    }
  }

  test("q136 modal alignment: coverage = corpus, shares in (0,1]") {
    val r = Round7Queries.q136ModalAlignment(spark, sf).collect()
    assert(r.length == 10)
    val total = r.map(_.getAs[Long]("n_docs")).sum
    assert(total == spark.read.parquet(s"$sf/documents.parquet").count())
    r.foreach { row =>
      val share = row.getAs[Double]("top_lang_share")
      assert(share > 0.0 && share <= 1.0)
      assert(Set("en", "de", "fr", "es", "zh")(row.getAs[String]("top_lang")))
    }
  }

  test("q137 filter sweep: survivors monotone non-increasing in threshold") {
    val r = Round7Queries.q137FilterSweep(spark, sf).orderBy("threshold").collect()
    assert(r.nonEmpty)
    val docs = r.map(_.getAs[Long]("surviving_docs"))
    val toks = r.map(_.getAs[Long]("surviving_tokens"))
    assert(docs.zip(docs.tail).forall { case (a, b) => a >= b })
    assert(toks.zip(toks.tail).forall { case (a, b) => a >= b })
    // threshold 0 (lowest bucket present) keeps everything
    assertApprox(r.head.getAs[Double]("token_fraction"), 1.0, tol = 1e-9)
  }

  test("q138 chi-square: nonnegative, Cramér's V in [0,1], dof correct") {
    val r = Round7Queries.q138Chi2Independence(spark, sf).collect()
    assert(r.length == 1)
    val row = r.head
    assert(row.getAs[Double]("chi2") >= 0.0)
    val v = row.getAs[Double]("cramers_v")
    assert(v >= 0.0 && v <= 1.0)
    assert(row.getAs[Long]("dof") == (5 - 1) * (20 - 1))
  }

  test("q139 Wilson CI: interval contains point estimate, inside [0,1]") {
    val r = Round7Queries.q139WilsonCi(spark, sf).collect()
    // sf0.001 has few users: some of the 20 buckets may be empty
    assert(r.nonEmpty && r.length <= 20)
    r.foreach { row =>
      val p = row.getAs[Double]("conversion")
      val lo = row.getAs[Double]("wilson_lo")
      val hi = row.getAs[Double]("wilson_hi")
      assert(lo >= -1e-9 && hi <= 1.0 + 1e-9)
      assert(lo <= p + 1e-9 && p <= hi + 1e-9)
    }
  }

  test("q140 pivot: cell mass equals the event count") {
    val r = Round7Queries.q140PivotDaily(spark, sf).collect()
    assert(r.nonEmpty)
    val types = Seq("click", "error", "purchase", "signup", "view")
    val mass = r.map(row => types.map(row.getAs[Long]).sum).sum
    assert(mass == spark.read.parquet(s"$sf/events.parquet").count())
  }

  test("q141 range window: trailing frame ≤ 7 calendar days and ⊇ current") {
    val r = Round7Queries.q141RangeWindow(spark, sf).collect()
    assert(r.nonEmpty)
    r.foreach { row =>
      val days = row.getAs[Long]("trail7_days")
      assert(days >= 1 && days <= 7)
      assert(row.getAs[Long]("trail7_events") >= row.getAs[Long]("n_events"))
    }
  }

  test("q134 Welch A/B: df between min(n)−1 and n_a+n_b−2, cohorts partition") {
    val r = Round7Queries.q134WelchAb(spark, sf).collect()
    assert(r.nonEmpty)
    val nTotal = r.map(x => x.getAs[Long]("n_a") + x.getAs[Long]("n_b")).sum
    val corpus = spark.read.parquet(s"$sf/events.parquet").count()
    assert(nTotal == corpus)
    r.foreach { row =>
      val na = row.getAs[Long]("n_a"); val nb = row.getAs[Long]("n_b")
      val df = row.getAs[Double]("welch_df")
      // Welch–Satterthwaite bounds
      assert(df >= math.min(na, nb) - 1 - 1e-6)
      assert(df <= na + nb - 2 + 1e-6)
      assert(!row.getAs[Double]("t_stat").isNaN)
    }
  }
}
