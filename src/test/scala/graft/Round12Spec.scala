package graft

import org.apache.spark.sql.functions._

import graft.ext.Bpe

/** Round-12 guards for the production-shaped BPE: the pre-tokenizer's
  * letter/digit/punctuation-run splitting, the U+001F exclusion guarantee
  * (ADVICE r8: a corpus word containing the separator must not silently
  * corrupt token boundaries), and the subword regime on out-of-vocabulary
  * punctuated/unicode text — none of which the synthetic corpus (31 bare
  * lowercase words) exercises. Engine Column path vs the Scala twin are
  * asserted equal; the DuckDB oracle replay equality is the driver's
  * q208/q209 gate.
  */
class Round12Spec extends SparkSpec {
  import spark.implicits._

  test("preTokenize splits letter/digit/punctuation runs and drops U+001F") {
    assert(Bpe.preTokenize("don't stop!") == Seq("don", "'", "t", "stop", "!"))
    assert(Bpe.preTokenize("v2.0-rc1") == Seq("v", "2", ".", "0", "-", "rc", "1"))
    assert(Bpe.preTokenize("  spaced\tout\n") == Seq("spaced", "out"))
    assert(Bpe.preTokenize("café 駱駝 123") ==
      Seq("café", "駱駝", "123"))
    assert(Bpe.preTokenize("--== ?!") == Seq("--==", "?!"))
    // The separator can never survive pre-tokenization: it is excluded from
    // every character class, so it acts as a hard token boundary.
    assert(Bpe.preTokenize("ab\u001Fcd") == Seq("ab", "cd"))
    assert(Bpe.preTokenize("\u001F") == Nil)
    assert(Bpe.preTokenize("") == Nil)
  }

  test("Column pre-tokenizer matches the Scala twin on mixed text") {
    val texts = Seq("don't stop! v2.0-rc1", "café --== 42",
      "spark\u001Fjoin window", "", "   ", "...punct...only...")
    val got = texts.toDF("t").select(Bpe.preTokens(col("t")).as("p"))
      .collect().map(_.getSeq[String](0).toSeq)
    texts.zip(got).foreach { case (t, g) =>
      assert(g == Bpe.preTokenize(t), s"mismatch on '$t'")
    }
  }

  test("engine token counts equal the Scala reference on OOV subwords") {
    // None of these words are in the 31-word training vocabulary; they must
    // decompose through the merge table into genuine subword sequences.
    val words = Seq("sparkling", "partition", "reorder", "customers",
      "streaming", "tablecloth", "valueless", "windows", "déjà",
      "12345", "?!--", "q", "x", "joinjoin")
    val got = words.toDF("w")
      .select(col("w"), Bpe.tokenCountCol(col("w")).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    words.foreach { w =>
      assert(got(w) == Bpe.tokenCount(w).toLong,
        s"'$w': engine ${got(w)} vs scala ${Bpe.tokenCount(w)} " +
          s"(${Bpe.encodeWord(w).mkString("|")})")
    }
    // Spot-check real subword decompositions (not all-chars, not one-token)
    assert(Bpe.encodeWord("sparkling") == Seq("spark", "l", "in", "g"))
    assert(Bpe.encodeWord("customers") == Seq("customer", "s"))
    assert(Bpe.encodeWord("streaming") == Seq("stream", "in", "g"))
  }

  test("trained-vocabulary words match the trainer's end state") {
    // From the BpeTrain sf0.1 run that produced Bpe.Merges: saturated words
    // are one token; these stay multi-token at 60 merges.
    assert(Bpe.encodeWord("customer") == Seq("customer"))
    assert(Bpe.encodeWord("window") == Seq("window"))
    assert(Bpe.encodeWord("fast") == Seq("f", "a", "st"))
    assert(Bpe.encodeWord("order") == Seq("or", "d", "er"))
    assert(Bpe.encodeWord("query") == Seq("q", "u", "er", "y"))
    assert(Bpe.encodeWord("scan") == Seq("s", "c", "a", "n"))
  }

  test("replace-chain encoding is equivalent to the exact symbol merge scan") {
    // The trainer merges symbol VECTORS (exact adjacency); the runtime
    // merges separator-wrapped STRINGS via literal replace. The round-8
    // prefix-only encoding silently diverged on patterns whose second
    // symbol was a prefix of a longer neighbor ("fast" → f|ast); the
    // wrapped encoding must agree with the exact scan on every input,
    // including adjacent-pair runs and repeated characters.
    def mergeScan(w: String): Seq[String] = {
      var syms: Vector[String] = w.map(_.toString).toVector
      Bpe.Merges.foreach { case (a, b) =>
        val out = Vector.newBuilder[String]
        var i = 0
        while (i < syms.length) {
          if (i + 1 < syms.length && syms(i) == a && syms(i + 1) == b) {
            out += (a + b); i += 2
          } else { out += syms(i); i += 1 }
        }
        syms = out.result()
      }
      syms
    }
    val vocab = Seq("a", "agg", "batch", "big", "column", "customer", "data",
      "dup", "fast", "filter", "group", "hash", "join", "key", "line",
      "merge", "order", "part", "query", "row", "scan", "slow", "small",
      "sort", "spark", "stream", "table", "the", "value", "vector", "window")
    val adversarial = Seq("aaaa", "erer", "inin", "stst", "aststast",
      "sparkspark", "ssssst", "windowwindow", "merger", "partss",
      "astast", "erereர", "xyzzy", "ost", "aost", "fastfast")
    (vocab ++ adversarial).foreach { w =>
      assert(Bpe.encodeWord(w) == mergeScan(w),
        s"'$w': replace ${Bpe.encodeWord(w).mkString("|")} vs " +
          s"scan ${mergeScan(w).mkString("|")}")
    }
  }

  test("LangId: Column trigrams match the Scala twin, incl. short texts") {
    import graft.ext.LangId
    val texts = Seq("Hello world", "ab", "a", "", "  ", "早上好",
      "Mixed 中文 and English!", "Straße élève mañana")
    val got = texts.toDF("t").select(LangId.trigramsCol(col("t")).as("g"))
      .collect().map(_.getSeq[String](0).toSeq)
    texts.zip(got).foreach { case (t, g) =>
      assert(g == LangId.trigrams(t), s"trigram mismatch on '$t'")
    }
  }

  test("LangId: distributed classify matches the Scala twin on the fixture") {
    import graft.ext.LangId
    val fixture = LangId.EvalFixture.toDF("id", "label", "text")
    val preds = LangId.classify(fixture, "id", col("text"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    LangId.EvalFixture.foreach { case (id, label, text) =>
      val scala = LangId.classifyOne(text)
      assert(preds(id) == scala, s"doc $id: engine ${preds(id)} vs scala $scala")
      assert(preds(id) == label, s"doc $id ('$text') misclassified as ${preds(id)}")
    }
    // trigram-less text (normalized "" is 2 chars) → und on both paths
    val und = LangId.classify(Seq((99L, "")).toDF("id", "text"), "id", col("text"))
      .head().getString(1)
    assert(und == "und" && LangId.classifyOne("") == "und")
    // the row-local literal-map variant agrees with the grouped join path
    val rowLocal = fixture.select(col("id"), LangId.predictCol(col("text")).as("p"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    LangId.EvalFixture.foreach { case (id, _, text) =>
      assert(rowLocal(id) == LangId.classifyOne(text),
        s"predictCol($id) = ${rowLocal(id)}")
    }
    assert(fixture.sparkSession.range(1).select(
      LangId.predictCol(lit("")).as("p")).head().getString(0) == "und")
  }

  test("DDSketch: relative-α accuracy vs exact discrete quantiles, incl. negatives/zeros") {
    import graft.functions.DDSketchAgg
    val alpha = 0.01
    val agg = new DDSketchAgg.Quantiles(alpha, Seq(0.1, 0.5, 0.9, 0.99))
    // deterministic pseudo-random multiset spanning 5 orders of magnitude,
    // with planted zeros and negatives
    def h(i: Int): Double = {
      val u = ((i * 2654435761L) & 0xFFFFFFFFL).toDouble / 4294967296.0
      math.exp(u * 11.0 - 4.0) // ~e^-4 .. e^7
    }
    val values = (0 until 20000).map(h) ++ Seq.fill(500)(0.0) ++
      (0 until 2000).map(i => -h(i + 7))
    val buf = values.foldLeft(agg.zero)(agg.reduce)
    val sorted = values.sorted
    Seq(0.1, 0.5, 0.9, 0.99).foreach { q =>
      val est = agg.quantile(buf, q)
      val exact = sorted(math.floor(q * (values.size - 1)).toInt) // rank ⌊q(n−1)⌋+1, 0-based
      if (exact == 0.0) assert(est == 0.0)
      else assert(math.abs(est / exact - 1.0) <= alpha + 1e-12,
        s"q=$q est=$est exact=$exact relerr=${math.abs(est / exact - 1.0)}")
    }
  }

  test("DDSketch: merge-order-invariant — identical estimates under any partitioning") {
    import graft.functions.DDSketchAgg
    import org.apache.spark.sql.Encoders
    val agg = new DDSketchAgg.Quantiles(0.01, Seq(0.5, 0.95))
    val sk = udaf(agg, Encoders.scalaDouble)
    val vals = (1 to 30000).map(i => ((i * 40503) % 9973 + 1).toDouble)
    def run(parts: Int): Seq[Double] =
      vals.toDF("v").repartition(parts).agg(sk(col("v"))).head().getSeq[Double](0).toSeq
    val p1 = run(1)
    assert(p1 == run(7) && p1 == run(32), "estimates changed with partitioning")
    // and the distributed result equals the scalar fold
    val scalarBuf = vals.foldLeft(agg.zero)(agg.reduce)
    assert(p1 == agg.finish(scalarBuf))
  }

  test("DDSketch: maxBuckets collapse bounds memory, degrades only the low end") {
    import graft.functions.DDSketchAgg
    val agg = new DDSketchAgg.Quantiles(0.01, Seq(0.05, 0.95), maxBuckets = 64)
    val values = (0 until 5000).map(i => math.exp((i % 1000) / 40.0)) // e^0..e^25
    val buf = values.foldLeft(agg.zero)(agg.reduce)
    val out = agg.finish(buf)
    assert(out.last <= 64.0, s"bucket bound broken: ${out.last}")
    val sorted = values.sorted
    val exact95 = sorted(math.floor(0.95 * (values.size - 1)).toInt)
    // high quantiles keep the α guarantee; low ones land in the collapsed
    // bucket and only satisfy est >= exact (collapse merges upward)
    assert(math.abs(out(1) / exact95 - 1.0) <= 0.01 + 1e-12)
    val exact05 = sorted(math.floor(0.05 * (values.size - 1)).toInt)
    assert(out(0) >= exact05 * 0.99)
  }

  test("as-of join with DUPLICATE right timestamps is deterministic (greatest value wins)") {
    import graft.core.AsOfJoin
    // three right rows share ts=5; without a total tie order the winner
    // would be whichever row the shuffle placed last
    val left = Seq((10L, "a"), (5L, "b"), (7L, "c")).toDF("ts", "tag")
    val right = Seq((5L, 1.0), (5L, 9.0), (5L, 4.0), (6L, 2.0)).toDF("ts", "v")
    def run(parts: Int): Map[String, Double] =
      AsOfJoin.backward(left.repartition(parts), right.repartition(parts),
          "ts", "ts", Seq("v"))
        .collect().map(r => r.getString(1) -> r.getDouble(2)).toMap
    val expected = Map("b" -> 9.0, "c" -> 2.0, "a" -> 2.0)
    (1 to 8).foreach(p => assert(run(p) == expected, s"parts=$p: ${run(p)}"))
  }

  test("composed curation pipeline invariants hold at 50k docs (CI-scale probe)") {
    // The 10M run is the BASELINE.md artifact; this keeps the same staged
    // invariants (exact planted survivor counts, per-stage shuffle bounds,
    // budget fill) gating every `sbt test`. run() asserts internally.
    graft.tools.PipelineScaleProbe.run(spark, 50000L, cores = 4)
  }

  test("docTokenCounts equals brute-force on punctuated text, 0 for empty") {
    val docs = Seq(
      (1L, "don't stop the stream!"),
      (2L, "v2.0: faster scans, 10x smaller windows"),
      (3L, ""),
      (4L, "\u001F"),               // separator-only text → zero tokens
      (5L, "spark\u001Fjoin"),      // embedded separator → two clean words
      (6L, "?!")
    ).toDF("doc_id", "text")
    val got = Bpe.docTokenCounts(docs, "doc_id", col("text"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val expected = Seq(
      (1L, "don't stop the stream!"),
      (2L, "v2.0: faster scans, 10x smaller windows"),
      (3L, ""), (4L, "\u001F"), (5L, "spark\u001Fjoin"), (6L, "?!")
    ).map { case (id, t) =>
      id -> Bpe.preTokenize(t).map(Bpe.tokenCount).sum.toLong
    }.toMap
    assert(got == expected, s"got $got expected $expected")
    assert(got(3L) == 0L && got(4L) == 0L)
    assert(got(5L) == Bpe.tokenCount("spark") + Bpe.tokenCount("join"))
  }
}
