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
