package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Word-trigram language model with stupid backoff (Brants et al. 2007,
  * "Large Language Models in Machine Translation" — the score designed
  * for DISTRIBUTED n-gram models: no discounting renormalization, so
  * counts are plain aggregations and scoring is plain joins), used as a
  * KenLM/CCNet-style perplexity quality filter: documents whose text the
  * corpus LM finds surprising score high, templated/duplicated text
  * scores low.
  *
  * Score of token w₃ in context (w₁,w₂), with λ = 0.4 per backoff level:
  *   S = c(w₁w₂w₃)/c(w₁w₂)          if the trigram was seen
  *     = λ·c(w₂w₃)/c(w₂)            else if the bigram was seen
  *     = λ²·c(w₃)/T                 else if the unigram was seen
  *     = λ²·1/T                     else (OOV, scored as a count-1 word)
  * Only positions with a full two-token context are scored (no
  * sentence-boundary padding), so a document scores over max(n−2, 0)
  * tokens. The per-document score is the mean of −ln S (nats/token —
  * log-perplexity under the backoff model).
  *
  * Train/score separation: the model is counted over the md5-bucket
  * train half ([[Splits.bucket]] < 50) and scores the held-out half —
  * self-scoring a corpus LM on its own training rows can never back
  * off (every occurrence counts itself), which would silence exactly
  * the code paths the filter exists for.
  *
  * Scale shape: counting is tokenize → explode → keyed aggregations
  * (map-side partial); scoring is keyed equi-joins of the scored half's
  * (w₁,w₂,w₃) occurrence stream against the three count tables. NO
  * broadcast assumption on the trigram/bigram tables — at open-vocabulary
  * corpus scale they are corpus-sized and the joins shuffle on their keys
  * (Brants's point: stupid backoff needs no global renormalization pass,
  * so a sharded model serves lookups by key); the unigram table is
  * vocabulary-sized and broadcastable. Exact-integer backoff-level
  * counters ride along with the float score so the gate pins the
  * branch decisions exactly.
  */
object NgramLm {

  /** Backoff multiplier per level (Brants et al. use 0.4 throughout). */
  val Lambda = 0.4

  /** (doc_id, pos, w) token stream — lowercase whitespace tokens, the
    * same tokenization as the rest of the text family. */
  def tokenStream(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs.select(col(idCol).as("doc_id"),
        posexplode(split(lower(col(textCol)), "\\s+")).as(Seq("pos", "w")))
      .filter(col("w") =!= "")

  /** Trigram occurrences of each document: (doc_id, pos, w1, w2, w3) for
    * every position ≥ 2, via a doc-keyed lag window (partitioned by
    * doc_id — never global). */
  def trigramStream(tok: DataFrame): DataFrame = {
    val w = Window.partitionBy("doc_id").orderBy("pos")
    tok
      .withColumn("w2", lag(col("w"), 1).over(w))
      .withColumn("w1", lag(col("w"), 2).over(w))
      .filter(col("w1").isNotNull)
      .select(col("doc_id"), col("pos"),
        col("w1"), col("w2"), col("w").as("w3"))
  }

  /** The three count tables + total-token count of a training corpus.
    * Returned frames: uni(w, c1), bi(w1, w2, c2), tri(w1, w2, w3, c3),
    * tot(__T). */
  def countModel(docs: DataFrame, idCol: String, textCol: String)
      : (DataFrame, DataFrame, DataFrame, DataFrame) = {
    val tok = tokenStream(docs, idCol, textCol)
    val uni = tok.groupBy(col("w")).agg(count(lit(1)).as("c1"))
    val w = Window.partitionBy("doc_id").orderBy("pos")
    val withPrev = tok.withColumn("wp", lag(col("w"), 1).over(w))
    val bi = withPrev.filter(col("wp").isNotNull)
      .groupBy(col("wp").as("w1"), col("w").as("w2"))
      .agg(count(lit(1)).as("c2"))
    val tri = trigramStream(tok)
      .groupBy("w1", "w2", "w3").agg(count(lit(1)).as("c3"))
    val tot = uni.agg(sum(col("c1")).as("__T"))
    (uni, bi, tri, tot)
  }

  /** Per-document LM panel of `scored` under the model counted from
    * `train`: doc_id plus exact backoff-level counters (n_scored,
    * n_tri, n_bi, n_uni, n_oov) and `nats` = Σ −ln S (unrounded; one
    * float sum per doc — callers round at the edge). Documents with
    * fewer than 3 tokens appear with n_scored = 0 and nats = 0.
    */
  def scoreDocs(train: DataFrame, scored: DataFrame,
      idCol: String, textCol: String): DataFrame = {
    val (uni, bi, tri, tot) = countModel(train, idCol, textCol)
    val occ = trigramStream(tokenStream(scored, idCol, textCol))
    val looked = occ
      .join(tri, Seq("w1", "w2", "w3"), "left")
      .join(bi.select(col("w1"), col("w2"), col("c2").as("ctx2")),
        Seq("w1", "w2"), "left")
      .join(bi.select(col("w1").as("w2"), col("w2").as("w3"),
        col("c2").as("c2b")), Seq("w2", "w3"), "left")
      .join(broadcast(uni.select(col("w").as("w2"), col("c1").as("ctx1"))),
        Seq("w2"), "left")
      .join(broadcast(uni.select(col("w").as("w3"), col("c1").as("c1w"))),
        Seq("w3"), "left")
      .crossJoin(broadcast(tot))
    // branch level first (exact), then the per-row score S on that branch
    val level = when(col("c3").isNotNull, lit(0))
      .when(col("c2b").isNotNull, lit(1))
      .when(col("c1w").isNotNull, lit(2))
      .otherwise(lit(3))
    val s = when(col("c3").isNotNull,
        col("c3").cast("double") / col("ctx2"))
      .when(col("c2b").isNotNull,
        lit(Lambda) * col("c2b") / col("ctx1"))
      .when(col("c1w").isNotNull,
        lit(Lambda * Lambda) * col("c1w") / col("__T"))
      .otherwise(lit(Lambda * Lambda) / col("__T"))
    val perTok = looked.select(col("doc_id"), level.as("lvl"), (-log(s)).as("nll"))
    val perDoc = perTok.groupBy("doc_id").agg(
      count(lit(1)).as("n_scored"),
      sum(when(col("lvl") === 0, 1L).otherwise(0L)).as("n_tri"),
      sum(when(col("lvl") === 1, 1L).otherwise(0L)).as("n_bi"),
      sum(when(col("lvl") === 2, 1L).otherwise(0L)).as("n_uni"),
      sum(when(col("lvl") === 3, 1L).otherwise(0L)).as("n_oov"),
      sum(col("nll")).as("nats"))
    // short docs (< 3 tokens) still belong to the panel: zero-scored
    scored.select(col(idCol).as("doc_id"))
      .join(perDoc, Seq("doc_id"), "left")
      .na.fill(0L, Seq("n_scored", "n_tri", "n_bi", "n_uni", "n_oov"))
      .na.fill(0.0, Seq("nats"))
  }

  /** In-memory reference scorer (tests): same tokenization, counts,
    * backoff and arithmetic as the DataFrame path. Returns
    * (n_scored, n_tri, n_bi, n_uni, n_oov, nats) per scored doc id. */
  def referenceScore(train: Seq[String], scored: Seq[(Long, String)])
      : Map[Long, (Long, Long, Long, Long, Long, Double)] = {
    def toks(s: String): Seq[String] =
      s.toLowerCase.split("\\s+").filter(_.nonEmpty).toSeq
    val trainToks = train.map(toks)
    val uni = trainToks.flatten.groupBy(identity).map { case (k, v) => k -> v.size.toLong }
    val bi = trainToks.flatMap(t => t.zip(t.drop(1)))
      .groupBy(identity).map { case (k, v) => k -> v.size.toLong }
    val tri = trainToks.flatMap(t => t.zip(t.drop(1)).zip(t.drop(2))
        .map { case ((a, b), c) => (a, b, c) })
      .groupBy(identity).map { case (k, v) => k -> v.size.toLong }
    val t = uni.values.sum.toDouble
    scored.map { case (id, text) =>
      val tk = toks(text)
      val trips = tk.zip(tk.drop(1)).zip(tk.drop(2)).map { case ((a, b), c) => (a, b, c) }
      var (nTri, nBi, nUni, nOov) = (0L, 0L, 0L, 0L)
      var nats = 0.0
      trips.foreach { case (w1, w2, w3) =>
        val s =
          if (tri.contains((w1, w2, w3))) {
            nTri += 1; tri((w1, w2, w3)).toDouble / bi((w1, w2))
          } else if (bi.contains((w2, w3))) {
            nBi += 1; Lambda * bi((w2, w3)) / uni(w2)
          } else if (uni.contains(w3)) {
            nUni += 1; Lambda * Lambda * uni(w3) / t
          } else { nOov += 1; Lambda * Lambda / t }
        nats += -math.log(s)
      }
      id -> ((trips.size.toLong, nTri, nBi, nUni, nOov, nats))
    }.toMap
  }
}
