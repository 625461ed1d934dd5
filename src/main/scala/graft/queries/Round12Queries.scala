package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.ext.LangId
import graft.queries.ExtQueries.docs

/** Round-12 queries: model-grade language identification (q210/q211) — the
  * char-trigram Naive-Bayes successor to q17's stopword-marker heuristic.
  * Classification is integer-milli-nat arithmetic end to end, so the
  * DuckDB oracle replays scores and argmax hash-exactly from the same
  * profile constants ([[graft.ext.LangId.profileValuesSql]]).
  */
object Round12Queries {

  // ---- q210 labeled-fixture evaluation panel --------------------------------

  /** Per-language precision/recall of the trigram classifier on the
    * embedded labeled eval fixture (sentences disjoint from the training
    * seeds — the `documents` fixture's own text is language-invariant, so
    * its `lang` label cannot gate a real classifier; see
    * [[graft.ext.LangId]]). A model-quality gate AND a correctness gate:
    * the oracle recomputes every score, prediction, and ratio.
    */
  def q210LangidEval(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val fixture = LangId.EvalFixture.toDF("id", "label", "text")
    val preds = LangId.classify(fixture, "id", col("text"))
      .join(fixture.select("id", "label"), "id")
    val conf = preds.groupBy("label", "lang_pred").agg(count(lit(1)).as("c"))
    val panel = conf
      .select(explode(array(LangId.Langs.map(lit): _*)).as("lang"),
        col("label"), col("lang_pred"), col("c"))
      .groupBy("lang")
      .agg(
        coalesce(sum(when(col("label") === col("lang"), col("c"))), lit(0L)).as("n_docs"),
        coalesce(sum(when(col("label") === col("lang") &&
          col("lang_pred") === col("lang"), col("c"))), lit(0L)).as("tp"),
        coalesce(sum(when(col("label") =!= col("lang") &&
          col("lang_pred") === col("lang"), col("c"))), lit(0L)).as("fp"),
        coalesce(sum(when(col("label") === col("lang") &&
          col("lang_pred") =!= col("lang"), col("c"))), lit(0L)).as("fn"))
    panel.select(col("lang"), col("n_docs"), col("tp"), col("fp"), col("fn"),
        when(col("tp") + col("fp") > 0,
          round(col("tp").cast("double") / (col("tp") + col("fp")), 6)).as("precision"),
        when(col("tp") + col("fn") > 0,
          round(col("tp").cast("double") / (col("tp") + col("fn")), 6)).as("recall"))
      .orderBy("lang")
  }

  private def langsValuesSql: String =
    LangId.Langs.map(l => s"('$l')").mkString(", ")

  val q210Sql: String =
    s"""WITH profile(gram, lp_en, lp_de, lp_fr, lp_es, lp_zh) AS (VALUES
       |    ${LangId.profileValuesSql}),
       |fixture(id, label, text) AS (VALUES
       |    ${LangId.fixtureValuesSql}),
       |grams AS (
       |  SELECT id, unnest(${LangId.trigramsSqlExpr("text")}) AS g FROM fixture),
       |scored AS (
       |  SELECT gr.id,
       |    ${LangId.scoreSelectSql}
       |  FROM grams gr LEFT JOIN profile p ON gr.g = p.gram
       |  GROUP BY gr.id),
       |pred AS (
       |  SELECT f.id, f.label, ${LangId.predSqlExpr("s.s_")} AS lang_pred
       |  FROM fixture f LEFT JOIN scored s USING (id)),
       |langs(lang) AS (VALUES $langsValuesSql),
       |panel AS (
       |  SELECT l.lang,
       |    CAST(SUM(CASE WHEN p.label = l.lang THEN 1 ELSE 0 END) AS BIGINT) AS n_docs,
       |    CAST(SUM(CASE WHEN p.label = l.lang AND p.lang_pred = l.lang THEN 1 ELSE 0 END) AS BIGINT) AS tp,
       |    CAST(SUM(CASE WHEN p.label <> l.lang AND p.lang_pred = l.lang THEN 1 ELSE 0 END) AS BIGINT) AS fp,
       |    CAST(SUM(CASE WHEN p.label = l.lang AND p.lang_pred <> l.lang THEN 1 ELSE 0 END) AS BIGINT) AS fn
       |  FROM langs l CROSS JOIN pred p GROUP BY l.lang)
       |SELECT lang, n_docs, tp, fp, fn,
       |  CASE WHEN tp + fp > 0 THEN ROUND(CAST(tp AS DOUBLE) / (tp + fp), 6) END AS precision,
       |  CASE WHEN tp + fn > 0 THEN ROUND(CAST(tp AS DOUBLE) / (tp + fn), 6) END AS recall
       |FROM panel ORDER BY lang""".stripMargin

  // ---- q211 corpus-wide classification distribution -------------------------

  /** The identical distributed classifier over the real `documents` table:
    * (labeled lang, predicted lang, count). On the synthetic corpus every
    * text is the same English-ish vocabulary, so the interesting content is
    * the gate itself — engine and oracle must agree on every integer score
    * over ~1M trigram rows — plus the explode → broadcast-join → one keyed
    * aggregation shape that carries to 100 TB.
    */
  def q211LangidCorpus(spark: SparkSession, sfDir: String): DataFrame = {
    val d = docs(spark, sfDir)
    LangId.classify(d, "doc_id", col("text"))
      .join(d.select("doc_id", "lang"), "doc_id")
      .groupBy("lang", "lang_pred").agg(count(lit(1)).as("n_docs"))
      .orderBy("lang", "lang_pred")
  }

  val q211Sql: String =
    s"""WITH profile(gram, lp_en, lp_de, lp_fr, lp_es, lp_zh) AS (VALUES
       |    ${LangId.profileValuesSql}),
       |grams AS (
       |  SELECT doc_id, unnest(${LangId.trigramsSqlExpr("text")}) AS g FROM documents),
       |scored AS (
       |  SELECT gr.doc_id,
       |    ${LangId.scoreSelectSql}
       |  FROM grams gr LEFT JOIN profile p ON gr.g = p.gram
       |  GROUP BY gr.doc_id),
       |pred AS (
       |  SELECT d.doc_id, d.lang, ${LangId.predSqlExpr("s.s_")} AS lang_pred
       |  FROM documents d LEFT JOIN scored s USING (doc_id))
       |SELECT lang, lang_pred, CAST(COUNT(*) AS BIGINT) AS n_docs
       |FROM pred GROUP BY lang, lang_pred ORDER BY lang, lang_pred""".stripMargin

  val all: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q210_langid_eval" -> (q210LangidEval _),
    "q211_langid_corpus" -> (q211LangidCorpus _))

  val oracles: Map[String, String] = Map(
    "q210_langid_eval" -> q210Sql,
    "q211_langid_corpus" -> q211Sql)
}
