package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Model-grade language identification: character-trigram Naive-Bayes
  * profiles (the Cavnar–Trenkle 1994 textcat family / langid.py's char
  * n-gram model — public methods), replacing the stopword-marker heuristic
  * of [[TextStats.langId]] (kept: it gates q17).
  *
  * Model: per language, the top-K character trigrams of an embedded seed
  * corpus, with add-one-smoothed log-probabilities scaled to INTEGER
  * milli-nats (`round(1000·ln p)`). Integer scores make the per-document
  * sum order-independent and therefore hash-exact across engines — the
  * DuckDB oracle replays classification bit-for-bit from the same profile
  * constants ([[profileValuesSql]]), which a float-sum formulation could
  * not guarantee.
  *
  * Scoring: normalize (`lower`, whitespace runs → `_`, pad with `_`),
  * explode trigrams, LEFT-join the broadcast profile, per-language sum of
  * `coalesce(lp_lang, default_lang)` (the default is the smoothed
  * zero-count mass), argmax with first-language preference on ties; a doc
  * with no trigrams (under 3 chars) is `und`.
  *
  * Training/eval data: the synthetic `documents` fixture's text is
  * language-INVARIANT (the same 31-word English-ish vocabulary for every
  * `lang` label — the label is not derivable from the text), so the model
  * trains on embedded per-language seed sentences and is gated on an
  * embedded labeled eval fixture (sentences disjoint from training) with a
  * per-language precision/recall panel (q210). The corpus-wide
  * distribution query (q211) then exercises the identical distributed path
  * over `documents`.
  *
  * Scale: the profile is a few hundred rows — broadcast; the corpus side
  * is explode → broadcast-join → one keyed aggregation per doc. No
  * all-pairs, no driver loops; trigram explosion is pipeline-local.
  */
object LangId {

  val Langs: Seq[String] = Seq("en", "de", "fr", "es", "zh")

  /** Top-K trigrams kept per language profile (textcat-style truncation —
    * the head of the Zipf curve carries the signal). */
  val ProfileK = 200

  /** Embedded seed corpora (authored for this repo; generic non-domain
    * sentences exercising each language's characteristic letter patterns).
    */
  val TrainingSamples: Map[String, Seq[String]] = Map(
    "en" -> Seq(
      "The quick brown fox jumps over the lazy dog near the river bank.",
      "She said that the weather would be better in the morning.",
      "Every child should have the chance to learn and to play outside.",
      "This is not the first time that they have been here together.",
      "We are going to the market because there is nothing in the house.",
      "The old library at the corner of the street closes early on Sunday.",
      "He could not remember where he had left the keys to the front door.",
      "People often think that things were better in the old days.",
      "A little knowledge about many things makes life more interesting.",
      "They watched the sunset from the hill behind their grandmother's farm."),
    "de" -> Seq(
      "Der schnelle braune Fuchs springt über den faulen Hund am Flussufer.",
      "Sie sagte, dass das Wetter am Morgen besser sein würde.",
      "Jedes Kind sollte die Möglichkeit haben, draußen zu lernen und zu spielen.",
      "Das ist nicht das erste Mal, dass sie zusammen hier gewesen sind.",
      "Wir gehen auf den Markt, weil nichts mehr im Haus ist.",
      "Die alte Bibliothek an der Straßenecke schließt sonntags früher.",
      "Er konnte sich nicht erinnern, wo er die Schlüssel gelassen hatte.",
      "Die Leute denken oft, dass früher alles besser gewesen wäre.",
      "Ein wenig Wissen über viele Dinge macht das Leben interessanter.",
      "Sie beobachteten den Sonnenuntergang vom Hügel hinter dem Bauernhof."),
    "fr" -> Seq(
      "Le rapide renard brun saute par-dessus le chien paresseux près de la rivière.",
      "Elle a dit que le temps serait meilleur dans la matinée.",
      "Chaque enfant devrait avoir la chance d'apprendre et de jouer dehors.",
      "Ce n'est pas la première fois qu'ils sont venus ici ensemble.",
      "Nous allons au marché parce qu'il n'y a plus rien dans la maison.",
      "La vieille bibliothèque au coin de la rue ferme plus tôt le dimanche.",
      "Il ne se souvenait plus où il avait laissé les clés de la porte.",
      "Les gens pensent souvent que les choses étaient mieux autrefois.",
      "Un peu de savoir sur beaucoup de choses rend la vie plus intéressante.",
      "Ils regardaient le coucher du soleil depuis la colline derrière la ferme."),
    "es" -> Seq(
      "El rápido zorro marrón salta sobre el perro perezoso junto al río.",
      "Ella dijo que el tiempo sería mejor por la mañana.",
      "Cada niño debería tener la oportunidad de aprender y jugar afuera.",
      "No es la primera vez que ellos han estado aquí juntos.",
      "Vamos al mercado porque no queda nada en la casa.",
      "La vieja biblioteca de la esquina cierra más temprano los domingos.",
      "No podía recordar dónde había dejado las llaves de la puerta.",
      "La gente piensa a menudo que las cosas eran mejores antes.",
      "Un poco de conocimiento sobre muchas cosas hace la vida más interesante.",
      "Miraban la puesta de sol desde la colina detrás de la granja."),
    "zh" -> Seq(
      "敏捷的棕色狐狸跳过河边那只懒惰的狗。",
      "她说早上的天气会更好一些。",
      "每个孩子都应该有机会在外面学习和玩耍。",
      "这不是他们第一次一起来到这里。",
      "我们要去市场，因为家里什么都没有了。",
      "街角的老图书馆星期天关门比较早。",
      "他不记得把前门的钥匙放在哪里了。",
      "人们常常觉得过去的日子更美好。",
      "对许多事物略知一二会让生活更有趣。",
      "他们在农场后面的山坡上看日落。"))

  /** Labeled evaluation fixture — sentences DISJOINT from training. */
  val EvalFixture: Seq[(Long, String, String)] = Seq(
    (1L, "en", "The train to the city leaves at seven in the morning."),
    (2L, "en", "Nobody knew why the lights were still on in the house."),
    (3L, "en", "Reading by the window is her favourite thing in winter."),
    (4L, "en", "The students finished their work before the bell rang."),
    (5L, "en", "There was a long queue outside the bakery this morning."),
    (6L, "en", "He wrote a letter to his brother about the journey home."),
    (7L, "de", "Der Zug in die Stadt fährt um sieben Uhr morgens ab."),
    (8L, "de", "Niemand wusste, warum das Licht im Haus noch brannte."),
    (9L, "de", "Im Winter liest sie am liebsten am Fenster ein Buch."),
    (10L, "de", "Die Schüler beendeten ihre Arbeit, bevor es klingelte."),
    (11L, "de", "Heute Morgen stand eine lange Schlange vor der Bäckerei."),
    (12L, "de", "Er schrieb seinem Bruder einen Brief über die Heimreise."),
    (13L, "fr", "Le train pour la ville part à sept heures du matin."),
    (14L, "fr", "Personne ne savait pourquoi la lumière était encore allumée."),
    (15L, "fr", "Lire près de la fenêtre est ce qu'elle préfère en hiver."),
    (16L, "fr", "Les élèves ont terminé leur travail avant la sonnerie."),
    (17L, "fr", "Il y avait une longue file devant la boulangerie ce matin."),
    (18L, "fr", "Il a écrit une lettre à son frère au sujet du voyage."),
    (19L, "es", "El tren hacia la ciudad sale a las siete de la mañana."),
    (20L, "es", "Nadie sabía por qué la luz seguía encendida en la casa."),
    (21L, "es", "Leer junto a la ventana es lo que más le gusta en invierno."),
    (22L, "es", "Los alumnos terminaron su trabajo antes de que sonara el timbre."),
    (23L, "es", "Había una fila muy larga frente a la panadería esta mañana."),
    (24L, "es", "Escribió una carta a su hermano sobre el viaje de regreso."),
    (25L, "zh", "去城里的火车早上七点出发。"),
    (26L, "zh", "没有人知道为什么房子里的灯还亮着。"),
    (27L, "zh", "冬天她最喜欢坐在窗边看书。"),
    (28L, "zh", "学生们在铃声响起之前完成了作业。"),
    (29L, "zh", "今天早上面包店门口排起了长队。"),
    (30L, "zh", "他给哥哥写了一封关于回家旅途的信。"))

  // ---- normalization + trigrams (Scala twin and Column/SQL forms) ---------

  /** `lower`, collapse whitespace runs to `_`, pad both ends with `_`.
    * Locale.ROOT: Spark's `lower` and DuckDB's are locale-independent;
    * the Scala twin must not pick up a host locale (Turkish-I etc.). */
  def normalize(s: String): String =
    "_" + s.toLowerCase(java.util.Locale.ROOT).replaceAll("\\s+", "_") + "_"

  def normalizeCol(text: Column): Column =
    concat(lit("_"), regexp_replace(lower(text), "\\s+", "_"), lit("_"))

  def trigrams(s: String): Seq[String] = {
    val n = normalize(s)
    if (n.length < 3) Nil else (0 to n.length - 3).map(i => n.substring(i, i + 3))
  }

  /** Array of character trigrams of the normalized text (char-based
    * substrings — consistent across Spark and DuckDB for any script). */
  def trigramsCol(text: Column): Column =
    graft.core.Exprs.bindOnce(normalizeCol(text), n =>
      // sequence(1, 0) is DESCENDING in Spark, not empty — short texts need
      // the explicit empty-array branch
      when(length(n) < 3, array().cast("array<string>"))
        .otherwise(transform(sequence(lit(1), length(n) - 2),
          i => substr(n, i, lit(3)))))

  // ---- profile (computed once, driver-side, from the embedded seeds) ------

  /** Per-language top-K trigram counts (ties broken by gram for
    * determinism) and the smoothed-total denominator T_l + V. */
  private lazy val topK: Map[String, Map[String, Long]] = TrainingSamples.map {
    case (l, sents) =>
      val counts = sents.flatMap(trigrams).groupBy(identity)
        .map { case (g, occ) => g -> occ.size.toLong }
      l -> counts.toSeq.sortBy { case (g, c) => (-c, g) }.take(ProfileK).toMap
  }

  /** Union vocabulary of all language profiles (the smoothing V). */
  lazy val vocabulary: Seq[String] = topK.values.flatMap(_.keys).toSeq.distinct.sorted

  private lazy val denom: Map[String, Double] =
    Langs.map(l => l -> (topK(l).values.sum.toDouble + vocabulary.size)).toMap

  /** Integer milli-nat log-probability of gram `g` under language `l`
    * (add-one smoothing; `g` absent from the profile counts as 0). */
  def logProb(l: String, g: String): Long =
    math.round(1000.0 * math.log((topK(l).getOrElse(g, 0L) + 1.0) / denom(l)))

  /** Score contributed by a trigram unseen in ANY profile. */
  def defaultLogProb(l: String): Long = math.round(1000.0 * math.log(1.0 / denom(l)))

  /** Wide profile rows (gram, lp_en, …, lp_zh) over the union vocabulary. */
  lazy val profileRows: Seq[(String, Seq[Long])] =
    vocabulary.map(g => g -> Langs.map(l => logProb(l, g)))

  def profileDf(spark: org.apache.spark.sql.SparkSession): DataFrame = {
    import spark.implicits._
    profileRows.map { case (g, lps) =>
      (g, lps(0), lps(1), lps(2), lps(3), lps(4))
    }.toDF("gram", "lp_en", "lp_de", "lp_fr", "lp_es", "lp_zh")
  }

  /** Scala-twin classifier for tests. */
  def classifyOne(text: String): String = {
    val gs = trigrams(text)
    if (gs.isEmpty) "und"
    else Langs.maxBy(l => (gs.map(g =>
      if (vocabulary.contains(g)) logProb(l, g) else defaultLogProb(l)).sum,
      -Langs.indexOf(l)))
  }

  // ---- distributed classification ----------------------------------------

  /** (idCol…, lang_pred) — explode trigrams, pre-aggregate per-(doc, gram)
    * OCCURRENCE counts (score = Σ count·lp is identical to the
    * per-occurrence sum, but the profile join then probes each distinct
    * gram once per doc instead of once per occurrence — ~10× fewer probes
    * on natural text, where the trigram stream is far longer than its
    * per-doc support; the count aggregation itself is mostly map-side
    * since a doc's grams are co-located), broadcast-join the profile,
    * integer score sum per language, argmax (first of [[Langs]] on ties),
    * `und` when the text has no trigrams.
    */
  def classify(df: DataFrame, idCol: String, textCol: Column): DataFrame = {
    val occ = df.select(col(idCol), explode_outer(trigramsCol(textCol)).as("__g"))
      .groupBy(col(idCol), col("__g"))
      .agg(count(col("__g")).as("__c")) // count(col) = non-null: 0 marks the
                                        // explode_outer row of an empty array
    // null gram contributes null, so a trigram-less doc's sum is NULL →
    // und. Unseen grams take the smoothed default.
    val scoreAggs = Langs.map { l =>
      sum(when(col("__g").isNotNull,
        coalesce(col(s"lp_$l"), lit(defaultLogProb(l))) * col("__c"))).as(s"__s_$l")
    }
    val scored = occ.join(broadcast(profileDf(df.sparkSession)),
        occ("__g") === col("gram"), "left")
      .groupBy(col(idCol))
      .agg(scoreAggs.head, scoreAggs.tail: _*)
    val best = Langs.map(l => col(s"__s_$l")).reduce(greatest(_, _))
    val pred = Langs.foldRight(lit("und"): Column) { case (l, acc) =>
      when(col(s"__s_$l") === best, lit(l)).otherwise(acc)
    }
    scored.select(col(idCol),
      when(col(s"__s_${Langs.head}").isNull, lit("und")).otherwise(pred).as("lang_pred"))
  }

  /** ROW-LOCAL classification — the profile embedded as a literal map and
    * the score sum folded over the trigram array with `aggregate`. Zero
    * shuffle and no per-doc grouping, so it drops into Structured
    * Streaming unchanged ([[graft.streaming.StreamOps.streamingLangId]])
    * and is the per-row variant of [[classify]] for pipelines that carry
    * the prediction as just another column. Same argmax/tie/`und`
    * semantics (asserted equal in Round12Spec).
    *
    * PERF: `element_at` on a literal map is a LINEAR scan of all entries
    * (ArrayBasedMapData has no hash index), so each gram lookup costs
    * O(|vocabulary|) — measured 3.6× slower than [[classify]]'s broadcast
    * hash join on a full corpus scan. Right for streaming/per-event rates
    * and row-carrying pipelines; use [[classify]] for bulk scoring.
    */
  def predictCol(text: Column): Column = {
    val lpMap = typedLit(profileRows.toMap)
    val defaults = Langs.map(defaultLogProb)
    graft.core.Exprs.bindOnce(trigramsCol(text), gs =>
      when(size(gs) === 0, lit("und")).otherwise(
        graft.core.Exprs.bindOnce(
          aggregate(gs,
            struct(Langs.map(l => lit(0L).as(l)): _*),
            (acc, g) => graft.core.Exprs.bindOnce(element_at(lpMap, g), lp =>
              struct(Langs.zipWithIndex.map { case (l, i) =>
                (acc.getField(l) +
                  coalesce(element_at(lp, i + 1), lit(defaults(i)))).as(l)
              }: _*))),
          sc => {
            val best = Langs.map(l => sc.getField(l)).reduce(greatest(_, _))
            Langs.foldRight(lit("und")) { case (l, acc) =>
              when(sc.getField(l) === best, lit(l)).otherwise(acc)
            }
          })))
  }

  // ---- oracle fragments ---------------------------------------------------

  private def esc(s: String) = s.replace("'", "''")

  /** The profile as a SQL VALUES list `(gram, lp_en, …, lp_zh)`. */
  def profileValuesSql: String =
    profileRows.map { case (g, lps) =>
      s"('${esc(g)}', ${lps.mkString(", ")})"
    }.mkString(",\n    ")

  /** The eval fixture as a SQL VALUES list `(id, label, text)`. */
  def fixtureValuesSql: String =
    EvalFixture.map { case (id, l, t) => s"($id, '$l', '${esc(t)}')" }
      .mkString(",\n    ")

  /** DuckDB twin of [[normalizeCol]] + [[trigramsCol]] over `expr`. */
  def trigramsSqlExpr(expr: String): String = {
    val n = s"'_' || regexp_replace(lower($expr), '\\s+', '_', 'g') || '_'"
    s"list_transform(range(1, length($n) - 1), i -> ($n)[i:i+2])"
  }

  /** Per-language score CASE chain replicating the engine argmax (first of
    * [[Langs]] wins ties); `und` for a NULL (trigram-less) score. */
  def predSqlExpr(scorePrefix: String): String = {
    val cases = Langs.map { l =>
      val geAll = Langs.map(o => s"$scorePrefix$l >= $scorePrefix$o").mkString(" AND ")
      s"WHEN $geAll THEN '$l'"
    }.mkString(" ")
    s"CASE WHEN ${scorePrefix}${Langs.head} IS NULL THEN 'und' $cases ELSE 'und' END"
  }

  /** Per-language `SUM(COALESCE(lp_l, default_l))` select-list fragment for
    * a grams-joined-to-profile relation (gram column `g`, profile alias
    * `p`). Engine semantics: NULL gram rows contribute NULL. */
  def scoreSelectSql: String =
    Langs.map { l =>
      s"CAST(SUM(CASE WHEN g IS NOT NULL THEN COALESCE(p.lp_$l, ${defaultLogProb(l)}) END) AS BIGINT) AS s_$l"
    }.mkString(",\n    ")
}
