package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.ext.{Dedup, TextStats}

/** Text-pipeline scale probe: the round-4 operators over a synthetic corpus
  * 20× the sf0.1 bench corpus (default 100k docs, ~80 tokens each — ~8M
  * tokens), all-distributed generation like [[DedupScaleProbe]].
  *
  * Covers the paths whose cost profile changed this round:
  *  - span-level duplication (q47's operator; the let-binding fix makes the
  *    shingle explode linear — pre-fix this probe would take ~40× longer),
  *  - unigram surprisal (q54's shape: explode → two keyed aggs + broadcast
  *    model join),
  *  - TF-IDF scoring (q55's shape).
  * Invariants: planted duplicate docs (1 per 100) must show dup_fraction ≈ 1
  * while the random-token base corpus stays near 0; wall times print for the
  * scaling record. Run: `sbt "runMain graft.tools.TextScaleProbe [n]"`.
  */
object TextScaleProbe {
  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toInt).getOrElse(100000)
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.ansi.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val tokensPerDoc = 80
    val vocab = 50000
    def text(idCol: org.apache.spark.sql.Column) =
      concat_ws(" ", transform(sequence(lit(1), lit(tokensPerDoc)), j =>
        concat(lit("w"), pmod(xxhash64(idCol, j), lit(vocab)).cast("string"))))
    val base = spark.range(n).select(col("id").as("doc_id"), text(col("id")).as("text"))
    // exact copies planted every 100 docs → their 8-token spans all collide
    val planted = spark.range(n).filter(col("id") % 100 === 0)
      .select((col("id") + n).as("doc_id"), text(col("id")).as("text"))
    val corpus = base.unionByName(planted).cache()
    val total = corpus.count()

    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"$label%-22s ${(System.nanoTime() - t0) / 1e9}%7.2f s"); r
    }

    val dup = time("span_duplication") {
      Dedup.spanDuplication(corpus, "doc_id", "text", spanTokens = 8)
        .agg(sum((col("dup_fraction") > 0.99).cast("long")).as("full_dups"),
          sum((col("dup_fraction") === 0.0).cast("long")).as("clean"))
        .head()
    }
    val expectedDups = 2L * ((n + 99) / 100) // each planted copy + its base
    assert(dup.getLong(0) == expectedDups,
      s"full-dup docs ${dup.getLong(0)} != $expectedDups")
    assert(dup.getLong(1) >= total - expectedDups - n / 100,
      s"clean docs ${dup.getLong(1)} too few — random spans colliding?")

    time("unigram_surprisal") {
      val tok = corpus.select(col("doc_id"),
        explode(TextStats.tokens(lower(col("text")))).as("t"))
      val cnt = tok.groupBy("doc_id", "t").agg(count(lit(1)).as("c"))
      val freq = tok.groupBy("t").agg(count(lit(1)).as("f"))
      val tot = freq.agg(sum(col("f")).as("__T"))
      cnt.join(broadcast(freq), "t").crossJoin(tot)
        .groupBy("doc_id")
        .agg((-sum(col("c") * log(col("f").cast("double") / col("__T")))
          / sum(col("c"))).as("surp"))
        .agg(avg(col("surp"))).head()
    }

    time("tfidf_scoring") {
      val tok = corpus.select(col("doc_id"),
        explode(TextStats.tokens(lower(col("text")))).as("t"))
      val tf = tok.groupBy("t").agg(count(lit(1)).as("tf"))
      val df = tok.distinct().groupBy("t").agg(count(lit(1)).as("df"))
      tf.join(df, "t")
        .select(max(col("tf") * log(lit(total.toDouble) / col("df")))).head()
    }
    println(s"docs=$total ok")
    spark.stop()
  }
}
