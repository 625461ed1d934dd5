package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.ext.TextStats

/** Stage-level timing probe for the q17 language-ID formulations: exploded
  * token conditional sums (shuffle, codegen aggregates) vs the row-local
  * struct accumulator (no shuffle, interpreted HOF).
  */
object ProfileQ17 {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.ansi.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = spark.read.parquet(s"$sfDir/documents.parquet").cache()
    docs.count()

    def time(label: String)(body: => Long): Unit = {
      body
      val reps = (1 to 3).map { _ =>
        val t0 = System.nanoTime()
        val n = body
        (System.nanoTime() - t0) / 1e9 -> n
      }
      println(f"$label%-28s ${reps.map(_._1).min}%8.3f s  (rows ${reps.head._2})")
    }

    time("exploded conditional sums") {
      val ex = docs.select(col("doc_id"), col("lang"),
        explode(TextStats.tokens(lower(col("text")))).as("t"))
      val aggs = TextStats.langScoreAggs(col("t"))
      val scores = ex.groupBy("doc_id", "lang")
        .agg(aggs.head._2.as(s"s_${aggs.head._1}"),
          aggs.tail.map { case (l, c) => c.as(s"s_$l") }: _*)
      scores.select(col("lang"), TextStats.langIdFromCols(
        aggs.map { case (l, _) => l -> col(s"s_$l") }).as("predicted"))
        .groupBy("lang", "predicted").agg(count(lit(1)).as("n")).count()
    }

    time("row-local struct accumulate") {
      docs.select(col("lang"), TextStats.langScoresStruct(lower(col("text"))).as("__s"))
        .select(col("lang"), TextStats.langIdFromScores(col("__s")).as("predicted"))
        .groupBy("lang", "predicted").agg(count(lit(1)).as("n")).count()
    }
    spark.stop()
  }
}
