package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.ext.Dedup

/** Stage-level timing probe for the q18 MinHash pipeline (measure, don't
  * guess): signatures vs banded candidates vs full verified pairs.
  */
object ProfileQ18 {
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
      // warm-up then 3 timed reps
      body
      val reps = (1 to 3).map { _ =>
        val t0 = System.nanoTime()
        val n = body
        (System.nanoTime() - t0) / 1e9 -> n
      }
      println(f"$label%-28s ${reps.map(_._1).min}%8.3f s  (rows ${reps.head._2})")
    }

    val sig = Dedup.minhashSignatures(docs, "doc_id", "text", numHashes = 32, shingleSize = 3)
    time("signatures (explode+agg)") { sig.count() }
    time("candidates (band join)") { Dedup.lshCandidatePairs(sig, bands = 16, numHashes = 32).count() }
    time("full verified pairs") {
      Dedup.nearDuplicatePairs(docs, "doc_id", "text",
        threshold = 0.5, numHashes = 32, shingleSize = 3, bands = 16).count()
    }
    // row-local signature alternative: array_min over transformed shingle
    // hashes (no explode, no shuffle) — interpreted HOF lambdas vs codegen agg
    val th = docs.select(col("doc_id").as("id"), Dedup.tokenHashes(col("text")).as("__th"))
    val sh = th.select(col("id"), Dedup.shingleHashesFromTokenHashes(col("__th"), 3).as("__sh"))
    val rowLocal = sh.select(col("id"), array((0 until 32).map { i =>
      val a = 0x9E3779B97F4A7C15L * (2L * i + 1)
      val b = 0xBF58476D1CE4E5B9L * (i + 1)
      array_min(transform(col("__sh"), h => h * lit(a) + lit(b)))
    }: _*).as("sig"))
    time("signatures (row-local HOF)") { rowLocal.count() }
    spark.stop()
  }
}
