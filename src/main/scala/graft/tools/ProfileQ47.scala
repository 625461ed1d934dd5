package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.ext.Dedup

/** Stage-by-stage wall-time profile of the q47 span-duplication pipeline at a
  * given SF dir — isolates shingle build, span explode+DF count, the
  * shared-span join, and the final panel. Run:
  * `sbt "runMain graft.tools.ProfileQ47 [sfDir]"`.
  */
object ProfileQ47 {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.ansi.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val d = spark.read.parquet(s"$sfDir/documents.parquet").cache()
    d.count()

    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"$label%-28s ${(System.nanoTime() - t0) / 1e9}%7.2f s"); r
    }

    val n = 8
    // let-bound variant: bind the token-hash array as a lambda variable so
    // no downstream reference can trigger re-evaluation of the hash pipeline
    def letBoundSets = {
      val body = (th: org.apache.spark.sql.Column) =>
        when(size(th) < n, array().cast("array<bigint>"))
          .otherwise(transform(sequence(lit(0), size(th) - n),
            i => (0 until n).map(j =>
              element_at(th, i + lit(j + 1)) * lit(0x9E3779B97F4A7C15L * (2L * j + 1)))
              .reduce(_ + _)))
      d.select(col("doc_id").as("id"),
        array_distinct(element_at(
          transform(array(Dedup.tokenHashes(col("text"))), body), 1)).as("sset"))
    }
    for (pass <- 1 to 2) {
      println(s"-- pass $pass")
      val sets = Dedup.shingleSets(d, "doc_id", "text", 8)
      time("A sum(size(sset)) current")(
        sets.agg(sum(size(col("sset")))).head())
      time("B explode current")(
        sets.select(col("id"), explode(col("sset")).as("__g")).count())
      time("C explode let-bound")(
        letBoundSets.select(col("id"), explode(col("sset")).as("__g")).count())
      time("D sum(size) let-bound")(
        letBoundSets.agg(sum(size(col("sset")))).head())
    }
    spark.stop()
  }
}
