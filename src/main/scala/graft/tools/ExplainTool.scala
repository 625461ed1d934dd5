package graft.tools

import org.apache.spark.sql.SparkSession

/** Prints the executed plan of registered queries — the `.explain` audit
  * loop: `sbt "runMain graft.tools.ExplainTool q218 q219 ..."` (optional
  * first arg `sf=<dir>`; default sf0.01). Matches query names by
  * substring against the SparkEntry registry.
  */
object ExplainTool {
  def main(args: Array[String]): Unit = {
    val (sfArgs, qArgs) = args.partition(_.startsWith("sf="))
    val sf = sfArgs.headOption.map(_.stripPrefix("sf="))
      .getOrElse("/root/testdata/sf0.01")
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.ansi.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    for (pat <- qArgs; (name, fn) <- graft.SparkEntry.queries
        if name.contains(pat)) {
      println(s"==== $name ====")
      val df = fn(spark, sf)
      val t0 = System.nanoTime()
      df.collect() // finalize AQE
      println(f"collect: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      println(df.queryExecution.executedPlan.toString.take(6000))
    }
    spark.stop()
  }
}
