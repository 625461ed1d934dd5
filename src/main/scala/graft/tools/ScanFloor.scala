package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Measures the bare single-row-group parquet decode floor that bounds the
  * TPC-H-shaped fact queries at fixture scale (r14 audit evidence): times
  * a noop-sink scan of the q168-shaped lineitem projection, the same with
  * the revenue arithmetic, and the full-width scan. min-of-2 warm.
  * Usage: sbt "runMain graft.tools.ScanFloor [sfDir]"
  */
object ScanFloor {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.ansi.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def li = spark.read.parquet(s"$sfDir/lineitem.parquet")
    def time(label: String)(mk: => org.apache.spark.sql.DataFrame): Unit = {
      def pass(): Double = {
        val t0 = System.nanoTime()
        mk.write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }
      pass()
      println(f"$label: ${math.min(pass(), pass())}%.3f s")
    }
    time("lineitem 4-col projection") {
      li.select(col("l_orderkey"), col("l_suppkey"),
        col("l_extendedprice"), col("l_discount"))
    }
    time("lineitem 4-col + revc arithmetic") {
      li.select(col("l_orderkey"), col("l_suppkey"),
        round(col("l_extendedprice") * (lit(1.0) - col("l_discount")) * 100, 0)
          .cast("long").as("revc"))
    }
    time("lineitem 4-col + revc via roundHalfUpLong") {
      li.select(col("l_orderkey"), col("l_suppkey"),
        graft.core.Exprs.roundHalfUpLong(
          col("l_extendedprice") * (lit(1.0) - col("l_discount")) * 100)
          .as("revc"))
    }
    time("lineitem full width") { li }
    time("orders 3-col projection") {
      spark.read.parquet(s"$sfDir/orders.parquet")
        .select(col("o_orderkey"), col("o_custkey"), col("o_orderdate"))
    }
    spark.stop()
  }
}
