package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.FormattedMode

/** A/B evidence for the r14 q197 rewrite: the decile-cells build is an
  * eager localCheckpoint inside the query, so its plan never appears in the
  * registered query's final `explain` — this probe builds BOTH variants of
  * the cells frame (old: per-value bucket lookup joined on near-unique y;
  * new: ≤10-row broadcast threshold range join) standalone, dumps their
  * formatted plans to plans/r14/q197_cells_{old,new}.txt, asserts the cell
  * sets are IDENTICAL, and times min-of-2 warm passes of each.
  *
  * Usage: sbt "runMain graft.tools.AbQ197 [sfDir]"
  */
object AbQ197 {
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

    val li = spark.read.parquet(s"$sfDir/lineitem.parquet")
      .select(col("l_quantity").cast("long").as("x"),
        round(col("l_extendedprice") * (lit(1.0) - col("l_discount")) * 100, 0)
          .cast("long").as("y")).cache()
    li.count()

    def buckets(c: String): DataFrame = {
      val perV = li.groupBy(col(c)).agg(count(lit(1)).as("cnt"))
      val scan = graft.ext.Curation.withGlobalOffset(perV, c, "cnt", "pre")
      val tot = scan.agg(sum(col("cnt")).as("n"))
      scan.crossJoin(broadcast(tot))
        .select(col(c),
          least(ceil((col("pre") + col("cnt")).cast("double") * 10.0 /
            col("n").cast("double")).cast("long"), lit(10L)).as(s"b_$c"))
    }
    val bx = buckets("x").cache(); bx.count()
    val by = buckets("y").cache(); by.count()

    def cellsOld(): DataFrame =
      li.join(broadcast(bx), "x").join(by, "y")
        .groupBy(col("b_x"), col("b_y")).agg(count(lit(1)).as("c"))
    def cellsNew(): DataFrame = {
      val thrY = by.groupBy(col("b_y")).agg(max(col("y")).as("hi"))
        .withColumn("lo",
          lag(col("hi"), 1).over(Window.partitionBy(lit(0)).orderBy("b_y")))
      li.join(broadcast(bx), "x")
        .join(broadcast(thrY),
          col("y") <= col("hi") &&
            col("y") > coalesce(col("lo"), lit(Long.MinValue)))
        .groupBy(col("b_x"), col("b_y")).agg(count(lit(1)).as("c"))
    }

    // identical output check
    val o = cellsOld().collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sorted
    val n = cellsNew().collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sorted
    require(o.sameElements(n), s"cells differ: old=${o.length} new=${n.length}")
    println(s"cells identical: ${o.length} cells")

    def dump(df: DataFrame, name: String): Unit = {
      val txt = df.queryExecution.explainString(FormattedMode)
      val p = java.nio.file.Paths.get("plans/r14", s"q197_cells_$name.txt")
      java.nio.file.Files.createDirectories(p.getParent)
      java.nio.file.Files.write(p,
        txt.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      println(s"wrote $p")
    }
    dump(cellsOld(), "old")
    dump(cellsNew(), "new")

    def time(mk: () => DataFrame, label: String): Unit = {
      def pass(): Double = {
        val t0 = System.nanoTime()
        mk().write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }
      pass() // warm
      println(f"$label: ${math.min(pass(), pass())}%.3f s (min-of-2 warm, noop sink)")
    }
    time(cellsOld _, "cells_old")
    time(cellsNew _, "cells_new")
    spark.stop()
  }
}
