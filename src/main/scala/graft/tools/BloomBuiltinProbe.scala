package graft.tools

import org.apache.spark.sql.SparkSession

/** Scratch probe: is the builtin Bloom pair (bloom_filter_agg /
  * might_contain) reachable from user SQL on this Spark build?
  */
object BloomBuiltinProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    try {
      spark.range(0, 1000).createOrReplaceTempView("t")
      val sketch = spark.sql(
        "SELECT bloom_filter_agg(xxhash64(id), 1000L, 8192L) AS bf FROM t")
      val bytes = sketch.collect()(0).getAs[Array[Byte]](0)
      println(s"AGG_OK bytes=${bytes.length}")
      spark.range(0, 2000).createOrReplaceTempView("p")
      val hits = spark.sql(
        s"SELECT count(*) FROM p WHERE might_contain(X'${bytes.map("%02x".format(_)).mkString}', xxhash64(id))")
        .collect()(0).getLong(0)
      println(s"PROBE_OK hits=$hits of 2000 (>=1000 expected)")
    } catch {
      case e: Throwable => println(s"BLOOM_BUILTIN_FAIL ${e.getClass.getName}: ${e.getMessage}")
    }
    spark.stop()
  }
}
