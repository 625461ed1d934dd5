package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.streaming.StreamOps

/** Structured Streaming end-to-end drive over the real events parquet via a
  * file stream source: watermarked tumbling aggregation + session windows,
  * AvailableNow trigger, memory sink.
  * `sbt "runMain graft.tools.StreamDemo /root/testdata/sf0.001"`.
  */
object StreamDemo {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val spark = SparkSession.builder()
      .master("local[4]")
      .appName("graft-stream-demo")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.ansi.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // file stream sources want a directory: stage the single parquet file
    val stageDir = java.nio.file.Files.createTempDirectory("graft-stream-events")
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"$sfDir/events.parquet"),
      stageDir.resolve("events.parquet"))
    val schema = spark.read.parquet(s"$sfDir/events.parquet").schema
    val raw = spark.readStream.schema(schema).parquet(stageDir.toString)
    val events = graft.ext.Events.normalizeTs(raw)

    val q1 = StreamOps.tumblingStats(events, window = "1 hour", watermark = "10 minutes")
      .writeStream.format("memory").queryName("tumbling")
      .outputMode("append").trigger(Trigger.AvailableNow()).start()
    q1.awaitTermination(120000)
    println("== streaming tumbling stats (closed windows) ==")
    val t = spark.table("tumbling")
    println(s"windows emitted: ${t.count()}")
    t.orderBy(col("window_start"), col("event_type")).show(6, truncate = false)

    val q2 = StreamOps.sessionStats(events, gap = "30 minutes", watermark = "10 minutes")
      .writeStream.format("memory").queryName("sessions")
      .outputMode("append").trigger(Trigger.AvailableNow()).start()
    q2.awaitTermination(120000)
    println("== streaming session windows (closed sessions) ==")
    val s = spark.table("sessions")
    println(s"sessions emitted: ${s.count()}")
    s.orderBy(col("session_start")).show(5, truncate = false)

    spark.stop()
  }
}
