package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.FormattedMode

/** Writes `explain("formatted")` output for registered queries to files —
  * the optimization-round evidence trail (plans/rNN/<query>_before.txt /
  * _after.txt). Usage:
  *   sbt "runMain graft.tools.PlanDump <outDir> <suffix> [sf=<dir>] names..."
  * e.g. `runMain graft.tools.PlanDump plans/r13 before q218_zorder_pruning`.
  * Exact-name match against the SparkEntry registry (a substring match
  * could silently dump a neighbor's plan as the evidence file).
  * Uses bench-shaped session settings (local[32], shuffle.partitions=32)
  * so the dumped plan is the one the bench actually runs.
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    require(args.length >= 3, "usage: PlanDump <outDir> <suffix> [sf=<dir>] names...")
    val outDir = args(0)
    val suffix = args(1)
    val rest = args.drop(2)
    val (sfArgs, names) = rest.partition(_.startsWith("sf="))
    val sfDir = sfArgs.headOption.map(_.stripPrefix("sf="))
      .getOrElse("/root/testdata/sf0.1")
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
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(outDir))
    val unknown = names.filterNot(graft.SparkEntry.queries.contains)
    require(unknown.isEmpty, s"unknown query names: ${unknown.mkString(", ")}")
    names.foreach { n =>
      val df = graft.SparkEntry.queries(n)(spark, sfDir)
      val txt = df.queryExecution.explainString(FormattedMode)
      val path = java.nio.file.Paths.get(outDir, s"${n}_$suffix.txt")
      java.nio.file.Files.write(path,
        txt.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      println(s"wrote $path (${txt.length} chars)")
    }
    spark.stop()
  }
}
