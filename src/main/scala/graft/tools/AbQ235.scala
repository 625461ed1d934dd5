package graft.tools
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.ext.Dedup
object AbQ235 {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.ansi.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val sf = "/root/testdata/sf0.1"
    val docs = spark.read.parquet(s"$sf/documents.parquet").cache()
    val sets = Dedup.shingleSets(docs, "doc_id", "text", 3).cache()
    sets.count()
    val ranked = Dedup.containmentRankedIndex(sets).cache()
    ranked.count()
    // OLD: plain explode index, no prunes
    def oldVariant(): DataFrame = {
      val prefix = ranked
        .filter(col("rk") <= col("sz") - ceil(round(lit(0.5) * col("sz"), 6)) + 1)
        .select(col("id").as("a_id"), col("g"))
      val index = sets.select(col("id").as("b_id"), explode(col("sset")).as("g"))
      val cands = prefix.join(index, Seq("g"))
        .filter(col("a_id") =!= col("b_id")).select("a_id", "b_id").distinct()
      cands.join(sets.select(col("id").as("a_id"), col("sset").as("sa")), "a_id")
        .join(sets.select(col("id").as("b_id"), col("sset").as("sb")), "b_id")
        .select(col("a_id"), col("b_id"), size(col("sa")).as("sz_a"),
          size(array_intersect(col("sa"), col("sb"))).as("inter"))
        .filter(col("inter") >= ceil(round(lit(0.5) * col("sz_a"), 6)))
    }
    def newVariant(): DataFrame =
      Dedup.containmentPairsFromRankedIndex(ranked, sets, 0.5)
    def time(label: String, f: () => DataFrame): Unit = {
      val t0 = System.nanoTime(); val n = f().count()
      println(f"$label: ${(System.nanoTime() - t0) / 1e9}%.2f s ($n rows)")
    }
    time("old-warm", oldVariant); time("new-warm", newVariant)
    for (_ <- 1 to 3) { time("old", oldVariant); time("new", newVariant) }
    spark.stop()
  }
}
