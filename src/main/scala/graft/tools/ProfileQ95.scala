package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Stage-level timing for the q95 prefix-filter Jaccard join: how many
  * candidates does the prefix equi-join emit, and where does the wall time
  * go (prefix build vs candidate join vs exact verification)? Used to size
  * the ppjoin-style length/positional filters.
  * `sbt "runMain graft.tools.ProfileQ95 [sfDir] [threshold]"`.
  */
object ProfileQ95 {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val t = if (args.length > 1) args(1).toDouble else 0.4
    val spark = SparkSession.builder()
      .master("local[32]")
      .appName("graft-profile-q95")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.ansi.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val sets = graft.ext.Dedup.shingleSets(docs, "doc_id", "text", 3).cache()
    println(s"docs=${docs.count()} sets=${sets.count()}")
    println("avg |sset| = " + sets.select(avg(size(col("sset")))).first().getDouble(0))

    def time[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"$label: ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }

    val ex = sets.select(col("id"), size(col("sset")).as("sz"),
      explode(col("sset")).as("g"))
    val dfreq = ex.groupBy("g").agg(count(lit(1)).as("df"))
    val w = Window.partitionBy("id").orderBy(col("df"), col("g"))
    val prefix = ex.join(dfreq, "g")
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= col("sz") - ceil(round(lit(t) * col("sz"), 6)) + 1)
      .select(col("id"), col("sz"), col("rk"), col("g")).cache()
    time("prefix build")(prefix.count())
    println("prefix rows = " + prefix.count())

    val candsRaw = prefix.as("a").join(prefix.as("b"),
      col("a.g") === col("b.g") && col("a.id") < col("b.id"))
    time("raw candidate rows")(println("  n=" + candsRaw.count()))

    val lenOk = candsRaw.filter(
      least(col("a.sz"), col("b.sz")) >=
        round(lit(t) * greatest(col("a.sz"), col("b.sz")), 6))
    time("after length filter")(println("  n=" + lenOk.count()))

    val posOk = lenOk.filter(
      lit(1) + least(col("a.sz") - col("a.rk"), col("b.sz") - col("b.rk")) >=
        round(lit(t) / (1 + t) * (col("a.sz") + col("b.sz")), 6))
    time("after positional filter")(println("  n=" + posOk.count()))

    val pairs = time("distinct pairs")(
      posOk.select(col("a.id").as("id1"), col("b.id").as("id2"))
        .distinct().cache())
    println("  pairs=" + pairs.count())

    val verified = pairs
      .join(sets.select(col("id").as("id1"), col("sset").as("s1")), "id1")
      .join(sets.select(col("id").as("id2"), col("sset").as("s2")), "id2")
      .select(col("id1"), col("id2"),
        (size(array_intersect(col("s1"), col("s2"))).cast("double") /
          size(array_union(col("s1"), col("s2")))).as("jaccard"))
      .filter(col("jaccard") >= t)
    time("verification")(println("  out=" + verified.count()))

    time("full current q95")(
      graft.ext.Dedup.prefixFilterJaccardPairs(sets, t).count())
    spark.stop()
  }
}
// appended variant: profile the NEW FromIndex path with a cached index
object ProfileQ95New {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val t = if (args.length > 1) args(1).toDouble else 0.4
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.ansi.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import org.apache.spark.sql.functions._
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val sets = graft.ext.Dedup.shingleSets(docs, "doc_id", "text", 3).cache()
    sets.count()
    val idx = graft.ext.Dedup.jaccardPrefixIndex(sets, t).cache()
    idx.count()
    def time[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"$label: ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    val out = graft.ext.Dedup.prefixFilterJaccardPairsFromIndex(idx, sets, t)
    time("warmup")(out.count())
    time("pass1")(graft.ext.Dedup.prefixFilterJaccardPairsFromIndex(idx, sets, t).count())
    time("pass2")(graft.ext.Dedup.prefixFilterJaccardPairsFromIndex(idx, sets, t).count())
    graft.ext.Dedup.prefixFilterJaccardPairsFromIndex(idx, sets, t).explain("formatted")
    spark.stop()
  }
}
