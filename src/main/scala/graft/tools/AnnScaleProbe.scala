package graft.tools

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.ext.Similarity

/** ANN scale probe: 100k 64-dim clustered vectors (200 tight clusters —
  * the regime ANN indexes exist for), 100 queries. Measures brute-force
  * cosine top-5 as the truth, then recall@5 and wall time for multi-probe
  * SRP and IVF at candidate-reducing settings. All data synthesized
  * distributedly from hashes. Run: `sbt "runMain graft.tools.AnnScaleProbe [n]"`.
  */
object AnnScaleProbe {
  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toInt).getOrElse(100000)
    val dim = 64
    val clusters = 200
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.ansi.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // vector = cluster center (hash-derived uniform [-1,1] per component)
    // + 0.1-scale per-vector noise, built as one transform expression
    def u(seed: Column, k: Column): Column =
      (pmod(xxhash64(seed, k), lit(2001)) - lit(1000)) / lit(1000.0)
    val vec = transform(sequence(lit(0), lit(dim - 1)), k =>
      u(concat(lit("c"), pmod(col("vec_id"), lit(clusters))), k) +
        lit(0.1) * u(concat(lit("v"), col("vec_id")), k))
    val corpus = spark.range(n).select(col("id").as("vec_id"), vec.as("embedding")).cache()
    corpus.count()
    val queries = corpus.filter(col("vec_id") < 100)

    def timed(label: String)(df: => DataFrame): Array[(Long, Long)] = {
      val t0 = System.nanoTime()
      val rows = df.select(col("query_id"), col("neighbor_id")).collect()
        .map(r => (r.getLong(0), r.getLong(1)))
      println(f"$label%-34s ${(System.nanoTime() - t0) / 1e9}%7.2f s (${rows.length} pairs)")
      rows
    }

    val truth = timed("brute force top-5 (truth)") {
      Similarity.bruteForceTopK(corpus, "vec_id", "embedding",
        queries, "vec_id", "embedding", k = 5)
    }.toSet
    val srp = timed("srp(10 planes, probe<=1, 11/1024)") {
      Similarity.srpBucketTopK(corpus, "vec_id", "embedding",
        queries, "vec_id", "embedding", dims = dim, k = 5, planes = 10, probeHamming = 1)
    }
    val ivf = timed("ivf(64 lists, 8 probes)") {
      Similarity.ivfTopK(corpus, "vec_id", "embedding",
        queries, "vec_id", "embedding", k = 5, nLists = 64, nProbe = 8, sampleSize = 2048)
    }
    val srpRecall = srp.count(truth.contains).toDouble / truth.size
    val ivfRecall = ivf.count(truth.contains).toDouble / truth.size
    println(f"recall@5: srp $srpRecall%.3f  ivf $ivfRecall%.3f")
    assert(srpRecall >= 0.9, f"SRP recall $srpRecall%.3f below 0.9")
    assert(ivfRecall >= 0.9, f"IVF recall $ivfRecall%.3f below 0.9")
    spark.stop()
  }
}
