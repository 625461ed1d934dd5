package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Embedding similarity search over `array<float>` columns.
  *
  * Baseline: brute-force cosine top-k — broadcast the (small) query set, one
  * pass over the corpus, per-query top-k via window rank. 100-TB path:
  * SRP-LSH (random-hyperplane) bucketing — sign bits of projections onto
  * deterministic hyperplanes form a bucket key; the corpus is joined to
  * queries per bucket, cutting the candidate set by ~2^planes (an IVF-style
  * coarse quantization with hash-defined centroids).
  *
  * All vector math is higher-order-function expressions in double precision —
  * no UDFs, executes inside the JVM row pipeline.
  */
object Similarity {

  /** Codegen'd tight-loop vector math (graft.functions.VectorExprs) — the
    * HOF formulation (`aggregate(zip_with(...))`) pays an interpreted lambda
    * call per element; these generate straight Java loops.
    */
  def dot(a: Column, b: Column): Column = graft.functions.VectorExprs.dot(a, b)

  def norm2(a: Column): Column = graft.functions.VectorExprs.norm2(a)

  def cosine(a: Column, b: Column): Column =
    dot(a, b) / (sqrt(norm2(a)) * sqrt(norm2(b)))

  /** Top-k cosine neighbors for each query vector. `queries` must be small
    * (it is broadcast); corpus side never shuffles except the final per-query
    * rank, which is tiny (k × queries rows after local pre-filtering at scale).
    */
  def bruteForceTopK(corpus: DataFrame, idCol: String, vecCol: String,
      queries: DataFrame, queryIdCol: String, queryVecCol: String,
      k: Int = 10): DataFrame = {
    val q = broadcast(queries.select(
      col(queryIdCol).as("query_id"), col(queryVecCol).as("__qv")))
    val scored = corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("__cv"))
      .join(q, col("neighbor_id") =!= col("query_id"))
      .select(col("query_id"), col("neighbor_id"),
        cosine(col("__qv"), col("__cv")).as("cos"))
    val w = Window.partitionBy("query_id").orderBy(col("cos").desc, col("neighbor_id"))
    scored.withColumn("rank", row_number().over(w)).filter(col("rank") <= k)
      .drop("rank").orderBy(col("query_id"), col("cos").desc, col("neighbor_id"))
  }

  /** Deterministic SRP hyperplanes (seeded Gaussian, fixed seed). */
  private def hyperplanes(dims: Int, planes: Int, seed: Long = 42L): Seq[Seq[Double]] = {
    val rnd = new scala.util.Random(seed)
    Seq.fill(planes)(Seq.fill(dims)(rnd.nextGaussian()))
  }

  /** Sign-random-projection bucket id (0 .. 2^planes − 1) for a vector. */
  def srpBucket(vec: Column, dims: Int, planes: Int = 8): Column = {
    val hp = hyperplanes(dims, planes)
    val bits = hp.zipWithIndex.map { case (plane, p) =>
      val proj = dot(vec, typedLit(plane))
      when(proj >= 0, lit(1L << p)).otherwise(lit(0L))
    }
    bits.reduce((a, b) => a.bitwiseOR(b))
  }

  /** LSH-bucketed approximate top-k: candidates limited to the query's SRP
    * bucket. Trades recall for a ~2^planes candidate reduction; callers pick
    * `planes` by corpus size (coarse IVF analog). Returns the same schema as
    * bruteForceTopK.
    */
  def srpBucketTopK(corpus: DataFrame, idCol: String, vecCol: String,
      queries: DataFrame, queryIdCol: String, queryVecCol: String,
      dims: Int, k: Int = 10, planes: Int = 8): DataFrame = {
    val c = corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("__cv"),
      srpBucket(col(vecCol), dims, planes).as("__bucket"))
    val q = broadcast(queries.select(col(queryIdCol).as("query_id"),
      col(queryVecCol).as("__qv"), srpBucket(col(queryVecCol), dims, planes).as("__bucket")))
    val scored = c.join(q, Seq("__bucket")).filter(col("neighbor_id") =!= col("query_id"))
      .select(col("query_id"), col("neighbor_id"), cosine(col("__qv"), col("__cv")).as("cos"))
    val w = Window.partitionBy("query_id").orderBy(col("cos").desc, col("neighbor_id"))
    scored.withColumn("rank", row_number().over(w)).filter(col("rank") <= k)
      .drop("rank").orderBy(col("query_id"), col("cos").desc, col("neighbor_id"))
  }

  /** Embedding-cosine near-duplicate pairs above a threshold, via SRP buckets
    * (both vectors of a near-dup pair land in the same bucket with high
    * probability when cosine → 1).
    */
  def cosineNearDuplicates(corpus: DataFrame, idCol: String, vecCol: String,
      dims: Int, threshold: Double = 0.95, planes: Int = 8): DataFrame = {
    val c = corpus.select(col(idCol).as("id"), col(vecCol).as("__v"),
      srpBucket(col(vecCol), dims, planes).as("__bucket"))
    val l = c.select(col("__bucket"), col("id").as("id1"), col("__v").as("__v1"))
    val r = c.select(col("__bucket"), col("id").as("id2"), col("__v").as("__v2"))
    l.join(r, Seq("__bucket")).filter(col("id1") < col("id2"))
      .select(col("id1"), col("id2"), cosine(col("__v1"), col("__v2")).as("cos"))
      .filter(col("cos") >= threshold)
  }

  /** Per-label embedding statistics (norm distribution) — sanity panel. */
  def normStats(corpus: DataFrame, labelCol: String, vecCol: String): DataFrame =
    corpus.groupBy(col(labelCol))
      .agg(count(lit(1)).as("n"),
        avg(sqrt(norm2(col(vecCol)))).as("avg_norm"),
        min(sqrt(norm2(col(vecCol)))).as("min_norm"),
        max(sqrt(norm2(col(vecCol)))).as("max_norm"))
}
