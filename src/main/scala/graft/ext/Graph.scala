package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Iterative graph algorithms over plain edge-list DataFrames — no graph
  * library, just the two shuffles per round Spark already optimizes (a join
  * on the source key and an aggregation on the destination key).
  *
  * The 100-TB shape: state is one row per node and the edge list is joined —
  * never collected, never densified to a matrix. Each power-method round is
  * edge-join → map-side-combined sum per destination, so the exchange
  * volume per round is O(|V|) after partial aggregation no matter how many
  * edges feed a hub. Long iteration chains truncate lineage with
  * `localCheckpoint` every few rounds (same pattern as the
  * Shiloach-Vishkin connected-components fixpoint in
  * [[graft.ext.Dedup]]).
  */
object Graph {

  /** Weighted PageRank over a directed edge list. Transition probability
    * out of a node is its edge weight over the node's total out-weight;
    * per round every rank becomes `teleport / N + damping * Σ_in p·r`.
    *
    * Conventions pinned for oracle replay: the node set is every id
    * appearing as source OR destination; ranks start uniform at `1/N`; a
    * node with no out-edges (dangling) leaks its mass — the classic
    * simplification, harmless on symmetric graphs where none exist — and
    * `teleport`/`damping` are passed as separate literals so both engines
    * evaluate the identical IEEE constants (no `1 - damping` re-derivation
    * noise). Output: `(node, rank)` unrounded; callers round for display.
    */
  def pageRank(edges: DataFrame, srcCol: String, dstCol: String,
      wCol: String, damping: Double = 0.85, teleport: Double = 0.15,
      iters: Int = 3): DataFrame = {
    require(iters >= 1, s"iters=$iters must be >= 1")
    val e = edges.select(col(srcCol).as("__src"), col(dstCol).as("__dst"),
      col(wCol).cast("double").as("__w"))
    val outW = e.groupBy("__src").agg(sum(col("__w")).as("__ow"))
    // transition matrix rows, reused every round — cache so the upstream
    // edge derivation runs once, not once per iteration of the loop below
    val trans = e.join(outW, "__src")
      .select(col("__src"), col("__dst"), (col("__w") / col("__ow")).as("__p"))
      .cache()
    val nodes = e.select(col("__src").as("node"))
      .union(e.select(col("__dst"))).distinct().cache()
    val n = nodes.count() // bounded driver scalar: one long, not data
    require(n > 0, "pageRank: empty edge list")
    var ranks = nodes.withColumn("__r", lit(1.0 / n))
    for (i <- 0 until iters) {
      val contrib = trans.join(ranks, trans("__src") === ranks("node"))
        .groupBy(col("__dst").as("node"))
        .agg(sum(col("__p") * col("__r")).as("__m"))
      ranks = nodes.join(contrib, Seq("node"), "left").select(col("node"),
        (lit(teleport / n) + lit(damping) * coalesce(col("__m"), lit(0d)))
          .as("__r"))
      if (i % 5 == 4) ranks = ranks.localCheckpoint()
    }
    ranks.withColumnRenamed("__r", "rank")
  }
}
