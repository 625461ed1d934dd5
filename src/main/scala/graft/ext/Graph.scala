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

  /** Breadth-first hop distances from a seed set over an undirected edge
    * list — the Pregel frontier pattern on plain DataFrames: each round
    * joins the current frontier against the edge list, dedups the
    * discovered nodes, and anti-joins the visited set, so a node is
    * labeled with its MINIMUM hop count exactly once. Rounds are bounded
    * by `maxHops` (BFS rounds = graph diameter, not data size); lineage is
    * truncated per round with `localCheckpoint`, and the only driver-side
    * value is the per-round frontier COUNT (one long per round — the loop
    * terminates early when a frontier empties).
    *
    * At 100 TB each round is one equi-join plus two keyed dedups — the
    * same exchange profile as the connected-components fixpoint — and the
    * visited set carries one row per reached node.
    *
    * Output: `(node, hop)` for every node reached within `maxHops`
    * (seeds at hop 0). Unreached nodes are absent; callers left-join.
    *
    * Adaptive, like [[graft.ext.Dedup.duplicateGroups]]: a long-keyed edge
    * list within the bounded driver budget (default 2^20 edges) is solved
    * by one collect + queue BFS — a diameter-round scheduler loop over a
    * graph that fits in tens of MB is pure job overhead (measured 5 s for
    * a 150-node graph at sf0.1). Larger graphs and non-long ids run the
    * distributed frontier loop, unchanged.
    */
  def bfsHops(edges: DataFrame, aCol: String, bCol: String,
      seeds: DataFrame, maxHops: Int = 20,
      driverEdgeThreshold: Int = 1 << 20): DataFrame = {
    require(maxHops >= 0, s"maxHops=$maxHops must be >= 0")
    val isLong = edges.schema(aCol).dataType ==
      org.apache.spark.sql.types.LongType &&
      edges.schema(bCol).dataType == org.apache.spark.sql.types.LongType
    // no internal checkpoint: the probe reads at most threshold+1 rows and
    // the caller owns caching of an expensive upstream pipeline (q123 feeds
    // a session-cached edge frame) — a per-call checkpoint re-materialized
    // the whole edge list on every invocation
    val edgeList = edges.select(col(aCol).as("src"), col(bCol).as("dst"))
    val probe = if (isLong) edgeList.limit(driverEdgeThreshold + 1).collect()
      else Array.empty[org.apache.spark.sql.Row]
    if (isLong && probe.length <= driverEdgeThreshold) {
      val adj = scala.collection.mutable.LongMap
        .empty[scala.collection.mutable.ArrayBuffer[Long]]
      def add(a: Long, b: Long): Unit =
        adj.getOrElseUpdate(a,
          scala.collection.mutable.ArrayBuffer.empty[Long]) += b
      probe.foreach { r => add(r.getLong(0), r.getLong(1))
        add(r.getLong(1), r.getLong(0)) }
      val seedIds = seeds.select(
        col(seeds.columns.head).cast("long")).distinct().collect()
        .map(_.getLong(0))
      val dist = scala.collection.mutable.LongMap.empty[Int]
      var frontier = seedIds.toSeq
      frontier.foreach(s => dist(s) = 0)
      var hop = 0
      while (hop < maxHops && frontier.nonEmpty) {
        hop += 1
        frontier = frontier.flatMap(n =>
          adj.getOrElse(n, Nil).filterNot(dist.contains)).distinct
        frontier.foreach(n => dist(n) = hop)
      }
      val s = edges.sparkSession
      import s.implicits._
      return dist.toSeq.sortBy(_._1).map { case (n, h) => (n, h) }
        .toDF("node", "hop")
    }
    val und = edgeList
      .union(edgeList.select(col("dst"), col("src")))
      .distinct().cache()
    var visited = seeds.select(col(seeds.columns.head).as("node"))
      .distinct().withColumn("hop", lit(0)).localCheckpoint()
    var frontier = visited.select("node")
    var hop = 0
    var done = false
    while (hop < maxHops && !done) {
      hop += 1
      val next = frontier.join(und, frontier("node") === und("src"))
        .select(col("dst").as("node")).distinct()
        .join(visited, Seq("node"), "left_anti")
        .withColumn("hop", lit(hop))
        .localCheckpoint()
      if (next.isEmpty) done = true
      else {
        visited = visited.union(next).localCheckpoint()
        frontier = next.select("node")
      }
    }
    und.unpersist()
    visited
  }

  /** Per-node triangle counts over an undirected simple graph given as a
    * DISTINCT edge list (either endpoint order, no self-loops). Edges are
    * re-oriented from the lower- to the higher-`(degree, id)` endpoint — the
    * classic orientation that bounds every node's out-degree by O(√|E|) on
    * any graph, so the wedge join below never explodes on a hub the way a
    * naive shared-neighbor join would. Wedges `u→v→w` close against the
    * oriented edge `(u, w)` via a second equi-join; every triangle is found
    * exactly once and credits each of its three corners. Output:
    * `(node, triangles)` — nodes with zero triangles are absent (callers
    * left-join + coalesce).
    */
  def triangleCounts(edges: DataFrame, aCol: String, bCol: String): DataFrame = {
    val e0 = edges.select(col(aCol).as("a"), col(bCol).as("b"))
    val deg = e0.select(col("a").as("n")).union(e0.select(col("b")))
      .groupBy("n").agg(count(lit(1)).as("d"))
    // r14: the per-corner counting was a 3-way UNION of the triangle frame,
    // so the whole wedge-join subtree (with the oriented edge list and its
    // degree joins, themselves referenced 3× as e1/e2/e3) compiled and ran
    // three times — the q96 before-plan repeated the oriented subtree 12×
    // (a 474 KB plan). One explode over the (u,v,w) corners keeps a single
    // copy of the join tree (q96: 1.5 → ~1.1 s at sf0.1). An eager
    // localCheckpoint of `o` was A/B-measured WORSE (1.9 s — the
    // materialization jobs cost more than recomputing the cheap joins over
    // the caller's cached edge frame) and rejected.
    val o = e0
      .join(deg.select(col("n").as("a"), col("d").as("da")), "a")
      .join(deg.select(col("n").as("b"), col("d").as("db")), "b")
      .select(
        when(struct(col("da"), col("a")) < struct(col("db"), col("b")),
          col("a")).otherwise(col("b")).as("src"),
        when(struct(col("da"), col("a")) < struct(col("db"), col("b")),
          col("b")).otherwise(col("a")).as("dst"))
    val wedges = o.as("e1").join(o.as("e2"), col("e1.dst") === col("e2.src"))
      .select(col("e1.src").as("u"), col("e1.dst").as("v"),
        col("e2.dst").as("w"))
    val tri = wedges.join(o.as("e3"),
      col("u") === col("e3.src") && col("w") === col("e3.dst"))
      .select(col("u"), col("v"), col("w"))
    tri.select(explode(array(col("u"), col("v"), col("w"))).as("node"))
      .groupBy("node").agg(count(lit(1)).as("triangles"))
  }
}
