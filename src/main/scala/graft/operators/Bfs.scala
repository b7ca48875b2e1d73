package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Multi-source breadth-first search over an edge list — the graph-traversal
  * primitive next to [[PageRank]]'s centrality and [[Dedup]]'s connected
  * components: (node, dist) for every node reachable from a source set,
  * `dist` = fewest hops. The crawl/link-graph uses: seed-set distance
  * labeling (quality propagates outward from trusted seeds — the TrustRank
  * shape), contamination blast-radius ("everything within k hops of a leaked
  * eval document"), and reachability pruning.
  *
  * Scale shape: frontier expansion, one round per DEPTH level — each round
  * is ONE frontier×edges equi-join on src + one distinct + one anti-join
  * against the visited set (all keyed shuffles, never all-pairs). Rounds are
  * bounded by the graph's diameter — small for real link graphs (the
  * small-world property), and hard-capped by `maxDepth` so a pathological
  * chain cannot loop unbounded. The visited and frontier frames are
  * node-sized; both are materialized per round (`localCheckpoint`) because
  * each round references them twice — the [[PageRank]] re-execution
  * argument — and the per-round emptiness check that terminates the loop
  * needs an executed frame anyway (EAGER, like PageRank.run). Distances are
  * exact integers end-to-end, so the result is engine-exact and
  * DuckDB-oracle-able (depth-capped recursive CTE + min per node). */
object Bfs {

  /** `edges`: (src: long, dst: long) directed; `sources`: (node: long).
    * Returns (node, dist: long) for every node within `maxDepth` hops of
    * any source (sources themselves at dist 0, whether or not they appear
    * in the edge list). Duplicate edges/sources are deduplicated. */
  def distances(
      edges: DataFrame,
      sources: DataFrame,
      maxDepth: Int = 50): DataFrame = {
    require(maxDepth >= 0, s"maxDepth must be >= 0 (got $maxDepth)")
    val e = edges.select(col("src"), col("dst")).distinct().persist()
    var visited = sources.select(col("node")).distinct()
      .withColumn("dist", lit(0L))
      .localCheckpoint(true)
    var frontier = visited.select("node")
    var depth = 0L
    var done = maxDepth == 0
    while (!done) {
      depth += 1
      val next = frontier
        .join(e.withColumnRenamed("src", "node"), Seq("node"))
        .select(col("dst").as("node")).distinct()
        .join(visited.select("node"), Seq("node"), "left_anti")
        .withColumn("dist", lit(depth))
        .localCheckpoint(true)
      if (next.isEmpty || depth >= maxDepth) done = true
      visited = visited.unionByName(next).localCheckpoint(true)
      frontier = next.select("node")
    }
    e.unpersist()
    visited
  }

  /** Per-source BFS distances: (root, node, dist) for every (source,
    * reachable-node) pair — the LANDMARK-distance table behind harmonic
    * centrality estimation (Boldi & Vigna 2014's axioms; Common Crawl ranks
    * hosts by exactly this family): at graph scale one computes centrality
    * from a SAMPLED landmark set, and this operator is that primitive. Same
    * frontier loop as [[distances]] with a composite (root, node) state
    * key, so the per-round joins stay keyed equi-joins; state is
    * |landmarks| × reachable nodes — the deliberate price of per-source
    * exactness (keep the landmark set sampled, that is the algorithm). */
  def perSourceDistances(
      edges: DataFrame,
      sources: DataFrame,
      maxDepth: Int = 50): DataFrame = {
    require(maxDepth >= 0, s"maxDepth must be >= 0 (got $maxDepth)")
    val e = edges.select(col("src"), col("dst")).distinct().persist()
    var visited = sources.select(col("node")).distinct()
      .select(col("node").as("root"), col("node"))
      .withColumn("dist", lit(0L))
      .localCheckpoint(true)
    var frontier = visited.select("root", "node")
    var depth = 0L
    var done = maxDepth == 0
    while (!done) {
      depth += 1
      val next = frontier
        .join(e.withColumnRenamed("src", "node"), Seq("node"))
        .select(col("root"), col("dst").as("node")).distinct()
        .join(visited.select("root", "node"), Seq("root", "node"), "left_anti")
        .withColumn("dist", lit(depth))
        .localCheckpoint(true)
      if (next.isEmpty || depth >= maxDepth) done = true
      visited = visited.unionByName(next).localCheckpoint(true)
      frontier = next.select("root", "node")
    }
    e.unpersist()
    visited
  }

  /** Harmonic centrality from a landmark set: for each node, Σ_{root ≠ node}
    * 1/d(root, node) over the landmarks that reach it — unreachable pairs
    * contribute 0 by the harmonic convention (the property that makes the
    * measure well-defined on disconnected graphs, Boldi & Vigna 2014).
    * Terms fold in sorted root order (the q140 deterministic-fold contract:
    * every 1/d is an exact IEEE division, identical fold order ⇒
    * bit-identical sums, so the result is oracle-hashable). The buffer is
    * O(|landmarks|) per node — landmarks are a sample, that bound is the
    * design. */
  def harmonicCentrality(
      edges: DataFrame,
      landmarks: DataFrame,
      maxDepth: Int = 50): DataFrame =
    perSourceDistances(edges, landmarks, maxDepth)
      .filter(col("dist") > 0)
      .groupBy("node")
      .agg(aggregate(
        array_sort(collect_list(struct(col("root"),
          (lit(1.0) / col("dist").cast("double")).as("__v")))),
        lit(0.0), (acc, x) => acc + x.getField("__v")).as("harmonic"))
}
