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
}
