package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Multi-source WEIGHTED shortest path over an edge list — min-plus
  * relaxation (distributed Bellman–Ford), the link-graph primitive next to
  * [[Bfs]]'s hop distances: (node, dist) for every node reachable from a
  * source set, `dist` = minimum total edge weight. The crawl/link-graph
  * uses: trust decay over weighted links (edge weight = hop cost / inverse
  * link strength), cheapest-path blast radius, and weighted seed-distance
  * labeling where [[Bfs.distances]]' unit hops are too coarse — a
  * cheaper-but-longer path must beat a shorter-hop expensive one, which is
  * exactly what min-plus computes and BFS cannot.
  *
  * Scale shape: frontier relaxation, one round per improvement wave — each
  * round is ONE frontier×edges equi-join on src, a `min(dist)` rollup per
  * reached node, and a keyed improvement check against the standing
  * distances (all keyed shuffles, never all-pairs; parallel edges collapse
  * inside the same rollup at no extra pass). Rounds are bounded by the
  * longest shortest-PATH hop count — ≤ |V|−1 in theory, small for
  * small-world link graphs — and hard-capped by `maxRounds`. The distance
  * and frontier frames are node-sized; both materialize per round
  * (`localCheckpoint`, the [[PageRank]]/[[Bfs]] re-execution argument), and
  * the loop stops EAGERLY the first round that improves nothing — the
  * convergence test [[PageRank.runConverged]] uses. Weights are exact
  * non-negative LONGS end-to-end (min-plus on negative weights never
  * terminates — rejected up front), so distances are engine-exact and
  * DuckDB-oracle-able by an unrolled Bellman–Ford layer chain (q172).
  */
object Sssp {

  /** `edges`: (src: long, dst: long, w: long ≥ 0) directed; parallel edges
    * are fine (the cheapest wins inside the per-round rollup). `sources`:
    * (node: long). Returns (node, dist: long) for every node reachable from
    * any source within `maxRounds` relaxation waves (sources themselves at
    * dist 0, whether or not they appear in the edge list). */
  def distances(
      edges: DataFrame,
      sources: DataFrame,
      maxRounds: Int = 100): DataFrame =
    distancesWithRounds(edges, sources, maxRounds)._1

  /** [[distances]] plus the number of relaxation rounds actually run —
    * convergence is proven iff `rounds < maxRounds` OR the final round
    * improved nothing; callers pinning an unrolled fixed-depth oracle
    * (q172) assert the returned count against their unroll depth. */
  def distancesWithRounds(
      edges: DataFrame,
      sources: DataFrame,
      maxRounds: Int = 100): (DataFrame, Int) = {
    require(maxRounds >= 0, s"maxRounds must be >= 0 (got $maxRounds)")
    val e = edges
      .select(col("src"), col("dst"), col("w").cast("long").as("w"))
      .distinct()
      .persist()
    // fail fast BEFORE the rounds: a single negative weight makes min-plus
    // diverge around any cycle it touches — a wrong answer after maxRounds,
    // not an error, unless rejected here (one bounded probe on the persisted
    // edge frame the loop reuses)
    val neg = e.filter(col("w") < 0).limit(1).collect()
    require(neg.isEmpty,
      s"edge (${if (neg.isEmpty) "" else s"${neg(0).getLong(0)} -> ${neg(0).getLong(1)}"}) " +
        "has negative weight — min-plus shortest path requires w >= 0")
    var dist = sources.select(col("node")).distinct()
      .withColumn("dist", lit(0L))
      .localCheckpoint(true)
    var frontier = dist
    var round = 0
    var done = maxRounds == 0
    while (!done) {
      round += 1
      val improved = frontier
        .join(e.withColumnRenamed("src", "node"), Seq("node"))
        .select(col("dst").as("node"), (col("dist") + col("w")).as("dist"))
        .groupBy("node").agg(min("dist").as("dist"))
        .join(dist.select(col("node"), col("dist").as("__old")),
          Seq("node"), "left_outer")
        .filter(col("__old").isNull || col("dist") < col("__old"))
        .select("node", "dist")
        .localCheckpoint(true)
      if (improved.isEmpty || round >= maxRounds) done = true
      dist = dist.unionByName(improved)
        .groupBy("node").agg(min("dist").as("dist"))
        .localCheckpoint(true)
      frontier = improved
    }
    e.unpersist()
    (dist, round)
  }
}
