package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** k-CORE decomposition by iterative peeling (Seidman 1983; Batagelj &
  * Zaveršnik 2003) — the maximal subgraph in which every node has degree
  * ≥ k. The link-graph robustness signal next to [[Triangles]]' local
  * clustering: spam rings and boilerplate mirror farms sit in dense cores,
  * pendant chains and one-off outlinks peel away; "is this host in the
  * 3-core of the link graph" is a standard crawl-quality feature, and the
  * core is also the cheap pre-filter before triangle/community work
  * (everything outside the 2-core is triangle-free by construction).
  *
  * Scale shape: each peel round is ONE degree rollup (map-side combined
  * count per endpoint) plus two left-semi equi-joins filtering the edge
  * list to surviving endpoints — keyed shuffles only, never all-pairs. The
  * edge frame shrinks monotonically, so later rounds cost less than
  * earlier ones; each round materializes (`localCheckpoint`, the
  * [[PageRank]]/[[Bfs]] lineage argument) and the loop stops the first
  * round that removes nothing. Rounds are bounded by the longest peel
  * chain — the pathological case is a bare path (n/2 rounds), but link
  * graphs peel in a handful of waves; `maxRounds` hard-caps the
  * pathology. Degrees are exact longs end-to-end, so the result is
  * engine-exact and DuckDB-oracle-able by an unrolled peel-layer chain
  * (q176): layer i = degrees of layer i−1's edges, keep nodes ≥ k, keep
  * edges with both endpoints kept — monotone, so any unroll depth ≥ the
  * converged wave count yields the identical fixpoint.
  */
object KCore {

  /** `edges`: (src, dst) directed or undirected; duplicates, direction
    * pairs, and self-loops tolerated (collapsed to canonical undirected
    * edges, self-loops dropped — a self-loop never certifies core
    * membership). Returns (node, core_deg) for every member of the k-core,
    * `core_deg` = the node's degree WITHIN the core (≥ k by definition). */
  def core(edges: DataFrame, k: Int, maxRounds: Int = 100): DataFrame =
    coreWithRounds(edges, k, maxRounds)._1

  /** [[core]] plus the number of peel rounds actually run — the fixpoint is
    * proven iff the loop stopped before `maxRounds` (the final round
    * removed nothing); callers pinning an unrolled fixed-depth oracle
    * (q176) assert the returned count against their unroll depth. */
  def coreWithRounds(
      edges: DataFrame,
      k: Int,
      maxRounds: Int = 100): (DataFrame, Int) = {
    require(k >= 1, s"k must be >= 1 (got $k)")
    require(maxRounds >= 1, s"maxRounds must be >= 1 (got $maxRounds)")
    def degrees(und: DataFrame): DataFrame =
      und.select(col("u").as("node"))
        .unionAll(und.select(col("v").as("node")))
        .groupBy("node").agg(count(lit(1)).as("deg"))
    var cur = edges.filter(col("src") =!= col("dst"))
      .select(least(col("src"), col("dst")).as("u"),
        greatest(col("src"), col("dst")).as("v"))
      .distinct()
      .localCheckpoint(true)
    var nEdges = cur.count()
    var rounds = 0
    var converged = nEdges == 0L
    while (!converged && rounds < maxRounds) {
      rounds += 1
      val alive = degrees(cur).filter(col("deg") >= k).select("node")
      val next = cur
        .join(alive.withColumnRenamed("node", "u"), Seq("u"), "left_semi")
        .join(alive.withColumnRenamed("node", "v"), Seq("v"), "left_semi")
        .localCheckpoint(true)
      val n = next.count()
      // a peeled node always owns ≥ 1 surviving edge (degree ≥ 1 — nodes
      // exist only as edge endpoints), so edge-count fixpoint ⟺ node
      // fixpoint: nothing removed means the peel is done
      converged = n == nEdges
      cur = next
      nEdges = n
    }
    require(converged,
      s"k-core did not converge in $maxRounds peel rounds — raise maxRounds")
    (degrees(cur).withColumnRenamed("deg", "core_deg"), rounds)
  }
}
