package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Neighborhood-based LINK PREDICTION (Liben-Nowell & Kleinberg CIKM'03):
  * for every NON-adjacent node pair sharing at least one common neighbor,
  * the common-neighbor count and the neighborhood Jaccard
  * `|N(u)∩N(v)| / |N(u)∪N(v)|` — the classic "who should be linked"
  * candidate generator (crawl frontier prioritization, related-document
  * suggestion, knowledge-graph completion) and the missing-edge complement
  * of [[Triangles]]: a triangle closes an existing wedge, a link-prediction
  * candidate is a wedge that never closed.
  *
  * Scale shape: ONE adjacency self-join on the wedge pivot plus keyed
  * degree joins and a left-anti against the edge set — all equi-joins, no
  * cartesian. Wedge work is Σ deg(pivot)², which is why this operator is
  * meant for DEGREE-BOUNDED graphs (rank-capped kNN / top-k affinity
  * graphs, where the bound is k²·|V| by construction — the q189 graph is
  * ≤3-out). On a raw power-law crawl graph a million-degree hub makes
  * every pair of its neighbors a candidate — 10¹² wedges of no predictive
  * value — so the degree bound is ENFORCED, not advisory: by default any
  * node over `maxDegree` fails the job loudly (a codegen'd `raise_error`
  * guard inside the degree rollup, so the operator stays a lazy plan and
  * the `link_predict` TVF plans without running anything). That lazy
  * guard is a BEST-EFFORT abort, not a pre-flight: Spark schedules the
  * wedge self-join stage concurrently with the degree rollup, so on a
  * hub graph part of the deg² shuffle may run (or OOM) before the guard
  * stage fails. Callers who need the hard pre-flight pass
  * `preflight = true` — an EAGER node-sized degree check (one rollup +
  * one 1-row collect, the bounded-anchor pattern) that rejects the hub
  * BEFORE any wedge plan exists, at the price of the operator no longer
  * being a pure lazy plan. Passing
  * `capDegrees = true` instead rank-truncates adjacency to each node's
  * `maxDegree` smallest-id neighbors BEFORE the wedge join, kept only where
  * BOTH endpoints' caps agree (the symmetric cap — the one that actually
  * bounds a pivot's in-adjacency) — and then every output (cn, degrees,
  * jaccard) describes the truncated graph: a documented subset, never a
  * silent blow-up.
  *
  * Exactness: counts and degrees are exact longs; the Jaccard is ONE IEEE
  * division of exactly-represented integers (the [[Triangles
  * .localClustering]] contract), so every row is engine-exact with no
  * rounding. Self-loops dropped; parallel/bidirectional edges collapse to
  * one undirected edge. */
object LinkPredict {

  /** `edges`: (src, dst) directed or undirected, duplicates/self-loops
    * tolerated. Returns (u, v, cn, deg_u, deg_v, jaccard) for every
    * unordered non-adjacent pair u < v with cn ≥ 1.
    *
    * `maxDegree` is the enforced wedge-work contract: with
    * `capDegrees = false` (default) a node whose undirected degree exceeds
    * it aborts the job with a named diagnostic; with `capDegrees = true`
    * each node's adjacency is first truncated to its `maxDegree` smallest
    * neighbor ids, symmetrically (an edge survives only if it makes BOTH
    * endpoints' caps — deterministic), and all outputs describe that
    * truncated graph — adjacent pairs of the ORIGINAL graph are still
    * excluded in full.
    *
    * `preflight = true` (refuse mode only) runs the degree check EAGERLY
    * before building the wedge plan — the hard abort; the default keeps
    * the operator lazy with the best-effort in-plan guard. */
  def jaccardCandidates(edges: DataFrame, maxDegree: Int = 1000,
                        capDegrees: Boolean = false,
                        preflight: Boolean = false): DataFrame = {
    require(maxDegree >= 1, s"maxDegree must be >= 1 (got $maxDegree)")
    val und = edges.filter(col("src") =!= col("dst"))
      .select(least(col("src"), col("dst")).as("u"),
        greatest(col("src"), col("dst")).as("v"))
      .distinct()
    val adjAll = und.select(col("u").as("node"), col("v").as("nbr"))
      .unionAll(und.select(col("v").as("node"), col("u").as("nbr")))
    val adj =
      if (!capDegrees) adjAll
      else {
        // SYMMETRIC truncation: an edge survives only if it makes both
        // endpoints' per-node rank cap. Capping one direction alone would
        // not bound wedge work — the wedge pivot's cost is its IN-adjacency
        // (rows arriving from OTHER nodes' lists), which a node's own
        // capped out-list never shrinks.
        val capped = adjAll
          .withColumn("__rn", row_number().over(
            Window.partitionBy("node").orderBy("nbr")))
          .filter(col("__rn") <= maxDegree)
          .drop("__rn")
        capped.join(
          capped.select(col("nbr").as("node"), col("node").as("nbr")),
          Seq("node", "nbr"), "left_semi")
      }
    val degRaw = adj.groupBy("node").agg(count(lit(1)).as("deg"))
    if (preflight && !capDegrees) {
      // the HARD pre-flight: the degree rollup is node-sized (cheap), the
      // collect is 1 row — and no wedge stage has been submitted yet
      val worst = degRaw.orderBy(col("deg").desc, col("node").asc)
        .limit(1).collect()
      worst.headOption.foreach { r =>
        require(r.getLong(1) <= maxDegree,
          s"link-predict preflight: node ${r.get(0)} has degree " +
            s"${r.getLong(1)} > maxDegree=$maxDegree — wedge work is " +
            "deg² per node; raise maxDegree, or pass capDegrees=true to " +
            "rank-truncate adjacency (the affinity-graph cap)")
      }
    }
    // the refuse-mode guard lives INSIDE the degree rollup (a node-sized
    // frame): the deg column is selected into every output row, so the
    // check cannot be pruned away, and the failing stage is the small one
    val deg =
      if (capDegrees) degRaw
      else degRaw.select(col("node"),
        when(col("deg") <= maxDegree, col("deg"))
          .otherwise(raise_error(concat(
            lit("link-predict: node "), col("node").cast("string"),
            lit(" has degree "), col("deg").cast("string"),
            lit(s" > maxDegree=$maxDegree — wedge work is deg² per node;" +
              " raise maxDegree, or pass capDegrees=true to rank-truncate" +
              " adjacency (the affinity-graph cap)")))).as("deg"))
    val wedges = adj.select(col("node").as("u"), col("nbr"))
      .join(adj.select(col("node").as("v"), col("nbr")), Seq("nbr"))
      .filter(col("u") < col("v"))
      .groupBy("u", "v").agg(count(lit(1)).as("cn"))
    wedges
      .join(und, Seq("u", "v"), "left_anti")
      .join(deg.toDF("u", "deg_u"), Seq("u"))
      .join(deg.toDF("v", "deg_v"), Seq("v"))
      .select(col("u"), col("v"), col("cn"), col("deg_u"), col("deg_v"),
        (col("cn").cast("double") /
          (col("deg_u") + col("deg_v") - col("cn")).cast("double"))
          .as("jaccard"))
  }
}
