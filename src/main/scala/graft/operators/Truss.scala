package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** k-TRUSS decomposition (Cohen 2008; Wang & Cheng VLDB'12) — the maximal
  * subgraph in which every EDGE sits in at least k−2 triangles (counted
  * within the subgraph): the edge-level cohesion bar between [[KCore]]'s
  * degree floor and full clique mining. A 4-truss edge has two independent
  * witnesses to its community membership, which is why truss cores are the
  * standard spam-ring / mutual-admiration-cluster extractor on link
  * graphs: a hub can fake degree (k-core) with pendant links, but it
  * cannot fake triangle support without reciprocated neighborhoods.
  *
  * Scale shape: each peel round is one triangle enumeration over the
  * surviving edges ([[Triangles]]' DEGREE-ORDERED orientation — per-node
  * oriented out-degree bounded O(√|E|), hubs generate no wedges), one
  * map-side-combined support rollup, and one left-semi filter — keyed
  * shuffles only. The edge frame shrinks monotonically (later rounds cost
  * less); each round materializes (`localCheckpoint`, the
  * [[PageRank]]/[[Bfs]] lineage argument) and the loop stops the first
  * round that removes nothing, hard-capped by `maxRounds` with a LOUD
  * failure, never a silent partial answer. Supports are exact longs
  * end-to-end, so the result is engine-exact and DuckDB-oracle-able by an
  * unrolled peel-layer chain (the q176 contract): monotone layers, so any
  * unroll depth ≥ the converged round count yields the identical fixpoint.
  */
object Truss {

  /** `edges`: (src, dst) directed or undirected; duplicates, direction
    * pairs, and self-loops tolerated (collapsed to canonical undirected,
    * self-loops dropped). Returns (u, v, support) for every edge of the
    * k-truss, `support` = its triangle count WITHIN the truss (≥ k−2). */
  def edges(edges: DataFrame, k: Int, maxRounds: Int = 100): DataFrame =
    edgesWithRounds(edges, k, maxRounds)._1

  /** [[edges]] plus the number of peel rounds actually run — callers
    * pinning an unrolled fixed-depth oracle assert the returned count
    * against their unroll depth (the q172/q176 contract). */
  def edgesWithRounds(
      edgesDf: DataFrame,
      k: Int,
      maxRounds: Int = 100): (DataFrame, Int) = {
    require(k >= 3, s"k must be >= 3 — the 2-truss is every edge (got $k)")
    require(maxRounds >= 1, s"maxRounds must be >= 1 (got $maxRounds)")
    var cur = edgesDf.filter(col("src") =!= col("dst"))
      .select(least(col("src"), col("dst")).as("u"),
        greatest(col("src"), col("dst")).as("v"))
      .distinct()
      .localCheckpoint(true)
    var nEdges = cur.count()
    var rounds = 0
    var converged = nEdges == 0L
    while (!converged && rounds < maxRounds) {
      rounds += 1
      val next = cur.join(
          support(cur).filter(col("support") >= k - 2).select("u", "v"),
          Seq("u", "v"), "left_semi")
        .localCheckpoint(true)
      val n = next.count()
      converged = n == nEdges
      cur = next
      nEdges = n
    }
    require(converged,
      s"$k-truss did not converge in $maxRounds peel rounds — raise maxRounds")
    // final support within the fixpoint subgraph; every survivor has
    // support >= k-2 >= 1, so the inner join drops nothing
    (cur.join(support(cur), Seq("u", "v")), rounds)
  }

  /** Per-edge triangle support of a canonical undirected edge frame —
    * [[Triangles]]' degree-ordered enumeration (each triangle found once),
    * exploded to its three canonical edges and counted. */
  private def support(und: DataFrame): DataFrame = {
    val deg = und.select(col("u").as("node"))
      .unionAll(und.select(col("v").as("node")))
      .groupBy("node").agg(count(lit(1)).as("deg"))
    val oriented = und
      .join(deg.toDF("u", "__du"), Seq("u"))
      .join(deg.toDF("v", "__dv"), Seq("v"))
      .select(
        when(struct(col("__du"), col("u")) < struct(col("__dv"), col("v")),
          col("u")).otherwise(col("v")).as("a"),
        when(struct(col("__du"), col("u")) < struct(col("__dv"), col("v")),
          col("v")).otherwise(col("u")).as("b"),
        when(struct(col("__du"), col("u")) < struct(col("__dv"), col("v")),
          col("__dv")).otherwise(col("__du")).as("__db"))
    val triangles = oriented.select(col("a"), col("b").as("__b"), col("__db"))
      .join(oriented.select(col("a"), col("b").as("__c"),
        col("__db").as("__dc")), Seq("a"))
      .filter(struct(col("__db"), col("__b")) < struct(col("__dc"), col("__c")))
      .join(oriented.select(col("a").as("__b"), col("b").as("__c")),
        Seq("__b", "__c"), "left_semi")
      .select(col("a"), col("__b").as("b"), col("__c").as("c"))
    triangles.select(explode(array(
        struct(least(col("a"), col("b")).as("u"),
          greatest(col("a"), col("b")).as("v")),
        struct(least(col("a"), col("c")).as("u"),
          greatest(col("a"), col("c")).as("v")),
        struct(least(col("b"), col("c")).as("u"),
          greatest(col("b"), col("c")).as("v")))).as("p"))
      .select(col("p.u").as("u"), col("p.v").as("v"))
      .groupBy("u", "v").agg(count(lit(1)).as("support"))
  }
}
