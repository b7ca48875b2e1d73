package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Exact triangle counting via DEGREE-ORDERED ORIENTATION (Schank & Wagner
  * 2005; Cohen's MapReduce formulation; Suri & Vassilvitskii WWW'11) — the
  * graph-quality microstructure signal (clustering coefficient, spam-farm
  * detection: link farms are triangle-dense, organic link graphs are
  * locally sparse).
  *
  * The naive wedge join explodes on hubs: a node of degree d contributes
  * d² wedges, and crawl graphs have million-degree hubs. Orienting every
  * undirected edge from its lower-(degree, id) endpoint to the higher makes
  * each triangle countable exactly once AND bounds the per-node oriented
  * out-degree by O(√|E|) on ANY graph — the hub's edges point INTO it, so
  * the hub generates no wedges at all. Three keyed equi-joins total
  * (wedge-build on the pivot + closing-edge probe), never a cartesian;
  * counts are exact integers end-to-end, so the result is engine-exact and
  * DuckDB-oracle-able. Self-loops are dropped (no triangle contains one);
  * parallel/bidirectional edges collapse to one undirected edge. */
object Triangles {

  /** `edges`: (src, dst) directed or undirected, duplicates/self-loops
    * tolerated. Returns (node, n_triangles) for every node in at least one
    * triangle. */
  def perNode(edges: DataFrame): DataFrame = {
    val und = canonicalUndirected(edges)
    perNodeOn(und, degreesOf(und))
  }

  /** LOCAL CLUSTERING COEFFICIENT (Watts & Strogatz 1998) per node:
    * `2·triangles / (deg·(deg−1))` — the fraction of a node's neighbor
    * pairs that are themselves linked, the microstructure quality signal
    * [[perNode]]'s raw counts feed (link farms cluster near 1, organic
    * link graphs sit low). Nodes of degree < 2 are excluded (no neighbor
    * pair exists — the coefficient is undefined, not 0). Triangle counts
    * and degrees are exact longs and the coefficient is ONE IEEE division
    * of exactly-represented integers, so every row is engine-exact with no
    * rounding needed. Shares one canonical edge frame and one degree
    * rollup between the orientation and the denominator — the triangle
    * join is the only non-linear stage (the [[perNode]] O(√|E|) wedge
    * bound). Returns (node, deg, n_triangles, clustering). */
  def localClustering(edges: DataFrame): DataFrame = {
    val und = canonicalUndirected(edges)
    val deg = degreesOf(und)
    deg.filter(col("deg") >= 2)
      .join(perNodeOn(und, deg), Seq("node"), "left_outer")
      .select(col("node"), col("deg"),
        coalesce(col("n_triangles"), lit(0L)).as("n_triangles"),
        ((coalesce(col("n_triangles"), lit(0L)) * 2).cast("double") /
          (col("deg") * (col("deg") - 1)).cast("double")).as("clustering"))
  }

  private def canonicalUndirected(edges: DataFrame): DataFrame =
    edges.filter(col("src") =!= col("dst"))
      .select(least(col("src"), col("dst")).as("u"),
        greatest(col("src"), col("dst")).as("v"))
      .distinct()

  private def degreesOf(und: DataFrame): DataFrame =
    und.select(col("u").as("node"))
      .unionAll(und.select(col("v").as("node")))
      .groupBy("node").agg(count(lit(1)).as("deg"))

  private def perNodeOn(und: DataFrame, deg: DataFrame): DataFrame = {
    // orient low-(deg, id) → high-(deg, id); carry the HEAD's order key so
    // wedges can be emitted in canonical (b < c) orientation without a
    // degree re-join
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
    triangles
      .select(explode(array(col("a"), col("b"), col("c"))).as("node"))
      .groupBy("node").agg(count(lit(1)).as("n_triangles"))
  }
}
