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
    val und = edges.filter(col("src") =!= col("dst"))
      .select(least(col("src"), col("dst")).as("u"),
        greatest(col("src"), col("dst")).as("v"))
      .distinct()
    val deg = und.select(col("u").as("node"))
      .unionAll(und.select(col("v").as("node")))
      .groupBy("node").agg(count(lit(1)).as("deg"))
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
