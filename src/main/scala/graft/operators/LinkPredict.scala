package graft.operators

import org.apache.spark.sql.DataFrame
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
  * ≤3-out). On a raw power-law crawl graph, cap degrees first (the same
  * contract as the rank cap that builds the affinity graph): a
  * million-degree hub makes every pair of its neighbors a candidate, which
  * is 10¹² wedges of no predictive value.
  *
  * Exactness: counts and degrees are exact longs; the Jaccard is ONE IEEE
  * division of exactly-represented integers (the [[Triangles
  * .localClustering]] contract), so every row is engine-exact with no
  * rounding. Self-loops dropped; parallel/bidirectional edges collapse to
  * one undirected edge. */
object LinkPredict {

  /** `edges`: (src, dst) directed or undirected, duplicates/self-loops
    * tolerated. Returns (u, v, cn, deg_u, deg_v, jaccard) for every
    * unordered non-adjacent pair u < v with cn ≥ 1. */
  def jaccardCandidates(edges: DataFrame): DataFrame = {
    val und = edges.filter(col("src") =!= col("dst"))
      .select(least(col("src"), col("dst")).as("u"),
        greatest(col("src"), col("dst")).as("v"))
      .distinct()
    val adj = und.select(col("u").as("node"), col("v").as("nbr"))
      .unionAll(und.select(col("v").as("node"), col("u").as("nbr")))
    val deg = adj.groupBy("node").agg(count(lit(1)).as("deg"))
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
