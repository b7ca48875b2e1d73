package graft.tools

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.{Queries, Sessions}

/** Measures q214's sampled-betweenness top-10 recall vs exact on the real
  * affinity graph for several deterministic pivot densities — the number
  * that picks the registered pivot rule and its floor. */
object ProbeBc2 {
  def main(args: Array[String]): Unit = {
    val spark = Sessions.local(cores = 8)
    for (dir <- Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01",
        "/root/testdata/sf0.1")) {
      val edges = Queries.affinityTopEdges(spark, dir).localCheckpoint(true)
      val nodes = edges.select(col("src").as("node"))
        .unionByName(edges.select(col("dst").as("node"))).distinct()
        .localCheckpoint(true)
      def topN(df: DataFrame, n: Int) = df
        .orderBy(col("betweenness").desc, col("node").asc).limit(n)
        .select("node")
      def top(df: DataFrame) = topN(df, 10)
      val exactAll = graft.operators.Betweenness.fromPivots(
        edges, nodes, maxDepth = 20).localCheckpoint(true)
      val exact = top(exactAll).localCheckpoint(true)
      for ((name, pred) <- Seq(
          "mod2" -> (pmod(col("node"), lit(2)) === 0),
          "mod3not0" -> (pmod(col("node"), lit(3)) =!= 0),
          "mod4not0" -> (pmod(col("node"), lit(4)) =!= 0))) {
        val pivots = nodes.filter(pred)
        val s = top(graft.operators.Betweenness.fromPivots(
          edges, pivots, maxDepth = 20)).localCheckpoint(true)
        val hits = exact.join(s, Seq("node"), "left_semi").count()
        val band16 = s.join(topN(exactAll, 16), Seq("node"), "left_semi")
          .count()
        println(s"[probebc2] $dir $name pivots=${pivots.count()} " +
          s"hits=$hits/10 inBand16=$band16/10")
      }
    }
    spark.stop()
  }
}
