package graft.tools

import org.apache.spark.sql.functions._
import graft.{Queries, Sessions}
import graft.operators.{GraphStats, Louvain}

object ProbeWarm {
  def main(args: Array[String]): Unit = {
    val spark = Sessions.local(cores = 8)
    for (sf <- Seq("0.001", "0.01", "0.1")) {
      val dir = s"/root/testdata/sf$sf"
      val today = Queries.affinityTopEdges(spark, dir).localCheckpoint(true)
      val yest = Queries.affinityTopEdges(spark, dir,
        before = Some("2024-01-16")).localCheckpoint(true)
      def q(l: org.apache.spark.sql.DataFrame): Double =
        GraphStats.modularity(today, l.select("node", "label"))
          .agg(sum(col("modularity"))).head.getDouble(0)
      val old = Louvain.communities(yest, 6).localCheckpoint(true)
      for (budget <- Seq(1, 2, 4)) {
        val warm = Louvain.communitiesFrom(today, Some(old), budget)
        val cold = Louvain.communitiesFrom(today, None, budget)
        println(f"[probewarm] sf$sf budget=$budget qwarm=${q(warm)}%.4f qcold=${q(cold)}%.4f qold_on_today=${q(old.join(today.select(col("src").as("node")).unionByName(today.select(col("dst").as("node"))).distinct(), Seq("node")))}%.4f")
      }
    }
    spark.stop()
  }
}
