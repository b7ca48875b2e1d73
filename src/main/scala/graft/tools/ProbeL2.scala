package graft.tools

import org.apache.spark.sql.functions._
import graft.{Queries, Sessions}
import graft.operators.{GraphStats, Louvain}

object ProbeL2 {
  def main(args: Array[String]): Unit = {
    val spark = Sessions.local(cores = 8)
    for (sf <- Seq("0.001", "0.01", "0.1")) {
      val dir = s"/root/testdata/sf$sf"
      val edges = Queries.affinityTopEdges(spark, dir).localCheckpoint(true)
      def q(l: org.apache.spark.sql.DataFrame): Double =
        GraphStats.modularity(edges, l.select("node", "label"))
          .agg(sum(col("modularity"))).head.getDouble(0)
      val l1 = Louvain.communities(edges, 6)
      val l2 = Louvain.twoLevel(edges, 6, 4)
      val n1 = l1.select("label").distinct().count()
      val n2 = l2.select("label").distinct().count()
      println(f"[probel2] sf$sf q1=${q(l1)}%.4f q2=${q(l2)}%.4f comms $n1 -> $n2")
    }
    spark.stop()
  }
}
