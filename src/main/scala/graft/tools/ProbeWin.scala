package graft.tools

import graft._
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.execution.window.WindowExec

object ProbeWin {
  def main(args: Array[String]): Unit = {
    val spark = Sessions.local(cores = 8)
    val sfDir = "/root/testdata/sf0.01"
    for (name <- Seq("q63_token_budget", "q65_shuffle_rank")) {
      val df = Queries.all(name)(spark, sfDir)
      df.count()
      val finalPlan = df.queryExecution.executedPlan match {
        case a: AdaptiveSparkPlanExec => a.executedPlan
        case p => p
      }
      var i = 0
      finalPlan.foreach {
        case w: WindowExec =>
          i += 1
          println(s"PROBE $name window#$i nParts=${w.partitionSpec.length} " +
            s"partitionSpec=[${w.partitionSpec.map(_.sql).mkString(",")}] " +
            s"order=[${w.orderSpec.map(_.sql).mkString(",")}] " +
            s"childMaxRows=${w.child.logicalLink.flatMap(_.maxRows)}")
        case _ =>
      }
    }
    spark.stop()
  }
}
