package graft.tools

/** Dev tool: print a registered query's physical plan BEFORE and AFTER
  * execution (AQE finalizes exchange reuse / join strategy at runtime, so the
  * two differ) plus wall time. Usage:
  *
  *   sbt "runMain graft.tools.PlanProbe <sfDir> <queryName> [cores]"
  */
object PlanProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.length > 0) args(0) else "/root/testdata/sf0.001"
    val name = if (args.length > 1) args(1) else "q01_agg_pricing"
    val cores = if (args.length > 2) args(2).toInt else 8
    val spark = graft.Sessions.local(cores = cores)
    val df = graft.SparkEntry.queries(name)(spark, sfDir)
    println(s"=== $name: PLAN BEFORE EXECUTION ===")
    println(df.queryExecution.executedPlan.toString)
    val t0 = System.nanoTime()
    val n = df.queryExecution.toRdd.count()
    println(f"rows=$n wall=${(System.nanoTime() - t0) / 1e9}%.2fs")
    println(s"=== $name: PLAN AFTER EXECUTION (AQE final) ===")
    println(df.queryExecution.executedPlan.toString)
    spark.stop()
  }
}
