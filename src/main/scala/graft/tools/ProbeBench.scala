package graft.tools
import graft._
object ProbeBench {
  def main(args: Array[String]): Unit = {
    val spark = Sessions.local(cores = 32)
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    for (name <- args.drop(1)) {
      def once(): Double = {
        val t0 = System.nanoTime()
        SparkEntry.queries(name)(spark, dir).queryExecution.toRdd.count()
        (System.nanoTime() - t0) / 1e9
      }
      once()
      val med = Seq(once(), once(), once()).sorted.apply(1)
      println(f"PROBE $name%s $med%.3f s")
    }
    spark.stop()
  }
}
