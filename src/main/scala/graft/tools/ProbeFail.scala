package graft.tools

import graft.{Queries, Sessions, SparkEntry}

/** Dev probe: reproduce the r17 bench failures (q217/q218 at sf0.1, repeated
  * runs in one session) with the FULL stack trace the bench harness swallows.
  */
object ProbeFail {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val names = args.drop(2).toSeq
    val spark = Sessions.local(cores = args(1).toInt)
    names.foreach { name =>
      (1 to 4).foreach { i =>
        val t0 = System.nanoTime()
        try {
          val n = SparkEntry.queries(name)(spark, sfDir).queryExecution.toRdd.count()
          println(f"[probefail] $name run$i rows=$n wall=${(System.nanoTime()-t0)/1e9}%.2f")
        } catch { case e: Throwable =>
          println(s"[probefail] $name run$i FAILED: ${e.getMessage}")
          e.printStackTrace()
          var c = e.getCause
          while (c != null) { println("CAUSE: " + c.getMessage); c.printStackTrace(); c = c.getCause }
        }
      }
    }
    spark.stop()
  }
}
