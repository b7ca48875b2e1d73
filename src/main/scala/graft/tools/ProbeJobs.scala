package graft.tools

import java.util.concurrent.atomic.{AtomicInteger, AtomicLong}

import org.apache.spark.scheduler._

import graft.{Queries, Sessions}

/** Per-query COST-SHAPE probe for the round-17 optimization work: run each
  * named registered query once untimed (codegen/JIT warm-up), then once
  * measured, reporting wall seconds plus the scheduler-level counts that
  * are the scale-honest cost model — Spark jobs launched, stages run,
  * tasks, and shuffle bytes written. A "fast locally" change that does not
  * reduce jobs/stages/shuffle-bytes is a config accident; one that does
  * carries to the cluster (guide §1/§2: count the passes and the bytes,
  * not just the seconds). Usage:
  *
  *   SPARK_GRAFT_SF_DIR=... SPARK_GRAFT_CPUS=... \
  *     sbt "runMain graft.tools.ProbeJobs <query> [query ...]"
  */
object ProbeJobs {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.get("SPARK_GRAFT_CPUS").flatMap(_.toIntOption).getOrElse(32)
    val spark = Sessions.local(cores = cpus)
    val jobs = new AtomicInteger
    val stages = new AtomicInteger
    val tasks = new AtomicInteger
    val shuffleWrite = new AtomicLong
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(e: SparkListenerJobStart): Unit =
        jobs.incrementAndGet()
      override def onStageCompleted(e: SparkListenerStageCompleted): Unit = {
        stages.incrementAndGet()
        tasks.addAndGet(e.stageInfo.numTasks)
        shuffleWrite.addAndGet(e.stageInfo.taskMetrics.shuffleWriteMetrics.bytesWritten)
      }
    })
    println(f"${"query"}%-28s ${"sec"}%8s ${"jobs"}%6s ${"stages"}%7s ${"tasks"}%7s ${"shufMB"}%8s")
    args.foreach { n =>
      Queries.all.get(n) match {
        case None => System.err.println(s"[probejobs] unknown query: $n")
        case Some(fn) =>
          fn(spark, dir).queryExecution.toRdd.count() // warm-up, untimed
          Thread.sleep(200)
          jobs.set(0); stages.set(0); tasks.set(0); shuffleWrite.set(0)
          val t0 = System.nanoTime()
          fn(spark, dir).queryExecution.toRdd.count()
          val sec = (System.nanoTime() - t0) / 1e9
          // listener events are async; give the bus a beat to drain
          Thread.sleep(300)
          println(f"$n%-28s $sec%8.2f ${jobs.get}%6d ${stages.get}%7d ${tasks.get}%7d ${shuffleWrite.get / 1e6}%8.2f")
      }
    }
    spark.stop()
  }
}
