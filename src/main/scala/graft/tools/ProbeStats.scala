package graft.tools

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.{Queries, Sessions}

/** Reproduces the q216 streaming slowdown: with AQE off (as inside
  * foreachBatch) the optimizer's sizeInBytes stats compound across
  * maintenance rounds until BigInteger arithmetic dominates. Measures
  * Scc.maintain batch-by-batch with and without a stats-stripping
  * boundary. */
object ProbeStats {
  def main(args: Array[String]): Unit = {
    val spark = Sessions.local(cores = 8)
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    val dir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val edges = Queries.affinityTopEdges(spark, dir)
      .filter(col("src") =!= col("dst"))
      .select("src", "dst").distinct()
      .withColumn("__b", pmod(col("src") + col("dst"), lit(4)))
      .localCheckpoint(true)

    def run(strip: Boolean): Unit = {
      def maybeStrip(df: DataFrame): DataFrame =
        if (strip) spark.createDataFrame(df.rdd, df.schema) else df
      var acc: DataFrame = null
      var scc: DataFrame =
        spark.range(0).select(col("id"), col("id").as("scc"))
      for (i <- 0 until 4) {
        val t0 = System.nanoTime()
        val b = maybeStrip(
          edges.filter(col("__b") === i).select("src", "dst")
            .localCheckpoint(true))
        acc = maybeStrip(
          (if (acc == null) b else acc.unionByName(b)).localCheckpoint(true))
        scc = maybeStrip(graft.operators.Scc.maintain(
            acc, scc, maxRounds = 50, delta = Some(b))
          .localCheckpoint(true))
        val bits = scc.queryExecution.optimizedPlan.stats.sizeInBytes
          .bigInteger.bitLength()
        println(f"[probestats] strip=$strip batch=$i " +
          f"sec=${(System.nanoTime() - t0) / 1e9}%.1f statsBits=$bits")
      }
    }
    run(strip = true)
    run(strip = false)
    spark.stop()
  }
}
