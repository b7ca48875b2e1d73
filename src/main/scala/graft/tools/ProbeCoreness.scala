package graft.tools

import org.apache.spark.sql.functions._

/** Dev probe: max coreness (degeneracy) + per-k peel rounds of the top-3
  * affinity graph at each SF — sizes q209's oracle unroll.
  *   sbt "runMain graft.tools.ProbeCoreness"
  */
object ProbeCoreness {
  def main(args: Array[String]): Unit = {
    val spark = graft.Sessions.local(cores = 16)
    for (sf <- Seq("sf0.001", "sf0.01", "sf0.1")) {
      val dir = s"/root/testdata/$sf"
      // the q175/q176 graph rebuilt inline (affinityTopEdges is private)
      val ev = graft.Tables.load(spark, dir, "events")
        .select(col("user_id"), col("ts"), col("event_id"),
          expr("try_cast(get_json_object(props, '$.k') AS BIGINT)")
            .as("node"))
        .filter(col("node").isNotNull)
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("user_id").orderBy(col("ts"), col("event_id"))
      val edges = ev
        .select(col("node").as("src"), lead(col("node"), 1).over(w).as("dst"))
        .filter(col("dst").isNotNull && col("src") =!= col("dst"))
        .groupBy("src", "dst").agg(count(lit(1)).as("w"))
        .withColumn("__rn", row_number().over(
          org.apache.spark.sql.expressions.Window
            .partitionBy("src").orderBy(col("w").desc, col("dst"))))
        .filter(col("__rn") <= 3)
        .select("src", "dst")
      var cur = edges.filter(col("src") =!= col("dst"))
        .select(least(col("src"), col("dst")).as("u"),
          greatest(col("src"), col("dst")).as("v"))
        .distinct().localCheckpoint(true)
      var k = 1
      var done = cur.isEmpty
      while (!done) {
        k += 1
        val (core, rounds) = graft.operators.KCore.coreWithRounds(
          cur.select(col("u").as("src"), col("v").as("dst")), k, 100)
        val members = core.select("node").localCheckpoint(true)
        val n = members.count()
        println(s"PROBE $sf k=$k rounds=$rounds members=$n")
        if (n == 0) done = true
        else cur = cur
          .join(members.withColumnRenamed("node", "u"), Seq("u"), "left_semi")
          .join(members.withColumnRenamed("node", "v"), Seq("v"), "left_semi")
          .localCheckpoint(true)
      }
      println(s"PROBE $sf degeneracy=${k - 1}")
    }
    spark.stop()
  }
}
