package graft.tools

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Dev probe: BFS depth + node/edge counts of the top-3 affinity graph per
  * SF — sizes q201's fixed oracle unroll (the q176 contract). */
object ProbeBc {
  def main(args: Array[String]): Unit = {
    val spark = graft.Sessions.local(cores = 8)
    for (sf <- Seq("sf0.001", "sf0.01", "sf0.1")) {
      val dir = s"/root/testdata/$sf"
      val ev = graft.Tables.load(spark, dir, "events")
        .select(col("user_id"), col("ts"), col("event_id"),
          expr("try_cast(get_json_object(props, '$.k') AS BIGINT)").as("node"))
        .filter(col("node").isNotNull)
      val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
      val top3 = ev
        .select(col("node").as("src"), lead(col("node"), 1).over(w).as("dst"))
        .filter(col("dst").isNotNull && col("src") =!= col("dst"))
        .groupBy("src", "dst").agg(count(lit(1)).as("w"))
        .withColumn("__rn", row_number().over(
          Window.partitionBy("src").orderBy(col("w").desc, col("dst"))))
        .filter(col("__rn") <= 3).select("src", "dst")
      val und = top3.select(least(col("src"), col("dst")).as("u"),
          greatest(col("src"), col("dst")).as("v")).distinct()
      val nodes = und.select(col("u").as("node"))
        .unionByName(und.select(col("v").as("node"))).distinct()
      val t0 = System.nanoTime()
      val (bc, rounds) = graft.operators.Betweenness.fromPivotsWithRounds(
        top3, nodes, maxDepth = 50)
      val top = bc.orderBy(desc("betweenness")).limit(3).collect()
        .map(r => s"${r.getLong(0)}:${r.getDouble(1)}").mkString(" ")
      val wall = (System.nanoTime() - t0) / 1e9
      println(f"PROBEBC $sf nodes=${nodes.count()} undEdges=${und.count()} " +
        f"rounds=$rounds wall=$wall%.1fs top3[$top]")
    }
    spark.stop()
  }
}
