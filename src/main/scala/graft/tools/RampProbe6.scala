package graft.tools

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Dev tool: the incremental-vs-full CORENESS crossover (q217) on a
  * history ramp — the RampProbe5 k-core harness, graded. History =
  * disjoint copies of {the top-3 affinity graph + a 40-node pendant
  * chain}: a from-scratch coreness pays EVERY level's peel cascade over
  * ALL history every day (the k=2 level alone peels the chain one node
  * per wave), while maintenance certifies each level's old core in one
  * wave and grows only the delta's affected component per level — empty
  * here beyond copy 0, by disjointness.
  *
  *   sbt "runMain graft.tools.RampProbe6 <sfDir> [cores]"
  */
object RampProbe6 {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val cores = if (args.length > 1) args(1).toInt else 32
    val spark = graft.Sessions.local(cores = cores)

    def time(name: String, df: => DataFrame): Double = {
      val t0 = System.nanoTime()
      val n = df.queryExecution.toRdd.count()
      val wall = (System.nanoTime() - t0) / 1e9
      println(f"RAMP $name%-36s rows=$n%-9d wall=$wall%.2fs")
      wall
    }

    val ev = graft.Tables.load(spark, sfDir, "events")
      .select(col("user_id"), col("ts"), col("event_id"),
        expr("try_cast(get_json_object(props, '$.k') AS BIGINT)").as("node"))
      .filter(col("node").isNotNull)
    val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
    val aff = ev
      .select(col("node").as("src"), lead(col("node"), 1).over(w).as("dst"))
      .filter(col("dst").isNotNull && col("src") =!= col("dst"))
      .groupBy("src", "dst").agg(count(lit(1)).as("w"))
      .withColumn("__rn", row_number().over(
        Window.partitionBy("src").orderBy(col("w").desc, col("dst"))))
      .filter(col("__rn") <= 3)
      .select(least(col("src"), col("dst")).as("u"),
        greatest(col("src"), col("dst")).as("v"))
      .distinct()
      .localCheckpoint(true)
    val maxId = aff.agg(greatest(max("u"), max("v"))).head.getLong(0)
    val anchor = aff.agg(min("u")).head.getLong(0)
    for (chainLen <- Seq(40L, 200L)) {
      val chain = spark.range(chainLen).select(
        when(col("id") === 0, lit(anchor))
          .otherwise(lit(maxId) + col("id")).as("u"),
        (lit(maxId) + col("id") + 1L).as("v"))
      val base = aff.unionByName(chain).localCheckpoint(true)
      val off = maxId + chainLen + 2L
      def copies(c: Long): DataFrame = base
        .select(explode(sequence(lit(0L), lit(c - 1L))).as("i"),
          col("u"), col("v"))
        .select((col("u") + col("i") * off).as("u"),
          (col("v") + col("i") * off).as("v"))
      val deltaPred = pmod(col("u") + col("v"), lit(5)) === 0 &&
        col("u") <= lit(maxId) && col("v") <= lit(maxId)
      val delta = copies(1L).filter(deltaPred)
        .select(col("u").as("src"), col("v").as("dst")).persist()
      delta.count()

      for (c <- Seq(20L, 200L)) {
        val hist = copies(c).filter(!(deltaPred && col("u") < lit(off)))
          .select(col("u").as("src"), col("v").as("dst")).persist()
        hist.count()
        val full = hist.unionAll(delta).persist()
        full.count()
        val oldC = graft.operators.KCore.coreness(hist, maxK = 12,
          maxRounds = 2 * chainLen.toInt).persist()
        oldC.count()
        time(s"q217 full coreness chain=$chainLen ${c}x",
          graft.operators.KCore.coreness(full, maxK = 12,
            maxRounds = 2 * chainLen.toInt))
        time(s"q217 incremental chain=$chainLen ${c}x",
          graft.operators.KCore.corenessMaintain(full, oldC, maxK = 12,
            maxRounds = 2 * chainLen.toInt, delta = Some(delta)))
        hist.unpersist(); full.unpersist(); oldC.unpersist()
      }
      delta.unpersist()
    }
    spark.stop()
  }
}
