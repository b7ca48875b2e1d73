package graft.tools

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Dev tool: the incremental-vs-full k-core crossover (q202) on a 10×
  * HISTORY ramp. History = disjoint copies of {the top-3 affinity graph +
  * a 40-node pendant chain}: at k = 2 the chain peels ONE node per wave,
  * so a from-scratch recompute pays a ~40-round cascade over ALL history
  * every day, while maintenance (old core + the declared daily delta)
  * pays one certify pass plus the delta's affected component — here empty,
  * because the delta lands inside the certified core, so candidates'
  * degrees cannot move (the KCore.maintain closure argument). The honest
  * claim measured: maintenance work scales with the DELTA NEIGHBORHOOD;
  * full recompute re-pays peel depth × history size.
  *
  *   sbt "runMain graft.tools.RampProbe5 <sfDir> [cores]"
  */
object RampProbe5 {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val cores = if (args.length > 1) args(1).toInt else 32
    val spark = graft.Sessions.local(cores = cores)
    import spark.implicits._

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
      .localCheckpoint(true)                       // cut lineage before copying
    val maxId = aff.agg(greatest(max("u"), max("v"))).head.getLong(0)
    val anchor = aff.agg(min("u")).head.getLong(0)
    val chainLen = 40L
    // pendant chain anchored in the core: ids maxId+1 .. maxId+chainLen
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
    // the daily delta: copy 0's (u+v)%5 AFFINITY edges (guard u <= maxId
    // keeps chain edges out of the delta)
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
      val oldCore = graft.operators.KCore.core(hist, k = 2, maxRounds = 60)
        .select("node").persist()
      oldCore.count()
      time(s"q202-shape full recompute ${c}x",
        graft.operators.KCore.core(full, k = 2, maxRounds = 60))
      time(s"q202-shape incremental ${c}x",
        graft.operators.KCore.maintain(full, oldCore, k = 2, maxRounds = 60,
          delta = Some(delta)))
      hist.unpersist(); full.unpersist(); oldCore.unpersist()
    }
    delta.unpersist()

    // ---- the TRUSS family (q203): same discipline on the top-8 graph.
    // Full recompute re-pays 11–14 TRIANGLE-ENUMERATION waves over ALL
    // history's edges every day; maintenance pays one certify pass over
    // the (much smaller) old-truss subgraph plus the delta's affected
    // component — copy 0 only, by disjointness.
    val aff8 = ev
      .select(col("node").as("src"), lead(col("node"), 1).over(w).as("dst"))
      .filter(col("dst").isNotNull && col("src") =!= col("dst"))
      .groupBy("src", "dst").agg(count(lit(1)).as("w"))
      .withColumn("__rn", row_number().over(
        Window.partitionBy("src").orderBy(col("w").desc, col("dst"))))
      .filter(col("__rn") <= 8)
      .select(least(col("src"), col("dst")).as("u"),
        greatest(col("src"), col("dst")).as("v"))
      .distinct()
      .localCheckpoint(true)
    val maxId8 = aff8.agg(greatest(max("u"), max("v"))).head.getLong(0)
    val off8 = maxId8 + 2L
    def copies8(c: Long): DataFrame = aff8
      .select(explode(sequence(lit(0L), lit(c - 1L))).as("i"),
        col("u"), col("v"))
      .select((col("u") + col("i") * off8).as("u"),
        (col("v") + col("i") * off8).as("v"))
    val deltaPred8 = pmod(col("u") + col("v"), lit(5)) === 0 &&
      col("u") < lit(off8)
    val delta8 = copies8(1L).filter(deltaPred8)
      .select(col("u").as("src"), col("v").as("dst")).persist()
    delta8.count()
    for (c <- Seq(10L, 100L, 500L)) {
      val hist = copies8(c).filter(!deltaPred8)
        .select(col("u").as("src"), col("v").as("dst")).persist()
      hist.count()
      val full = hist.unionAll(delta8).persist()
      full.count()
      val oldTruss = graft.operators.Truss.edges(hist, k = 4, maxRounds = 50)
        .select("u", "v").persist()
      oldTruss.count()
      time(s"q203-shape full recompute ${c}x",
        graft.operators.Truss.edges(full, k = 4, maxRounds = 50))
      time(s"q203-shape incremental ${c}x",
        graft.operators.Truss.maintain(full, oldTruss, k = 4, maxRounds = 50,
          delta = Some(delta8)))
      hist.unpersist(); full.unpersist(); oldTruss.unpersist()
    }
    delta8.unpersist()

    // ---- the SCC family (q204): history = disjoint 40-node directed
    // CYCLES (each one SCC of diameter 39 — the full recompute pays ~40
    // coloring waves over ALL history every day); the daily delta is two
    // cross-edges merging copy 0's and copy 1's cycles. Maintenance
    // certifies FREE (insert-only ⇒ no dirty classes), contracts every
    // cycle to one node, and solves a 2-node condensation.
    val cyc = 40L
    val cycle = spark.range(cyc).select(col("id").as("src"),
      pmod(col("id") + 1L, lit(cyc)).as("dst"))
      .localCheckpoint(true)
    def cycCopies(c: Long): DataFrame = cycle
      .select(explode(sequence(lit(0L), lit(c - 1L))).as("i"),
        col("src"), col("dst"))
      .select((col("src") + col("i") * cyc).as("src"),
        (col("dst") + col("i") * cyc).as("dst"))
    val deltaScc = Seq((5L, cyc + 7L), (cyc + 3L, 2L)).toDF("src", "dst")
      .localCheckpoint(true)
    for (c <- Seq(20L, 200L)) {
      val hist = cycCopies(c).persist()
      hist.count()
      val full = hist.unionAll(deltaScc).persist()
      full.count()
      val oldScc = graft.operators.Scc.components(hist, maxRounds = 60)
        .persist()
      oldScc.count()
      time(s"q204-shape full recompute ${c}x",
        graft.operators.Scc.components(full, maxRounds = 60))
      time(s"q204-shape incremental ${c}x",
        graft.operators.Scc.maintain(full, oldScc, maxRounds = 60,
          delta = Some(deltaScc)))
      hist.unpersist(); full.unpersist(); oldScc.unpersist()
    }
    spark.stop()
  }
}
