package graft.tools

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Dev tool: 10× scaling ramp for the round-15 second-wave operators, each
  * on the axis that actually grows at 100 TB:
  *
  *  - link prediction / k-truss: 10× EDGES via disjoint id-offset copies of
  *    the affinity graph (components never interact — true work ×10);
  *  - temporal reachability: 10× temporal EDGES (disjoint copies, each with
  *    its own %7 seed set shifted along);
  *  - KMV sketch + 7-day sliding merge: 10× DISTINCT USERS (id-offset event
  *    copies — the distinct pass and the heap do 10× real work);
  *  - categorical drift: 10× token OCCURRENCES (corpus copies — counts
  *    scale, the explode+count path does 10× work);
  *  - FD profile: 10× ROWS with 10× distinct keys (id-offset orders).
  *
  *   sbt "runMain graft.tools.RampProbe4 <sfDir> [cores]"
  */
object RampProbe4 {
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

    def topEdges(n: Int): DataFrame = ev
      .select(col("node").as("src"), lead(col("node"), 1).over(w).as("dst"))
      .filter(col("dst").isNotNull && col("src") =!= col("dst"))
      .groupBy("src", "dst").agg(count(lit(1)).as("w"))
      .withColumn("__rn", row_number().over(
        Window.partitionBy("src").orderBy(col("w").desc, col("dst"))))
      .filter(col("__rn") <= n).select("src", "dst")
    // disjoint copies need a DERIVED offset: a fixed constant silently
    // overlaps once any id reaches it at larger SFs, and overlapping
    // components would make the "10x" ramp measure less than 10x true work
    def copiesOf(df: DataFrame, c: Int, idCols: Seq[String]): DataFrame = {
      val off = idCols.map(ic =>
        df.agg(max(col(ic).cast("long"))).head.getLong(0)).max + 1L
      (0 until c).map { i =>
        idCols.foldLeft(df)((d, ic) =>
          d.withColumn(ic, col(ic) + lit(i * off)))
      }.reduce(_ unionAll _)
    }

    for (c <- Seq(1, 10)) {
      val g3 = copiesOf(topEdges(3), c, Seq("src", "dst")).persist()
      g3.count()
      time(s"q189-shape linkpred ${c}x",
        graft.operators.LinkPredict.jaccardCandidates(g3))
      g3.unpersist()
      val g8 = copiesOf(topEdges(8), c, Seq("src", "dst")).persist()
      g8.count()
      time(s"q195-shape truss k=4 ${c}x",
        graft.operators.Truss.edges(g8, k = 4, maxRounds = 50))
      g8.unpersist()

      // temporal edges: per-copy seed set = the copy's own %7 nodes shifted
      val te1 = ev.select(col("node").as("src"),
          lead(col("node"), 1).over(w).as("dst"),
          unix_millis(lead(col("ts"), 1).over(w)).as("ts"))
        .filter(col("dst").isNotNull)
      val te = copiesOf(te1, c, Seq("src", "dst")).persist()
      te.count()
      val seeds1 = te1.select(col("src").as("node"))
        .unionByName(te1.select(col("dst").as("node"))).distinct()
        .filter(col("node") % 7 === 0)
      val seeds = copiesOf(seeds1, c, Seq("node"))
      time(s"q194-shape temporal ${c}x",
        graft.operators.TemporalReach.earliestArrival(te, seeds,
          maxRounds = 50))
      te.unpersist()

      // KMV: 10x distinct users per day + the 7-day sliding merge
      val evd = copiesOf(graft.Tables.load(spark, sfDir, "events")
          .select(datediff(to_date(col("ts")), lit("1970-01-01")).cast("long")
            .as("key"), col("user_id")), c, Seq("user_id")).persist()
      evd.count()
      time(s"q196-shape kmv+sliding ${c}x", {
        val sk = graft.operators.Kmv.sketch(evd, Seq("key"), "user_id", 64)
        graft.operators.Kmv.mergeTrailing(sk, "key", 7, 64)
          .filter(col("n_periods") === 7)
      })
      evd.unpersist()

      // drift: 10x occurrences (corpus copies, same vocabulary)
      val docs = graft.Tables.load(spark, sfDir, "documents")
      val docsC = (0 until c).map(_ => docs).reduce(_ unionAll _)
      val toks = docsC.select(col("doc_id"),
          explode(graft.functions.Text.tokens(col("text"))).as("token"))
        .filter(col("token") =!= "")
      time(s"q193-shape drift ${c}x",
        graft.operators.Drift.categoricalDrift(
          toks.filter(pmod(col("doc_id"), lit(2)) === 0).select("token"),
          toks.filter(pmod(col("doc_id"), lit(2)) === 1).select("token"),
          "token"))

      // FD profile: 10x rows, 10x distinct keys
      val ord = copiesOf(graft.Tables.load(spark, sfDir, "orders"), c,
        Seq("o_orderkey"))
      time(s"q197-shape fd ${c}x",
        graft.operators.Profile.functionalDeps(ord,
          Seq("o_orderkey", "o_custkey", "o_orderstatus", "o_orderpriority")))
    }
    spark.stop()
  }
}
