package graft.tools

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Dev tool: 10× scaling ramp for the session-5 operators (q137 edit-distance
  * join, q139 BM25, q140 PageRank, q141 snapshot diff) — each ramped on the
  * axis that actually grows at 100 TB:
  *
  *  - edit-distance: corpus replicated with 3-char replica tags (pairwise tag
  *    distance 3 > k=2, so cross-replica pairs stay impossible and true work
  *    scales ~10×, the RampProbe design);
  *  - BM25: corpus replicated VERBATIM (id-shifted only) — every query term's
  *    df and candidate set grow 10×, the hot-term regime the bounded heap
  *    exists for; the query batch stays fixed (production shape);
  *  - PageRank: (a) disjoint-subgraph 10× edge ramp in production (sum) mode;
  *    (b) one hub's IN-DEGREE ramped 10× comparing deterministic (sorted
  *    fold, buffer = in-degree) vs sum mode — the buffer-bound evidence;
  *  - snapshot diff: both snapshots replicated 10× on the user axis.
  *
  *   sbt "runMain graft.tools.RampProbe2 <sfDir> [cores]"
  */
object RampProbe2 {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val cores = if (args.length > 1) args(1).toInt else 32
    val spark = graft.Sessions.local(cores = cores)
    import spark.implicits._

    def time(name: String, df: => DataFrame): Double = {
      val t0 = System.nanoTime()
      val n = df.queryExecution.toRdd.count()
      val wall = (System.nanoTime() - t0) / 1e9
      println(f"RAMP $name%-34s rows=$n%-9d wall=$wall%.2fs")
      wall
    }

    val docs = graft.Tables.load(spark, sfDir, "documents").select("doc_id", "text")

    // ---- q137: tag-separated replication (no cross-replica pairs) ----
    def prefixed(copies: Int): DataFrame =
      (0 until copies).map { i =>
        if (i == 0) docs.select(col("doc_id"), substring(col("text"), 1, 32).as("prefix"))
        else docs.select(
          (col("doc_id") + lit(i * 100000000L)).as("doc_id"),
          substring(concat(lit(s"$i$i$i"), col("text")), 1, 32).as("prefix"))
      }.reduce(_ unionAll _)
    for (c <- Seq(1, 10)) {
      val d = prefixed(c).persist(); d.count()
      time(s"q137-shape editdist ${c}x",
        graft.operators.EditDistance.editDistancePairs(d, "doc_id", "prefix", 2))
      d.unpersist()
    }

    // ---- q139: verbatim replication (df and candidates 10x, queries fixed) ----
    def verbatim(copies: Int): DataFrame =
      (0 until copies).map { i =>
        docs.select((col("doc_id") + lit(i * 100000000L)).as("doc_id"), col("text"))
      }.reduce(_ unionAll _)
    val queries = Seq(
      (1L, "spark window query"), (2L, "customer order merge batch"),
      (3L, "vector stream hash join"), (4L, "data model store")
    ).toDF("qid", "qt")
    for (c <- Seq(1, 10)) {
      val d = verbatim(c).persist(); d.count()
      time(s"q139-shape bm25 ${c}x",
        graft.operators.Bm25.topK(d, "doc_id", "text", queries, "qid", "qt", k = 10))
      d.unpersist()
    }

    // ---- q140a: disjoint-subgraph edge ramp, production (sum) mode ----
    val ev = graft.Tables.load(spark, sfDir, "events")
      .select(col("user_id"), col("ts"), col("event_id"),
        expr("try_cast(get_json_object(props, '$.k') AS BIGINT)").as("node"))
      .filter(col("node").isNotNull)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("user_id").orderBy(col("ts"), col("event_id"))
    val baseEdges = ev
      .select(col("node").as("src"), lead(col("node"), 1).over(w).as("dst"))
      .filter(col("dst").isNotNull)
      .groupBy("src", "dst").agg(count(lit(1)).as("w"))
    def edgesReplicated(copies: Int): DataFrame =
      (0 until copies).map { i =>
        baseEdges.select((col("src") + lit(i * 100000000L)).as("src"),
          (col("dst") + lit(i * 100000000L)).as("dst"), col("w"))
      }.reduce(_ unionAll _)
    for (c <- Seq(1, 10)) {
      val e = edgesReplicated(c).persist(); e.count()
      time(s"q140-shape pagerank-sum ${c}x",
        graft.operators.PageRank.run(e, iters = 3, deterministic = false))
      e.unpersist()
    }

    // ---- q140b: hub in-degree ramp, deterministic vs sum mode ----
    // one node receives N in-edges; the sorted fold's buffer is N structs,
    // the sum fold's is one double — the exact buffer-bound finding
    for (n <- Seq(200000, 2000000)) {
      val hub = spark.range(n.toLong).select(
        (col("id") + 1L).as("src"), lit(0L).as("dst"), lit(1L).as("w"))
        .unionAll(spark.range(50).select(lit(0L).as("src"),
          (col("id") + 1L).as("dst"), lit(1L).as("w")))
        .persist()
      hub.count()
      time(s"q140-hub det indeg=$n",
        graft.operators.PageRank.run(hub, iters = 2, deterministic = true))
      time(s"q140-hub sum indeg=$n",
        graft.operators.PageRank.run(hub, iters = 2, deterministic = false))
      hub.unpersist()
    }

    // ---- q141: user-axis 10x on both snapshots ----
    val events = graft.Tables.load(spark, sfDir, "events")
    def snap(lo: String, hi: String, copies: Int): DataFrame = {
      val s0 = events
        .filter(col("ts") >= lit(lo).cast("timestamp") &&
          col("ts") < lit(hi).cast("timestamp"))
        .groupBy("user_id")
        .agg(count(lit(1)).as("n_events"),
          sum(col("value").cast("decimal(18,2)")).cast("double").as("total_value"))
      (0 until copies).map { i =>
        s0.select((col("user_id") + lit(i * 100000000L)).as("user_id"),
          col("n_events"), col("total_value"))
      }.reduce(_ unionAll _)
    }
    for (c <- Seq(1, 10)) {
      val o = snap("2024-01-01", "2024-01-16", c).persist(); o.count()
      val nw = snap("2024-01-16", "2024-01-31", c).persist(); nw.count()
      time(s"q141-shape diff ${c}x",
        graft.operators.SnapshotDiff.diff(o, nw,
          Seq("user_id"), Seq("n_events", "total_value")))
      o.unpersist(); nw.unpersist()
    }
    spark.stop()
  }
}
