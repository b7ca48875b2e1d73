package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** STRONGLY CONNECTED COMPONENTS by iterative coloring (Orzan 2004; the
  * FW-BW family) — the DIRECTED-graph complement of [[Dedup]]'s weakly
  * connected components: mutual-reachability classes of the link graph.
  * The crawl uses: a redirect/alias RING is an SCC its members should
  * canonicalize over; PageRank's "rank sinks" are exactly the terminal
  * SCCs; condensing the graph to its SCC DAG is the preprocessing step of
  * any path analysis that must terminate.
  *
  * Algorithm, each outer round over the REMAINING graph:
  *   1. forward min-label coloring to fixpoint: color(v) = min id that
  *      REACHES v (per-round: one edge join + min rollup + keyed merge —
  *      the [[Bfs]]/[[Sssp]] shape, converging in O(diameter) waves);
  *   2. roots = nodes whose color is their own id (the minimum of each
  *      color class); the SCC of root r is {v : color(v) = r AND v
  *      reaches r}, found by BACKWARD flag propagation restricted to the
  *      color class (same keyed shape over reversed edges);
  *   3. flagged nodes emit (id, scc = color) and leave the graph; every
  *      color class retires at least its root's SCC, so the outer loop
  *      strictly shrinks and terminates.
  * Labels are exact longs with pinned min tie-breaks, so the result is a
  * pure function of the graph — engine-exact, and the q188 oracle needs
  * NO fixed unroll: mutual reachability is a depth-free recursive-CTE
  * closure (UNION-deduped, always finite).
  *
  * Scale shape: every step is a keyed equi-join / map-side-combined min
  * rollup on node- or edge-sized frames, never all-pairs; each wave
  * materializes (`localCheckpoint`, the [[PageRank]] lineage argument).
  * Outer rounds are bounded by the SCC-DAG's level count — small for link
  * graphs (one giant SCC + a shallow fringe), `maxRounds`-capped with a
  * LOUD failure, never a silent partial answer. */
object Scc {

  def components(edges: DataFrame, maxRounds: Int = 100): DataFrame =
    componentsWithRounds(edges, maxRounds)._1

  /** [[components]] plus the number of outer peel rounds taken. `edges`:
    * (src, dst) directed; duplicates collapsed, self-loops dropped (a
    * self-loop never changes mutual reachability). Returns (id, scc) for
    * every node appearing as an endpoint, scc = min member id. */
  def componentsWithRounds(
      edges: DataFrame,
      maxRounds: Int = 100): (DataFrame, Int) = {
    require(maxRounds >= 1, s"maxRounds must be >= 1 (got $maxRounds)")
    val spark = edges.sparkSession
    var e = edges.filter(col("src") =!= col("dst"))
      .select("src", "dst").distinct().localCheckpoint(true)
    var nodes = e.select(col("src").as("id"))
      .unionByName(e.select(col("dst").as("id"))).distinct()
      .localCheckpoint(true)
    var result = spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("id",
          org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("scc",
          org.apache.spark.sql.types.LongType))))
    var rounds = 0
    var remaining = nodes.count()
    while (remaining > 0) {
      rounds += 1
      require(rounds <= maxRounds,
        s"SCC did not finish in $maxRounds peel rounds — raise maxRounds")
      // 1. forward min coloring to fixpoint
      var colors = nodes.withColumn("color", col("id")).localCheckpoint(true)
      var changed = 1L
      while (changed > 0) {
        val pushed = e
          .join(colors.select(col("id").as("src"), col("color").as("__c")),
            Seq("src"))
          .groupBy(col("dst").as("id")).agg(min(col("__c")).as("__in"))
        val next = colors.join(pushed, Seq("id"), "left_outer")
          .select(col("id"), col("color"),
            least(col("color"), coalesce(col("__in"), col("color")))
              .as("__next"))
          .localCheckpoint(true)
        changed = next.filter(col("__next") < col("color")).count()
        colors = next.select(col("id"), col("__next").as("color"))
          .localCheckpoint(true)
      }
      // 2. backward confirmation within color classes: flag = reaches the
      // class root (seeded at the root itself)
      var flags = colors
        .withColumn("__f", col("color") === col("id")).localCheckpoint(true)
      changed = 1L
      while (changed > 0) {
        // u gains the flag if some edge u->v has flag(v) with v in u's
        // OWN color class (a u may border several classes — only its own
        // class's flags count, checked after resolving u's color)
        val gained = e
          .join(flags.select(col("id").as("dst"), col("color").as("__cv"),
            col("__f").as("__fv")), Seq("dst"))
          .filter(col("__fv"))
          .select(col("src").as("id"), col("__cv"))
          .distinct()
        val gainedMine = gained
          .join(flags.select("id", "color"), Seq("id"))
          .filter(col("__cv") === col("color"))
          .select("id").distinct()
          .withColumn("__g", lit(true))
        val next = flags.join(gainedMine, Seq("id"), "left_outer")
          .select(col("id"), col("color"),
            (col("__f") || coalesce(col("__g"), lit(false))).as("__nf"),
            col("__f"))
          .localCheckpoint(true)
        changed = next.filter(col("__nf") && !col("__f")).count()
        flags = next.select(col("id"), col("color"), col("__nf").as("__f"))
          .localCheckpoint(true)
      }
      val found = flags.filter(col("__f"))
        .select(col("id"), col("color").as("scc")).localCheckpoint(true)
      result = result.unionByName(found).localCheckpoint(true)
      nodes = nodes.join(found.select("id"), Seq("id"), "left_anti")
        .localCheckpoint(true)
      e = e
        .join(found.select(col("id").as("src")), Seq("src"), "left_anti")
        .join(found.select(col("id").as("dst")), Seq("dst"), "left_anti")
        .select("src", "dst")
        .localCheckpoint(true)
      remaining = nodes.count()
    }
    (result, rounds)
  }
}
