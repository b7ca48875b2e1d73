package graft

import org.apache.spark.sql.SparkSession

/** Shared session tuning for every entry point (Verify, Bench, tests, main).
  *
  * Sized for the harness (`local[32]`, 128 GiB single JVM) but every choice is the
  * one we'd make on a 1000-executor cluster too: AQE on (runtime coalescing +
  * skew-join splitting), shuffle partitions matched to parallelism instead of the
  * 200 default, and broadcast threshold left at 10 MB so dimension tables
  * (region/nation/customer/supplier/part at any tested SF) broadcast instead of
  * shuffling the fact side.
  */
object Sessions {
  def tune(b: SparkSession.Builder): SparkSession.Builder = b
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .config("spark.sql.adaptive.enabled", "true")
    .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
    .config("spark.sql.adaptive.skewJoin.enabled", "true")
    // events.parquet is written with TIMESTAMP(NANOS); Spark can only read it
    // as a raw long (Tables.load converts to a micros TimestampType).
    .config("spark.sql.legacy.parquet.nanosAsLong", "true")
    // the iterative graph operators localCheckpoint once per round; the
    // blocks of superseded rounds are only released when the ContextCleaner
    // sees their RDDs garbage-collected, and the default periodic-GC
    // cadence (30 min) lets a multi-query session accumulate every dead
    // round of every query — measured r17: a query mid-session ran 4.5×
    // its isolated time purely from storage pressure (q226: 8.3 s alone,
    // 37.8 s after 10 checkpoint-heavy queries). One driver GC a minute
    // bounds the leak on any long-lived session, cluster or local.
    .config("spark.cleaner.periodicGC.interval", "60s")
    // vec_cosine / minhash_signature / simhash64 / lsh_bucket as SQL functions
    .config("spark.sql.extensions", "graft.GraftExtensions")

  def local(cores: Int = 4, shufflePartitions: Int = 0): SparkSession = {
    val sp = if (shufflePartitions > 0) shufflePartitions else cores
    val spark = tune(
      SparkSession.builder()
        .master(s"local[$cores]")
        .config("spark.sql.shuffle.partitions", sp.toString))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark
  }
}
