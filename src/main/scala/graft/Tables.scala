package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Loaders for the driver-provided parquet tables (TESTDATA.md).
  *
  * `events.parquet` has shipped under two encodings across driver generations:
  *   - legacy: `ts` as a raw nanosecond long (readable only with
  *     `spark.sql.legacy.parquet.nanosAsLong=true`, set in [[Sessions.tune]]);
  *   - current: `ts` as a microsecond TIMESTAMP.
  * We normalize both to the same contract: `ts` is a microsecond TimestampType and
  * `ts_ns` is the epoch-nanosecond long (integer arithmetic only — ns since epoch
  * exceeds the 53-bit double mantissa, so no double round-trips).
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, sfDir: String, name: String): DataFrame = {
    val df = spark.read.parquet(s"$sfDir/$name.parquet")
    if (name != "events") df
    else df.schema("ts").dataType.typeName match {
      case "long" =>
        df.withColumn("ts_ns", col("ts"))
          .withColumn("ts", expr("timestamp_micros(ts_ns DIV 1000)"))
      case "timestamp" | "timestamp_ntz" =>
        // NTZ wall time is interpreted in the session zone, pinned to UTC in
        // Sessions.tune — the same naive-epoch reading DuckDB's oracle uses.
        df.withColumn("ts", col("ts").cast("timestamp"))
          .withColumn("ts_ns", unix_micros(col("ts")) * lit(1000L))
      case other =>
        throw new IllegalStateException(
          s"events.ts has unsupported type $other (expected long ns or timestamp)")
    }
  }
}
