package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Loaders for the driver-provided parquet tables (TESTDATA.md).
  *
  * `events.parquet` carries nanosecond-precision timestamps, which Spark's parquet
  * reader only accepts as raw longs (`spark.sql.legacy.parquet.nanosAsLong=true`,
  * set in [[Sessions.tune]]). We normalize: `ts` becomes a microsecond TimestampType
  * via integer division (no double round-trip — ns since epoch exceeds the 53-bit
  * double mantissa), and the raw value stays available as `ts_ns`.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, sfDir: String, name: String): DataFrame = {
    val df = spark.read.parquet(s"$sfDir/$name.parquet")
    if (name == "events" && df.schema("ts").dataType.typeName == "long")
      df.withColumn("ts_ns", col("ts"))
        .withColumn("ts", expr("timestamp_micros(ts_ns DIV 1000)"))
    else df
  }
}
