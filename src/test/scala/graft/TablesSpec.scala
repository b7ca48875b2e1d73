package graft

import java.nio.file.Files
import java.sql.Timestamp

import org.apache.spark.sql.functions._

/** `Tables.load` must normalize BOTH events encodings the driver has shipped
  * (legacy nanosecond long and current microsecond TIMESTAMP) to one contract:
  * `ts` a microsecond TimestampType, `ts_ns` the epoch-nanosecond long. A driver-
  * side regeneration of events.parquet broke three queries in round 9; this spec
  * pins the contract against in-test fixtures of each encoding so a future
  * encoding drift fails here first.
  */
class TablesSpec extends SparkSpec {
  import spark.implicits._

  private val microsA = 1718500000000000L // 2024-06-16 ballpark, µs since epoch
  private val microsB = 1718500123456789L

  private def loadEvents(dir: String): org.apache.spark.sql.DataFrame =
    Tables.load(spark, dir, "events")

  test("events legacy encoding: ts as nanosecond long → ts timestamp + ts_ns long") {
    val dir = Files.createTempDirectory("tables-long").toString
    Seq(microsA * 1000L, microsB * 1000L).toDF("ts")
      .withColumn("event_id", monotonically_increasing_id())
      .write.mode("overwrite").parquet(s"$dir/events.parquet")

    val out = loadEvents(dir)
    assert(out.schema("ts").dataType.typeName === "timestamp")
    assert(out.schema("ts_ns").dataType.typeName === "long")
    val rows = out.select("ts_ns", "ts").orderBy("ts_ns").collect()
    assert(rows.map(_.getLong(0)).toSeq === Seq(microsA * 1000L, microsB * 1000L))
    // ts must be the µs truncation of ts_ns, computed with integer arithmetic
    assert(out.select(unix_micros(col("ts")).as("us")).orderBy("us").as[Long].collect().toSeq
      === Seq(microsA, microsB))
  }

  test("events current encoding: ts as timestamp[us] → ts preserved + ts_ns synthesized") {
    val dir = Files.createTempDirectory("tables-ts").toString
    Seq(new Timestamp(microsA / 1000L), new Timestamp(microsB / 1000L)).toDF("ts")
      .withColumn("ts", timestamp_micros(lit(microsA))) // exact µs, not ms-rounded
      .limit(1)
      .union(Seq(1).toDF("x").select(timestamp_micros(lit(microsB)).as("ts")))
      .write.mode("overwrite").parquet(s"$dir/events.parquet")

    val out = loadEvents(dir)
    assert(out.schema("ts").dataType.typeName === "timestamp")
    assert(out.schema("ts_ns").dataType.typeName === "long")
    assert(out.select("ts_ns").orderBy("ts_ns").as[Long].collect().toSeq
      === Seq(microsA * 1000L, microsB * 1000L))
  }

  test("events NTZ encoding (pyarrow default, no UTC flag): ts_ns via UTC interpretation") {
    val dir = Files.createTempDirectory("tables-ntz").toString
    spark.range(2).select(
      timestamp_micros(when(col("id") === 0, microsA).otherwise(microsB))
        .cast("timestamp_ntz").as("ts"))
      .write.mode("overwrite").parquet(s"$dir/events.parquet")

    val out = loadEvents(dir)
    assert(out.schema("ts").dataType.typeName === "timestamp")
    assert(out.select("ts_ns").orderBy("ts_ns").as[Long].collect().toSeq
      === Seq(microsA * 1000L, microsB * 1000L))
  }

  test("events unknown encoding: loader raises rather than silently dropping ts_ns") {
    val dir = Files.createTempDirectory("tables-bad").toString
    Seq("2024-06-16").toDF("ts").write.mode("overwrite").parquet(s"$dir/events.parquet")
    val e = intercept[IllegalStateException](loadEvents(dir))
    assert(e.getMessage.contains("unsupported type"))
  }

  test("non-events tables pass through untouched") {
    val dir = Files.createTempDirectory("tables-passthru").toString
    Seq((1, "a")).toDF("id", "name").write.mode("overwrite").parquet(s"$dir/region.parquet")
    val out = Tables.load(spark, dir, "region")
    assert(out.columns.toSeq === Seq("id", "name"))
  }
}
