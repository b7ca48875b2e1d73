package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Ordered / stateful analytics over grouped data: sessionization and
  * gaps-and-islands streaks. These generalize the reference's alert analytics
  * (current-miss streak, /root/reference/etl/alerts.py:77-151) to any keyed,
  * ordered DataFrame. Each is a single shuffle on the partition key.
  */
object OrderedAnalytics {

  /** Assign gap-based session ids per key: a new session starts when the gap
    * between consecutive `tsMillisCol` values (ordered by `ordCol`) exceeds
    * `gapMillis`. Adds `session_id` (1-based, per key).
    */
  def sessionize(
      df: DataFrame,
      keyCols: Seq[String],
      ordCol: String,
      tsMillisCol: String,
      gapMillis: Long): DataFrame = {
    val w = Window.partitionBy(keyCols.map(col): _*).orderBy(col(ordCol))
    val wRun = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    df.withColumn("__prev_ts", lag(col(tsMillisCol), 1).over(w))
      .withColumn("__new_session",
        when(col("__prev_ts").isNull || col(tsMillisCol) - col("__prev_ts") > gapMillis, 1)
          .otherwise(0))
      .withColumn("session_id", sum(col("__new_session")).over(wRun))
      .drop("__prev_ts", "__new_session")
  }

  /** Trailing streak per key: the number of rows strictly after the last row
    * where `breakCond` held (all rows if it never held), i.e. the reference's
    * "current consecutive misses". Returns (keyCols*, streak); keys whose
    * newest row breaks the streak are reported with streak 0, not dropped.
    * One shuffle: a per-key window followed by a conditional count on the
    * same partitioning (no second exchange — the aggregation reuses it).
    */
  def trailingStreak(
      df: DataFrame,
      keyCols: Seq[String],
      ordCol: String,
      breakCond: Column): DataFrame = {
    val wKey = Window.partitionBy(keyCols.map(col): _*)
    df.withColumn("__last_break", max(when(breakCond, col(ordCol))).over(wKey))
      .groupBy(keyCols.map(col): _*)
      .agg(count(when(col("__last_break").isNull || col(ordCol) > col("__last_break"), 1))
        .as("streak"))
  }
}
