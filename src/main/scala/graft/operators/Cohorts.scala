package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Cohort and trailing-window analytics over keyed event streams — the
  * engagement-reporting counterpart of the funnel/sessionize family
  * ([[OrderedAnalytics]]). Generalizes the reference's per-key activity
  * analytics (max attended date / lookback rate,
  * /root/reference/etl/alerts.py:77-151) to arbitrary keys and time grains.
  */
object Cohorts {

  /** Classic retention triangle: group keys into cohorts by their FIRST
    * active `dayCol` value, then count how many of each cohort are active
    * again `offset_days` later. Emits one row per (cohort_day, offset_days)
    * with the active count, the cohort size, and the retention ratio
    * (one IEEE division over two exact longs — bit-deterministic).
    *
    * `dayCol` must be an integral day number (e.g. epoch days); cohorts and
    * offsets are plain long arithmetic, so the operator never touches
    * calendar types.
    *
    * Scale shape: ONE shuffle by key builds (first day, distinct-day set)
    * per key in a single map-side-combinable aggregate — the per-key set is
    * bounded by the reporting window (days, not events), so `collect_set`
    * never holds more than the time span. The explode that follows is
    * key-local (no exchange), and both rollups that ride it are
    * partial-aggregated. The cohort-size frame is one row per cohort day —
    * broadcast back (AQE does this at any scale).
    */
  def retention(
      events: DataFrame,
      keyCols: Seq[String],
      dayCol: Column): DataFrame = {
    val key = keyCols.map(col)
    val perKey = events
      .select((key :+ dayCol.cast("long").as("__day")): _*)
      .groupBy(key: _*)
      .agg(min("__day").as("cohort_day"), collect_set("__day").as("__days"))
    val active = perKey
      .select(col("cohort_day"), explode(col("__days")).as("__day"))
      .select(col("cohort_day"), (col("__day") - col("cohort_day")).as("offset_days"))
      .groupBy("cohort_day", "offset_days")
      .agg(count(lit(1)).as("n_active"))
    val sizes = perKey.groupBy("cohort_day").agg(count(lit(1)).as("cohort_size"))
    active.join(sizes, Seq("cohort_day"))
      .withColumn("retention", col("n_active").cast("double") / col("cohort_size"))
  }

  /** Trailing range-frame aggregates per key: for every input row, each
    * `(name, aggExpr)` is evaluated over the key's rows with
    * `ordCol` in `[current - width, current]` (both ends inclusive — the
    * RANGE BETWEEN width PRECEDING AND CURRENT ROW frame on both Spark and
    * ANSI SQL engines). `ordCol` must be a single numeric column (epoch
    * ns/ms/days); rows sharing the exact ordinate are frame peers and see
    * identical results.
    *
    * Callers wanting hash-stable output across engines should stick to
    * order-independent aggregates (count / min / max / exact sums); a
    * floating-point `sum` over the frame is order-sensitive.
    *
    * Scale shape: ONE shuffle on the key; the running range frame is
    * evaluated by a single WindowExec per partition — no self-join, no
    * per-row re-scan. Per-key row counts bound the window buffer exactly as
    * in sessionize/q10.
    */
  def trailingRange(
      df: DataFrame,
      keyCols: Seq[String],
      ordCol: String,
      width: Long,
      aggs: Seq[(String, Column)]): DataFrame = {
    require(width >= 0, s"trailing width must be >= 0 (got $width)")
    require(aggs.nonEmpty, "trailingRange needs at least one aggregate")
    val w = Window.partitionBy(keyCols.map(col): _*)
      .orderBy(col(ordCol))
      .rangeBetween(-width, Window.currentRow)
    aggs.foldLeft(df) { case (d, (name, e)) => d.withColumn(name, e.over(w)) }
  }
}
