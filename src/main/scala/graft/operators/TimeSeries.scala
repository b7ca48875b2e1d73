package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Regular-grid time-series repair over keyed observations: densify each
  * key's ordinate range and carry the last observation forward — the
  * resample-and-ffill step between raw event rollups and any model that
  * assumes one row per (key, period). Complements [[AsOfJoin]] (which
  * aligns TWO frames; this regularizes ONE).
  */
object TimeSeries {

  /** Densify to one row per (key, ord) for every integral `ordCol` step in
    * each key's [min, max] observed range, and forward-fill `valueCols`
    * (last non-null at or before each step). Emits `observed` marking real
    * input rows; gap rows carry the filled values. Input must be unique per
    * (key, ord) — duplicate ordinates make the fill order undefined.
    *
    * Leading rows are always observed (the scaffold starts at each key's
    * first observation), so filled values are never null.
    *
    * Scale shape: TWO key shuffles — one aggregate computing each key's gap
    * list in place (`array_except(sequence(min, max), collect_list(ord))`,
    * exploded key-locally; the per-key array is bounded by the ordinate
    * SPAN, e.g. days of history, not by row count), and one window for the
    * running fill. No scaffold join: gap rows union in with null values.
    */
  def forwardFill(
      df: DataFrame,
      keyCols: Seq[String],
      ordCol: String,
      valueCols: Seq[String]): DataFrame = {
    require(valueCols.nonEmpty, "forwardFill needs at least one value column")
    val key = keyCols.map(col)
    val missing = df.groupBy(key: _*)
      .agg(array_except(
        sequence(min(col(ordCol)), max(col(ordCol))),
        collect_list(col(ordCol))).as("__gaps"))
      .select((key :+ explode(col("__gaps")).as(ordCol)): _*)
      .withColumn("observed", lit(false))
    val unioned = df.withColumn("observed", lit(true))
      .unionByName(missing, allowMissingColumns = true)
    val w = Window.partitionBy(key: _*).orderBy(col(ordCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    valueCols.foldLeft(unioned) { (d, v) =>
      d.withColumn(v, last(col(v), ignoreNulls = true).over(w))
    }
  }

  /** [[forwardFill]]'s linear sibling: densify each key's ordinate range and
    * LERP gap values between the surrounding observations —
    * `prev + (next − prev) · (ord − prevOrd)/(nextOrd − prevOrd)` — the
    * resample step for quantities that drift rather than hold (rates,
    * gauges). Same scaffold contract: unique (key, ord) input, non-null
    * observed values; every gap row sits strictly between two observations
    * (the scaffold spans each key's own [min, max]), so the interpolant is
    * always defined. Determinism: one fixed-order IEEE multiply-add chain
    * on inputs both engines derive identically.
    *
    * Scale shape: the same TWO key shuffles as forwardFill — the gap-list
    * aggregate, then ONE window partitioning whose ascending sort serves
    * both the backward (last observed) and forward (next observed) frames.
    */
  def interpolate(
      df: DataFrame,
      keyCols: Seq[String],
      ordCol: String,
      valueCol: String): DataFrame = {
    val key = keyCols.map(col)
    val missing = df.groupBy(key: _*)
      .agg(array_except(
        sequence(min(col(ordCol)), max(col(ordCol))),
        collect_list(col(ordCol))).as("__gaps"))
      .select((key :+ explode(col("__gaps")).as(ordCol)): _*)
      .withColumn("observed", lit(false))
    val unioned = df.withColumn("observed", lit(true))
      .unionByName(missing, allowMissingColumns = true)
    val w = Window.partitionBy(key: _*).orderBy(col(ordCol))
    val back = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val fwd = w.rowsBetween(Window.currentRow, Window.unboundedFollowing)
    val obsOrd = when(col("observed"), col(ordCol))
    unioned
      .withColumn("__pv", last(col(valueCol), ignoreNulls = true).over(back))
      .withColumn("__po", last(obsOrd, ignoreNulls = true).over(back))
      .withColumn("__nv", first(col(valueCol), ignoreNulls = true).over(fwd))
      .withColumn("__no", first(obsOrd, ignoreNulls = true).over(fwd))
      .withColumn(valueCol,
        when(col("observed"), col(valueCol))
          .otherwise(col("__pv") + (col("__nv") - col("__pv")) *
            ((col(ordCol) - col("__po")).cast("double") /
              (col("__no") - col("__po")).cast("double"))))
      .drop("__pv", "__po", "__nv", "__no")
  }
}
