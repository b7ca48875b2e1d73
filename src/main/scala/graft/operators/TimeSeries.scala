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
}
