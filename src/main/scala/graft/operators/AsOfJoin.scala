package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of ("last value at or before") join.
  *
  * Semantics match the reference's per-row assignment lookup
  * (/root/reference/etl/marts.py:56-80): for each left row, the right row with the
  * greatest order key `<=` the left row's order key, per join key.
  *
  * Implementation is the union + running-`last` trick rather than a non-equi range
  * join: tag both sides, union, and take `last(value, ignoreNulls)` over a window
  * ordered by (ord, side) with right rows sorting first at equal ord (inclusive
  * as-of). One shuffle on the join key, O(n log n) per key, no join blow-up —
  * a range join would produce |left| × |matching right| intermediate rows, which
  * at 100 TB with long histories is the difference between a plan that finishes
  * and one that doesn't.
  */
object AsOfJoin {

  /** Enrich `left` with the latest values of `valueCols` from `right` as of
    * `ordCol` (inclusive), per `keyCols`. `valueCols` must not collide with left
    * columns; rows in `right` should be unique per (key, ord) or carry a
    * deterministic tiebreak in `ordCol` itself.
    */
  def lastValueAsOf(
      left: DataFrame,
      right: DataFrame,
      keyCols: Seq[String],
      ordCol: String,
      valueCols: Seq[String]): DataFrame = {
    require(valueCols.forall(v => !left.columns.contains(v)),
      s"valueCols ${valueCols.mkString(",")} collide with left columns")
    val l = left.withColumn("__side", lit(1))
    val r = right
      .select((keyCols :+ ordCol).map(col) ++ valueCols.map(col): _*)
      .withColumn("__side", lit(0))
    val unioned = l.unionByName(r, allowMissingColumns = true)
    val w = Window
      .partitionBy(keyCols.map(col): _*)
      .orderBy(col(ordCol).asc, col("__side").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val enriched = valueCols.foldLeft(unioned) { (df, v) =>
      df.withColumn(v, last(col(v), ignoreNulls = true).over(w))
    }
    enriched.filter(col("__side") === 1).drop("__side")
  }
}
