package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{ArrayType, DataType, MapType, StructType}

/** ANALYZE-style table profiling — the per-column data-quality rollup an
  * ingest runs before trusting a new drop: row count, null count, EXACT
  * distinct count, and min/max (rendered as strings so one output schema
  * carries every column type). ONE corpus scan computes every metric in a
  * single aggregation — the multi-count-distinct plans through Spark's
  * Expand, the documented exact-profiling cost (a 100 TB profile swaps in
  * `approx_count_distinct`, the q35/q119 sketch trade, without changing
  * the shape) — and the per-column reshape is DECLARATIVE (the 1-row
  * aggregate explodes into one struct per column inside the plan), so the
  * whole profile is a single lazy DataFrame: nothing reaches the driver,
  * and the `table_profile` TVF plans WITHOUT running anything at
  * resolution time. min/max over strings compare UTF-8 bytes on both
  * engines (code-point order), so rendered values are engine-identical.
  * (Engine-addition family — the reference has no profiling surface.)
  */
object Profile {

  /** Profile every ATOMIC column of `df` (non-atomic columns — arrays,
    * structs, maps — are not orderable/hashable the same way across
    * engines and are skipped). Output: one row per profiled column,
    * (col_name, n_rows, n_nulls, n_distinct, min_value, max_value),
    * ordered by col_name. */
  def table(df: DataFrame): DataFrame = {
    def atomic(dt: DataType): Boolean = dt match {
      case _: ArrayType | _: MapType | _: StructType => false
      case _ => true
    }
    val cols = df.schema.fields
      .filter(f => atomic(f.dataType)).map(_.name).toSeq
    require(cols.nonEmpty, "no atomic columns to profile")
    // backtick-quoted resolution: a raw name containing a dot would parse
    // as nested-field access (literal backticks in the name double-escape)
    def q(c: String) = col("`" + c.replace("`", "``") + "`")
    // index-based aliases: column names may carry characters illegal in
    // an alias, and two columns may differ only by case
    val aggs = count(lit(1)).as("__n") +: cols.zipWithIndex.flatMap {
      case (c, i) => Seq(
        count(q(c)).as(s"nn_$i"),
        countDistinct(q(c)).as(s"nd_$i"),
        min(q(c)).cast("string").as(s"mn_$i"),
        max(q(c)).cast("string").as(s"mx_$i"))
    }
    df.agg(aggs.head, aggs.tail: _*)
      .select(explode(array(cols.zipWithIndex.map { case (c, i) =>
        struct(
          lit(c).as("col_name"),
          col("__n").as("n_rows"),
          (col("__n") - col(s"nn_$i")).as("n_nulls"),
          col(s"nd_$i").as("n_distinct"),
          col(s"mn_$i").as("min_value"),
          col(s"mx_$i").as("max_value"))
      }: _*)).as("r"))
      .select("r.*")
      .orderBy("col_name")
  }
}
