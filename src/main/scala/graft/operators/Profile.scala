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
  * the shape) — and only the single 1-row aggregate result reaches the
  * driver for the per-column reshape (the AlertMessage bounded-collect
  * precedent). min/max over strings compare UTF-8 bytes on both engines
  * (code-point order), so rendered values are engine-identical.
  * (Engine-addition family — the reference has no profiling surface.)
  */
object Profile {

  /** Profile every ATOMIC column of `df` (non-atomic columns — arrays,
    * structs, maps — are not orderable/hashable the same way across
    * engines and are skipped). Output: one row per profiled column,
    * (col_name, n_rows, n_nulls, n_distinct, min_value, max_value),
    * ordered by col_name. */
  def table(df: DataFrame): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    def atomic(dt: DataType): Boolean = dt match {
      case _: ArrayType | _: MapType | _: StructType => false
      case _ => true
    }
    val cols = df.schema.fields
      .filter(f => atomic(f.dataType)).map(_.name).toSeq
    require(cols.nonEmpty, "no atomic columns to profile")
    // index-based aliases: column names may carry characters illegal in
    // an alias, and two columns may differ only by case
    val aggs = count(lit(1)).as("__n") +: cols.zipWithIndex.flatMap {
      case (c, i) => Seq(
        count(col(c)).as(s"nn_$i"),
        countDistinct(col(c)).as(s"nd_$i"),
        min(col(c)).cast("string").as(s"mn_$i"),
        max(col(c)).cast("string").as(s"mx_$i"))
    }
    val r = df.agg(aggs.head, aggs.tail: _*).head()
    val n = r.getLong(0)
    cols.zipWithIndex.map { case (c, i) =>
      (c, n,
        n - r.getAs[Long](s"nn_$i"),
        r.getAs[Long](s"nd_$i"),
        r.getAs[String](s"mn_$i"),
        r.getAs[String](s"mx_$i"))
    }.toDF("col_name", "n_rows", "n_nulls", "n_distinct", "min_value", "max_value")
      .orderBy("col_name")
  }
}
