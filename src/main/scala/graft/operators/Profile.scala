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

  /** FUNCTIONAL-DEPENDENCY + CANDIDATE-KEY discovery over an explicit
    * column set — the schema-inference step beside [[table]]'s value
    * profile: which columns KEY the table, and which determine which
    * others? (The decisions this feeds at 100 TB: dedup keys, bucketing
    * columns, whether a dimension can be normalized out.) For every
    * ordered pair (a, b): `a → b` holds iff distinct(a) = distinct(a, b) —
    * the classic count-based FD test — and each column's key-candidacy row
    * (`dependent = '*'`) holds iff distinct(a) = rows. Exact longs and
    * equality compares only — engine-exact, no rounding.
    *
    * NULL semantics (stated because engines differ by default): rows where
    * the determinant OR dependent is NULL are excluded from that pair's
    * counts — on BOTH sides of the comparison: `n_pair` is Spark's
    * multi-column count-distinct (drops any-NULL rows) and `n_determinant`
    * is the determinant's distinct count UNDER THE SAME FILTER
    * (`count(DISTINCT a)` over rows where b IS NOT NULL; the oracle
    * mirrors it with explicit IS NOT NULL). Filtering only one side lets
    * opposing errors cancel — (a1,1),(a1,2),(a2,NULL) has distinct(a) = 2
    * = distinct(a,b) even though a1 maps to two b values. A column's
    * key-candidacy compares its non-null distinct count against ALL rows,
    * so a column with any NULL can never be a key.
    *
    * Scale shape: ONE scan, one aggregation — n + n·(n−1) count-distincts
    * plan through Spark's Expand, the [[table]] documented exact-profiling
    * cost, quadratic in the COLUMN-SET size (keep the set the handful of
    * candidates under study; the 100 TB variant swaps approx counts into
    * the same shape) — then the declarative 1-row explode reshape, so the
    * whole report is one lazy DataFrame. */
  def functionalDeps(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.size >= 2, s"need at least 2 columns (got ${cols.size})")
    require(cols.distinct.size == cols.size, s"duplicate columns in $cols")
    def q(c: String) = col("`" + c.replace("`", "``") + "`")
    val pairs = for (a <- cols; b <- cols if a != b) yield (a, b)
    val aggs = count(lit(1)).as("__n") +:
      (cols.zipWithIndex.map { case (c, i) =>
        countDistinct(q(c)).as(s"d_$i")
      } ++ pairs.zipWithIndex.flatMap { case ((a, b), i) =>
        // pd_i: the determinant's distinct count under the SAME null filter
        // as the pair count — countDistinct already drops NULL a, the `when`
        // drops rows whose dependent is NULL (the doc's stated contract)
        Seq(countDistinct(q(a), q(b)).as(s"p_$i"),
          countDistinct(when(q(b).isNotNull, q(a))).as(s"pd_$i"))
      })
    val keyRows = cols.zipWithIndex.map { case (c, i) =>
      struct(lit(c).as("determinant"), lit("*").as("dependent"),
        col(s"d_$i").as("n_determinant"), col("__n").as("n_pair"))
    }
    val fdRows = pairs.zipWithIndex.map { case ((a, b), i) =>
      struct(lit(a).as("determinant"), lit(b).as("dependent"),
        col(s"pd_$i").as("n_determinant"),
        col(s"p_$i").as("n_pair"))
    }
    df.agg(aggs.head, aggs.tail: _*)
      .select(explode(array(keyRows ++ fdRows: _*)).as("r"))
      .select(col("r.*"))
      .withColumn("holds", col("n_determinant") === col("n_pair"))
      .orderBy("determinant", "dependent")
  }
}
