package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Keyed snapshot diff — the dataset-versioning primitive: given two
  * versions of a keyed table, emit one row per key whose state differs,
  * classified `added` / `removed` / `changed`, with both versions' values
  * side by side. This is how a corpus pipeline audits an incremental
  * refresh (what did the new crawl add, what fell out of the quality gate,
  * whose dedup cluster changed), diffing table STATES without any change
  * log — the delta computation under every data-versioning system
  * (nightly-snapshot reconciliation, slowly-changing-dimension detection,
  * backfill verification).
  *
  * Unchanged keys emit NO row (diff semantics — the interesting output is
  * empty when nothing moved); `changed` compares the listed value columns
  * null-safely (`<=>`), so a null→value transition is a change and
  * null→null is not.
  *
  * Scale shape: one full-outer equi-join on the key — both sides shuffle
  * once on the key and nothing else; with both snapshots bucketed on the
  * key (the `TableStore` keyed layout) the exchange disappears entirely.
  * The value comparison is a scan-local expression over the joined row; no
  * window, no collect. At 100 TB the diff costs exactly one co-partitioned
  * join pass.
  */
object SnapshotDiff {

  /** Diff `newer` against `older` on `keyCols`, comparing `valueCols`.
    * Output: keyCols, change ('added'|'removed'|'changed'), then for each
    * value column v: old_v and new_v. */
  def diff(older: DataFrame, newer: DataFrame,
           keyCols: Seq[String], valueCols: Seq[String]): DataFrame = {
    require(keyCols.nonEmpty, "keyCols must be non-empty")
    require(valueCols.nonEmpty, "valueCols must be non-empty")
    // the positional toDF rename below assumes the three name families are
    // disjoint; an overlap would silently mislabel columns, so reject it
    // loudly (contract, not analysis accident)
    val overlap = keyCols.intersect(valueCols)
    require(overlap.isEmpty,
      s"keyCols and valueCols must be disjoint (both list: ${overlap.mkString(", ")})")
    val prefixed = valueCols.flatMap(v => Seq("old_" + v, "new_" + v)) ++ Seq("__old", "__new")
    val collisions = prefixed.filter(p => keyCols.contains(p) || valueCols.contains(p))
    require(collisions.isEmpty,
      s"generated column names collide with input columns: ${collisions.mkString(", ")}")
    val o = older.select((keyCols ++ valueCols).map(col): _*)
      .withColumn("__old", lit(true))
      .toDF(keyCols ++ valueCols.map("old_" + _) ++ Seq("__old"): _*)
    val n = newer.select((keyCols ++ valueCols).map(col): _*)
      .withColumn("__new", lit(true))
      .toDF(keyCols ++ valueCols.map("new_" + _) ++ Seq("__new"): _*)
    val j = o.join(n, keyCols, "full_outer")
    val changed = valueCols
      .map(v => !(col("old_" + v) <=> col("new_" + v)))
      .reduce(_ || _)
    val change = when(col("__old").isNull, lit("added"))
      .when(col("__new").isNull, lit("removed"))
      .when(changed, lit("changed"))
    j.withColumn("change", change)
      .filter(col("change").isNotNull)
      .select((keyCols.map(col) :+ col("change")) ++
        valueCols.flatMap(v => Seq(col("old_" + v), col("new_" + v))): _*)
  }
}
