package graft.etl

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.etl.Exprs._
import graft.etl.RawSheet.{qcol, RowIdx}

/** fact_attendance: the dense unpivot (R2).
  *
  * Capability source /root/reference/etl/fact_attendance.py:95-161 — every
  * chorister row × every date column becomes one fact row:
  * empty cell → (hours=0.0, missed_flag=1); non-empty → strict parse
  * (comma decimals; garbage/negative aborts the job), missed_flag=0.
  *
  * Spark shape: project the date columns to their normalized ISO names, then
  * one `unpivot` — a narrow map-side transform, no shuffle; the strict parse
  * is a codegen'd `when`/`raise_error` ladder, so data-quality failures abort
  * the job exactly like the reference's RuntimeError (X2).
  */
object FactAttendance {

  def build(raw: DataFrame, idByKey: DataFrame): DataFrame = {
    val dateCols = RawSheet.dateColumns(raw) // R1, raises on duplicate ISO
    val fixed = Seq(
      col(RowIdx),
      safeStr(qcol("Tag")).as("tag"),
      safeStr(qcol("Joined")).as("joined_date"),
      safeStr(qcol("Who")).as("full_name"))
    // Null cells → "" before unpivot so no melt variant can drop them:
    // the reference keeps empty cells as missed rows.
    val dated = dateCols.map { case (name, iso) =>
      coalesce(qcol(name).cast("string"), lit("")).as(iso)
    }
    val base = raw
      .select(fixed ++ dated: _*)
      .filter(col("tag") =!= "" && col("tag") =!= "Song" && col("full_name") =!= "")
      // id lookup is a dimension join: broadcast, never shuffle the sheet side
      .join(broadcast(idByKey), Seq("full_name", "joined_date"), "inner") // no id → skip row

    if (dateCols.isEmpty) {
      return base.select(
        lit("").as("rehearsal_date"), col("chorister_id"),
        lit(0.0).as("hours_attended"), lit(0).as("missed_flag"),
        current_timestamp().as("load_ts")).limit(0)
    }

    val unp = base.unpivot(
      Array(col("chorister_id")),
      dateCols.map { case (_, iso) => col("`" + iso + "`") }.toArray,
      "rehearsal_date", "raw_val")

    val empty = trim(coalesce(col("raw_val"), lit(""))) === ""
    unp.select(
      col("rehearsal_date"),
      col("chorister_id"),
      when(empty, 0.0)
        .otherwise(parseHoursStrict(col("raw_val"), col("chorister_id"), col("rehearsal_date")))
        .as("hours_attended"),
      when(empty, 1).otherwise(0).as("missed_flag"),
      current_timestamp().as("load_ts"))
  }

  /** Lenient variant with a `bad_cells` quarantine
    * (docs/data_contract.md:196-205 — spec'd in the reference contract but
    * never implemented there; grain: one row per invalid source cell).
    * Invalid cells (unparseable or negative hours) are diverted to the
    * quarantine frame with their context instead of aborting the run; the
    * corresponding fact rows are dropped. Returns (facts, badCells).
    */
  def buildWithQuarantine(raw: DataFrame, idByKey: DataFrame): (DataFrame, DataFrame) = {
    val dateCols = RawSheet.dateColumns(raw)
    val fixed = Seq(
      col(RowIdx),
      safeStr(qcol("Tag")).as("tag"),
      safeStr(qcol("Joined")).as("joined_date"),
      safeStr(qcol("Who")).as("full_name"))
    val dated = dateCols.map { case (name, iso) =>
      coalesce(qcol(name).cast("string"), lit("")).as(iso)
    }
    val base = raw
      .select(fixed ++ dated: _*)
      .filter(col("tag") =!= "" && col("tag") =!= "Song" && col("full_name") =!= "")
      .join(broadcast(idByKey), Seq("full_name", "joined_date"), "inner")

    if (dateCols.isEmpty) {
      val emptyFacts = base.select(
        lit("").as("rehearsal_date"), col("chorister_id"),
        lit(0.0).as("hours_attended"), lit(0).as("missed_flag"),
        current_timestamp().as("load_ts")).limit(0)
      val emptyBad = base.select(
        lit("chorister").as("entity_type"), col("tag"), col("full_name").as("who"),
        lit(null).cast("date").as("rehearsal_date"), lit("").as("raw_value"),
        lit("").as("error_reason"), current_timestamp().as("run_ts")).limit(0)
      return (emptyFacts, emptyBad)
    }

    val unp = base.unpivot(
      Array(col("chorister_id"), col("tag"), col("full_name")),
      dateCols.map { case (_, iso) => col("`" + iso + "`") }.toArray,
      "rehearsal_date", "raw_val")

    val trimmed = trim(coalesce(col("raw_val"), lit("")))
    val parsed = parseNumLenient(col("raw_val"))
    val reason = when(trimmed === "", lit(null))
      .when(parsed.isNull, lit("unparseable number"))
      .when(parsed < 0, lit("negative hours"))
      .otherwise(lit(null))
    val tagged = unp.withColumn("__reason", reason)

    val facts = tagged.filter(col("__reason").isNull).select(
      col("rehearsal_date"),
      col("chorister_id"),
      when(trimmed === "", 0.0).otherwise(parsed).as("hours_attended"),
      when(trimmed === "", 1).otherwise(0).as("missed_flag"),
      current_timestamp().as("load_ts"))

    val badCells = tagged.filter(col("__reason").isNotNull).select(
      lit("chorister").as("entity_type"),
      col("tag"),
      col("full_name").as("who"),
      try_to_date(col("rehearsal_date"), "yyyy-MM-dd").as("rehearsal_date"),
      trimmed.as("raw_value"),
      col("__reason").as("error_reason"),
      current_timestamp().as("run_ts"))

    (facts, badCells)
  }
}
