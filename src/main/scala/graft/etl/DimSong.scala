package graft.etl

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.etl.Exprs._
import graft.etl.RawSheet.{qcol, RowIdx}

/** dim_song — capability source /root/reference/etl/dim_song.py.
  *
  * Duplicate titles get " (k)" suffixes in source-row order (D2). The
  * `seq_idx` column numbers emitted songs 1..n in source order; it is the
  * positional link (D5) fact_song_time joins on — the reference zips the i-th
  * RAW Song row with song_ids_ordered[i] (dim_song.py:62,
  * fact_song_time.py:78-81), including its quirk that Song rows with an empty
  * title do NOT emit a dim row yet DO consume a position in the fact builder.
  */
object DimSong {

  /** All RAW rows with Tag == "Song" (P4) — including empty titles. */
  def songRows(raw: DataFrame): DataFrame = {
    require(Seq("Tag", "Who").forall(raw.columns.contains),
      "RAW is missing required columns Tag/Who")
    raw.select(
        col(RowIdx),
        safeStr(qcol("Tag")).as("tag"),
        safeStr(qcol("Who")).as("song_name"))
      .filter(col("tag") === "Song")
  }

  /** dim_song rows with their 1-based emission order (`seq_idx`).
    * Single-partition windows are fine here: the sheet is KB-scale by
    * construction (≤702 columns, tens of rows).
    */
  def withSeq(raw: DataFrame): DataFrame = {
    val named = songRows(raw).filter(col("song_name") =!= "")
    val wDup = Window.partitionBy(col("song_name")).orderBy(col(RowIdx))
    val wAll = Window.orderBy(col(RowIdx))
    named
      .withColumn("__rn", row_number().over(wDup))
      .withColumn("song_id",
        when(col("__rn") === 1, col("song_name"))
          .otherwise(format_string("%s (%d)", col("song_name"), col("__rn"))))
      .withColumn("seq_idx", row_number().over(wAll))
      .drop("__rn")
  }

  /** dim_song table (canonical 4 columns + ordinals for the D5 link). */
  def build(raw: DataFrame): DataFrame =
    withSeq(raw).select(
      col("song_id"), col("song_name"),
      current_timestamp().as("created_at"),
      current_timestamp().as("updated_at"),
      col("seq_idx"),
      col(RowIdx).as("src_ord"))
}
