package graft.etl

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.etl.Exprs._
import graft.etl.RawSheet.RowIdx

/** fact_song_time: the sparse unpivot (R3).
  *
  * Capability source /root/reference/etl/fact_song_time.py:43-88 — Song rows ×
  * date columns, keeping only cells that parse as a number (lenient comma
  * decimals). Two reference quirks preserved:
  *  - rehearsal_date is the RAW header string, NOT ISO-normalized (that
  *    happens later in the marts, marts.py:208-210);
  *  - the song_id comes positionally: the k-th Song row (title or not) takes
  *    the k-th emitted dim_song id, and rows past the end of the id list are
  *    dropped (the reference `break`s). (D5)
  */
object FactSongTime {

  /** @param dimSong output of [[DimSong.withSeq]] (or the built table — needs
    *                `song_id` and `seq_idx`). */
  def build(raw: DataFrame, dimSong: DataFrame): DataFrame = {
    val rawDates = RawSheet.rawDateColumns(raw)
    val wAll = Window.orderBy(col(RowIdx))
    val songPos = DimSong.songRows(raw)
      .withColumn("fact_seq", row_number().over(wAll))
      .join(dimSong.select(col("seq_idx"), col("song_id")),
        col("fact_seq") === col("seq_idx"), "inner")
      .select(col(RowIdx), col("song_id"))

    if (rawDates.isEmpty) {
      return songPos.select(
        lit("").as("rehearsal_date"), col("song_id"),
        lit(0.0).as("minutes_spent"),
        current_timestamp().as("load_ts")).limit(0)
    }

    val dated = rawDates.map(n =>
      coalesce(RawSheet.qcol(n).cast("string"), lit("")).as(n))
    val base = raw.select((col(RowIdx) +: dated): _*)
      .join(songPos, Seq(RowIdx), "inner")

    base.unpivot(
        Array(col("song_id")),
        rawDates.map(n => RawSheet.qcol(n)).toArray,
        "rehearsal_date", "raw_val")
      .withColumn("minutes_spent", parseNumLenient(col("raw_val")))
      .filter(col("minutes_spent").isNotNull)
      .select(col("rehearsal_date"), col("song_id"), col("minutes_spent"),
        current_timestamp().as("load_ts"))
  }
}
