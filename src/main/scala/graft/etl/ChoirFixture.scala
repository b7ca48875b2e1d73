package graft.etl

import org.apache.spark.sql.{DataFrame, SparkSession}

/** The canonical RAW fixture (FIXTURES.md §1): one wide sheet exercising
  * every pipeline branch — mixed header formats (d.m.yy, Sheets serial,
  * d.m.yyyy), duplicate chorister and song names, the ex-prefix, an override
  * history, comma decimals, empty cells as misses, the empty-title Song-row
  * position quirk, and a skipped row. Shared by the golden E2E spec and the
  * driver-verified choir queries so the expectations stay pinned to one
  * definition.
  */
object ChoirFixture {
  /** 45473 = 2024-06-30 as a Sheets serial; dates: 06-16, 06-23, 06-30, 07-07. */
  val header: Seq[String] = Seq(
    "Tag", "Joined", "tgid", "Who", "16.06.24", "23.06.24", "45473", "7.7.2024")

  val rows: Seq[Seq[String]] = Seq(
    Seq("Alto", "16.06.24", "@anna", "Anna A", "2", "", "2,5", ""),
    Seq("exTenor", "16.06.24", "", "Boris B", "1.5", "2", "", ""),
    Seq("Soprano", "02.10.24", "@maria", "Мария Дидуренко", "", "2", "2", ""),
    Seq("Bass", "16.06.24", "@ivan", "Иван И", "", "", "", ""),
    Seq("Alto", "23.06.24", "", "Anna A", "", "1", "", ""),
    Seq("", "", "", "Ghost", "", "", "", ""),
    Seq("Song", "", "", "Gloria", "30", "", "45", ""),
    Seq("Song", "", "", "", "", "10", "", ""),
    Seq("Song", "", "", "Ave Maria", "", "", "25", "x"),
    Seq("Song", "", "", "Gloria", "", "20", "", ""))

  def raw(spark: SparkSession): DataFrame = RawSheet.fromRows(spark, header, rows)
}
