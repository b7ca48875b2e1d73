package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.types._

import graft.analytics.Alerts
import graft.etl.{DimChorister, FactAttendance, RawSheet}

/** The two contract-spec'd-but-never-implemented reference features
  * (SURVEY §2.11): the bad_cells quarantine (data_contract.md:196-205) and
  * the song-filtered miss alert (data_contract.md:209-212), plus the
  * lake-scale explicit-ordinal ingest.
  */
class ContractExtrasSpec extends SparkSpec {

  private val header = Seq("Tag", "Joined", "tgid", "Who", "16.06.24", "23.06.24")

  test("bad_cells quarantine: invalid cells diverted with reasons, run continues") {
    val raw = RawSheet.fromRows(spark, header, Seq(
      Seq("Alto", "16.06.24", "", "Anna", "2", "abc"),
      Seq("Bass", "16.06.24", "", "Ivan", "-1", "1,5")))
    val (facts, bad) = FactAttendance.buildWithQuarantine(raw, DimChorister.idByKey(raw))

    val gotFacts = facts.select("rehearsal_date", "chorister_id", "hours_attended", "missed_flag")
      .collect().map(_.toSeq).toSet
    assert(gotFacts === Set(
      Seq("2024-06-16", "Anna", 2.0, 0),
      Seq("2024-06-23", "Ivan", 1.5, 0)))

    val gotBad = bad.select("entity_type", "tag", "who", "rehearsal_date", "raw_value", "error_reason")
      .collect().map(r => (r.getString(1), r.getString(2), r.getDate(3).toString,
        r.getString(4), r.getString(5))).toSet
    assert(gotBad === Set(
      ("Alto", "Anna", "2024-06-23", "abc", "unparseable number"),
      ("Bass", "Ivan", "2024-06-16", "-1", "negative hours")))
    assert(bad.schema("rehearsal_date").dataType === DateType)
  }

  test("bad_cells: clean input yields empty quarantine and identical facts to strict build") {
    val raw = RawSheet.fromRows(spark, header, Seq(
      Seq("Alto", "16.06.24", "", "Anna", "2", "2,5")))
    val (facts, bad) = FactAttendance.buildWithQuarantine(raw, DimChorister.idByKey(raw))
    val strict = FactAttendance.build(raw, DimChorister.idByKey(raw))
    assert(bad.count() === 0)
    assert(facts.select("rehearsal_date", "chorister_id", "hours_attended", "missed_flag")
      .collect().map(_.toSeq).toSet ===
      strict.select("rehearsal_date", "chorister_id", "hours_attended", "missed_flag")
        .collect().map(_.toSeq).toSet)
  }

  test("missedWhileSong: misses counted only on dates the song was rehearsed") {
    val martSchema = StructType(Seq(
      StructField("rehearsal_date", StringType), StructField("chorister_id", StringType),
      StructField("full_name", StringType), StructField("voice_part", StringType),
      StructField("tgid", StringType), StructField("missed_flag", IntegerType),
      StructField("attended_flag", IntegerType), StructField("available_flag", IntegerType),
      StructField("is_active", IntegerType)))
    val dates = (0 until 4).map(i => java.time.LocalDate.of(2025, 3, 3).plusWeeks(i).toString)
    // c1 misses all 4; c2 misses only non-Gloria dates; c3 misses all but inactive
    val mart = spark.createDataFrame(
      spark.sparkContext.parallelize(
        dates.map(d => Row(d, "c1", "Ivan", "Bass", "", 1, 0, 1, 1)) ++
        dates.zipWithIndex.map { case (d, i) =>
          Row(d, "c2", "Olga", "Alto", "", if (i < 2) 1 else 0, if (i < 2) 0 else 1, 1, 1) } ++
        dates.map(d => Row(d, "c3", "Petr", "Tenor", "", 1, 0, 1, 0))),
      martSchema)
    // Gloria rehearsed on the last two dates only
    val songs = spark.createDataFrame(
      spark.sparkContext.parallelize(Seq(
        Row(dates(2), "Gloria"), Row(dates(3), "Gloria"), Row(dates(0), "Ave Maria"))),
      StructType(Seq(
        StructField("rehearsal_date", StringType), StructField("song_name", StringType))))

    val out = Alerts.missedWhileSong(mart, songs, "gloria", lookbackWeeks = 12, missThreshold = 2)
      .collect()
    // c1 missed both Gloria dates -> reported; c2 attended them; c3 inactive
    assert(out.length === 1)
    assert(out(0).getAs[String]("chorister_id") === "c1")
    assert(out(0).getAs[Long]("n_missed_song") === 2L)
    assert(out(0).getAs[Seq[String]]("missed_dates") === Seq(dates(3), dates(2)))
  }

  test("missedWhileSong: missed_dates capped at 10 like alert #1") {
    val martSchema = StructType(Seq(
      StructField("rehearsal_date", StringType), StructField("chorister_id", StringType),
      StructField("full_name", StringType), StructField("voice_part", StringType),
      StructField("tgid", StringType), StructField("missed_flag", IntegerType),
      StructField("attended_flag", IntegerType), StructField("available_flag", IntegerType),
      StructField("is_active", IntegerType)))
    val dates = (0 until 14).map(i => java.time.LocalDate.of(2025, 1, 6).plusDays(i).toString)
    val mart = spark.createDataFrame(
      spark.sparkContext.parallelize(
        dates.map(d => Row(d, "c1", "Ivan", "Bass", "", 1, 0, 1, 1))),
      martSchema)
    val songs = spark.createDataFrame(
      spark.sparkContext.parallelize(dates.map(d => Row(d, "Gloria"))),
      StructType(Seq(
        StructField("rehearsal_date", StringType), StructField("song_name", StringType))))
    val out = Alerts.missedWhileSong(mart, songs, "gloria", 12, 3).collect()
    assert(out.length === 1)
    assert(out(0).getAs[Long]("n_missed_song") === 14L)
    assert(out(0).getAs[Seq[String]]("missed_dates").length === 10)
  }

  test("fromOrdinal: ordinal column is dropped (cannot become a date header) and nulls fail fast") {
    import spark.implicits._
    val df = Seq((1L, "Alto", "16.06.24", "", "Anna", "2"))
      .toDF("45473", "Tag", "Joined", "tgid", "Who", "16.06.24")
    val raw = RawSheet.fromOrdinal(df, "45473")
    // the numeric-named ordinal column must NOT appear as a date column
    assert(RawSheet.dateColumns(raw).map(_._2) === Seq("2024-06-16"))
    val bad = Seq((null.asInstanceOf[java.lang.Long], "Alto", "x", "", "A", ""))
      .toDF("ord", "Tag", "Joined", "tgid", "Who", "16.06.24")
    val e = intercept[Exception] {
      RawSheet.fromOrdinal(bad, "ord").select(RawSheet.RowIdx).collect()
    }
    assert(e.getMessage.contains("null or non-numeric"))
  }

  test("fromOrdinal: explicit source ordinal drives D1 numbering, no coalesce") {
    import spark.implicits._
    val df = Seq(
      (30L, "Alto", "23.06.24", "", "Anna"),
      (10L, "Alto", "16.06.24", "", "Anna"),
      (20L, "Bass", "16.06.24", "", "Ivan"))
      .toDF("ord", "Tag", "Joined", "tgid", "Who")
    val raw = RawSheet.fromOrdinal(df, "ord")
    val ids = DimChorister.withIds(raw)
      .select("full_name", "joined_date", "chorister_id")
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getString(2)).toMap
    // ordinal 10 row is FIRST despite appearing second in the data
    assert(ids(("Anna", "16.06.24")) === "Anna")
    assert(ids(("Anna", "23.06.24")) === "Anna | 23.06.24")
    assert(!raw.queryExecution.executedPlan.toString.contains("Coalesce"))
  }
}
