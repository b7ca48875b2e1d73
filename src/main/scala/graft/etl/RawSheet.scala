package graft.etl

import java.time.LocalDate
import java.time.format.DateTimeFormatter

import org.apache.spark.sql.{Column, DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}

/** Driver-side mirror of [[Exprs.normalizeDateToIso]] for *header* cells.
  *
  * Column headers are plan metadata, not data, so the date-column extraction
  * (R1, /root/reference/etl/fact_attendance.py:117-133) runs on the driver.
  * A ScalaTest property asserts this stays in lockstep with the Column version.
  */
object IsoDate {
  private val Iso = DateTimeFormatter.ofPattern("yyyy-MM-dd")
  private val Dmy = "^(\\d{1,2})\\.(\\d{1,2})\\.(\\d{2,4})$".r
  // Python datetime years are 1..9999; serials outside raised OverflowError in
  // the reference and normalized to "". java.time goes far past year 9999, so
  // the bound must be explicit (same constants as Exprs.normalizeDateToIso).
  // The epoch's ordinal is 693594, so -693593 is the smallest accepted serial.
  private val SerialMin = -693593L // 0001-01-01
  private val SerialMax = 2958465L // 9999-12-31

  def normalize(raw: String): String = {
    if (raw == null) return ""
    val s = raw.trim
    if (s.isEmpty) ""
    else if (s.matches("^-?\\d+(\\.\\d+)?$")) {
      try {
        val serial = s.toDouble.toLong // int(float(v)): truncates toward zero
        if (serial < SerialMin || serial > SerialMax) ""
        else LocalDate.of(1899, 12, 30).plusDays(serial).format(Iso)
      } catch { case _: Exception => "" }
    } else if (s.matches("^\\d{4}-\\d{2}-\\d{2}.*")) s.substring(0, 10)
    else s match {
      case Dmy(d, m, y0) =>
        var y = y0.toInt
        if (y < 100) y += (if (y < 50) 2000 else 1900)
        try LocalDate.of(y, m.toInt, d.toInt).format(Iso)
        catch { case _: Exception => "" }
      case _ => ""
    }
  }
}

/** The RAW wide sheet: fixed entity columns `Tag, Joined, tgid, Who` plus a
  * variable set of date columns (headers in any format [[IsoDate]] accepts),
  * per /root/reference/docs/data_contract.md:15-36.
  *
  * Every order-dependent downstream operator (duplicate-ID numbering D1/D2,
  * the positional song link D5) keys off `src_row_idx`, a stable per-row
  * ordinal attached at ingest. A spreadsheet is inherently a single ordered
  * file, so the CSV ingest reads it as one split and stamps ordinals with
  * `zipWithIndex`; at lake scale the ingest job must persist an explicit
  * ordinal column instead — order is a property of the *source*, and no
  * distributed plan should be asked to invent it.
  */
object RawSheet {
  val FixedCols: Seq[String] = Seq("Tag", "Joined", "tgid", "Who")
  val RowIdx = "src_row_idx"

  /** Backtick-quoted column ref — date headers contain dots. */
  def qcol(name: String): Column = col("`" + name + "`")

  /** Read a RAW sheet from a single CSV file (header row = sheet header) via
    * the `widesheet` DataSource V2 connector
    * ([[graft.sources.widesheet.WideSheetSource]]): header promotion,
    * ragged-row padding, empty-cell→null and the `src_row_idx` ordinal all
    * happen inside the source — the data streams on an executor and never
    * takes the old `coalesce(1).rdd.zipWithIndex` driver-adjacent detour. */
  def fromCsv(spark: SparkSession, path: String): DataFrame =
    spark.read.format("widesheet").load(path)

  /** Build a RAW frame from in-memory rows (tests, embedded fixtures). */
  def fromRows(spark: SparkSession, header: Seq[String], rows: Seq[Seq[String]]): DataFrame = {
    val schema = StructType(
      StructField(RowIdx, LongType, nullable = false) +:
        header.map(h => StructField(h, StringType, nullable = true)))
    val data = rows.zipWithIndex.map { case (r, i) =>
      val padded = r.padTo(header.size, null: String).take(header.size)
      Row.fromSeq(i.toLong +: padded)
    }
    spark.createDataFrame(spark.sparkContext.parallelize(data, 1), schema)
  }

  /** Lake-scale ingest: the caller supplies the ordinal (a file offset, an
    * ingest-time sequence, a monotonic source column) instead of deriving it
    * from file order — no single-partition coalesce anywhere. This is the
    * path for any source too big to be "a sheet": order is a property of the
    * SOURCE, and a distributed plan should never have to invent it.
    */
  def fromOrdinal(df: DataFrame, ordinalCol: String): DataFrame = {
    require(df.columns.contains(ordinalCol), s"no ordinal column '$ordinalCol'")
    // fail fast on a null/non-numeric ordinal — a silently-null src_row_idx
    // would corrupt every order-dependent rule (D1/D2/D5) downstream
    val ord = when(col(ordinalCol).cast(LongType).isNull,
      raise_error(format_string(
        "ordinal column '%s' has a null or non-numeric value: '%s'",
        lit(ordinalCol), col(ordinalCol).cast("string"))).cast(LongType))
      .otherwise(col(ordinalCol).cast(LongType))
    // drop the source column: anything left among the extras is treated as a
    // date-header candidate by dateColumns (a numeric ordinal name would
    // parse as a Sheets serial and unpivot ordinals into facts)
    val out = df.withColumn(RowIdx, ord)
    if (ordinalCol != RowIdx) out.drop(ordinalCol) else out
  }

  /** Non-fixed columns, in sheet order. */
  def extraColumns(df: DataFrame): Seq[String] =
    df.columns.filterNot(c => FixedCols.contains(c) || c == RowIdx).toSeq

  /** R1: date columns as (rawHeader, isoDate), skipping headers that do not
    * normalize; duplicate ISO dates after normalization abort the run, exactly
    * like /root/reference/etl/fact_attendance.py:127-132.
    */
  def dateColumns(df: DataFrame): Seq[(String, String)] = {
    val seen = scala.collection.mutable.LinkedHashMap[String, String]()
    extraColumns(df).flatMap { name =>
      val iso = IsoDate.normalize(name)
      if (iso.isEmpty) None
      else {
        seen.get(iso).foreach { prev =>
          throw new RuntimeException(
            s"Duplicate rehearsal_date after normalization: '$iso' " +
              s"(raw headers '$prev' and '$name')")
        }
        seen(iso) = name
        Some(name -> iso)
      }
    }
  }

  /** All non-empty extra headers with their RAW text (fact_song_time keeps the
    * raw header as rehearsal_date — /root/reference/etl/fact_song_time.py:63-67). */
  def rawDateColumns(df: DataFrame): Seq[String] =
    extraColumns(df).filter(_.trim.nonEmpty)
}
