package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.sources.widesheet.CsvCodec

/** The widesheet DataSource V2 connector (S1/S2): header promotion, ragged
  * rows, quoting, null semantics and the src_row_idx ordinal — plus the CSV
  * codec's RFC-4180 edges. The golden E2E pipeline runs over the same path
  * via RawSheet.fromCsv in ChoirPipelineSpec.
  */
class WideSheetSpec extends SparkSpec {

  private def sheet(content: String): String = {
    val f = Files.createTempFile("widesheet", ".csv")
    Files.writeString(f, content)
    f.toString
  }

  test("header promotion + src_row_idx in file order, all data columns string") {
    val df = spark.read.format("widesheet").load(sheet(
      "Tag,Joined,tgid,Who,16.06.24\nAlto,16.06.24,@a,Anna,2\nBass,23.06.24,,Boris,1\n"))
    assert(df.columns.toSeq === Seq("src_row_idx", "Tag", "Joined", "tgid", "Who", "16.06.24"))
    assert(df.schema.fields.drop(1).forall(_.dataType.typeName === "string"))
    val rows = df.orderBy("src_row_idx").collect()
    assert(rows.map(_.getLong(0)).toSeq === Seq(0L, 1L))
    assert(rows(0).getString(4) === "Anna" && rows(1).getString(4) === "Boris")
  }

  test("ragged rows: short rows padded with null, long rows truncated; empty cells null") {
    val df = spark.read.format("widesheet").load(sheet(
      "a,b,c\n1,,3\nonly\nx,y,z,EXTRA\n"))
    val rows = df.orderBy("src_row_idx").collect()
    assert(rows.length === 3)
    assert(rows(0).isNullAt(2), "empty cell must be null")
    assert(rows(1).getString(1) === "only" && rows(1).isNullAt(2) && rows(1).isNullAt(3))
    assert(rows(2).getString(3) === "z") // EXTRA dropped: header width wins
  }

  test("quoted commas, escaped quotes and embedded newlines survive; blank lines skipped") {
    val df = spark.read.format("widesheet").load(sheet(
      "Who,Note\n\"Doe, Jane\",\"said \"\"hi\"\"\"\n\n\"Two\nLines\",ok\r\nlast,row"))
    val rows = df.orderBy("src_row_idx").collect()
    assert(rows.map(_.getString(1)).toSeq === Seq("Doe, Jane", "Two\nLines", "last"))
    assert(rows(0).getString(2) === "said \"hi\"")
    assert(rows(1).getString(2) === "ok")
  }

  test("header hygiene: empty header cells become _c<idx>, duplicate headers fail fast") {
    val df = spark.read.format("widesheet").load(sheet("a,,c\n1,2,3\n"))
    assert(df.columns.toSeq === Seq("src_row_idx", "a", "_c1", "c"))
    val e = intercept[IllegalArgumentException] {
      spark.read.format("widesheet").load(sheet("a,b,a\n1,2,3\n")).schema
    }
    assert(e.getMessage.contains("duplicate header") && e.getMessage.contains("'a'"))
  }

  test("schema peek: an unterminated header past the cap fails fast; a terminated one is fine") {
    import graft.sources.widesheet.WideSheetSource
    // one giant record, no newline inside the peek bound -> must error, not
    // silently infer a truncated schema
    val cap = WideSheetSource.HeaderPeekBytes
    val giant = sheet("h" + (",x" * (cap / 2 + 16).toInt))
    val e = intercept[IllegalArgumentException] {
      spark.read.format("widesheet").load(giant).schema
    }
    assert(e.getMessage.contains("does not terminate"))
    // a file LARGER than the cap whose header terminates early is fine: the
    // second record inside the prefix proves record 1 complete
    val bigBody = new StringBuilder("a,b\n")
    while (bigBody.length < cap + 1024) bigBody.append("1,2\n")
    val ok = spark.read.format("widesheet").load(sheet(bigBody.toString))
    assert(ok.columns.toSeq === Seq("src_row_idx", "a", "b"))
  }

  test("CsvCodec edges: CRLF, trailing record without newline, lone CR, empty file") {
    assert(CsvCodec.parse("a,b\r\nc,d") === Vector(Vector("a", "b"), Vector("c", "d")))
    assert(CsvCodec.parse("a\rb") === Vector(Vector("a"), Vector("b")))
    assert(CsvCodec.parse("") === Vector.empty)
    assert(CsvCodec.parse("x,\n") === Vector(Vector("x", "")))
    // a single QUOTED empty field is a real one-field record (Spark CSV emits
    // a one-null-field row for it) — only unquoted blank lines are skipped
    assert(CsvCodec.parse("\"\"\n") === Vector(Vector("")),
      "quoted empty sole field is a record, not a blank line")
    assert(CsvCodec.parse("\"\"") === Vector(Vector("")),
      "trailing quoted empty record without newline still emitted")
    assert(CsvCodec.parse("a\n\n\nb") === Vector(Vector("a"), Vector("b")),
      "unquoted blank lines are skipped")
  }

  test("fromCsv through the connector matches the fromRows frame shape") {
    val viaCsv = graft.etl.RawSheet.fromCsv(spark, sheet(
      "Tag,Joined,tgid,Who,16.06.24\nAlto,16.06.24,,Anna,2\n"))
    val viaRows = graft.etl.RawSheet.fromRows(spark,
      Seq("Tag", "Joined", "tgid", "Who", "16.06.24"),
      Seq(Seq("Alto", "16.06.24", null, "Anna", "2")))
    assert(viaCsv.schema === viaRows.schema)
    assert(viaCsv.collect().toSeq === viaRows.collect().toSeq)
  }
}
