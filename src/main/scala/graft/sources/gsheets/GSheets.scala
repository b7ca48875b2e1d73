package graft.sources.gsheets

import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}
import java.nio.charset.StandardCharsets

import scala.jdk.CollectionConverters._

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.format.Json

/** Live Google Sheets connector shim — the HTTP half of the S1/S2 source the
  * `widesheet` file source reproduces offline. Mirrors the reference
  * connector's API surface call-for-call
  * (`/root/reference/etl/gsheets.py:18-164`: values.get / values.clear /
  * values.update / values.append / addSheet / read_table /
  * write_table_overwrite) against the public Sheets API v4 REST endpoints,
  * with the JDK's own HTTP client (the [[graft.format.TelegramAlertSink]]
  * precedent — no extra dependencies; JSON via the Jackson shipped with
  * Spark).
  *
  * Auth boundary: the caller supplies a bearer-token provider. The
  * reference builds its token from a service-account key via Google's OAuth
  * JWT exchange — that flow needs RSA signing plus a token-endpoint round
  * trip and is environment-specific, so it stays OUTSIDE the engine
  * (exactly like the reference keeps it in `build_sheets_service`): any
  * OAuth2 bearer with the spreadsheets scope works, however obtained.
  * `baseUrl` is injectable so the full request/response cycle is testable
  * against a loopback server (GSheetsSpec) with zero egress.
  *
  * Scale note: a spreadsheet is a small-dimension source by nature (the API
  * caps cells per sheet), so every read is a driver-side fetch promoted to a
  * DataFrame — the same single-partition shape as the file-based widesheet
  * source; big facts arrive through parquet, not sheets.
  */
final class GSheetsClient(
    tokenProvider: () => String,
    baseUrl: String = "https://sheets.googleapis.com/v4/spreadsheets",
    timeoutSeconds: Long = 30L) {

  private val http = HttpClient.newHttpClient()
  private val mapper = new ObjectMapper()

  private def enc(s: String): String =
    java.net.URLEncoder.encode(s, StandardCharsets.UTF_8.name())

  private def request(method: String, url: String, body: Option[String]): JsonNode = {
    val b = HttpRequest.newBuilder()
      .uri(URI.create(url))
      .header("Authorization", s"Bearer ${tokenProvider()}")
      .timeout(java.time.Duration.ofSeconds(timeoutSeconds))
    val req = (body match {
      case Some(payload) => b.header("Content-Type", "application/json")
        .method(method, HttpRequest.BodyPublishers.ofString(payload))
      case None => b.method(method, HttpRequest.BodyPublishers.noBody())
    }).build()
    val resp = http.send(req, HttpResponse.BodyHandlers.ofString())
    // raise on HTTP error like the reference client (googleapiclient throws)
    if (resp.statusCode() / 100 != 2)
      throw new RuntimeException(
        s"Sheets API HTTP ${resp.statusCode()} for $method $url: ${resp.body().take(200)}")
    if (resp.body() == null || resp.body().isEmpty) mapper.createObjectNode()
    else mapper.readTree(resp.body())
  }

  private def valuesJson(values: Seq[Seq[String]]): String =
    values.map(_.map(v => if (v == null) "\"\"" else Json.str(v))
      .mkString("[", ",", "]")).mkString("""{"values": [""", ",", "]}")

  /** `values.get` — rows of a range; [] for an empty range
    * (gsheets.py:97-109). Cells render as strings (the widesheet contract:
    * everything arrives as text and the parse operators decide). */
  def getValues(spreadsheetId: String, rangeA1: String): Seq[Seq[String]] = {
    val node = request("GET", s"$baseUrl/$spreadsheetId/values/${enc(rangeA1)}", None)
    val values = node.path("values")
    if (!values.isArray) Seq.empty
    else values.elements().asScala.map { row =>
      row.elements().asScala.map(c => if (c.isNull) null else c.asText()).toSeq
    }.toSeq
  }

  /** Worksheet titles (gsheets.py:35-49). */
  def sheetTitles(spreadsheetId: String): Set[String] = {
    val node = request("GET",
      s"$baseUrl/$spreadsheetId?fields=${enc("sheets.properties.title")}", None)
    node.path("sheets").elements().asScala
      .map(_.path("properties").path("title").asText())
      .filter(_.nonEmpty).toSet
  }

  /** Create the tab if missing (gsheets.py:52-70); no-op when present. */
  def ensureSheet(spreadsheetId: String, title: String): Unit =
    if (!sheetTitles(spreadsheetId).contains(title)) {
      val body =
        s"""{"requests": [{"addSheet": {"properties": {"title": ${Json.str(title)}}}}]}"""
      request("POST", s"$baseUrl/$spreadsheetId:batchUpdate", Some(body))
      ()
    }

  /** `values.clear` on a range (the first half of every idempotent write). */
  def clearRange(spreadsheetId: String, rangeA1: String): Unit = {
    request("POST", s"$baseUrl/$spreadsheetId/values/${enc(rangeA1)}:clear",
      Some("{}"))
    ()
  }

  /** `values.update` with USER_ENTERED input (gsheets.py:73-95). */
  def updateRange(spreadsheetId: String, rangeA1: String, values: Seq[Seq[String]]): Unit = {
    request("PUT",
      s"$baseUrl/$spreadsheetId/values/${enc(rangeA1)}?valueInputOption=USER_ENTERED",
      Some(valuesJson(values)))
    ()
  }

  /** `values.append` — the reference's non-idempotent helper
    * (gsheets.py:18-32), used for the run-log sheet. */
  def appendRows(spreadsheetId: String, rangeA1: String, rows: Seq[Seq[String]]): Unit = {
    request("POST",
      s"$baseUrl/$spreadsheetId/values/${enc(rangeA1)}:append" +
        "?valueInputOption=USER_ENTERED&insertDataOption=INSERT_ROWS",
      Some(valuesJson(rows)))
    ()
  }

  /** `read_table` (gsheets.py:112-136): worksheet `A:ZZ`, first row promoted
    * to the header (trimmed), short rows padded with null, long rows
    * truncated — rendered as the same `src_row_idx`-stamped all-string frame
    * the file widesheet source emits, with the same header hygiene: empty
    * header cells become `_c<idx>`, DUPLICATE headers fail fast (a sheet
    * with two identical column names is malformed; silently renaming would
    * let every downstream `qcol` pick one arbitrarily). Empty sheet or
    * header-only → empty frame. */
  def readTable(spark: SparkSession, spreadsheetId: String, worksheet: String): DataFrame = {
    val values = getValues(spreadsheetId, s"$worksheet!A:ZZ")
    if (values.isEmpty)
      return graft.etl.RawSheet.fromRows(spark, Seq.empty, Seq.empty)
    val header = values.head.zipWithIndex.map { case (h, i) =>
      val t = if (h == null) "" else h.trim
      if (t.isEmpty) s"_c$i" else t
    }
    val dups = header.groupBy(identity).filter(_._2.length > 1).keys
    require(dups.isEmpty,
      s"gsheets: duplicate header name(s) ${dups.mkString(", ")} in '$worksheet'")
    graft.etl.RawSheet.fromRows(spark, header, values.tail)
  }

  /** `write_table_overwrite` (gsheets.py:139-164): ensure tab, clear `A:ZZ`,
    * write header + rows at `A1` — idempotent by construction (repeat runs
    * converge to the same sheet state). */
  def overwriteTable(
      spreadsheetId: String,
      worksheet: String,
      header: Seq[String],
      rows: Seq[Seq[String]]): Unit = {
    ensureSheet(spreadsheetId, worksheet)
    clearRange(spreadsheetId, s"$worksheet!A:ZZ")
    updateRange(spreadsheetId, s"$worksheet!A1", header +: rows)
  }
}
