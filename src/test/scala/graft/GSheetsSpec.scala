package graft

import java.net.InetSocketAddress
import java.nio.charset.StandardCharsets

import com.sun.net.httpserver.{HttpExchange, HttpServer}

import graft.sources.gsheets.GSheetsClient

/** The live-sheet connector shim against a loopback Sheets API double: full
  * request/response cycle (method, path, auth header, body) with zero
  * egress. The semantics under test mirror the reference connector
  * (gsheets.py read_table / write_table_overwrite / append_rows): header
  * promotion with trimming and `_c<idx>` placeholders, short-row padding /
  * long-row truncation, duplicate-header fail-fast, idempotent
  * ensure→clear→update write order, and raise-on-HTTP-error.
  */
class GSheetsSpec extends SparkSpec {

  private case class Recorded(method: String, path: String, body: String)

  /** Start a loopback server; `routes` maps (method, path-with-query prefix)
    * to a response body. Requests are recorded in order. */
  private def withServer(routes: (String, String, String)*)(
      f: (String, () => List[Recorded]) => Unit): Unit = {
    val server = HttpServer.create(new InetSocketAddress("127.0.0.1", 0), 0)
    val recorded = scala.collection.mutable.ListBuffer.empty[Recorded]
    server.createContext("/", (ex: HttpExchange) => {
      val body = new String(ex.getRequestBody.readAllBytes(), StandardCharsets.UTF_8)
      val path = ex.getRequestURI.toString
      recorded.synchronized {
        recorded += Recorded(ex.getRequestMethod, path, body)
      }
      val auth = Option(ex.getRequestHeaders.getFirst("Authorization"))
      val (code, resp) =
        if (!auth.contains("Bearer test-token")) (401, """{"error": "no auth"}""")
        else routes.collectFirst {
          case (m, p, r) if m == ex.getRequestMethod && path.startsWith(p) => (200, r)
        }.getOrElse((404, """{"error": "not found"}"""))
      val bytes = resp.getBytes(StandardCharsets.UTF_8)
      ex.sendResponseHeaders(code, bytes.length)
      ex.getResponseBody.write(bytes)
      ex.close()
    })
    server.start()
    try f(s"http://127.0.0.1:${server.getAddress.getPort}",
      () => recorded.synchronized(recorded.toList))
    finally server.stop(0)
  }

  private def client(base: String) =
    new GSheetsClient(() => "test-token", baseUrl = base)

  test("readTable: header promotion, trim, _c placeholder, pad, truncate — the widesheet contract") {
    val payload =
      """{"range": "members!A1:ZZ100", "values": [
        |  [" name ", "hours", ""],
        |  ["Анна", "1.5"],
        |  ["Боб", "2", "extra-kept"],
        |  ["Ц", "3", "x", "beyond-header-dropped"]
        |]}""".stripMargin
    withServer(("GET", "/sheet1/values/members", payload)) { (base, _) =>
      val df = client(base).readTable(spark, "sheet1", "members")
      assert(df.columns.toSeq === Seq("src_row_idx", "name", "hours", "_c2"))
      val rows = df.orderBy("src_row_idx").collect()
        .map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getString(3)))
      assert(rows.toSeq === Seq(
        (0L, "Анна", "1.5", null), // short row padded with null
        (1L, "Боб", "2", "extra-kept"),
        (2L, "Ц", "3", "x"))) // cells beyond the header width dropped
    }
  }

  test("readTable: empty range → empty frame; duplicate headers fail fast") {
    withServer(
      ("GET", "/empt/values/", """{"range": "a!A1:ZZ"}"""),
      ("GET", "/dup/values/", """{"values": [["x", "x"], ["1", "2"]]}""")) { (base, _) =>
      val df = client(base).readTable(spark, "empt", "a")
      assert(df.columns.toSeq === Seq("src_row_idx") && df.count() === 0)
      val e = intercept[IllegalArgumentException] {
        client(base).readTable(spark, "dup", "a")
      }
      assert(e.getMessage.contains("duplicate header"))
    }
  }

  test("overwriteTable: ensure(addSheet when missing) → clear → update, idempotent order") {
    withServer(
      ("GET", "/book?fields=", """{"sheets": [{"properties": {"title": "existing"}}]}"""),
      ("POST", "/book:batchUpdate", """{}"""),
      ("POST", "/book/values/report", """{}"""), // :clear and :append match here
      ("PUT", "/book/values/report", """{}""")) { (base, recorded) =>
      client(base).overwriteTable("book", "report",
        header = Seq("a", "b"), rows = Seq(Seq("1", "2"), Seq("3", null)))
      val seq = recorded().map(r => (r.method, r.path.takeWhile(_ != '?')))
      assert(seq === List(
        ("GET", "/book"), // sheetTitles
        ("POST", "/book:batchUpdate"), // report missing -> addSheet
        ("POST", "/book/values/report%21A%3AZZ:clear"),
        ("PUT", "/book/values/report%21A1")))
      val add = recorded()(1).body
      assert(add.contains("addSheet") && add.contains("\"report\""))
      val update = recorded()(3).body
      assert(update.contains("""["a","b"]""") && update.contains("""["1","2"]"""))
      assert(update.contains("""["3",""]"""), "null cell must render as empty string")

      // second run against a server where the tab exists -> NO addSheet,
      // same clear+update (the idempotent-overwrite contract)
      withServer(
        ("GET", "/book?fields=", """{"sheets": [{"properties": {"title": "report"}}]}"""),
        ("POST", "/book/values/report", """{}"""),
        ("PUT", "/book/values/report", """{}""")) { (base2, rec2) =>
        client(base2).overwriteTable("book", "report", Seq("a"), Seq(Seq("x")))
        val seq2 = rec2().map(r => (r.method, r.path.takeWhile(_ != '?')))
        assert(seq2 === List(
          ("GET", "/book"),
          ("POST", "/book/values/report%21A%3AZZ:clear"),
          ("PUT", "/book/values/report%21A1")))
      }
    }
  }

  test("appendRows request shape; HTTP errors raise like the reference client") {
    withServer(("POST", "/log/values/runs", """{}""")) { (base, recorded) =>
      client(base).appendRows("log", "runs!A:E", Seq(Seq("ts", "ok")))
      val r = recorded().head
      assert(r.method === "POST")
      assert(r.path.contains(":append"))
      assert(r.path.contains("valueInputOption=USER_ENTERED"))
      assert(r.path.contains("insertDataOption=INSERT_ROWS"))
      assert(r.body.contains("""["ts","ok"]"""))
    }
    withServer() { (base, _) =>
      val e = intercept[RuntimeException] {
        client(base).getValues("nope", "a!A:ZZ")
      }
      assert(e.getMessage.contains("404"))
    }
    // bad token -> 401 surfaces
    withServer(("GET", "/s/values/a", """{"values": []}""")) { (base, _) =>
      val e = intercept[RuntimeException] {
        new GSheetsClient(() => "WRONG", baseUrl = base).getValues("s", "a")
      }
      assert(e.getMessage.contains("401"))
    }
  }
}
