package graft.format

/** Alert delivery (S8, /root/reference/etl/alerts.py:217-230). The engine
  * formats; a sink delivers. Tests and dry-runs use [[ConsoleAlertSink]];
  * [[TelegramAlertSink]] posts to the Bot API with the JDK's own HTTP client
  * (no extra dependencies) and raises on HTTP or API-level errors like the
  * reference.
  */
trait AlertSink {
  def send(text: String): Unit
}

object ConsoleAlertSink extends AlertSink {
  override def send(text: String): Unit = {
    println("--- Alert message ---")
    println(text)
    println("---")
  }
}

final class TelegramAlertSink(token: String, chatId: String) extends AlertSink {
  override def send(text: String): Unit = {
    import java.net.http.{HttpClient, HttpRequest, HttpResponse}
    import java.net.URI
    val payload =
      s"""{"chat_id": ${Json.str(chatId)}, "text": ${Json.str(text)}, "parse_mode": "HTML",
         | "disable_web_page_preview": true}""".stripMargin
    val req = HttpRequest.newBuilder()
      .uri(URI.create(s"https://api.telegram.org/bot$token/sendMessage"))
      .header("Content-Type", "application/json")
      .timeout(java.time.Duration.ofSeconds(30))
      .POST(HttpRequest.BodyPublishers.ofString(payload))
      .build()
    val resp = HttpClient.newHttpClient().send(req, HttpResponse.BodyHandlers.ofString())
    if (resp.statusCode() / 100 != 2)
      throw new RuntimeException(s"Telegram HTTP error ${resp.statusCode()}: ${resp.body().take(200)}")
    if (!resp.body().contains("\"ok\":true"))
      throw new RuntimeException(s"Telegram API error: ${resp.body().take(200)}")
  }
}
