package graft.format

import org.apache.spark.sql.{DataFrame, Row}

/** Driver-side alert formatting and delivery — capability source
  * /root/reference/etl/alerts.py:177-230 (X4 + S8). The analytics stay
  * distributed ([[graft.analytics.Alerts]]); only the collected, tens-of-rows
  * violator list is formatted here.
  */
object AlertMessage {

  /** One violator row, as produced by Alerts.currentMissedStreaks. */
  final case class Violator(
      fullName: String,
      voicePart: String,
      streakLen: Long,
      missedDates: Seq[String] = Seq.empty,
      lastAttendedDate: Option[String] = None,
      tgid: String = "")

  val DashboardUrl: String =
    "https://lookerstudio.google.com/reporting/0a0ee2af-cb64-42ca-bc16-c312a3d27f1e" +
      "/page/p_v5isym300d/edit?s=hs0hEMSZUdg"

  /** Collect a currentMissedStreaks frame into [[Violator]]s (small by
    * construction: violators are a handful of people). */
  def collectViolators(df: DataFrame): Seq[Violator] =
    df.select("full_name", "voice_part", "streak_len", "missed_dates",
      "last_attended_date", "tgid")
      .collect().toSeq.map { r: Row =>
        Violator(
          fullName = r.getString(0),
          voicePart = r.getString(1),
          streakLen = r.getLong(2),
          missedDates = r.getSeq[String](3),
          lastAttendedDate = Option(r.getString(4)),
          tgid = r.getString(5))
      }

  /** Reference `format_alert_message` (alerts.py:177-214), 1:1 including the
    * Russian text, emoji thresholds (🔴 < 50%, 🟡 <= 65%, 🟢 else), numbered
    * violator lines with `@tgid` mentions, and the dashboard link. Percent
    * uses banker's rounding like Python's round().
    */
  def format(
      violators: Seq[Violator],
      lookbackWeeks: Int,
      streakThreshold: Int = 3,
      attendanceRate: Option[Double] = None): String = {
    val parts = scala.collection.mutable.ArrayBuffer.empty[String]
    attendanceRate.foreach { rate =>
      val pct = BigDecimal(rate * 100)
        .setScale(0, BigDecimal.RoundingMode.HALF_EVEN).toInt
      val icon = if (pct < 50) "🔴" else if (pct <= 65) "🟡" else "🟢"
      parts += s"$icon Доходимость до репетиций (за последние $lookbackWeeks недели): $pct%"
      parts += ""
    }
    if (violators.isEmpty) {
      parts += s"✅ Нет хористов с пропусками $streakThreshold+ подряд (за последние $lookbackWeeks недели)."
    } else {
      parts += s"⚠️ Хористы с $streakThreshold+ пропусками подряд (за последние $lookbackWeeks недели):"
      parts += ""
      violators.zipWithIndex.foreach { case (v, i) =>
        val name = if (v.fullName.isEmpty) "—" else v.fullName
        val part = if (v.voicePart.isEmpty) "—" else v.voicePart
        val lastAtt = v.lastAttendedDate.filter(_.nonEmpty).getOrElse("—")
        val tgid = v.tgid.trim.dropWhile(_ == '@')
        val mention = if (tgid.nonEmpty) s"@$tgid" else "—"
        parts += s"${i + 1}. $name ($part) — пропусков: ${v.streakLen}, последняя явка: $lastAtt, $mention"
      }
    }
    parts += ""
    parts += s"""<a href="$DashboardUrl">Ссылка на дашборд</a>"""
    parts.mkString("\n")
  }
}
