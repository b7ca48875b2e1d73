package graft

import java.nio.file.{Files, Paths}

/** S9 config source: `.env` parsing (reference main.py:152-166 semantics) and
  * the alert-config derivation, including the fail-clearly contract for
  * non-numeric integer knobs (round-3 ADVICE). Pure string parsing — plain
  * FunSuite, no SparkSession spin-up.
  */
class EnvFileSpec extends org.scalatest.funsuite.AnyFunSuite {

  private def write(lines: String*): java.nio.file.Path = {
    val f = Files.createTempFile("graftenv", ".env")
    Files.writeString(f, lines.mkString("\n"))
    f
  }

  test(".env: comments, blanks and =-less lines skipped; first = splits; quotes stripped") {
    val f = write(
      "# a comment",
      "",
      "not a kv line",
      "ALERTS_ENABLED=1",
      "ALERTS_LOOKBACK_WEEKS = 5 ",
      "TELEGRAM_BOT_TOKEN=\"tok=en\"", // value keeps its inner '='
      "NAME='single quoted'",
      "EMPTY=")
    val m = EnvFile.parse(f)
    assert(m === Map(
      "ALERTS_ENABLED" -> "1",
      "ALERTS_LOOKBACK_WEEKS" -> "5",
      "TELEGRAM_BOT_TOKEN" -> "tok=en",
      "NAME" -> "single quoted",
      "EMPTY" -> ""))
  }

  test(".env: absent file is an empty config; file values override the process env") {
    assert(EnvFile.parse(Paths.get("/nonexistent/.env")) === Map.empty)
    val f = write("PATH=from-file", "GRAFT_ONLY_IN_FILE=x")
    val merged = EnvFile.withProcessEnv(f)
    // reference main.py loads the project .env with override=True: the file
    // wins over the process environment, env fills the gaps
    assert(merged("PATH") === "from-file", "file must override the process env")
    assert(merged("GRAFT_ONLY_IN_FILE") === "x", "file must fill gaps")
    // environment-independent witness that the process env fills the gaps:
    // every ambient env key must survive the merge (values may be overridden)
    assert((sys.env.keySet -- merged.keySet).isEmpty, "env keys must fill gaps")
  }

  test("alert config: .env fixture drives ALERTS_* knobs end to end") {
    val f = write("ALERTS_ENABLED=1", "ALERTS_LOOKBACK_WEEKS=7", "ALERTS_STREAK_THRESHOLD=2")
    val cfg = Main.alertConfigFrom(EnvFile.parse(f))
    assert(cfg.enabled && cfg.lookbackWeeks === 7 && cfg.streakThreshold === 2)
  }

  test("alert config: non-numeric knob raises a named config error, not a bare NFE") {
    val e = intercept[IllegalArgumentException] {
      Main.alertConfigFrom(Map("ALERTS_LOOKBACK_WEEKS" -> "three"))
    }
    assert(e.getMessage.contains("ALERTS_LOOKBACK_WEEKS") && e.getMessage.contains("three"))
    // blank/absent falls back to defaults
    val cfg = Main.alertConfigFrom(Map("ALERTS_STREAK_THRESHOLD" -> " "))
    assert(cfg.lookbackWeeks === 3 && cfg.streakThreshold === 3 && !cfg.enabled)
  }
}
