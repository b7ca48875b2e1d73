package graft

import java.nio.file.{Files, Path}

import scala.jdk.CollectionConverters._

/** `.env` file parsing — the last sliver of S9 (config source).
  *
  * Capability source /root/reference/etl/main.py:152-166: skip blank lines,
  * comments and lines without '='; split on the FIRST '='; trim the key; trim
  * the value and strip one surrounding quote layer. FILE values take
  * precedence over the process environment, matching the reference's primary
  * `load_dotenv(env_path, override=True)` load (its later `setdefault`
  * fallback only fills ALERTS_* keys dotenv missed — it never demotes the
  * file below the process env).
  */
object EnvFile {

  /** Parse a `.env` file; an absent file is an empty config, not an error. */
  def parse(path: Path): Map[String, String] = {
    if (!Files.exists(path)) return Map.empty
    Files.readAllLines(path).asScala.iterator
      .map(_.trim)
      .filterNot(l => l.isEmpty || l.startsWith("#") || !l.contains("="))
      .map { line =>
        val eq = line.indexOf('=')
        val key = line.substring(0, eq).trim
        key -> stripQuotes(line.substring(eq + 1).trim)
      }
      .filter(_._1.nonEmpty)
      .toMap
  }

  private def stripQuotes(v: String): String =
    if (v.length >= 2 &&
      ((v.head == '"' && v.last == '"') || (v.head == '\'' && v.last == '\'')))
      v.substring(1, v.length - 1)
    else v

  /** Effective config: file values win (reference `override=True`), the
    * process env fills the gaps. */
  def withProcessEnv(path: Path): Map[String, String] = sys.env ++ parse(path)
}
