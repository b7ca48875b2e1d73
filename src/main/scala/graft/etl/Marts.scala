package graft.etl

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.etl.Exprs._

/** The three BI marts — capability source /root/reference/etl/marts.py.
  *
  * The reference's per-row assignment lookup (marts.py:56-80) is an
  * O(|facts| × |assignments|) Python loop; here it is an equi-keyed interval
  * join (hash join on chorister_id, range predicate on the validity window)
  * followed by a row_number top-1 — the join stays a broadcast/hash join at
  * any scale because the equi key carries it, and the tie-break (max
  * valid_from, then assignment order) matches the reference's stable sort.
  */
object Marts {

  /** Normalized date-or-raw: ISO if parseable, else the trimmed raw string
    * (marts.py:149-152 keeps the raw value when normalization fails). */
  private def dateOrRaw(c: org.apache.spark.sql.Column) = {
    val n = normalizeDateToIso(c)
    when(n === "", safeStr(c)).otherwise(n)
  }

  /** J3: enrich `facts` (carrying `chorister_id` and an ISO string date column
    * `dateCol`) with the assignment valid on that date. Adds `voice_part`
    * (string, "" when none) and `asg_is_active` (boolean).
    *
    * The lookup is a pure function of (chorister_id, date), so it is computed
    * once per DISTINCT pair — interval join against the broadcast assignment
    * dim, top-1 by (max valid_from, assignment order) over the pair grain —
    * and equi-joined back to the facts. No window ever partitions by a unique
    * per-row key, no synthetic row ids exist (deterministic under task
    * retries/AQE re-plans), and the interval join's blow-up is bounded by
    * |distinct pairs| × |matching assignments| instead of |facts| × matches.
    */
  private def withAssignment(
      facts: DataFrame,
      assignments: DataFrame,
      dateCol: String): DataFrame = {
    // asg_ord is the stable tie-break our dim builder stores; a read-back
    // table always has it. For ad-hoc frames without it, the window's sort
    // below falls through to (voice_part, valid_to) so equal-valid_from ties
    // still resolve to ONE deterministic winner instead of partition order.
    val ord =
      if (assignments.columns.contains("asg_ord")) col("asg_ord") else lit(0L)
    val a = assignments.select(
        safeStr(col("chorister_id")).as("a_cid"),
        safeStr(col("voice_part")).as("a_voice_part"),
        col("is_active").as("a_is_active_raw"),
        normalizeDateToIso(col("valid_from")).as("a_vf"),
        safeStr(col("valid_to")).as("a_vt_raw"),
        normalizeDateToIso(col("valid_to")).as("a_vt"),
        ord.as("a_ord"))
      .filter(col("a_vf") =!= "")

    val pairs = facts.select(col("chorister_id"), col(dateCol)).distinct()
    val cond = col("chorister_id") === col("a_cid") &&
      col(dateCol) =!= "" &&
      col(dateCol) >= col("a_vf") &&
      !(col("a_vt_raw") =!= "" && col("a_vt") =!= "" && col(dateCol) > col("a_vt"))

    val w = Window.partitionBy(col("chorister_id"), col(dateCol))
      .orderBy(col("a_vf").desc, col("a_ord").asc,
        col("a_voice_part").asc, col("a_vt").asc)
    val lookup = pairs.join(broadcast(a), cond, "left")
      .withColumn("__arn", row_number().over(w))
      .filter(col("__arn") === 1)
      .select(
        col("chorister_id"), col(dateCol),
        coalesce(col("a_voice_part"), lit("")).as("voice_part"),
        coalesce(boolFromString(col("a_is_active_raw")), lit(false)).as("asg_is_active"))

    facts.join(lookup, Seq("chorister_id", dateCol), "left")
  }

  /** dim_chorister as a lookup: one row per chorister_id, LAST stored row wins
    * (the reference builds a dict keyed by id — marts.py:145). Uses the
    * `src_ord` ordinal our dim builder stores; chorister_id is unique by
    * construction (D1 disambiguation), so the lit(0) fallback for ad-hoc
    * frames only matters for pathological duplicate-id inputs. */
  private def choristerLookup(dimChorister: DataFrame): DataFrame = {
    val ord =
      if (dimChorister.columns.contains("src_ord")) col("src_ord") else lit(0L)
    val w = Window.partitionBy(col("c_cid")).orderBy(col("__ord").desc)
    dimChorister.select(
        safeStr(col("chorister_id")).as("c_cid"),
        safeStr(col("full_name")).as("c_full_name"),
        safeStr(col("tgid")).as("c_tgid"),
        col("joined_date").cast("string").as("c_joined_raw"),
        ord.as("__ord"))
      .filter(col("c_cid") =!= "")
      .withColumn("__crn", row_number().over(w))
      .filter(col("__crn") === 1)
      .drop("__ord", "__crn")
  }

  /** mart_attendance — marts.py:136-184. One row per fact_attendance row. */
  def martAttendance(
      dimChorister: DataFrame,
      assignments: DataFrame,
      factAttendance: DataFrame): DataFrame = {
    val f = factAttendance.select(
        dateOrRaw(col("rehearsal_date")).as("rehearsal_date"),
        safeStr(col("chorister_id")).as("chorister_id"),
        parseNumDefault(col("hours_attended")).as("hours_attended"),
        when(parseNumDefault(col("missed_flag")) =!= 0.0, 1).otherwise(0)
          .as("missed_flag"))

    val ch = choristerLookup(dimChorister)
    val joined = f.join(broadcast(ch), col("chorister_id") === col("c_cid"), "left")
      // joined_date: ISO for display; present-but-unparseable aborts the run
      // (X2, marts.py:122-133). Evaluated only for choristers that actually
      // join a fact row, like the reference.
      .withColumn("__joined_iso",
        when(coalesce(safeStr(col("c_joined_raw")), lit("")) =!= "" &&
            normalizeDateToIso(col("c_joined_raw")) === "",
          raise_error(format_string(
            "Invalid joined_date for chorister_id='%s': '%s' (cannot normalize to YYYY-MM-DD).",
            col("chorister_id"), col("c_joined_raw"))))
          .otherwise(normalizeDateToIso(coalesce(col("c_joined_raw"), lit("")))))
      .withColumn("__joined_display",
        when(col("__joined_iso") =!= "", col("__joined_iso"))
          .otherwise(coalesce(safeStr(col("c_joined_raw")), lit(""))))

    withAssignment(joined, assignments, "rehearsal_date")
      .select(
        col("rehearsal_date"),
        col("chorister_id"),
        coalesce(col("c_full_name"), lit("")).as("full_name"),
        col("__joined_display").as("joined_date"),
        col("voice_part"),
        coalesce(col("c_tgid"), lit("")).as("tgid"),
        col("asg_is_active").as("is_active"),
        col("hours_attended"),
        when(col("hours_attended") > 0, 1).otherwise(0).as("attended_flag"),
        col("missed_flag"),
        when(col("__joined_iso") =!= "" && col("rehearsal_date") >= col("__joined_iso"), 1)
          .otherwise(0).as("available_flag"))
  }

  /** mart_song_rehearsal — marts.py:198-223. */
  def martSongRehearsal(dimSong: DataFrame, factSongTime: DataFrame): DataFrame = {
    val s = dimSong.select(
        safeStr(col("song_id")).as("s_sid"),
        safeStr(col("song_name")).as("s_name"))
      .filter(col("s_sid") =!= "")
    factSongTime.select(
        dateOrRaw(col("rehearsal_date")).as("rehearsal_date"),
        safeStr(col("song_id")).as("song_id"),
        parseNumDefault(col("minutes_spent")).as("minutes_spent"))
      .join(broadcast(s), col("song_id") === col("s_sid"), "left")
      .select(
        col("rehearsal_date"), col("song_id"),
        coalesce(col("s_name"), lit("")).as("song_name"),
        col("minutes_spent"),
        (col("minutes_spent") / 60.0).as("hours_spent"))
  }

  /** mart_chorister_song — marts.py:241-299: attendees-per-date × songs-per-date
    * (the per-date cross product IS the equi-join on rehearsal_date), then
    * dimension lookups and the as-of voice part. Attendees are deduplicated
    * per (date, chorister) like the reference's set. */
  def martChoristerSong(
      dimChorister: DataFrame,
      assignments: DataFrame,
      dimSong: DataFrame,
      factAttendance: DataFrame,
      factSongTime: DataFrame): DataFrame = {
    val att = factAttendance.select(
        dateOrRaw(col("rehearsal_date")).as("rehearsal_date"),
        safeStr(col("chorister_id")).as("chorister_id"),
        parseNumDefault(col("hours_attended")).as("h"))
      .filter(col("rehearsal_date") =!= "" && col("h") > 0)
      .select("rehearsal_date", "chorister_id")
      .distinct()

    val songs = factSongTime.select(
        dateOrRaw(col("rehearsal_date")).as("rehearsal_date"),
        safeStr(col("song_id")).as("song_id"),
        parseNumDefault(col("minutes_spent")).as("minutes_spent"))
      .filter(col("rehearsal_date") =!= "")

    val ch = choristerLookup(dimChorister)
    val sng = dimSong.select(
        safeStr(col("song_id")).as("s_sid"),
        safeStr(col("song_name")).as("s_name"))
      .filter(col("s_sid") =!= "")

    val base = att.join(songs, Seq("rehearsal_date"), "inner")
      .join(broadcast(ch), col("chorister_id") === col("c_cid"), "left")

    withAssignment(base, assignments, "rehearsal_date")
      .join(broadcast(sng), col("song_id") === col("s_sid"), "left")
      .select(
        col("rehearsal_date"),
        col("chorister_id"),
        coalesce(col("c_full_name"), lit("")).as("full_name"),
        coalesce(safeStr(col("c_joined_raw")), lit("")).as("joined_date"),
        col("voice_part"),
        col("song_id"),
        coalesce(col("s_name"), lit("")).as("song_name"),
        col("minutes_spent"),
        (col("minutes_spent") / 60.0).as("hours_spent"))
  }
}
