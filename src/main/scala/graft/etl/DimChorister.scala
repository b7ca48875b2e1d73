package graft.etl

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.etl.Exprs._
import graft.etl.RawSheet.{qcol, RowIdx}

/** dim_chorister + dim_chorister_assignment.
  *
  * Capability source: /root/reference/etl/dim_chorister.py. The reference
  * assigns IDs in source-row order with hand-rolled dicts; here every
  * order-dependent rule is a deterministic window over `src_row_idx`:
  *  - D1 duplicate numbering: k-th occurrence of a full_name gets
  *    `"name | joined_date"` (dim_chorister.py:39-49);
  *  - the (full_name, joined_date) → id lookup keeps the LAST occurrence
  *    (dict overwrite, dim_chorister.py:103-104);
  *  - the normalized-name → id lookup keeps the FIRST occurrence
  *    (setdefault shape, dim_chorister.py:106-107).
  */
object DimChorister {

  /** Chorister rows of RAW: Tag present and not "Song", Who present (P3). */
  def choristerRows(raw: DataFrame): DataFrame = {
    require(Seq("Tag", "Joined", "Who").forall(raw.columns.contains),
      "RAW is missing required columns Tag/Joined/Who")
    val tgid =
      if (raw.columns.contains("tgid")) safeStr(qcol("tgid")) else lit("")
    raw.select(
        col(RowIdx),
        safeStr(qcol("Tag")).as("tag"),
        safeStr(qcol("Joined")).as("joined_date"),
        tgid.as("tgid"),
        safeStr(qcol("Who")).as("full_name"))
      .filter(col("tag") =!= "" && col("tag") =!= "Song" && col("full_name") =!= "")
  }

  /** Chorister rows + their D1 chorister_id. */
  def withIds(raw: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("full_name")).orderBy(col(RowIdx))
    choristerRows(raw)
      .withColumn("__rn", row_number().over(w))
      .withColumn("chorister_id",
        when(col("__rn") === 1, col("full_name"))
          .otherwise(concat(col("full_name"), lit(" | "), col("joined_date"))))
      .drop("__rn")
  }

  /** dim_chorister table (canonical 6 columns + src ordinal for read-back). */
  def build(raw: DataFrame): DataFrame =
    withIds(raw).select(
      col("chorister_id"), col("tgid"), col("full_name"), col("joined_date"),
      current_timestamp().as("created_at"),
      current_timestamp().as("updated_at"),
      col(RowIdx).as("src_ord"))

  /** (full_name, joined_date) → chorister_id; last occurrence wins. (D4) */
  def idByKey(raw: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("full_name"), col("joined_date"))
      .orderBy(col(RowIdx).desc)
    withIds(raw)
      .withColumn("__krn", row_number().over(w))
      .filter(col("__krn") === 1)
      .select(col("full_name"), col("joined_date"), col("chorister_id"))
  }

  /** normalized full_name → chorister_id; first occurrence wins. (D3) */
  def normToId(raw: DataFrame): DataFrame = {
    val named = withIds(raw).withColumn("norm", normalizeName(col("full_name")))
    val w = Window.partitionBy(col("norm")).orderBy(col(RowIdx))
    named
      .withColumn("__nrn", row_number().over(w))
      .filter(col("__nrn") === 1)
      .select(col("norm"), col("chorister_id").as("norm_chorister_id"))
  }

  /** Hard-coded SCD2 voice-part histories keyed by normalized name — X1,
    * /root/reference/etl/dim_chorister.py:136-154. `ord` preserves the
    * override list order within one chorister. */
  val Overrides: Seq[(String, Int, String, String, String)] = Seq(
    ("мария_дидуренко", 1, "soprano", "16.06.24", "01.10.24"),
    ("мария_дидуренко", 2, "alto", "02.10.24", ""),
    ("полина_калач", 1, "alto", "16.06.24", "01.10.24"),
    ("полина_калач", 2, "soprano", "02.10.24", ""),
    ("митя_чернаков", 1, "bass", "16.06.24", "31.12.25"),
    ("митя_чернаков", 2, "tenor", "01.01.26", ""))

  def overridesDf(spark: SparkSession): DataFrame = {
    import spark.implicits._
    Overrides.toDF("norm", "ovr_ord", "ovr_voice_part", "ovr_valid_from", "ovr_valid_to")
  }

  /** dim_chorister_assignment: derived rows (voice part + active from Tag,
    * valid_from = joined_date, open valid_to), except rows whose normalized
    * name has a manual override — those emit the override history instead
    * (anti-join ∪ union; dim_chorister.py:219-242). `asg_ord` is the stable
    * emission order the reference implies (source row, then override index),
    * used by the marts' as-of tie-break.
    */
  def buildAssignments(raw: DataFrame): DataFrame = {
    val spark = raw.sparkSession
    val base = withIds(raw)
      .drop("chorister_id") // assignment uses the keyed lookup, not the row's own id
      .withColumn("norm", normalizeName(col("full_name")))
      .join(idByKey(raw), Seq("full_name", "joined_date"), "left")
      .withColumn("chorister_id", coalesce(col("chorister_id"), col("full_name")))
    val ovr = overridesDf(spark)

    val overridden = base
      .join(broadcast(ovr), Seq("norm"))
      .join(broadcast(normToId(raw)), Seq("norm"), "left")
      .withColumn("asg_cid", coalesce(col("norm_chorister_id"), col("chorister_id")))
      .select(
        concat(col("asg_cid"), lit(" | "), col("ovr_voice_part"), lit(" | "),
          col("ovr_valid_from")).as("assignment_id"),
        col("asg_cid").as("chorister_id"),
        col("ovr_voice_part").as("voice_part"),
        lit("TRUE").as("is_active"),
        col("ovr_valid_from").as("valid_from"),
        col("ovr_valid_to").as("valid_to"),
        (col(RowIdx) * 10 + col("ovr_ord")).as("asg_ord"))

    val derived = base
      .join(broadcast(ovr.select("norm").distinct()), Seq("norm"), "left_anti")
      .select(
        concat(col("chorister_id"), lit(" | "), voicePart(col("tag")), lit(" | "),
          col("joined_date")).as("assignment_id"),
        col("chorister_id"),
        voicePart(col("tag")).as("voice_part"),
        when(isActiveFromTag(col("tag")), "TRUE").otherwise("FALSE").as("is_active"),
        col("joined_date").as("valid_from"),
        lit("").as("valid_to"),
        (col(RowIdx) * 10).as("asg_ord"))

    derived.unionByName(overridden)
  }
}
