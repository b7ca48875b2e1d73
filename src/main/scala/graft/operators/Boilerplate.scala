package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Cross-document line-level boilerplate removal — the CCNet/RefinedWeb-style
  * screen that strips lines repeated across many documents (cookie banners,
  * navigation chrome, license footers) while leaving each document's unique
  * prose intact. Operates BELOW document granularity, which is what makes it
  * different from the document screens: exact dedup (q15) drops whole
  * duplicate documents, the repetition filter (q53) measures WITHIN-document
  * redundancy; this removes the shared fragments that survive both.
  * (Engine-addition family — the reference has no sub-document surface; its
  * closest shape is the cell-level quarantine, `docs/data_contract.md:196-205`.)
  *
  * Contract: a line is boilerplate iff it is non-blank after trimming and
  * occurs in MORE than `maxDf` distinct documents (exact string match —
  * deliberately no normalization, so the screen never merges lines the
  * rebuild step couldn't tell apart). Blank lines are structural, never
  * counted and never removed. Kept lines are re-joined with `\n` in their
  * original order; a document whose every line is boilerplate rebuilds as the
  * empty string (count columns make that visible).
  *
  * Scale shape (100 TB): posexplode is scan-local; the document-frequency
  * count is one map-side-combined aggregation keyed by line (Spark plans the
  * distinct-doc count as a two-phase partial aggregate, so no single task
  * sees a whole line-group); the boilerplate set it emits is tiny relative to
  * the corpus — lines above any useful `maxDf` are by definition mass
  * duplicates — so AQE resolves the marker join to a broadcast at runtime
  * (no hint: a pathological corpus where the set IS large degrades to a
  * shuffled hash join instead of an OOM); the rebuild is one groupBy(doc)
  * whose per-group state is a single document's lines. No all-pairs stage
  * anywhere (pinned repo-wide in PlanSpec).
  */
object Boilerplate {

  /** Remove lines occurring in more than `maxDf` distinct documents.
    * Returns one row per input document: `idCol`, `n_lines` (original line
    * count), `n_removed`, and `text_clean` (kept lines re-joined with `\n`
    * in original order). NULL text is treated as the empty document (one
    * blank line, kept). */
  def removeFrequentLines(
      df: DataFrame,
      idCol: String,
      textCol: String,
      maxDf: Long): DataFrame = {
    require(maxDf >= 1, s"maxDf must be >= 1 (got $maxDf)")
    val lines = df.select(
      col(idCol),
      posexplode(split(coalesce(col(textCol), lit("")), "\n"))
        .as(Seq("__pos", "__line")))
    val boiler = lines
      .filter(trim(col("__line")) =!= "")
      .groupBy("__line")
      .agg(countDistinct(col(idCol)).as("__df"))
      .filter(col("__df") > maxDf)
      .select(col("__line"), lit(true).as("__boiler"))
    lines
      .join(boiler, Seq("__line"), "left")
      .groupBy(idCol)
      .agg(
        count(lit(1)).as("n_lines"),
        count(col("__boiler")).as("n_removed"),
        // collect_list drops the nulls `when` emits for boilerplate lines;
        // array_sort orders the kept structs by their leading pos field
        array_join(
          transform(
            array_sort(collect_list(when(col("__boiler").isNull,
              struct(col("__pos").as("pos"), col("__line").as("line"))))),
            x => x.getField("line")),
          "\n").as("text_clean"))
  }
}
