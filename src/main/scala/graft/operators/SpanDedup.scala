package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.Text

/** Exact repeated-span detection and removal — the token-window analogue of
  * the substring dedup in "Deduplicating Training Data Makes Language Models
  * Better" (Lee et al., 2021), re-expressed as declarative Spark instead of a
  * suffix array. Operates BELOW line granularity: [[Boilerplate]] strips whole
  * repeated lines, this finds and cuts fixed-width token windows that recur
  * across documents mid-line (templated sentences, quoted passages, injected
  * ads) — the duplication that survives both document dedup and line dedup.
  * (Engine-addition family — the reference has no sub-document surface.)
  *
  * Contract: a span is the space-joined window of exactly `n` consecutive
  * whitespace tokens of the lowercased text ([[Text.strictShingles]] — docs
  * with fewer than `n` tokens produce no spans and are never scrubbed). A span
  * is duplicated iff it occurs in at least `minDocs` DISTINCT documents.
  * Scrubbing drops every token covered by at least one non-canonical
  * duplicated-span occurrence (overlapping occurrences merge naturally — a
  * token is kept iff NO cut span starting at p satisfies p <= i < p + n) and
  * re-joins the survivors with single spaces, preserving order.
  * Deterministic: pure string equality, no hashing, no sampling.
  *
  * Scale shape (100 TB): span generation is scan-local (the zip-shingle form
  * evaluates the tokenizer O(n) times per row, not O(tokens)); the duplicated-
  * span set is one (span, doc) distinct + one map-side-combined count keyed by
  * span — no single task ever holds a full span group; the canonical-
  * occurrence pick is a partial-aggregable min(struct), not a per-span sort;
  * the marker join back to occurrences is keyed by span (AQE broadcasts it
  * when the duplicated set is
  * small, degrades to a shuffled hash join when a pathological corpus makes it
  * large — no OOM either way); the rebuild is one groupBy(doc) whose state is
  * one document's hit positions. No all-pairs stage anywhere (pinned repo-wide
  * in PlanSpec). At extreme scale the span string in the shuffle key can be
  * replaced by a 128-bit hash to shrink exchanges — kept as the exact string
  * here so the semantics stay collision-free and oracle-checkable.
  */
object SpanDedup {

  /** Corpus-wide repeated-span report: every `n`-token span occurring in at
    * least `minDocs` distinct documents, with its distinct-document count and
    * total occurrence count. The discovery half of [[scrubSpans]], useful on
    * its own as a contamination/boilerplate audit. */
  def spanReport(
      df: DataFrame,
      idCol: String,
      textCol: String,
      n: Int,
      minDocs: Long = 2L): DataFrame = {
    require(minDocs >= 1, s"minDocs must be >= 1 (got $minDocs)")
    df.select(col(idCol), explode(Text.strictShingles(col(textCol), n)).as("span"))
      .groupBy("span")
      .agg(
        countDistinct(col(idCol)).as("n_docs"),
        count(lit(1)).as("n_occurrences"))
      .filter(col("n_docs") >= minDocs)
  }

  /** Remove duplicated spans, KEEPING one canonical occurrence each — the
    * Lee-et-al. policy (all-but-one removal), not blanket erasure: for every
    * `n`-token span occurring in at least `minDocs` distinct documents, the
    * lexicographically first occurrence (min document id, then min start
    * position) survives and every other occurrence's tokens are cut. A pair
    * of near-duplicate documents therefore resolves to the lower-id copy
    * intact and the duplicated portion of the other removed, instead of both
    * being destroyed.
    *
    * Returns one row per input document: `idCol`, `n_tokens` (whitespace
    * token count, 0 for blank), `n_removed` (tokens cut), and `text_scrubbed`
    * (kept tokens of the lowercased text re-joined with single spaces — the
    * same normalized stream every downstream screen tokenizes). NOT
    * idempotent by construction: re-running recomputes the span set on the
    * scrubbed corpus, which may surface new duplication. */
  def scrubSpans(
      df: DataFrame,
      idCol: String,
      textCol: String,
      n: Int,
      minDocs: Long = 2L): DataFrame = {
    require(minDocs >= 1, s"minDocs must be >= 1 (got $minDocs)")
    val occ = df.select(
      col(idCol),
      posexplode(Text.strictShingles(col(textCol), n)).as(Seq("pos", "span")))
    // Duplicated-span set: distinct (span, doc) first so the count is a plain
    // map-side-combinable count, not a countDistinct expand over occurrences.
    val dup = occ.select(col("span"), col(idCol)).distinct()
      .groupBy("span").agg(count(lit(1)).as("__df"))
      .filter(col("__df") >= minDocs)
      .select("span")
    val dupOcc = occ.join(dup, Seq("span"))
    // Canonical occurrence per span: min(struct) is a plain partial-aggregable
    // min (structs order lexicographically by field), so no per-span sort.
    val keeper = dupOcc
      .groupBy("span")
      .agg(min(struct(col(idCol), col("pos"))).as("__k"))
    val hits = dupOcc.join(keeper, Seq("span"))
      .filter(!(col(idCol) === col("__k").getField(idCol) &&
        col("pos") === col("__k").getField("pos")))
      .groupBy(idCol)
      .agg(collect_set(col("pos")).as("__hit_pos"))
    df.join(hits, Seq(idCol), "left")
      .select(
        col(idCol),
        Text.tokenCount(col(textCol)).as("n_tokens"),
        col("__hit_pos"),
        Text.tokens(col(textCol)).as("__t"))
      .withColumn("__kept",
        when(col("__hit_pos").isNull, col("__t"))
          .otherwise(filter(col("__t"), (tok, i) =>
            !exists(col("__hit_pos"), p => p <= i && i < p + n))))
      .select(
        col(idCol),
        col("n_tokens"),
        when(col("n_tokens") === 0L, 0L)
          .otherwise(col("n_tokens") - size(col("__kept")).cast("long"))
          .as("n_removed"),
        when(col("n_tokens") === 0L, lit(""))
          .otherwise(array_join(col("__kept"), " "))
          .as("text_scrubbed"))
  }
}
