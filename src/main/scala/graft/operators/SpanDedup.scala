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
  * Deterministic: exact span equality up to a fixed 128-bit fingerprint
  * (no sampling, no randomness — identical inputs always produce identical
  * outputs).
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
  * in PlanSpec).
  *
  * Shuffle-key representation: [[scrubSpans]] never shuffles the span STRING —
  * every internal exchange (df-count, keeper pick, marker join) is keyed by a
  * 128-bit span fingerprint (two independent xxhash64 values), 16 fixed-width
  * bytes instead of an ~8-token string. The scrub is shuffle-bytes-bound at
  * scale (PERF.md's q72 ramp analysis), so this cuts the dominant cost
  * directly. Collision risk is the 128-bit birthday bound — ~10¹² distinct
  * spans (a 100 TB corpus) gives ≈ 10⁻¹⁵ probability of ANY colliding pair —
  * far below hardware error rates, and a collision's worst case is one
  * spurious span cut, not corruption. [[spanReport]] keeps the exact string:
  * its OUTPUT is the span, so the string must ride its (map-side-combined)
  * aggregation anyway.
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
    // Spans are fingerprinted AT THE SCAN and never shuffled (see the object
    // scaladoc) — and never even materialized as strings: each window's two
    // xxhash64 values are chained directly over its n tokens (token-sequence
    // fingerprint — the running hash seeds the next token, so boundary
    // ambiguity like ["ab","c"] vs ["a","bc"] cannot collide structurally).
    // The token array materializes ONCE per row; each window then costs 2n
    // element_at reads and zero string allocations, where the join-on-string
    // form allocated an ~n-token string per window before hashing it.
    // Null-id rows are excluded from span DISCOVERY (they pass through the
    // final left join unscrubbed either way — a null key never matches). The
    // explicit filter also makes the two consumers of the occurrence exchange
    // canonically IDENTICAL: the final join infers isnotnull(id) into the
    // hits branch only, which would otherwise break ReuseExchange and double
    // the corpus scan.
    val toked = df.filter(col(idCol).isNotNull).select(
      col(idCol), Text.tokens(col(textCol)).as("__t"))
    val cnt = size(col("__t")) - (n - 1)
    def winHash(i: org.apache.spark.sql.Column, seeded: Boolean) = {
      val toks = (0 until n).map(j => element_at(col("__t"), i + lit(j + 1)))
      xxhash64((if (seeded) lit("graft.span.h2") +: toks else toks): _*)
    }
    val occ = toked.select(
      col(idCol),
      posexplode(
        when(cnt <= 0, array().cast("array<struct<h1:bigint,h2:bigint>>"))
          .otherwise(transform(sequence(lit(0), cnt - 1),
            i => struct(
              winHash(i, seeded = false).as("h1"),
              winHash(i, seeded = true).as("h2")))))
        .as(Seq("pos", "__hs")))
      .select(col(idCol), col("pos"),
        col("__hs").getField("h1").as("__h1"),
        col("__hs").getField("h2").as("__h2"))
    val hkey = Seq("__h1", "__h2")
    // ONE materialization of the occurrence frame: everything downstream
    // hangs off this span-keyed exchange, so the scan + window fingerprinting
    // runs once (ReuseExchange dedups the identical subtree under the
    // self-join's two consumers). The r11 shape re-derived `occ` on every
    // consumer — four scan+hash passes in a cold driver run.
    val occP = occ.repartition(hkey.map(col): _*)
    // Span metadata in one cascade, all map-side-combinable, ZERO further
    // exchanges: hash(h1,h2) satisfies the (h1,h2,doc) clustering of the
    // per-doc rollup and the (h1,h2) clustering of the span rollup.
    //  - per (span, doc): min position (collapses occurrences; the row count
    //    IS the doc frequency);
    //  - per span: doc frequency + canonical occurrence. min(struct) orders
    //    lexicographically (min doc, then that doc's min pos) — identical to
    //    min over ALL (doc, pos) occurrences, no per-span sort.
    val perDoc = occP.groupBy(col("__h1"), col("__h2"), col(idCol))
      .agg(min(col("pos")).as("__minpos"))
    val spanMeta = perDoc.groupBy(hkey.map(col): _*)
      .agg(
        count(lit(1)).as("__df"),
        min(struct(col(idCol), col("__minpos").as("pos"))).as("__k"))
      .filter(col("__df") >= minDocs)
      .select(col("__h1"), col("__h2"), col("__k"))
    // Non-canonical occurrences of duplicated spans → hit positions per doc.
    // The join probes the SAME exchange as the rollup (left side already
    // partitioned; AQE broadcasts spanMeta when the duplicated set is small).
    val hits = occP.join(spanMeta, hkey)
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
