package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Token-budget corpus selection — the mixture-capping step of training-data
  * preparation: each stratum (source, language, domain …) is capped at a
  * token budget, and documents are admitted in a deterministic content-hash
  * priority order until the budget fills. Re-expresses the "sample each
  * source to its mixture weight" stage every large-corpus recipe runs
  * (capability family of the reference's per-table row accounting,
  * `etl/main.py:301-347`, generalized to token accounting).
  *
  * Rate-based sampling ([[graft.functions.Curation.sampleHit]], q56) hits a
  * target FRACTION; this operator hits a target TOKEN COUNT — the quantity
  * mixtures are actually specified in — which needs a running sum in priority
  * order, not a per-row predicate.
  *
  * Scale design — the naive form is `sum(tokens) OVER (PARTITION BY stratum
  * ORDER BY priority)`: one window partition per stratum, so a 5-source
  * 100 TB corpus puts 20 TB in a single task. This implementation decomposes
  * the running sum with a distributed two-phase prefix sum over hash-prefix
  * buckets instead:
  *
  *   1. bucket = the first `bucketChars` hex chars of the priority (a prefix
  *      of fixed-width lowercase hex decomposes its lexicographic order, see
  *      [[graft.functions.Curation.saltedHash]]), splitting each stratum into
  *      16^bucketChars uniform slices;
  *   2. per-(stratum, bucket) token totals — one map-side-combined
  *      aggregation producing ≤ strata·16^bucketChars rows;
  *   3. exclusive prefix offsets over that TINY table (a window over rows
  *      numbering strata·buckets, microseconds at any corpus size);
  *   4. offsets broadcast-joined back; the within-bucket running sum runs in
  *      a window partitioned by (stratum, bucket) — max task payload is
  *      stratum/16^bucketChars, tuned by `bucketChars`, never a whole
  *      stratum.
  *
  * `offset + within-bucket running sum` equals the global running sum because
  * (bucket, priority, id) orders identically to (priority, id). Exact long
  * arithmetic — no float order sensitivity — so the result is independent of
  * physical partitioning and bucketing granularity, and a plain single-window
  * oracle (DuckDB q63) verifies it bit-for-bit.
  */
object Budget {

  /** Annotate `df` with the stratum-wise running token total (`cum_tokens`)
    * in (`priorityCol`, `idCol`) order and the budget decision (`kept` =
    * cum_tokens ≤ budget). Keeping every row with its flag (rather than
    * filtering) preserves the audit trail: the first dropped document per
    * stratum shows exactly where the budget filled.
    *
    * @param idCol       unique row id — the deterministic tie-break
    * @param stratumCol  budget domain (each stratum gets its own running sum)
    * @param tokensCol   non-negative token counts (long); non-negativity
    *                    makes the running sum monotone, so the kept set is a
    *                    prefix of the priority order ("admit until full")
    * @param priorityCol fixed-width lowercase-hex content hash
    *                    ([[graft.functions.Curation.saltedHash]]) — admission
    *                    order; content-derived, so the selection is
    *                    reproducible run-over-run and duplicate-stable
    * @param budget      per-row budget expression (a literal, or a `when`
    *                    ladder over the stratum for per-stratum mixture
    *                    weights)
    * @param bucketChars priority-prefix length defining the prefix-sum
    *                    buckets; 2 (=256 buckets/stratum) caps a window task
    *                    at stratum/256 rows
    */
  def selectWithinBudget(
      df: DataFrame,
      idCol: String,
      stratumCol: String,
      tokensCol: String,
      priorityCol: String,
      budget: Column,
      bucketChars: Int = 2): DataFrame = {
    require(bucketChars >= 1 && bucketChars <= 8,
      s"bucketChars must be in 1..8 (got $bucketChars)")
    val bucket = "__budget_bucket"
    val offset = "__budget_offset"
    val base = df.withColumn(bucket, substring(col(priorityCol), 1, bucketChars))
    val totals = base.groupBy(stratumCol, bucket)
      .agg(sum(tokensCol).as("__bucket_tokens"))
    // exclusive prefix: everything in strictly-earlier buckets of the stratum
    val wOffset = Window.partitionBy(stratumCol).orderBy(bucket)
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = totals
      .withColumn(offset, coalesce(sum("__bucket_tokens").over(wOffset), lit(0L)))
      .drop("__bucket_tokens")
    val wCum = Window.partitionBy(col(stratumCol), col(bucket))
      .orderBy(col(priorityCol), col(idCol))
    // the join must be NULL-SAFE on the stratum: groupBy and window both
    // treat a NULL stratum as its own group (matching the oracle's
    // PARTITION BY), so a plain equi-join would silently DELETE every
    // NULL-stratum row here instead of returning it with its flag
    val offsetsR = offsets
      .withColumnRenamed(stratumCol, "__offset_stratum")
      .withColumnRenamed(bucket, "__offset_bucket")
    base
      .join(broadcast(offsetsR),
        col(stratumCol) <=> col("__offset_stratum") &&
          col(bucket) === col("__offset_bucket"))
      .withColumn("cum_tokens",
        (col(offset) + sum(col(tokensCol)).over(wCum)).cast("long"))
      .withColumn("kept", col("cum_tokens") <= budget)
      .drop(bucket, offset, "__offset_stratum", "__offset_bucket")
  }

  /** Global deterministic shuffle rank — the epoch-order assignment a
    * training export needs: every document gets a dense 1-based `shuffle_rank`
    * in salted content-hash order, reproducible run-over-run and independent
    * of physical partitioning. A hash order is exactly what a training
    * shuffle wants (decorrelated from ingest order, stable under re-runs),
    * and materializing it as a rank column lets the export range-partition
    * on it without ever sorting the corpus in one task.
    *
    * Distributed form: this is [[selectWithinBudget]]'s bucketed two-phase
    * prefix sum with a constant token weight of 1 — the running COUNT in
    * priority order IS the rank. One (bucket)-partitioned window plus a
    * ≤ 16^bucketChars-row broadcast; no global window, no single-task sort.
    *
    * @param priorityCol fixed-width lowercase-hex hash
    *                    ([[graft.functions.Curation.saltedHash]]); ties
    *                    broken by `idCol`
    */
  /** Token-balanced shard assignment — the export layout step of a training
    * run: documents in salted-hash epoch order ([[shuffleRank]]'s order) are
    * cut into consecutive shards of `tokensPerShard` tokens each, so every
    * output file carries the same training payload regardless of document
    * length skew. Sharding by TOKENS (not rows) is what a data loader wants;
    * taking the budget as a constant (not a shard COUNT) keeps the operator
    * free of any global-total probe — `shard_id = floor(exclusive_cum /
    * tokensPerShard)` is a pure function of the prefix sum, and the shard
    * count simply falls out of the data (the 100 TB posture: shards have
    * fixed SIZE, their number grows with the corpus).
    *
    * Distributed form: [[selectWithinBudget]]'s bucketed two-phase prefix sum
    * with a single constant stratum — no global window, no single-task sort,
    * no driver collect. A document straddling a boundary belongs to the shard
    * its FIRST token falls in (exclusive-start rule), so shard token totals
    * sit within ±max-document-tokens of the budget — the tightest guarantee
    * any contiguous-assignment rule can give without splitting documents.
    * Zero-token rows ride along at their hash position and inflate no shard.
    * Emits `cum_tokens` (inclusive running total — the audit column) and
    * `shard_id` (0-based). The floor division routes through double: exact
    * below 2^52 total tokens (≈4·10^15 — far past 100 TB of text), and the
    * identical expression replays in any engine for the oracle. */
  def assignShards(
      df: DataFrame,
      idCol: String,
      tokensCol: String,
      priorityCol: String,
      tokensPerShard: Long,
      bucketChars: Int = 2): DataFrame = {
    require(tokensPerShard > 0L,
      s"tokensPerShard must be positive (got $tokensPerShard)")
    val stratum = "__shard_stratum"
    selectWithinBudget(
      df.withColumn(stratum, lit("all")),
      idCol, stratum, tokensCol, priorityCol,
      budget = lit(Long.MaxValue), bucketChars = bucketChars)
      .withColumn("shard_id",
        floor((col("cum_tokens") - col(tokensCol)) / lit(tokensPerShard.toDouble)))
      .drop(stratum, "kept")
  }

  def shuffleRank(
      df: DataFrame,
      idCol: String,
      priorityCol: String,
      bucketChars: Int = 2): DataFrame = {
    val stratum = "__rank_stratum"
    val ones = "__rank_one"
    selectWithinBudget(
      df.withColumn(stratum, lit("all")).withColumn(ones, lit(1L)),
      idCol, stratum, ones, priorityCol,
      budget = lit(Long.MaxValue), bucketChars = bucketChars)
      .withColumnRenamed("cum_tokens", "shuffle_rank")
      .drop(stratum, ones, "kept")
  }
}
