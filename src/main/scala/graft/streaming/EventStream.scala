package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Structured Streaming operators over an event stream with the same
  * semantics as the batch analytics: event-time windowed aggregation under a
  * watermark, and gap-based sessionization as explicit keyed state
  * (`flatMapGroupsWithState`).
  *
  * The reference pipeline is batch-only (SURVEY §2.10), so this module is the
  * engine's forward path for streaming ingest: the same events.parquet schema
  * arriving as a stream (`spark.readStream` on a directory, Kafka, etc.)
  * flows through these unchanged. State size is bounded: windowed counts
  * evict on watermark, sessions time out on event-time and emit exactly once.
  */
object EventStream {

  final case class Event(user_id: Long, ts: Timestamp, event_type: String, value: Double)

  // the value sum rides an exact scaled integer (DECIMAL(18,2) cents —
  // the windowedCountsExact policy, state-side): addition on longs is
  // order-independent, so the emitted sum is bit-identical under any
  // arrival interleaving and a batch oracle can verify the FULL row
  final case class SessionState(start: Long, last: Long, n: Long, sumCents: Long)

  final case class ClosedSession(
      user_id: Long,
      session_start: Timestamp,
      session_end: Timestamp,
      n_events: Long,
      sum_value: Double)

  final case class FunnelProgress(
      user_id: Long,
      steps_completed: Int,
      completed: Boolean,
      last_step_ts: Timestamp)

  /** Event-time windowed counts per event type: tumbling `windowDur` windows,
    * late data beyond `watermark` dropped, window state evicted as the
    * watermark passes (bounded state at any input rate).
    */
  def windowedCounts(events: DataFrame, watermark: String, windowDur: String): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), windowDur), col("event_type"))
      .agg(count(lit(1)).as("n_events"), sum(col("value")).as("sum_value"))
      .select(
        col("window.start").as("window_start"),
        col("event_type"), col("n_events"), col("sum_value"))

  /** [[windowedCounts]] with the value sum routed through DECIMAL(18,2) —
    * the oracle-exact form (the q141 policy: exact decimal addition is
    * order-independent, so the streamed sum is bit-identical to any batch
    * engine's). Used by the driver-oracled append-mode registration, where
    * the accumulated sink is hash-compared against batch SQL: a double sum
    * would drift by partial-aggregation order, a decimal sum cannot. */
  def windowedCountsExact(events: DataFrame, watermark: String, windowDur: String): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), windowDur), col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        sum(col("value").cast("decimal(18,2)")).as("__sum"))
      .select(
        col("window.start").as("window_start"),
        col("event_type"), col("n_events"),
        col("__sum").cast("double").as("sum_value"))

  /** Streaming exact dedup: drops any row whose `keyCols` combination was
    * already seen within the watermark horizon — the streaming-ingest form
    * of exact dedup for a training-data feed. The first occurrence is
    * emitted immediately (append mode, no watermark latency); seen-key state
    * is evicted as the watermark passes, so state stays bounded at any input
    * rate. The documented tradeoff of bounded state: a duplicate arriving
    * later than the watermark horizon is not caught — at ingest scale, pair
    * this with the batch [[graft.operators.Dedup]] sweep downstream.
    */
  def dedupWithinWatermark(
      events: DataFrame,
      tsCol: String,
      watermark: String,
      keyCols: Seq[String]): DataFrame =
    events
      .withWatermark(tsCol, watermark)
      .dropDuplicatesWithinWatermark(keyCols)

  /** Streaming exact-dedup rollup: the per-content-hash keeper/copy-count
    * aggregation maintained as STREAMING STATE — each micro-batch folds
    * into the per-hash (min keeper id, running count), so the snapshot
    * after any prefix of batches equals the batch aggregation over the
    * rows seen so far. min and count are commutative-associative, which
    * makes the result independent of batch slicing and arrival order —
    * the property that lets the driver oracle this stateful path against
    * plain batch SQL (q121), not just row-gate it.
    *
    * State is O(distinct hashes) — the right shape for a dedup REGISTRY
    * (one row per distinct content). At 100 TB the complete-mode in-memory
    * sink below this would be replaced by update-mode output into the
    * keyed corpus layout ([[graft.io.TableStore.upsertKeyed]] — only
    * touched hash buckets rewrite per batch); the aggregation itself is
    * already that scale shape, hash-partitioned by content key. */
  def dedupRollup(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs.groupBy(
        md5(coalesce(col(textCol), lit("")).cast("binary")).as("content_hash"))
      .agg(
        min(col(idCol)).as("keeper_id"),
        count(lit(1)).as("n_copies"))

  /** Ingest-time curation gate: the batch curation scoring (q41) plus PII
    * scrubbing (q54) applied to a LIVE document stream. Every operator here
    * is a per-row Catalyst expression, so this is a STATELESS streaming
    * projection — no watermark, no state store, identical semantics to the
    * batch path by construction (asserted per batch in StreamingSpec).
    * The one q41 stage that needs state — exact-dedup canonicalization — is
    * deliberately not fused in: compose with [[dedupWithinWatermark]] keyed
    * on a content hash for the streaming form of that stage.
    *
    * Returns the gated stream with lang_pred / quality_score / n_tokens
    * columns and `textCol` scrubbed IN PLACE — the same contract as the
    * batch pipeline ([[graft.CuratePipeline]]), so a sink persisting this
    * stream verbatim never stores raw PII. All gate decisions (language,
    * quality, token budget) are made on the RAW text before the scrub, the
    * q41 batch semantics; rows failing a gate are dropped at ingest (the
    * cheapest place to drop them).
    */
  def curateStream(
      docs: DataFrame,
      textCol: String = "text",
      lang: String = graft.functions.Curation.GateLang,
      minQuality: Double = graft.functions.Curation.GateMinQuality,
      tokenRange: (Long, Long) =
        (graft.functions.Curation.GateTokenMin, graft.functions.Curation.GateTokenMax)): DataFrame = {
    val t = col(textCol)
    docs
      .withColumn("lang_pred", graft.functions.Text.langId(t))
      .withColumn("quality_score", graft.functions.Text.qualityScore(t))
      .withColumn("n_tokens", graft.functions.Text.tokenCount(t))
      // scrub REPLACES the text column (after the gate columns above are
      // derived from the raw bytes): keeping raw text in a parallel column
      // would hand every downstream sink unscrubbed PII by default
      .withColumn(textCol, graft.functions.Curation.scrubPii(t))
      .filter(col("lang_pred") === lang &&
        col("quality_score") >= minQuality &&
        col("n_tokens").between(tokenRange._1, tokenRange._2))
  }

  /** Constant-space exact-content membership screen on a document STREAM:
    * every arriving row gains a `might_exist` flag probed against a Bloom
    * sketch of the stored corpus's content keys
    * ([[graft.operators.BloomScreen]]). A STATELESS projection — no
    * watermark, no state store, no per-batch join against the corpus: the
    * sketch rides the plan and each row pays one hash probe, which is the
    * cheapest possible first stage of ingest dedup (flagged rows go on to
    * the exact keyed lookup; unflagged rows are GUARANTEED new). Rebuild
    * the sketch when the corpus generation advances — it is a snapshot, so
    * rows upserted mid-stream probe as new until then (false negatives
    * never; stale positives only). */
  def bloomScreen(
      docs: DataFrame,
      keyCol: String,
      bf: org.apache.spark.util.sketch.BloomFilter,
      flagCol: String = "might_exist"): DataFrame =
    graft.operators.BloomScreen.screen(docs, keyCol, bf, flagCol)

  /** Stream-static enrichment join: each micro-batch joins against a STATIC
    * dimension frame — the standard ingest-enrichment shape (events × user /
    * tenant / source dim). A stream-static join carries NO streaming state
    * (the static side is re-planned per batch), so the only scale question
    * is keeping the fact side shuffle-free: with `broadcastDim = true` (the
    * default, right for dims under Spark's 8 GB broadcast hard limit) the
    * dim is broadcast explicitly; pass `false` for a dim too large to
    * broadcast and let Catalyst plan a shuffled join instead of dying at
    * runtime on the forced hint. Left join: an event with no dim row passes
    * through with nulls rather than silently dropping — at ingest time,
    * completeness beats lookup hygiene.
    */
  def enrichWithDim(
      events: DataFrame,
      dim: DataFrame,
      keys: Seq[String],
      broadcastDim: Boolean = true): DataFrame =
    events.join(if (broadcastDim) broadcast(dim) else dim, keys, "left")

  /** Watermarked stream-stream interval join: correlate two live streams on
    * equality `keys` where the right event lands within
    * `[left.ts, left.ts + within]` — the late-metadata correlation shape of
    * a streaming ingest pipeline (document events matched with quality /
    * annotation / toxicity events that arrive up to `within` later). Both
    * sides carry event-time watermarks AND the join carries the explicit
    * time bound, which together let Spark derive state eviction: a buffered
    * left row is dropped once the right watermark passes `ts + within`, a
    * right row once the left watermark passes its timestamp — bounded state
    * at any input rate, the non-negotiable property of a stream-stream join
    * (without the bound, both sides buffer forever). Append mode either
    * way; two join types:
    *
    *  - `"inner"` (default): a correlation by definition needs both sides;
    *    events that never get their annotation are the batch completeness
    *    sweep's job, not the stream's.
    *  - `"left_outer"`: the completeness sweep IN the stream — a left row
    *    whose match window closes unmatched (watermark passes
    *    `ts + within`) is emitted once with null right columns at state
    *    EVICTION time, the only moment the stream can prove "no annotation
    *    ever came". Matched rows still emit as they join. The null-padded
    *    tail is therefore watermark-gated: rows whose window the final
    *    watermark never passed are still buffered, not absent (q150 states
    *    this set exactly in batch SQL).
    *  - `"right_outer"`: the symmetric sweep alone — only the unmatched
    *    RIGHT rows null-pad (the q184 cell; eviction rule below), matched
    *    rows emit as they join.
    *  - `"full_outer"`: BOTH completeness sweeps — q150's unmatched-left
    *    rule plus the symmetric right side: a right row that can no longer
    *    match any future left row (the watermark passes its timestamp — the
    *    tightest left a right row at `t` can join is `leftTs = t`) is
    *    emitted once with null left columns at ITS state eviction. Both
    *    tails are watermark-gated the same way (q173 states both sets in
    *    batch SQL). Key columns are COALESCEd across sides so a
    *    right-only row still carries its key.
    *
    * Output: every left column, then the right side's non-key columns
    * (under full_outer, each key column is `coalesce(left, right)`).
    * Right-side names (beyond `keys`) must not collide with left names —
    * rejected eagerly with the offenders listed, same contract as
    * [[graft.operators.AsOfJoin]].
    */
  def correlateStreams(
      left: DataFrame,
      leftTs: String,
      right: DataFrame,
      rightTs: String,
      keys: Seq[String],
      watermark: String,
      within: String,
      joinType: String = "inner"): DataFrame = {
    require(keys.nonEmpty, "correlateStreams needs at least one equality key")
    require(joinType == "inner" || joinType == "left_outer" ||
      joinType == "right_outer" || joinType == "full_outer",
      s"joinType must be inner, left_outer, right_outer or full_outer (got $joinType)")
    val collisions = right.columns.toSet.intersect(left.columns.toSet) -- keys
    require(collisions.isEmpty,
      s"right-side columns collide with left: ${collisions.mkString(", ")} — rename them first")
    val l = left.withWatermark(leftTs, watermark).alias("__l")
    val r = right.withWatermark(rightTs, watermark).alias("__r")
    val keyCond = keys.map(k => col(s"__l.$k") === col(s"__r.$k")).reduce(_ && _)
    val bound = col(rightTs) >= col(leftTs) &&
      col(rightTs) <= col(leftTs) + expr(s"INTERVAL $within")
    val leftCols = left.columns.map { c =>
      // under full_outer/right_outer a right-only row's left key is null —
      // surface the right side's key instead (inner/left_outer keep their
      // exact shape: the left key is never null there)
      if ((joinType == "full_outer" || joinType == "right_outer") &&
        keys.contains(c))
        coalesce(col(s"__l.$c"), col(s"__r.$c")).as(c)
      else col(s"__l.$c")
    }
    l.join(r, keyCond && bound, joinType)
      .select(leftCols ++
        right.columns.filterNot(keys.contains).map(c => col(s"__r.$c")): _*)
  }

  /** Incremental near-duplicate screening of a document STREAM against a
    * static embedding corpus: each micro-batch runs the exact block-
    * partitioned pair scan ([[graft.operators.Ann.blockPairsAboveJoinWithDim]])
    * via `foreachBatch` — the batch kernel unchanged, applied per batch —
    * and `emit` receives that batch's (query_id, corpus_id, cosine)
    * verdicts. foreachBatch is the standard bridge for batch-only shapes
    * (cogroup is not a streaming operator): state lives in the static
    * corpus, not the stream, so nothing accumulates across batches. The
    * corpus dimension is computed ONCE up front (not per batch); persist
    * the corpus frame for repeated-scan economy — its lifecycle belongs to
    * the caller. `configure` receives the writer before `start()` — set
    * `checkpointLocation` (mandatory for restartable sources: without it
    * offsets live in a temp dir and a driver restart reprocesses or skips),
    * trigger, and queryName there. Returns the started query (caller stops
    * it).
    */
  def nearDupScreen(
      docs: DataFrame,
      idCol: String,
      vecCol: String,
      corpus: DataFrame,
      corpusId: String,
      corpusVec: String,
      threshold: Double,
      configure: org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row] =>
        org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row] = identity)(
      emit: DataFrame => Unit): org.apache.spark.sql.streaming.StreamingQuery = {
    // ONE pre-pass job resolves dim AND block count for the whole query's
    // lifetime — per-batch auto-resolution would re-count the static corpus
    // every micro-batch
    val (dim, corpusRows) = graft.operators.Ann.majorityDimAndCountOf(corpus, corpusVec)
      .getOrElse(throw new IllegalArgumentException(
        "near-dup screen: corpus has no valid vectors to screen against"))
    val blocks = graft.operators.Ann.autoBlocks(
      corpusRows, dim, corpus.sparkSession.sparkContext.defaultParallelism)
    configure(
      docs.writeStream
        .outputMode(OutputMode.Append)
        .foreachBatch { (batch: DataFrame, _: Long) =>
          emit(graft.operators.Ann.blockPairsAboveJoinWithDim(
            batch, idCol, vecCol, corpus, corpusId, corpusVec, threshold, dim, blocks))
        })
      .start()
  }

  /** Incremental decontamination screening of a document STREAM against a
    * static evaluation corpus: each micro-batch runs the exact q52 kernel
    * ([[graft.operators.Decontamination.sharedShingleCounts]]) via
    * `foreachBatch` — ingest-time benchmark-leakage detection, so a
    * contaminated document is flagged the moment it arrives instead of at
    * the next batch sweep. `emit` receives that batch's (doc id, n_shared)
    * verdicts. Same bridge rationale as [[nearDupScreen]]: the kernel's
    * aggregation shape is batch-only, and state lives entirely in the
    * static eval corpus — nothing accumulates across batches. The eval
    * frame is re-planned per batch (its DISTINCT shingles broadcast, the
    * batch side never shuffles before the join — the q52 plan contract);
    * persist it for repeated-scan economy — its lifecycle belongs to the
    * caller. `maxShingleDf` keeps the boilerplate cap available, but note
    * its document frequency is computed over each BATCH, not the full
    * stream — leave it unlimited unless batches are corpus-sized.
    * `configure` receives the writer before `start()` — set
    * `checkpointLocation`, trigger, and queryName there. Returns the
    * started query (caller stops it). */
  def decontaminationScreen(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      eval: DataFrame,
      n: Int = graft.functions.Curation.DeconNgram,
      maxShingleDf: Long = Long.MaxValue,
      configure: org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row] =>
        org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row] = identity)(
      emit: DataFrame => Unit): org.apache.spark.sql.streaming.StreamingQuery =
    configure(
      docs.writeStream
        .outputMode(OutputMode.Append)
        .foreachBatch { (batch: DataFrame, _: Long) =>
          emit(graft.operators.Decontamination.sharedShingleCounts(
            batch, eval, idCol, textCol, n, maxShingleDf))
        })
      .start()

  /** Incremental TEXT near-duplicate screening of a document STREAM against
    * a static document corpus: each micro-batch runs the asymmetric
    * LSH-gated exact-Jaccard kernel
    * ([[graft.operators.Dedup.lshJaccardPairsJoin]]) via `foreachBatch`,
    * and `emit` receives that batch's (new_id, corpus_id, jaccard)
    * verdicts — the text counterpart of [[nearDupScreen]], completing the
    * pair: embedding screen for semantic near-dups, shingle screen for
    * lexical ones. Same bridge rationale: the kernel's candidate-distinct
    * and rejoin shapes are batch-only, and state lives entirely in the
    * static corpus — nothing accumulates across batches. The corpus is
    * re-shingled and re-signed per batch by this bridge; persist the
    * corpus frame (or pre-materialize its banded signatures upstream) for
    * repeated-scan economy — its lifecycle belongs to the caller.
    * `configure` receives the writer before `start()` — set
    * `checkpointLocation`, trigger, and queryName there. Returns the
    * started query (caller stops it). */
  def textNearDupScreen(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      corpus: DataFrame,
      shingleSize: Int = 3,
      k: Int = 64,
      bands: Int = 32,
      minJaccard: Double = 0.5,
      configure: org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row] =>
        org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row] = identity)(
      emit: DataFrame => Unit): org.apache.spark.sql.streaming.StreamingQuery =
    configure(
      docs.writeStream
        .outputMode(OutputMode.Append)
        .foreachBatch { (batch: DataFrame, _: Long) =>
          emit(graft.operators.Dedup.lshJaccardPairsJoin(
            batch, corpus, idCol, textCol, shingleSize, k, bands, minJaccard))
        })
      .start()

  /** Incremental unigram-LM quality screening of a document STREAM against
    * a FROZEN reference corpus: each micro-batch is scored with the exact
    * q74-family kernel ([[graft.operators.UnigramLm.scoreAgainst]]) via
    * `foreachBatch`, and `emit` receives that batch's (doc id, n_tokens,
    * sum_df, n_oov, mean_tok_prob) verdicts — the statistical companion to
    * [[curateStream]]'s rule gate, in CCNet order at ingest time. The
    * reference statistics are trained ONCE up front ([[graft.operators.UnigramLm.stats]]
    * — train them on yesterday's curated corpus, not on the stream); state
    * lives entirely in that static vocabulary frame, nothing accumulates
    * across batches. Persist `refCorpus`-derived stats for repeated-scan
    * economy — the vocabulary frame's lifecycle belongs to the caller via
    * the overload taking (freq, nTotal) directly. `configure` receives the
    * writer before `start()` — set `checkpointLocation`, trigger, and
    * queryName there. Returns the started query (caller stops it). */
  def unigramScreen(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      freq: DataFrame,
      nTotal: Long,
      configure: org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row] =>
        org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row] = identity)(
      emit: DataFrame => Unit): org.apache.spark.sql.streaming.StreamingQuery =
    configure(
      docs.writeStream
        .outputMode(OutputMode.Append)
        .foreachBatch { (batch: DataFrame, _: Long) =>
          emit(graft.operators.UnigramLm.scoreAgainst(batch, idCol, textCol, freq, nTotal))
        })
      .start()

  /** STREAMING corpus ingest: every micro-batch runs the full incremental
    * ingest driver ([[graft.CuratePipeline.ingestBatch]] — gate → self
    * near-dup prune → asymmetric corpus screen → asymmetric decontamination
    * → scrub → keyed upsert into the standing curated corpus) via
    * `foreachBatch`, and `onBatch` receives each batch's per-stage counts.
    * This is the end of the ingest story: the same screens the batch
    * pipeline runs nightly, applied the moment documents arrive, with the
    * corpus's generation-parity invariant preserved across every batch.
    * Cost note: with the corpus in the keyed layout
    * ([[graft.io.TableStore.upsertKeyed]]) each micro-batch rewrites ONLY
    * the doc_id hash buckets its survivors touch — O(batch), not
    * O(corpus); a legacy non-keyed corpus is migrated by the first batch's
    * one full rewrite. foreachBatch is the right bridge
    * because the kernels aggregate and the sink is a swap — neither is a
    * streaming operator. `configure` receives the writer before `start()` —
    * set `checkpointLocation`, trigger, and queryName there. Returns the
    * started query (caller stops it). */
  def ingestStream(
      docs: DataFrame,
      store: graft.io.TableStore,
      configure: org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row] =>
        org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row] = identity)(
      onBatch: graft.CuratePipeline.IngestCounts => Unit): org.apache.spark.sql.streaming.StreamingQuery =
    configure(
      docs.writeStream
        .outputMode(OutputMode.Append)
        .foreachBatch { (batch: DataFrame, _: Long) =>
          if (!batch.isEmpty)
            onBatch(graft.CuratePipeline.ingestBatch(batch.sparkSession, batch, store))
        })
      .start()

  /** Streaming conversion funnel — the stateful arrival-time form of the
    * batch q87 kernel ([[graft.operators.OrderedAnalytics.funnel]]): per
    * user, match `steps` as a strictly-time-increasing subsequence, holding
    * only the matched step times as state (O(steps) longs per live user).
    * Emits one [[FunnelProgress]] row per user per micro-batch IN WHICH THE
    * FUNNEL ADVANCED — an append-only progress feed; the final row per user
    * has `completed = true` or their stalled step count.
    *
    * Divergence from the exact batch kernel (the sessionize precedent of a
    * documented streaming trade): matching is greedy in ARRIVAL order
    * (batches sorted by event time internally, so in-order streams
    * reproduce q87 exactly), and an out-of-order event arriving in a later
    * batch with a timestamp at or before the last matched step cannot
    * retro-improve the match — the dropped anchor would require replaying
    * history the state no longer holds. Same-instant events never advance
    * (the q87 strictness contract).
    *
    * State is bounded two ways: completed users' state is dropped
    * immediately (no further row can change anything), and stalled users
    * expire via event-time timeout `idleGapMillis` past their last matched
    * step once the watermark passes — an expiry, not an emission, so no
    * duplicate rows.
    */
  def funnelScreen(
      events: Dataset[Event],
      steps: Seq[String],
      watermark: String,
      idleGapMillis: Long): Dataset[FunnelProgress] = {
    require(steps.nonEmpty, "funnel needs at least one step")
    require(steps.distinct.length == steps.length,
      s"funnel steps must be distinct (got $steps)")
    // gap 0 would set the idle timeout AT the advancing event's own
    // timestamp: for an event at the watermark that lands at/below the
    // current watermark, which setTimeoutTimestamp rejects at RUNTIME and
    // fails the whole query — same contract as sessionize's gap
    require(idleGapMillis > 0, s"idleGapMillis must be > 0 (got $idleGapMillis)")
    import events.sparkSession.implicits._
    events
      .withWatermark("ts", watermark)
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[List[Long], FunnelProgress](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (userId: Long, batch: Iterator[Event], state: GroupState[List[Long]]) =>
          if (state.hasTimedOut) {
            state.remove()
            Iterator.empty
          } else {
            var times = state.getOption.getOrElse(Nil) // ascending matched step times (ms)
            val before = times.length
            for (e <- batch.toSeq.sortBy(_.ts.getTime)) {
              val t = e.ts.getTime
              if (times.length < steps.length && e.event_type == steps(times.length) &&
                  (times.isEmpty || t > times.last))
                times = times :+ t
            }
            if (times.length == before) Iterator.empty
            else {
              val done = times.length == steps.length
              if (done) state.remove() // nothing can ever change; free the slot
              else {
                state.update(times)
                state.setTimeoutTimestamp(times.last + idleGapMillis)
              }
              Iterator.single(FunnelProgress(
                userId, times.length, done, new Timestamp(times.last)))
            }
          }
      }
  }

  /** One NEW (cohort_day, offset_days) activity cell for one user — the
    * increment form of the q88 retention triangle: summing increments per
    * (cohort_day, offset_days) is the batch `n_active`. */
  final case class RetentionIncrement(user_id: Long, cohort_day: Long, offset_days: Long)

  /** Internal keyed state of [[retentionScreen]] — public only because
    * generated deserializer code constructs it. */
  final case class RetentionState(cohortDay: Long, seen: Array[Long])

  /** Streaming retention ([[graft.operators.Cohorts.retention]]'s increment
    * form): per-user keyed state holds the cohort day (first ARRIVING
    * event's day — arrival-order cohort assignment, the funnel/sessionize
    * streaming trade: an earlier-day event arriving late within the
    * watermark joins the existing cohort rather than retro-moving it) and
    * the set of offsets already emitted; each event whose
    * `day − cohort_day` offset is NEW emits exactly one increment row.
    * Rolling the increments up per (cohort_day, offset_days) reproduces the
    * batch kernel's `n_active` exactly for in-order streams (spec-pinned);
    * cohort sizes are the offset-0 cells.
    *
    * State is O(distinct active days per user) — bounded by the reporting
    * horizon, not the event count — and expires via event-time timeout
    * `idleTimeoutMillis` past the user's last activity (an expiry, not an
    * emission: no duplicate rows; a user re-appearing later restarts as a
    * NEW cohort member, the documented horizon semantics).
    */
  def retentionScreen(
      events: Dataset[Event],
      watermark: String,
      idleTimeoutMillis: Long,
      dayMillis: Long = 86400000L): Dataset[RetentionIncrement] = {
    require(dayMillis > 0, s"dayMillis must be > 0 (got $dayMillis)")
    require(idleTimeoutMillis > 0,
      s"idleTimeoutMillis must be > 0 (got $idleTimeoutMillis)") // funnel contract
    import events.sparkSession.implicits._
    events
      .withWatermark("ts", watermark)
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[RetentionState, RetentionIncrement](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (userId: Long, batch: Iterator[Event], state: GroupState[RetentionState]) =>
          if (state.hasTimedOut) {
            state.remove()
            Iterator.empty
          } else {
            var lastMs = Long.MinValue
            var out = List.empty[RetentionIncrement]
            var st = state.getOption.orNull
            for (e <- batch.toSeq.sortBy(_.ts.getTime)) {
              val ms = e.ts.getTime
              if (ms > lastMs) lastMs = ms
              val day = Math.floorDiv(ms, dayMillis)
              if (st == null) {
                st = RetentionState(day, Array(0L))
                out ::= RetentionIncrement(userId, day, 0L)
              } else {
                val off = day - st.cohortDay
                // a late event from BEFORE the cohort day folds into offset 0
                // (it cannot retro-move the cohort); new offsets emit once
                val eff = math.max(0L, off)
                if (!st.seen.contains(eff)) {
                  st = st.copy(seen = st.seen :+ eff)
                  out ::= RetentionIncrement(userId, st.cohortDay, eff)
                }
              }
            }
            if (st != null) {
              state.update(st)
              state.setTimeoutTimestamp(lastMs + idleTimeoutMillis)
            }
            out.reverseIterator
          }
      }
  }

  /** Gap-based sessionization with explicit keyed state: a session closes
    * when event time advances more than `gapMillis` past its last event
    * (enforced via event-time timeout, i.e. by the watermark). Out-of-order
    * events within the watermark merge into the open session from either
    * side, extending its bounds; an event more than a gap BEFORE the open
    * session's start is emitted as its own immediately-closed session (the
    * open session is the only retained state, so older sessions cannot be
    * reopened — a documented divergence from full-history batch
    * sessionization, bounded by the watermark). Emits each closed session
    * exactly once, in append mode.
    *
    * `sum_value` semantics: each event's value is rounded to DECIMAL(18,2)
    * at accumulation (`BigDecimal.valueOf(v).setScale(2, HALF_UP)` — the
    * exact per-row rounding Spark's double→DECIMAL(18,2) cast performs, the
    * [[windowedCountsExact]] policy) and summed as exact scaled-integer
    * cents in the state, so the emitted sum is order-independent and
    * batch-restatable bit-for-bit (q151 hashes the full row).
    */
  def sessionize(events: Dataset[Event], watermark: String, gapMillis: Long): Dataset[ClosedSession] = {
    import events.sparkSession.implicits._
    events
      .withWatermark("ts", watermark)
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[SessionState, ClosedSession](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (userId: Long, batch: Iterator[Event], state: GroupState[SessionState]) =>
          def cents(v: Double): Long =
            java.math.BigDecimal.valueOf(v)
              .setScale(2, java.math.RoundingMode.HALF_UP)
              .unscaledValue().longValueExact()
          def close(s: SessionState): ClosedSession =
            // cents → double through the scale-2 BigDecimal, the exact
            // mirror of CAST(DECIMAL(18,2) AS DOUBLE) on both engines
            ClosedSession(userId, new Timestamp(s.start), new Timestamp(s.last), s.n,
              java.math.BigDecimal.valueOf(s.sumCents, 2).doubleValue())

          if (state.hasTimedOut) {
            val out = state.getOption.map(close).iterator
            state.remove()
            out
          } else {
            val events = batch.toSeq.sortBy(_.ts.getTime)
            var closed = List.empty[ClosedSession]
            var cur = state.getOption
            // gap-sessionized accumulator for in-watermark events that fall
            // entirely BEFORE the open session: they form their own sessions
            // (merging among themselves by the same gap rule) and are emitted
            // closed, since only the open session is retained as state
            var old: Option[SessionState] = None
            def flushOld(): Unit = old.foreach { o => closed ::= close(o); old = None }
            for (e <- events) {
              val t = e.ts.getTime
              cur match {
                // within the gap of EITHER end: merge, extending both bounds
                // (an in-watermark out-of-order event that precedes the
                // session start must not inflate it without moving start)
                case Some(s) if t >= s.start - gapMillis && t <= s.last + gapMillis =>
                  cur = Some(s.copy(
                    start = math.min(s.start, t), last = math.max(s.last, t),
                    n = s.n + 1, sumCents = s.sumCents + cents(e.value)))
                // entirely before the open session: grows the old-session
                // accumulator (events arrive sorted, so gap logic is local)
                case Some(s) if t < s.start - gapMillis =>
                  old match {
                    case Some(o) if t - o.last <= gapMillis =>
                      old = Some(o.copy(last = t, n = o.n + 1, sumCents = o.sumCents + cents(e.value)))
                    case _ =>
                      flushOld()
                      old = Some(SessionState(t, t, 1, cents(e.value)))
                  }
                // after the gap: the open session closes, a new one starts
                case Some(s) =>
                  closed ::= close(s)
                  cur = Some(SessionState(t, t, 1, cents(e.value)))
                case None =>
                  cur = Some(SessionState(t, t, 1, cents(e.value)))
              }
            }
            flushOld()
            cur.foreach { s =>
              state.update(s)
              // time out (and emit) once the watermark passes last + gap
              state.setTimeoutTimestamp(s.last + gapMillis)
            }
            closed.reverseIterator
          }
      }
  }

  /** KMV DISTINCT-COUNT SKETCH MAINTENANCE as streaming state
    * ([[graft.operators.Kmv]] online): per key, the ≤k smallest distinct
    * hashes of the value column, maintained incrementally across
    * micro-batches in `flatMapGroupsWithState` — O(k) state per key
    * forever, the streaming form of the cardinality rollup (live "distinct
    * users today" dashboards without a distinct-aggregation state store
    * that grows with true cardinality). Because the sketch is a SET
    * property of the data (insertion order irrelevant), the streamed
    * sketch equals the batch [[graft.operators.Kmv.sketch]] EXACTLY under
    * any arrival interleaving — which is what lets a batch oracle verify
    * the full streamed row (the q105/q167 batch-equality argument, here
    * for STATEFUL maintenance).
    *
    * Emits `(key, n_seen, kmv)` per key per touched micro-batch (Update
    * mode); `n_seen` counts every row ever seen for the key — strictly
    * increasing across a key's emissions — so the LATEST state is
    * `max_by(kmv, n_seen)` in the sink, with no wall-clock anywhere. */
  def kmvSketchStream(ev: DataFrame, keyCol: String, valueCol: String,
                      k: Int): Dataset[(Long, Long, Seq[Long])] = {
    require(k >= 2, s"k must be >= 2 (got $k)")
    val spark = ev.sparkSession
    import spark.implicits._
    ev.select(col(keyCol).cast("long"),
        graft.operators.Kmv.hash(col(valueCol)))
      .as[(Long, Long)]
      .groupByKey(_._1)
      .flatMapGroupsWithState[(Long, Seq[Long]), (Long, Long, Seq[Long])](
        OutputMode.Update, GroupStateTimeout.NoTimeout) {
        (key: Long, rows: Iterator[(Long, Long)],
         state: GroupState[(Long, Seq[Long])]) =>
          val (seen0, arr0) = state.getOption.getOrElse((0L, Seq.empty[Long]))
          val cur = scala.collection.mutable.TreeSet[Long](arr0: _*)
          var seen = seen0
          rows.foreach { case (_, h) =>
            seen += 1
            if (!cur.contains(h)) {
              if (cur.size < k) cur += h
              else if (h < cur.last) { cur -= cur.last; cur += h }
            }
          }
          val out = (key, seen, cur.toSeq)
          state.update((seen, out._3))
          Iterator.single(out)
      }
      .toDF("key", "n_seen", "kmv")
      .as[(Long, Long, Seq[Long])]
  }
}
