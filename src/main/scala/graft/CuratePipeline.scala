package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.{Curation, Text}
import graft.io.TableStore
import graft.operators.Dedup

/** End-to-end corpus curation driver — the production composition the
  * individual q41/q45/q51/q54 kernels exist for, parallel to [[Main]] for
  * the choir ETL. One run takes a raw documents table through:
  *
  *  1. quality gate — language / quality-score / token-budget rules plus
  *     exact-dedup canonicalization ([[Queries.curationOf]], the q41 kernel);
  *  2. near-duplicate pruning — LSH candidates → exact-Jaccard gate → strict
  *     log-rounds connected components, keeping each cluster's smallest
  *     doc_id (the q45 pipeline; singletons pass through);
  *  3. content-hash split assignment on the RAW text (q51 kernel — the same
  *     bytes q52's decontamination screen hashes, so the two agree on every
  *     document's split and a scrub-regex change can never migrate documents
  *     across a frozen train/eval boundary), then PII scrub (q54);
  *  4. a partitioned overwrite of the curated corpus (split = partition
  *     column, so a training job reads train/ without touching eval bytes),
  *     PER-SPLIT sequence packing into context-window bins (q55 kernel —
  *     a window must never mix train and eval documents), and an
  *     append-only run-log row with per-stage counts.
  *
  * Every stage is the already-oracled kernel — this driver adds NO new
  * semantics, only the composition, lifecycle, and counts. Lifecycle
  * contract mirrors [[Main]]: fail fast, but ALWAYS append the run-log row
  * (status `success` or `failed` + truncated error). Scale posture: stages
  * 1 and 3 are scan-local (one content-hash window exchange in the gate),
  * stage 2 is the banded-join + bounded-round CC audited in PERF.md, and
  * both writes go through the failure-atomic staged-swap partitioned
  * overwrite.
  */
object CuratePipeline {

  final case class StageCounts(
      input: Long, gated: Long, deduped: Long, written: Long, ccRounds: Int)

  /** CLI: `runMain graft.CuratePipeline <sfDir> <storeRoot>` — curate the
    * documents table at `sfDir` into a [[TableStore]] at `storeRoot`. */
  def main(args: Array[String]): Unit = {
    val Array(sfDir, storeRoot) = args
    val spark = Sessions.local(cores = 8)
    try {
      val counts = run(spark, Tables.load(spark, sfDir, "documents"),
        new TableStore(spark, storeRoot))
      println(s"curation run: $counts")
    } finally spark.stop()
  }

  /** Run the pipeline from `docs(doc_id, text, ...)` into `store`:
    * writes `curated_corpus` and `curated_bins` (partitioned by split) and
    * appends one row to `curation_log` — on success AND on failure;
    * returns the per-stage counts it logged. */
  def run(
      spark: SparkSession, docs: DataFrame, store: TableStore,
      binCapacity: Long = 2048, packGroupSize: Int = 64): StageCounts = {
    import spark.implicits._
    val runTs = java.time.Instant.now.toString
    def log(status: String, c: StageCounts, error: String): Unit =
      store.append("curation_log",
        Seq((runTs, status, c.input, c.gated, c.deduped, c.written,
          c.ccRounds, error))
          .toDF("run_ts", "status", "n_input", "n_gated", "n_deduped",
            "n_written", "cc_rounds", "error"))
    var progress = StageCounts(-1L, -1L, -1L, -1L, -1)
    try {
      val counts = runStages(spark, docs, store, binCapacity, packGroupSize,
        p => progress = p)
      log("success", counts, "")
      counts
    } catch {
      case e: Throwable =>
        // the fail-fast-but-ALWAYS-log contract: record how far the run got
        try log("failed", progress,
          Option(e.getMessage).getOrElse(e.getClass.getName).take(500))
        catch { case e2: Throwable => e.addSuppressed(e2) }
        throw e
    }
  }

  private def runStages(
      spark: SparkSession, docs: DataFrame, store: TableStore,
      binCapacity: Long, packGroupSize: Int,
      onProgress: StageCounts => Unit): StageCounts = {
    val input = docs.count()
    onProgress(StageCounts(input, -1L, -1L, -1L, -1))

    // 1. quality gate + exact-dedup canonicalization (q41 kernel). The gated
    // frame feeds several actions (count, the pair pipeline, the corpus
    // write) — persist it so the gate's scan + content-hash window runs
    // once, not once per action.
    val kept = docs.join(
      Queries.curationOf(docs.select(col("doc_id"), col("text")))
        .filter(col("keep")).select("doc_id"),
      Seq("doc_id"), "left_semi")
      .persist()
    try {
      val gated = kept.count()
      onProgress(StageCounts(input, gated, -1L, -1L, -1))

      // 2. near-dup clusters over the gated corpus (q45 kernel): LSH-banded
      // candidates -> exact Jaccard >= 0.5 -> strict log-rounds CC; keep each
      // cluster's smallest member, singletons (no edge) pass through
      val pairs = Dedup.lshJaccardPairs(kept, "doc_id", "text")
      val (comp, rounds) = Dedup.connectedComponentsLogRoundsStrictWithStats(pairs)
      val losers = comp.filter(col("id") =!= col("comp")).select(col("id").as("doc_id"))
      val deduped = kept.join(losers, Seq("doc_id"), "left_anti")

      // 3. split from the RAW text FIRST (must match q51/q52 — see header),
      // then scrub; token counts describe the stored (scrubbed) content
      val curated = deduped
        .withColumn("split", Curation.splitAssign(col("text")))
        .withColumn("text", Curation.scrubPii(col("text")))
        .withColumn("n_tokens", Text.tokenCount(col("text")))
      store.overwritePartitioned("curated_corpus", curated, Seq("split"))
      // write → read-back barrier (same pattern as Main's marts): packing
      // reads the MATERIALIZED corpus, so the curation chain runs exactly
      // once and the bins provably match the stored table. The explicit
      // schema keeps the read well-defined even for an all-filtered (empty)
      // corpus, where partitioned parquet leaves no schema-bearing file.
      val corpus = spark.read.schema(curated.schema)
        .parquet(store.path("curated_corpus"))
      val written = corpus.count() // == deduped count: stages 3-4 drop nothing
      onProgress(StageCounts(input, gated, written, written, rounds))

      // 4. sequence packing PER SPLIT (a context window must never mix train
      // and eval documents) — bin_id is unique within a split; (split,
      // bin_id) is the global bin key. Split-partition pruning makes each
      // pass read only its own split's files.
      val packed = Curation.Splits.map { sp =>
        graft.operators.Packing.packBins(
          corpus.filter(col("split") === sp), "doc_id", "n_tokens",
          capacity = binCapacity, groupSize = packGroupSize)
          .withColumn("split", lit(sp))
      }.reduce(_ unionAll _)
      store.overwritePartitioned("curated_bins", packed, Seq("split"))

      StageCounts(input, gated, written, written, rounds)
    } finally kept.unpersist()
  }
}
