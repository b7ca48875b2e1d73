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
  *  3. PII scrub + content-hash split assignment (q54 / q51 kernels);
  *  4. a partitioned overwrite of the curated corpus (split = partition
  *     column, so a training job reads train/ without touching eval bytes),
  *     PER-SPLIT sequence packing into context-window bins (q55 kernel —
  *     a window must never mix train and eval documents), and an
  *     append-only run-log row with per-stage counts.
  *
  * Every stage is the already-oracled kernel — this driver adds NO new
  * semantics, only the composition, lifecycle, and counts. Scale posture:
  * stages 1 and 3 are scan-local (one content-hash window exchange in the
  * gate), stage 2 is the banded-join + bounded-round CC audited in PERF.md,
  * and the write is a layout decision (split-partitioned parquet).
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
    * writes `curated_corpus` (partitioned by split) and appends one row to
    * `curation_log`; returns the per-stage counts it logged. */
  def run(spark: SparkSession, docs: DataFrame, store: TableStore): StageCounts = {
    val input = docs.count()

    // 1. quality gate + exact-dedup canonicalization (q41 kernel)
    val kept = docs.join(
      Queries.curationOf(docs.select(col("doc_id"), col("text")))
        .filter(col("keep")).select("doc_id"),
      Seq("doc_id"), "left_semi")
    val gated = kept.count()

    // 2. near-dup clusters over the gated corpus (q45 kernel): LSH-banded
    // candidates -> exact Jaccard >= 0.5 -> strict log-rounds CC; keep each
    // cluster's smallest member, singletons (no edge) pass through
    val pairs = Dedup.lshJaccardPairs(kept, "doc_id", "text")
    val (comp, rounds) = Dedup.connectedComponentsLogRoundsStrictWithStats(pairs)
    val losers = comp.filter(col("id") =!= col("comp")).select(col("id").as("doc_id"))
    val deduped = kept.join(losers, Seq("doc_id"), "left_anti")
    val dedupedN = deduped.count()

    // 3. scrub + split, then the layout write: split as the partition column
    val curated = deduped
      .withColumn("text", Curation.scrubPii(col("text")))
      .withColumn("n_tokens", Text.tokenCount(col("text")))
      .withColumn("split", Curation.splitAssign(col("text")))
    store.overwritePartitioned("curated_corpus", curated, Seq("split"))
    // write → read-back barrier (same pattern as Main's marts): packing
    // reads the MATERIALIZED corpus, so the gate + dedup chain runs once,
    // not once more per split, and the bins provably match the stored table
    val corpus = store.read("curated_corpus")
    val written = corpus.count()

    // 4. sequence packing PER SPLIT (a context window must never mix train
    // and eval documents) — bin_id is unique within a split; (split, bin_id)
    // is the global bin key. Split-partition pruning makes each pass read
    // only its own split's files.
    val packed = Seq("train", "val", "test").map { sp =>
      graft.operators.Packing.packBins(
        corpus.filter(col("split") === sp), "doc_id", "n_tokens",
        capacity = 2048, groupSize = 64)
        .withColumn("split", lit(sp))
    }.reduce(_ unionAll _)
    store.overwritePartitioned("curated_bins", packed, Seq("split"))

    val counts = StageCounts(input, gated, dedupedN, written, rounds)
    import spark.implicits._
    store.append("curation_log",
      Seq((java.time.Instant.now.toString, input, gated, dedupedN, written, rounds))
        .toDF("run_ts", "n_input", "n_gated", "n_deduped", "n_written", "cc_rounds"))
    counts
  }
}
