package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.Text

/** Document → context-window chunking — the "fit long documents into the
  * model's window" preprocessing step of every training-data pipeline:
  * each document becomes overlapping windows of at most `maxTokens` tokens,
  * starting every `stride` tokens (overlap = maxTokens − stride; stride =
  * maxTokens is disjoint splitting). The complement of [[Packing]]: packing
  * combines SHORT documents into one window, chunking cuts LONG documents
  * down to windows. (Engine-addition family.)
  *
  * Contract: tokens are the normalized whitespace stream ([[Text.tokens]]).
  * A document with n > 0 tokens yields one chunk per start offset s ∈
  * {0, stride, 2·stride, …} with s < n − maxTokens + stride (i.e. only
  * windows that contribute at least one token the previous window did not —
  * a trailing window whose content is entirely contained in its predecessor
  * is suppressed); chunk k covers tokens [k·stride, min(k·stride +
  * maxTokens, n)) re-joined with single spaces, so every token appears in
  * at least one chunk and the final window may be short. Blank documents
  * yield no chunks. `chunk_id` is the 0-based window index — deterministic,
  * so (idCol, chunk_id) is a stable global key.
  *
  * Scale shape (100 TB): entirely scan-local — the token array materializes
  * ONCE per row in a projection (not inside a higher-order-function lambda,
  * which would re-split per chunk — the [[Text.shingles]] lesson), then the
  * start list explodes and each chunk slices that array. Zero shuffles, no
  * state; chunk rows land in whatever partition their document was read in.
  */
object Chunking {

  def chunkDocs(
      df: DataFrame,
      idCol: String,
      textCol: String,
      maxTokens: Int,
      stride: Int): DataFrame = {
    require(maxTokens >= 1, s"maxTokens must be >= 1 (got $maxTokens)")
    require(stride >= 1 && stride <= maxTokens,
      s"stride must be in 1..maxTokens (got $stride)")
    df.select(
        col(idCol),
        Text.tokens(col(textCol)).as("__t"),
        Text.tokenCount(col(textCol)).as("__n"))
      .select(
        col(idCol), col("__t"), col("__n"),
        posexplode(
          when(col("__n") > 0L,
            sequence(lit(0L),
              greatest(col("__n") - (maxTokens - stride) - 1L, lit(0L)),
              lit(stride.toLong)))
            .otherwise(array().cast("array<bigint>")))
          .as(Seq("__pos", "__start")))
      .select(
        col(idCol),
        col("__pos").cast("long").as("chunk_id"),
        least(lit(maxTokens.toLong), col("__n") - col("__start")).as("n_chunk_tokens"),
        array_join(
          slice(col("__t"), (col("__start") + 1L).cast("int"), lit(maxTokens)),
          " ").as("chunk_text"))
  }
}
