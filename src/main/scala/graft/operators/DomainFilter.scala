package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.Text

/** Domain-level quality filtering — the RefinedWeb/FineWeb-style screen that
  * judges each SOURCE (domain, crawl host, feed) by the aggregate quality of
  * its documents and drops every document from sources below the bar. The
  * per-document screens (q41 gate, q18 score) ask "is this document good?";
  * this asks "is this source worth crawling?" — the decision that actually
  * removes spam farms and SEO mills whose individual pages each scrape past a
  * per-document threshold. (Engine-addition family — the reference has no
  * source-level surface.)
  *
  * Contract: a document is "good" iff its [[Text.qualityScore]] is at least
  * `goodThreshold`; a source's `good_share` is (good docs) / (docs) — an exact
  * integer ratio with one final division, so the double is bit-deterministic
  * regardless of aggregation order; a source is kept iff its good_share is at
  * least `minGoodShare`. Every document is returned (annotated, not dropped)
  * so callers can route rejects to quarantine rather than silently lose them.
  *
  * Scale shape (100 TB): the per-source rollup is ONE map-side-combined
  * aggregation keyed by source; its output is one row per source — orders of
  * magnitude smaller than the corpus even at web scale (~10^8 domains), so the
  * join back is hinted broadcast (at the extreme where the source table
  * outgrows the driver, drop the hint and AQE plans a shuffled hash join on an
  * already-tiny side). The quality score itself is scan-local codegen'd
  * built-ins. One shuffle total.
  */
object DomainFilter {

  /** Per-source quality rollup: `srcCol`, `n_docs`, `n_good`, `good_share`. */
  def sourceQuality(
      df: DataFrame,
      srcCol: String,
      textCol: String,
      goodThreshold: Double): DataFrame =
    df.select(col(srcCol), Text.qualityScore(col(textCol)).as("__q"))
      .groupBy(srcCol)
      .agg(
        count(lit(1)).as("n_docs"),
        sum(when(col("__q") >= goodThreshold, 1L).otherwise(0L)).as("n_good"))
      .withColumn("good_share",
        col("n_good").cast("double") / col("n_docs").cast("double"))

  /** Annotate every document with its source's rollup and the keep decision.
    * Adds `n_docs`, `n_good`, `good_share`, and `source_kept` columns. */
  def annotateBySource(
      df: DataFrame,
      srcCol: String,
      textCol: String,
      goodThreshold: Double = 0.5,
      minGoodShare: Double = 0.5): DataFrame = {
    val rollup = sourceQuality(df, srcCol, textCol, goodThreshold)
      .withColumn("source_kept", col("good_share") >= minGoodShare)
    df.join(broadcast(rollup), Seq(srcCol))
  }

  /** The filtering form: only documents from kept sources survive. */
  def filterBySource(
      df: DataFrame,
      srcCol: String,
      textCol: String,
      goodThreshold: Double = 0.5,
      minGoodShare: Double = 0.5): DataFrame =
    annotateBySource(df, srcCol, textCol, goodThreshold, minGoodShare)
      .filter(col("source_kept"))
      .drop("n_docs", "n_good", "good_share", "source_kept")
}
