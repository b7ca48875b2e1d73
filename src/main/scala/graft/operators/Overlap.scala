package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.ThetaSketch

/** Segment-overlap analytics from theta sketches — "how many distinct keys
  * are in BOTH segments" for every segment pair, computed as set algebra
  * over per-segment summaries instead of a fact-table self-join.
  *
  * Scale shape: [[segmentSketches]] is ONE pass over the facts (map-side
  * combined into ≤ 8·2^lgK-byte partial sketches, one shuffled row per
  * segment). [[overlapMatrix]] then works entirely on the |segments|-row
  * frame: the pair grid is a broadcast self-join over KB-sized rows, and
  * every intersection/union estimate is scalar sketch arithmetic. The exact
  * alternative — self-joining the distinct (segment, key) frame — shuffles
  * the full key universe once per run and its join output grows with every
  * key shared by popular segment pairs; at 100 TB that join IS the
  * bottleneck, while the sketch route's fact-side cost stays one scan.
  *
  * Exactness: below ~2^lgK distinct keys per segment the sketches are in
  * exact mode and every estimate here is the true count (q123's oracled
  * regime, spec-asserted); beyond that they degrade to ±RSE estimates, the
  * documented sketch trade.
  */
object Overlap {

  /** One fact pass → (segment, sketch of distinct `keyCol`, n_uniques). */
  def segmentSketches(
      df: DataFrame, segmentCol: String, keyCol: String,
      lgK: Int = 12): DataFrame =
    df.groupBy(col(segmentCol).as("segment"))
      .agg(ThetaSketch.thetaSketchAgg(col(keyCol), lgK).as("key_sketch"))
      .withColumn("n_uniques", ThetaSketch.thetaEstimate(col("key_sketch")))

  /** Every unordered segment pair with distinct-key overlap stats:
    * (seg_a < seg_b, uniques_a, uniques_b, n_common, n_either, jaccard).
    * Jaccard is ONE IEEE division of two (exact-mode-exact) longs. */
  def overlapMatrix(segments: DataFrame): DataFrame = {
    val a = segments.select(col("segment").as("seg_a"),
      col("key_sketch").as("__sk_a"), col("n_uniques").as("uniques_a"))
    val b = segments.select(col("segment").as("seg_b"),
      col("key_sketch").as("__sk_b"), col("n_uniques").as("uniques_b"))
    a.join(broadcast(b), col("seg_a") < col("seg_b"))
      .withColumn("n_common", ThetaSketch.thetaEstimate(
        ThetaSketch.thetaIntersect(col("__sk_a"), col("__sk_b"))))
      .withColumn("n_either", ThetaSketch.thetaEstimate(
        ThetaSketch.thetaUnion(col("__sk_a"), col("__sk_b"))))
      .withColumn("jaccard",
        when(col("n_either") > 0,
          col("n_common").cast("double") / col("n_either")))
      .drop("__sk_a", "__sk_b")
  }
}
