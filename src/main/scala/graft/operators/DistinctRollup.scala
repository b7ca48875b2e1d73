package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Mergeable distinct-count rollups over pre-aggregated HLL sketch tables —
  * the pattern that makes "uniques over ANY date range" an O(days) query at
  * 100 TB instead of an O(events) rescan.
  *
  * Exact distinct counts do not re-aggregate: uniques-per-day cannot be
  * summed into uniques-per-week, so every new range normally means another
  * full pass over the event log. DataSketches HLL sketches do re-aggregate —
  * the union of two sketches is the register-wise max, which is commutative,
  * associative, and idempotent — so ONE pass materializes a per-day sketch
  * table (a few KB per row, `2^lgK` registers bounded regardless of event
  * volume), and every subsequent range query unions the handful of covered
  * day sketches. Per-register max also means the merged state is independent
  * of partitioning and merge order: re-aggregated estimates are
  * bit-deterministic (spec-pinned), and a day's sketch can be back-merged
  * incrementally when late events arrive — the same keyed-upsert posture as
  * the corpus tables.
  *
  * The estimate is approximate (~1.6%/sqrt(2^lgK) relative standard error at
  * the Spark-default lgK=12); the driver-oracled exactness twin runs the same
  * kernel on a frozen fixture small enough that the sketch is still in its
  * exact (coupon-list) regime, where the estimate provably equals the true
  * count — the IVF/PQ-fixture pattern.
  */
object DistinctRollup {

  /** One event-log pass → the per-day sketch table: (day, key_sketch,
    * n_events). The ONLY scan of the raw events any downstream range query
    * ever needs. */
  def dailySketches(events: DataFrame, tsCol: String, keyCol: String): DataFrame =
    events
      .groupBy(datediff(to_date(col(tsCol)), lit("1970-01-01")).cast("long").as("day"))
      .agg(
        hll_sketch_agg(col(keyCol)).as("key_sketch"),
        count(lit(1)).as("n_events"))

  /** Re-aggregate the sketch table to any coarser grain from sketches alone
    * — no event rescan. `grain` maps `day` to the rollup key (week, month,
    * campaign window...). */
  def rollupUniques(daily: DataFrame, grain: Column, grainName: String): DataFrame =
    daily
      .groupBy(grain.as(grainName))
      .agg(
        hll_sketch_estimate(hll_union_agg(col("key_sketch"))).as("approx_uniques"),
        sum(col("n_events")).as("n_events"))
}
