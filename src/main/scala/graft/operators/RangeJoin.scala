package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Point-in-interval (range) join without a nested-loop plan.
  *
  * Spark has no native range-join strategy: `points JOIN intervals ON p
  * BETWEEN s AND e` has no equi-key, so Catalyst plans a
  * BroadcastNestedLoopJoin — O(|intervals| · |points|) comparisons, a
  * non-starter at lake scale. The standard fix (used by every warehouse
  * that offers a "range join hint") is binning: quantize the number line
  * into fixed-width bins, replicate each interval to every bin it overlaps,
  * map each point to the single bin containing it, equi-join on the bin,
  * and re-check the exact predicate as a residual filter. The join becomes
  * a plain shuffled/broadcast hash join; each matching (interval, point)
  * pair meets in exactly one bin (the point's), so no dedup pass is needed.
  *
  * Cost model: the interval side is replicated ×(interval_length / binSize
  * + 1), the point side not at all. Pick `binSize` near the TYPICAL
  * interval length — much smaller multiplies interval replication, much
  * larger widens buckets (more residual-filtered false candidates). Both
  * degrade gracefully; the plan shape stays an equi-join either way. AQE
  * handles hot bins (a boilerplate time window shared by everything) as an
  * ordinary skew join.
  *
  * All binning arithmetic is exact long math (`x - pmod(x, b)` bin anchors,
  * `sequence` stepping by `binSize`) — no double rounding, valid over the
  * full long range. Interval bounds are INCLUSIVE on both ends (SQL
  * BETWEEN); rows with end < start match nothing and are dropped up front,
  * rows with null bounds/points likewise (no match is the only correct
  * BETWEEN answer for null).
  */
object RangeJoin {

  /** Inner-join `intervals` × `points` on `point BETWEEN start AND end`
    * via bin equi-join. Output: all interval columns then all point
    * columns (names must not collide). `maxBinsPerInterval` fail-fasts on
    * intervals that would fan out pathologically (a corrupt end date of
    * 9999-12-31 must not explode a 10^6-row replication silently).
    */
  def pointInInterval(
      intervals: DataFrame,
      startCol: String,
      endCol: String,
      points: DataFrame,
      pointCol: String,
      binSize: Long,
      maxBinsPerInterval: Long = 1L << 20): DataFrame = {
    require(binSize >= 1, s"binSize must be >= 1 (got $binSize)")
    require(maxBinsPerInterval >= 1,
      s"maxBinsPerInterval must be >= 1 (got $maxBinsPerInterval)")
    def binAnchor(c: Column): Column = {
      val l = c.cast("long")
      l - pmod(l, lit(binSize))
    }
    val s = col(startCol).cast("long")
    val e = col(endCol).cast("long")
    // widest allowed anchor span, saturated so the guard never overflows
    val maxSpan =
      try math.multiplyExact(binSize, maxBinsPerInterval - 1)
      catch { case _: ArithmeticException => Long.MaxValue }
    val iBinned = intervals
      .filter(s.isNotNull && e.isNotNull && s <= e)
      .withColumn("__bin_span", binAnchor(col(endCol)) - binAnchor(col(startCol)))
      .withColumn("__bin",
        explode(sequence(
          binAnchor(col(startCol)),
          when(col("__bin_span") <= maxSpan, binAnchor(col(endCol)))
            .otherwise(raise_error(concat(
              lit(s"range join: interval spans more than $maxBinsPerInterval bins " +
                s"of $binSize (start="), s, lit(", end="), e,
              lit(") — raise binSize or maxBinsPerInterval, or clean the data")))),
          lit(binSize))))
      .drop("__bin_span")
    val pBinned = points
      .filter(col(pointCol).isNotNull)
      .withColumn("__bin", binAnchor(col(pointCol)))
    iBinned.join(pBinned, Seq("__bin"))
      .filter(col(pointCol).cast("long").between(s, e))
      .drop("__bin")
  }

  /** Interval-overlap join: pairs where `[aStart, aEnd]` and `[bStart,
    * bEnd]` intersect (inclusive bounds), again as a bin equi-join. Both
    * sides replicate to their covered bins; a pair overlapping n shared
    * bins would meet n times, so the bin-local residual keeps a pair only
    * in the FIRST shared bin (the larger of the two anchors) — exactly-once
    * without a distinct shuffle. */
  def intervalOverlap(
      a: DataFrame, aStart: String, aEnd: String,
      b: DataFrame, bStart: String, bEnd: String,
      binSize: Long,
      maxBinsPerInterval: Long = 1L << 20): DataFrame = {
    require(binSize >= 1, s"binSize must be >= 1 (got $binSize)")
    def binAnchor(c: Column): Column = {
      val l = c.cast("long")
      l - pmod(l, lit(binSize))
    }
    def binned(df: DataFrame, s0: String, e0: String): DataFrame = {
      val s = col(s0).cast("long"); val e = col(e0).cast("long")
      val maxSpan =
        try math.multiplyExact(binSize, maxBinsPerInterval - 1)
        catch { case _: ArithmeticException => Long.MaxValue }
      df.filter(s.isNotNull && e.isNotNull && s <= e)
        .withColumn("__bin",
          explode(sequence(
            binAnchor(col(s0)),
            when(binAnchor(col(e0)) - binAnchor(col(s0)) <= maxSpan, binAnchor(col(e0)))
              .otherwise(raise_error(lit(
                s"range join: interval spans more than $maxBinsPerInterval bins of $binSize"))),
            lit(binSize))))
    }
    val sa = col(aStart).cast("long"); val ea = col(aEnd).cast("long")
    val sb = col(bStart).cast("long"); val eb = col(bEnd).cast("long")
    binned(a, aStart, aEnd).join(binned(b, bStart, bEnd), Seq("__bin"))
      .filter(sa <= eb && sb <= ea) // true overlap
      // first shared bin = bin of max(aStart, bStart): emit once
      .filter(col("__bin") === (greatest(sa, sb) - pmod(greatest(sa, sb), lit(binSize))))
      .drop("__bin")
  }
}
