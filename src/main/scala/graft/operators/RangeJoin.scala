package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{ByteType, DataType, IntegerType, LongType, ShortType}

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
  * Coordinates must be INTEGRAL columns (byte/short/int/long) — enforced
  * at plan time. Fractional coordinates would make the long-space bin
  * anchors and the naive BETWEEN disagree (10.7 vs 10; truncation toward
  * zero vs floor for negatives); scale them to a fixed-point integer grid
  * first. All binning arithmetic is then exact long math (`x - pmod(x, b)`
  * anchors, `sequence` stepping by `binSize`). Interval bounds are
  * INCLUSIVE on both ends (SQL BETWEEN); rows with end < start match
  * nothing and are dropped up front, rows with null bounds/points likewise
  * (no match is the only correct BETWEEN answer for null).
  */
object RangeJoin {

  private val BinCol = "__bin"

  private def requireIntegral(df: DataFrame, colName: String): Unit = {
    val dt: DataType = df.schema(colName).dataType
    require(Seq(ByteType, ShortType, IntegerType, LongType).contains(dt),
      s"range join column '$colName' must be integral (byte/short/int/long), got $dt — " +
        "scale fractional coordinates to a fixed-point grid first")
  }

  private def requireNoReserved(df: DataFrame, side: String): Unit =
    require(!df.columns.contains(BinCol),
      s"range join $side input already has a column named '$BinCol' (reserved)")

  private def binAnchor(c: Column, binSize: Long): Column = {
    val l = c.cast("long")
    // try_subtract: the anchor of a value within binSize of Long.MinValue can
    // underflow when binSize doesn't divide 2^63 — under ANSI (Spark 4
    // default) a plain `-` would throw a bare ARITHMETIC_OVERFLOW; a null
    // anchor instead flows into the interval-side span guard's designed
    // error (and on the point side means no match, the right answer at the
    // edge of the representable line)
    try_subtract(l, pmod(l, lit(binSize)))
  }

  /** Widest allowed anchor span, saturated so the guard itself can't overflow. */
  private def maxSpanOf(binSize: Long, maxBinsPerInterval: Long): Long =
    try math.multiplyExact(binSize, maxBinsPerInterval - 1)
    catch { case _: ArithmeticException => Long.MaxValue }

  /** Valid intervals exploded to one row per covered bin. The guard also
    * catches anchor arithmetic that OVERFLOWS long (a null try_subtract
    * span — e.g. a Long.MinValue corrupt sentinel bound): those hit a
    * designed diagnostic, not an inscrutable failure inside `sequence`. */
  private def binnedIntervals(
      df: DataFrame, startCol: String, endCol: String,
      binSize: Long, maxBinsPerInterval: Long): DataFrame = {
    require(binSize >= 1, s"binSize must be >= 1 (got $binSize)")
    require(maxBinsPerInterval >= 1,
      s"maxBinsPerInterval must be >= 1 (got $maxBinsPerInterval)")
    requireIntegral(df, startCol)
    requireIntegral(df, endCol)
    requireNoReserved(df, "interval")
    val s = col(startCol).cast("long")
    val e = col(endCol).cast("long")
    val maxSpan = maxSpanOf(binSize, maxBinsPerInterval)
    // try_subtract: anchors and spans near the edge of the long line can
    // overflow — under ANSI a plain `-` would throw a bare
    // ARITHMETIC_OVERFLOW; here overflow manifests as a NULL span (anchors
    // are monotone and s <= e is enforced, so a representable span is never
    // negative) and gets its own diagnostic below
    val span = try_subtract(
      binAnchor(col(endCol), binSize), binAnchor(col(startCol), binSize))
    df.filter(s.isNotNull && e.isNotNull && s <= e)
      .withColumn(BinCol,
        explode(sequence(
          binAnchor(col(startCol), binSize),
          when(span.isNull, raise_error(concat(
              lit(s"range join: interval coordinates too close to Long.MinValue " +
                s"for binSize=$binSize (start="), s, lit(", end="), e,
              lit(") — anchor arithmetic overflows; rescale the coordinates"))))
            .when(span <= maxSpan, binAnchor(col(endCol), binSize))
            .otherwise(raise_error(concat(
              lit(s"range join: interval spans more than $maxBinsPerInterval bins " +
                s"of $binSize (start="), s, lit(", end="), e,
              lit(") — raise binSize or maxBinsPerInterval, or clean the data")))),
          lit(binSize))))
  }

  /** Inner-join `intervals` × `points` on `point BETWEEN start AND end`
    * via bin equi-join. Output: all interval columns then all point
    * columns (names must not collide across the two sides).
    * `maxBinsPerInterval` fail-fasts on intervals that would fan out
    * pathologically (a corrupt end date of 9999-12-31 must not explode a
    * 10^6-row replication silently).
    */
  def pointInInterval(
      intervals: DataFrame,
      startCol: String,
      endCol: String,
      points: DataFrame,
      pointCol: String,
      binSize: Long,
      maxBinsPerInterval: Long = 1L << 20): DataFrame = {
    requireIntegral(points, pointCol)
    requireNoReserved(points, "point")
    val iBinned = binnedIntervals(intervals, startCol, endCol, binSize, maxBinsPerInterval)
    val pBinned = points
      .filter(col(pointCol).isNotNull)
      .withColumn(BinCol, binAnchor(col(pointCol), binSize))
    iBinned.join(pBinned, Seq(BinCol))
      .filter(col(pointCol).cast("long")
        .between(col(startCol).cast("long"), col(endCol).cast("long")))
      .drop(BinCol)
  }

  /** Interval-overlap join: pairs where `[aStart, aEnd]` and `[bStart,
    * bEnd]` intersect (inclusive bounds), again as a bin equi-join. Both
    * sides replicate to their covered bins; a pair overlapping n shared
    * bins would meet n times, so the bin-local residual keeps a pair only
    * in the FIRST shared bin (the bin of the larger start) — exactly-once
    * without a distinct shuffle. Column names must not collide across the
    * two sides. */
  def intervalOverlap(
      a: DataFrame, aStart: String, aEnd: String,
      b: DataFrame, bStart: String, bEnd: String,
      binSize: Long,
      maxBinsPerInterval: Long = 1L << 20): DataFrame = {
    val sa = col(aStart).cast("long"); val ea = col(aEnd).cast("long")
    val sb = col(bStart).cast("long"); val eb = col(bEnd).cast("long")
    binnedIntervals(a, aStart, aEnd, binSize, maxBinsPerInterval)
      .join(binnedIntervals(b, bStart, bEnd, binSize, maxBinsPerInterval), Seq(BinCol))
      .filter(sa <= eb && sb <= ea) // true overlap
      // first shared bin = bin of max(aStart, bStart): emit once
      .filter(col(BinCol) === (greatest(sa, sb) - pmod(greatest(sa, sb), lit(binSize))))
      .drop(BinCol)
  }
}
