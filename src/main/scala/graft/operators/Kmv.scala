package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.TopK

/** KMV (k-minimum-values / bottom-k) DISTINCT-COUNT SKETCH (Bar-Yossef et
  * al. RANDOM'02; Beyer et al. SIGMOD'07): keep the k smallest DISTINCT
  * values of a hash of the key; if the sketch saturates, estimate the
  * distinct count as `(k−1)·M / h_k` (h_k = the k-th minimum, M = the hash
  * range), else the sketch IS the exact count. The sketch is MERGEABLE —
  * the union of two key sets is summarized by the k smallest of the union
  * of their sketches — which is what makes it the per-partition /
  * per-day / per-source distinct primitive you can roll up along any
  * hierarchy without rescanning (the same role as HLL, q120/q124).
  *
  * Why this sketch gets a FULL DuckDB oracle while HLL gets a frozen
  * fixture: a KMV sketch is a pure deterministic function of the DATA — an
  * explicit portable hash plus an order statistic — with no
  * register-layout or bias-correction internals to mirror. Both engines
  * compute the identical k-set and the identical estimate, bit for bit.
  * The hash is an explicit 31-bit LCG step (x ↦ (1103515245·x + 12345)
  * mod 2³¹ on the non-negative residue), stated in plain modular
  * arithmetic both engines evaluate exactly in 64-bit integers; the
  * estimator is ONE IEEE division of exactly-represented integers (the
  * q175 exactness contract). The LCG is a demonstration-grade mixer — the
  * PRODUCTION mixer is [[hashXx]] (Spark's codegen'd xxhash64, masked to
  * [0, 2⁶²)), shipped behind the same order-statistic machinery and
  * registered as q190's sketched twin (q200): engine-specific, so its
  * oracle checks the exact columns plus an estimate BAND rather than the
  * hash values themselves (the q118≡q117 sketched-twin discipline).
  *
  * Scale shape: one (group, hash) distinct pass (the same expand a
  * count-distinct pays), then a bounded-heap [[graft.functions.TopK]]
  * rollup — O(k) aggregation buffers, map-side combined, never a
  * per-group collect. Merging explodes only k-bounded arrays. */
object Kmv {

  /** Hash range: 2³¹ (the LCG modulus). */
  val Modulus: Long = 2147483648L

  /** The portable 31-bit LCG hash of a non-negative-or-any long key:
    * both engines evaluate it with exact 64-bit integer arithmetic. */
  def hash(c: Column): Column =
    (lit(1103515245L) * pmod(c.cast("long"), lit(Modulus)) + lit(12345L)) %
      lit(Modulus)

  /** Hash range of the PRODUCTION mixer: 2⁶² (exactly representable in an
    * IEEE double, so the estimator stays one exact-operand division). */
  val XxModulus: Long = 1L << 62

  /** The production mixer: Spark's codegen'd xxhash64 masked to its low 62
    * bits (a bitwise AND — uniform over [0, 2⁶²), no modulo bias, and the
    * sign bit is gone so the ascending order statistic is the unsigned
    * one). Any column type Spark can hash is accepted. Engine-specific:
    * rows built on this mixer verify exact columns + an estimate band, not
    * hash values (the q118 sketched-twin discipline). */
  def hashXx(c: Column): Column = xxhash64(c).bitwiseAND(lit(XxModulus - 1L))

  /** Per-group KMV sketch of `valueCol`: (groupCols*, kmv array<long> —
    * the ≤k smallest distinct hash values, ascending). `hasher` picks the
    * mixer: [[hash]] (default — the fully-oracled portable LCG) or
    * [[hashXx]] (production). */
  def sketch(df: DataFrame, groupCols: Seq[String], valueCol: String,
             k: Int, hasher: Column => Column = hash): DataFrame = {
    require(k >= 2, s"k must be >= 2 (got $k)")
    df.select((groupCols.map(col) :+ hasher(col(valueCol)).as("__h")): _*)
      .distinct()
      .groupBy(groupCols.map(col): _*)
      .agg(TopK.topKAsc(col("__h"), k).as("kmv"))
  }

  /** The distinct-count estimate of a sketch column: exact cardinality
    * while unsaturated, `(k−1)·M / h_k` once full — one IEEE division of
    * exact integers, engine-portable. `modulus` must match the mixer the
    * sketch was built with ([[Modulus]] for [[hash]], [[XxModulus]] for
    * [[hashXx]]). */
  def estimate(kmv: Column, k: Int, modulus: Long = Modulus): Column =
    when(size(kmv) < k, size(kmv).cast("double"))
      .otherwise(lit(((k - 1).toDouble) * modulus.toDouble) /
        element_at(kmv, k).cast("double"))

  /** Merge every group's sketch into ONE union sketch (a 1-row frame,
    * column `kmv`): the k smallest distinct hashes across all sketches —
    * the union-cardinality estimate without touching the raw data. */
  def mergeAll(sketches: DataFrame, k: Int): DataFrame =
    sketches.select(explode(col("kmv")).as("__h")).distinct()
      .agg(TopK.topKAsc(col("__h"), k).as("kmv"))

  /** SET-SIMILARITY from two KMV sketches (Beyer et al. SIGMOD'07 §5):
    * with M = the k smallest distinct hashes of the sketch UNION, the
    * Jaccard estimate is |M ∩ A ∩ B| / |M| — members of M seen by BOTH
    * sketches are exactly the union's bottom-k members that lie in the
    * intersection. O(k) array arithmetic per pair, no raw-data rescan —
    * the audience/day-over-day overlap primitive on state you already
    * keep for cardinalities (the [[Overlap]] theta-sketch role, on the
    * fully-oracle-able sketch family). Deterministic given the mixer:
    * with [[hash]] the estimate is a pure function of the data (full
    * DuckDB oracle, q210); both-empty inputs yield NULL (no evidence, not
    * similarity 0). ONE IEEE division of exact integers. */
  def jaccardEstimate(a: Column, b: Column, k: Int): Column = {
    val merged = slice(array_sort(array_union(a, b)), 1, k)
    val inter = size(array_intersect(array_intersect(merged, a), b))
    when(size(merged) > 0,
      inter.cast("double") / size(merged).cast("double"))
  }

  /** Merge per-period sketches over a TRAILING ordinal window — the
    * sliding-window cardinality every monitoring pipeline wants ("distinct
    * users over the last 7 days, daily") and the workload mergeable
    * sketches exist for: the exact answer rescans `window`× the raw data
    * per period, the sketch answer touches only k-bounded state. Input:
    * one sketch row per `ordCol` period (from [[sketch]]); returns
    * (ordCol, n_periods, kmv) where row `t` merges the sketches of
    * periods [t−window+1, t] and `n_periods` counts how many actually
    * existed (callers gate on `n_periods === window` for full windows).
    *
    * Scale shape: each sketch contributes to its `window` windows via an
    * EXPLODED offset sequence — an equi-group, never a range join (the
    * [[RangeJoin]] exactly-once bin discipline; a between-join here would
    * plan BNLJ) — then one distinct + bounded-heap rollup per window. All
    * frames are periods×k-sized. Windows extending past the last period
    * appear with partial `n_periods`, symmetrical with leading warm-up. */
  def mergeTrailing(sketches: DataFrame, ordCol: String, window: Int,
                    k: Int): DataFrame = {
    require(window >= 1, s"window must be >= 1 (got $window)")
    require(k >= 2, s"k must be >= 2 (got $k)")
    val contrib = sketches
      .select(col(ordCol).as("__src"), col("kmv"),
        explode(sequence(lit(0), lit(window - 1))).as("__off"))
      .select((col("__src") + col("__off")).as("__end"), col("__src"),
        col("kmv"))
    val merged = contrib
      .select(col("__end"), explode(col("kmv")).as("__h")).distinct()
      .groupBy("__end").agg(TopK.topKAsc(col("__h"), k).as("kmv"))
    contrib.select("__end", "__src").distinct()
      .groupBy("__end").agg(count(lit(1)).as("n_periods"))
      .join(merged, Seq("__end"))
      .select(col("__end").as(ordCol), col("n_periods"), col("kmv"))
  }
}
