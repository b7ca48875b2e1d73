package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Literal, XxHash64}
import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
import org.apache.spark.sql.graftshim.ColumnGlue
import org.apache.spark.sql.types.BinaryType

/** Column wrappers for Spark's built-in (but unregistered) bloom-filter
  * sketch expressions — the same kernels Catalyst's own runtime-filter rule
  * (`InjectRuntimeFilter`) injects under shuffle joins, exposed here so a
  * pipeline can build the semi-join reduction EXPLICITLY: sketch the small
  * side once, prune the 100 TB fact stream scan-locally before any exchange.
  *
  * Both sides hash through the same `xxhash64` expression — membership is
  * only meaningful when build and probe agree on the hash — and the probe
  * compiles inside whole-stage codegen (`BloomFilterMightContain` has a
  * `doGenCode`), so the prescreen adds no interpreted step to the hot path.
  */
object Sketches {

  /** Aggregate a column into a bloom-filter sketch (binary): membership of
    * `xxhash64(c)` with no false negatives and ~`estItems`-calibrated false
    * positives. `numBits` bounds the sketch to `numBits/8` bytes regardless
    * of input size — the property that makes the build side driver-safe at
    * any corpus scale. Nullable inputs are skipped (SQL aggregate
    * semantics); an all-null/empty input aggregates to SQL NULL. */
  def bloomFilterAgg(c: Column, estItems: Long, numBits: Long): Column = {
    require(estItems > 0, s"bloom estItems must be positive (got $estItems)")
    require(numBits > 0, s"bloom numBits must be positive (got $numBits)")
    ColumnGlue.column(new BloomFilterAggregate(
      new XxHash64(Seq(ColumnGlue.expression(c))),
      Literal(estItems), Literal(numBits)).toAggregateExpression())
  }

  /** Probe a driver-held bloom sketch: true iff `xxhash64(c)` MIGHT be in
    * the set (false ⇒ definitely absent — the no-false-negative guarantee
    * downstream exactness proofs rely on). The sketch ships as a literal in
    * the task binary: MB-scale for millions of build keys, the same bounded
    * posture as the IVF/PQ centroid collects. */
  def mightContain(bloom: Array[Byte], c: Column): Column = {
    require(bloom != null && bloom.nonEmpty, "bloom sketch must be non-empty")
    ColumnGlue.column(BloomFilterMightContain(
      Literal(bloom, BinaryType),
      new XxHash64(Seq(ColumnGlue.expression(c)))))
  }
}
