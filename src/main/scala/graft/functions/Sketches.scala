package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Expression, Literal, UnaryExpression, XxHash64}
import org.apache.spark.sql.catalyst.expressions.aggregate.{BloomFilterAggregate, CountMinSketchAgg}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftshim.ColumnGlue
import org.apache.spark.sql.types.{BinaryType, DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String
import org.apache.spark.util.sketch.CountMinSketch

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

  /** Aggregate a string column into a count-min frequency sketch (binary,
    * `depth×width×8` bytes regardless of input size — like the bloom, a
    * fixed-space summary that is driver-safe at any corpus scale). The
    * estimate for any item is ≥ its true count ALWAYS (collisions only add),
    * which is the direction the heavy-hitter prescreen's exactness proof
    * needs; `eps`/`confidence` only bound the overestimate's magnitude
    * (error ≤ eps×N with probability ≥ confidence). Fixed `seed` keeps the
    * sketch — and thus every downstream estimate — deterministic. */
  def countMinAgg(c: Column, eps: Double, confidence: Double,
      seed: Int = 42): Column = {
    require(eps > 0 && eps < 1, s"cms eps must be in (0,1) (got $eps)")
    require(confidence > 0 && confidence < 1,
      s"cms confidence must be in (0,1) (got $confidence)")
    ColumnGlue.column(new CountMinSketchAgg(
      ColumnGlue.expression(c),
      Literal(eps), Literal(confidence), Literal(seed))
      .toAggregateExpression())
  }

  /** Frequency estimate of a string against a driver-held count-min sketch:
    * ≥ the true count always, so `cmsEstimate(...) >= t` admits every item
    * whose true count reaches `t` — no false negatives, the property that
    * makes a CMS prescreen + exact recount output-identical to the exact
    * frequency query. Probes the UTF8String's bytes — the representation
    * [[CountMinSketchAgg]] hashed at build time — inside whole-stage codegen
    * (the sketch deserializes once per task as a plan reference, not per
    * row). */
  def cmsEstimate(sketch: Array[Byte], c: Column): Column = {
    require(sketch != null && sketch.nonEmpty, "cms sketch must be non-empty")
    ColumnGlue.column(CmsEstimate(ColumnGlue.expression(c), sketch))
  }

  /** String-typed child only (probed as UTF-8 bytes, the representation the
    * agg hashed) — the [[cmsEstimate]] wrapper is the public entry and keeps
    * that contract. */
  case class CmsEstimate(child: Expression, sketchBytes: Array[Byte])
      extends UnaryExpression {
    override def dataType: DataType = LongType
    override def prettyName: String = "cms_estimate"
    @transient private lazy val cms = CountMinSketch.readFrom(sketchBytes)
    override def nullSafeEval(v: Any): Any =
      cms.estimateCount(v.asInstanceOf[UTF8String].getBytes)
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val ref = ctx.addReferenceObj("cms", cms, classOf[CountMinSketch].getName)
      nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.estimateCount($c.getBytes());")
    }
    override protected def withNewChildInternal(c: Expression): CmsEstimate =
      copy(child = c)
  }
}
