package graft.functions

import org.apache.datasketches.memory.Memory
import org.apache.datasketches.theta.{CompactSketch, SetOperation, Sketch, Sketches, Union, UpdateSketch}
import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.graftshim.ColumnGlue
import org.apache.spark.sql.types.{BinaryType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Theta-sketch SET ALGEBRA over distinct keys (Apache DataSketches, the
  * same library Spark's own `hll_sketch_agg` family builds on): bounded
  * sketches that support not just mergeable distinct counting (HLL's
  * territory, [[graft.operators.DistinctRollup]]) but INTERSECTION and
  * difference — "how many users did BOTH A and B" across segments without
  * ever joining the fact table against itself.
  *
  * Why it matters at 100 TB: the exact overlap of two segments is a
  * self-join of the (segment, key) distinct frame — a full shuffle whose
  * output grows with every popular key, re-paid for every pair of segments.
  * With one sketch per segment (a single fact pass, map-side combined,
  * ≤ 8·2^lgK bytes each), every pairwise overlap/union/difference is
  * segment-level arithmetic over KB-sized summaries.
  *
  * Determinism and exactness: a theta sketch retains the k smallest key
  * hashes under a fixed seed. Below ~2^lgK distinct keys it never purges —
  * EXACT mode, where estimates are exactly the distinct count and set
  * operations are exact set arithmetic regardless of row order or
  * partitioning (the regime the oracled q123 runs in, spec-asserted). In
  * estimation mode the retained set of a single QuickSelect sketch can
  * depend on update order; treat estimates there as ±RSE approximations
  * like any sketch (the q119 posture).
  */
object ThetaSketch {

  /** Aggregate distinct `c` values (long or string) into a compact theta
    * sketch (binary). lgK bounds memory and the exact-mode threshold. */
  def thetaSketchAgg(c: Column, lgK: Int = 12): Column = {
    require(lgK >= 4 && lgK <= 26, s"theta lgK must be in [4,26] (got $lgK)")
    ColumnGlue.column(ThetaSketchAgg(ColumnGlue.expression(c), lgK)
      .toAggregateExpression())
  }

  /** Merge already-built sketches (binary column) — the rollup aggregate
    * that re-aggregates a per-(segment, day) sketch table to any coarser
    * grain, the [[graft.operators.DistinctRollup]] pattern with set algebra
    * downstream. */
  def thetaUnionAgg(c: Column, lgK: Int = 12): Column = {
    require(lgK >= 4 && lgK <= 26, s"theta lgK must be in [4,26] (got $lgK)")
    ColumnGlue.column(ThetaUnionAgg(ColumnGlue.expression(c), lgK)
      .toAggregateExpression())
  }

  /** Distinct-count estimate of a sketch, rounded to a long (exact mode ⇒
    * exactly the distinct count). */
  def thetaEstimate(c: Column): Column =
    ColumnGlue.column(ThetaEstimate(ColumnGlue.expression(c)))

  /** Sketch of the intersection A ∩ B. */
  def thetaIntersect(a: Column, b: Column): Column =
    ColumnGlue.column(ThetaIntersect(
      ColumnGlue.expression(a), ColumnGlue.expression(b)))

  /** Sketch of the union A ∪ B (pairwise scalar form). */
  def thetaUnion(a: Column, b: Column): Column =
    ColumnGlue.column(ThetaUnionPair(
      ColumnGlue.expression(a), ColumnGlue.expression(b)))

  /** Sketch of the difference A \ B. */
  def thetaDiff(a: Column, b: Column): Column =
    ColumnGlue.column(ThetaANotB(
      ColumnGlue.expression(a), ColumnGlue.expression(b)))

  // ---- aggregate buffers ----------------------------------------------------

  /** Mutable agg state: raw values accumulate in `upd`; merged partials
    * accumulate in a lazily-created `uni`. Spark's lifecycle never
    * interleaves update() and merge() on one buffer, but `result` folds
    * both regardless. */
  final class Holder(lgK: Int) {
    val upd: UpdateSketch =
      UpdateSketch.builder().setLogNominalEntries(lgK).build()
    var uni: Union = null
    def mergeSketch(sk: Sketch): Unit = {
      if (uni == null)
        uni = SetOperation.builder().setLogNominalEntries(lgK).buildUnion()
      uni.union(sk)
    }
    def result: CompactSketch =
      if (uni == null) upd.compact(true, null)
      else {
        uni.union(upd.compact(false, null))
        uni.getResult
      }
  }

  private def wrap(bytes: Array[Byte]): Sketch =
    Sketches.wrapCompactSketch(Memory.wrap(bytes))

  abstract class ThetaAggBase extends TypedImperativeAggregate[Holder] {
    def lgK: Int
    override def createAggregationBuffer(): Holder = new Holder(lgK)
    override def merge(b: Holder, o: Holder): Holder = {
      b.mergeSketch(o.result); b
    }
    override def eval(b: Holder): Any = b.result.toByteArray
    override def serialize(b: Holder): Array[Byte] = b.result.toByteArray
    override def deserialize(bytes: Array[Byte]): Holder = {
      val h = new Holder(lgK); h.mergeSketch(wrap(bytes)); h
    }
    override def dataType: DataType = BinaryType
    override def nullable: Boolean = false
  }

  /** Build a sketch from raw long/string values. */
  case class ThetaSketchAgg(
      child: Expression, lgK: Int,
      mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
      extends ThetaAggBase {
    override def prettyName: String = "theta_sketch_agg"
    override def update(b: Holder, row: InternalRow): Holder = {
      val v = child.eval(row)
      if (v != null) child.dataType match {
        case LongType => b.upd.update(v.asInstanceOf[Long])
        case StringType => b.upd.update(v.asInstanceOf[UTF8String].getBytes)
        case dt => throw new IllegalArgumentException(
          s"theta_sketch_agg supports long/string keys, got $dt")
      }
      b
    }
    override def children: Seq[Expression] = Seq(child)
    override protected def withNewChildrenInternal(
        c: IndexedSeq[Expression]): ThetaSketchAgg = copy(child = c.head)
    override def withNewMutableAggBufferOffset(o: Int): ThetaSketchAgg =
      copy(mutableAggBufferOffset = o)
    override def withNewInputAggBufferOffset(o: Int): ThetaSketchAgg =
      copy(inputAggBufferOffset = o)
  }

  /** Merge pre-built sketches (binary column). */
  case class ThetaUnionAgg(
      child: Expression, lgK: Int,
      mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
      extends ThetaAggBase {
    override def prettyName: String = "theta_union_agg"
    override def update(b: Holder, row: InternalRow): Holder = {
      val v = child.eval(row)
      if (v != null) b.mergeSketch(wrap(v.asInstanceOf[Array[Byte]]))
      b
    }
    override def children: Seq[Expression] = Seq(child)
    override protected def withNewChildrenInternal(
        c: IndexedSeq[Expression]): ThetaUnionAgg = copy(child = c.head)
    override def withNewMutableAggBufferOffset(o: Int): ThetaUnionAgg =
      copy(mutableAggBufferOffset = o)
    override def withNewInputAggBufferOffset(o: Int): ThetaUnionAgg =
      copy(inputAggBufferOffset = o)
  }

  // ---- scalar set algebra (segment-level rows — interpreted eval is fine) ---

  case class ThetaEstimate(child: Expression)
      extends UnaryExpression with CodegenFallback {
    override def dataType: DataType = LongType
    override def prettyName: String = "theta_estimate"
    override def nullSafeEval(v: Any): Any =
      Math.round(wrap(v.asInstanceOf[Array[Byte]]).getEstimate)
    override protected def withNewChildInternal(c: Expression): ThetaEstimate =
      copy(child = c)
  }

  case class ThetaIntersect(left: Expression, right: Expression)
      extends BinaryExpression with CodegenFallback {
    override def dataType: DataType = BinaryType
    override def prettyName: String = "theta_intersect"
    override def nullSafeEval(a: Any, b: Any): Any =
      SetOperation.builder().buildIntersection()
        .intersect(wrap(a.asInstanceOf[Array[Byte]]),
          wrap(b.asInstanceOf[Array[Byte]]))
        .toByteArray
    override protected def withNewChildrenInternal(
        l: Expression, r: Expression): ThetaIntersect = copy(left = l, right = r)
  }

  case class ThetaUnionPair(left: Expression, right: Expression)
      extends BinaryExpression with CodegenFallback {
    override def dataType: DataType = BinaryType
    override def prettyName: String = "theta_union"
    override def nullSafeEval(a: Any, b: Any): Any =
      SetOperation.builder().buildUnion()
        .union(wrap(a.asInstanceOf[Array[Byte]]),
          wrap(b.asInstanceOf[Array[Byte]]))
        .toByteArray
    override protected def withNewChildrenInternal(
        l: Expression, r: Expression): ThetaUnionPair = copy(left = l, right = r)
  }

  case class ThetaANotB(left: Expression, right: Expression)
      extends BinaryExpression with CodegenFallback {
    override def dataType: DataType = BinaryType
    override def prettyName: String = "theta_a_not_b"
    override def nullSafeEval(a: Any, b: Any): Any =
      SetOperation.builder().buildANotB()
        .aNotB(wrap(a.asInstanceOf[Array[Byte]]),
          wrap(b.asInstanceOf[Array[Byte]]))
        .toByteArray
    override protected def withNewChildrenInternal(
        l: Expression, r: Expression): ThetaANotB = copy(left = l, right = r)
  }
}
