package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftshim.ColumnGlue
import org.apache.spark.sql.types.{DataType, LongType}

/** Morton (Z-order) keys for multi-dimensional sort-on-write data layout.
  *
  * A table linearly sorted on (a, b) clusters a but scatters b: parquet
  * min/max stats prune row groups for a-predicates only. Interleaving the
  * bits of BOTH columns' scaled values and sorting on the result gives every
  * dimension locality ∝ 2^-bits — a single-column predicate on ANY z-column
  * skips most row groups. This is the file-layout lever that decides how much
  * of 100 TB a selective scan actually reads; the mechanism is identical to
  * Delta's OPTIMIZE ZORDER BY, built here from a native codegen'd bit
  * interleave + `repartitionByRange`.
  */
object ZOrder {

  /** Round-robin bit interleave of the low `bits` bits of each value:
    * out bit (b * n + c) = bit b of vals(c). Public static so the generated
    * Java calls the same kernel `eval` uses. */
  def interleave(vals: Array[Long], bits: Int): Long = {
    var out = 0L
    var b = 0
    var pos = 0
    while (b < bits) {
      var c = 0
      while (c < vals.length) {
        out |= ((vals(c) >>> b) & 1L) << pos
        pos += 1
        c += 1
      }
      b += 1
    }
    out
  }

  /** Bit-interleave of ≥2 long columns' low `bits` bits (values above the
    * mask contribute only their low bits — callers scale first, see
    * [[zkey]]). Null if any input is null. Codegen'd: one static call per
    * row inside WholeStageCodegen. */
  case class InterleaveBits(children: Seq[Expression], bits: Int)
      extends Expression {
    require(children.size >= 2, s"need >= 2 columns to interleave (got ${children.size})")
    require(bits >= 1 && children.size * bits <= 63,
      s"columns * bits must fit a positive long (got ${children.size} * $bits)")
    override def dataType: DataType = LongType
    override def nullable: Boolean = children.exists(_.nullable)
    override def prettyName: String = "zorder_key"
    private val mask = (1L << bits) - 1

    override def eval(input: InternalRow): Any = {
      val vals = new Array[Long](children.size)
      var i = 0
      while (i < children.size) {
        val v = children(i).eval(input)
        if (v == null) return null
        vals(i) = v.asInstanceOf[Long] & mask
        i += 1
      }
      interleave(vals, bits)
    }

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val evals = children.map(_.genCode(ctx))
      val vals = ctx.freshName("zvals")
      val assigns = evals.zipWithIndex.map { case (e, i) =>
        s"""${e.code}
           |if (!${ev.isNull}) {
           |  if (${e.isNull}) { ${ev.isNull} = true; }
           |  else { $vals[$i] = ${e.value} & ${mask}L; }
           |}""".stripMargin
      }.mkString("\n")
      ev.copy(code =
        code"""
           |boolean ${ev.isNull} = false;
           |long ${ev.value} = 0L;
           |long[] $vals = new long[${children.size}];
           |$assigns
           |if (!${ev.isNull}) {
           |  ${ev.value} = graft.functions.ZOrder.interleave($vals, $bits);
           |}""".stripMargin)
    }

    override protected def withNewChildrenInternal(
        newChildren: IndexedSeq[Expression]): InterleaveBits =
      copy(children = newChildren)
  }

  /** Z-key over already-scaled non-negative integral columns (each in
    * [0, 2^bits)). For arbitrary numeric/date columns use [[scaledZkey]]. */
  def zkey(bits: Int, cols: Column*): Column =
    ColumnGlue.column(InterleaveBits(
      cols.map(c => ColumnGlue.expression(c.cast("long"))), bits))

  /** Z-key over arbitrary numeric/date/timestamp columns: each column is
    * equal-width bucketed into [0, 2^bits) between its OBSERVED min and max
    * (one bounded 2-value-per-column aggregate — the only driver-side data),
    * then bit-interleaved. Equal-width (not rank) scaling: adequate unless a
    * column is pathologically skewed, and fully codegen — no per-row UDF, no
    * global sort. */
  def scaledZkey(df: DataFrame, bits: Int, colNames: Seq[String]): Column = {
    require(colNames.size >= 2, "need >= 2 z-order columns")
    val stats = df.select(colNames.flatMap(c => Seq(
      min(col(c).cast("double")).as(s"__min_$c"),
      max(col(c).cast("double")).as(s"__max_$c"))): _*).collect()(0)
    val n = (1L << bits) - 1
    val scaled = colNames.zipWithIndex.map { case (c, i) =>
      // an all-null column has null min/max — no spread to encode, same as
      // a constant column (its bits contribute nothing to the key)
      if (stats.isNullAt(2 * i) || stats.isNullAt(2 * i + 1)) lit(0L)
      else {
      val lo = stats.getDouble(2 * i)
      val hi = stats.getDouble(2 * i + 1)
      if (lo == hi) lit(0L)
      // width_bucket yields [1, n] inside the range and n+1 AT the max —
      // clamp and shift to [0, n]
      else least(width_bucket(col(c).cast("double"), lit(lo), lit(hi), lit(n)),
        lit(n)) - lit(1L)
      }
    }
    zkey(bits, scaled: _*)
  }
}
