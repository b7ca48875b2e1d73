package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftshim.ColumnGlue
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String
import org.apache.spark.sql.functions._

/** Unicode/text normalization — the mojibake-and-junk cleanup pass every
  * crawled-text recipe runs before hashing or tokenizing (the ftfy/OSCAR
  * family; engine-addition capability — the reference's normalization surface
  * is names and dates, `etl/transform.py`). Everything here is scan-local and
  * codegen-friendly: one native NFC expression plus Catalyst `regexp_replace`
  * chains in the Java∩RE2 dialect (the q54 PII-scrub precedent), so the same
  * patterns run bit-identically on DuckDB for the oracle.
  *
  * Order matters and is fixed: control-strip → NFC → whitespace collapse.
  * Controls are stripped BEFORE NFC so a control char can never block a
  * combining sequence from recomposing; whitespace collapses AFTER so widths
  * produced by recomposition don't resurrect runs.
  */
object Normalize {

  /** Unicode NFC normalization as a native Catalyst expression. The common
    * case (already-NFC text — effectively all machine-generated and most
    * crawled text) is a zero-copy `isNormalized` check; only denormalized
    * rows pay the String round-trip. `doGenCode` keeps the check inside
    * WholeStageCodegen. NFC is the right form for dedup canonicalization:
    * é-as-one-codepoint and é-as-e+combining-acute hash identically after it.
    */
  case class NfcNormalize(child: Expression) extends UnaryExpression {
    override def dataType: DataType = StringType
    override def nullSafeEval(v: Any): Any = {
      val s = v.asInstanceOf[UTF8String].toString
      if (java.text.Normalizer.isNormalized(s, java.text.Normalizer.Form.NFC)) v
      else UTF8String.fromString(
        java.text.Normalizer.normalize(s, java.text.Normalizer.Form.NFC))
    }
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, c => {
        val js = ctx.freshName("jstr")
        s"""
           |String $js = $c.toString();
           |${ev.value} =
           |  java.text.Normalizer.isNormalized($js, java.text.Normalizer.Form.NFC)
           |    ? $c
           |    : org.apache.spark.unsafe.types.UTF8String.fromString(
           |        java.text.Normalizer.normalize($js, java.text.Normalizer.Form.NFC));
         """.stripMargin
      })
    override protected def withNewChildInternal(c: Expression): NfcNormalize =
      copy(child = c)
  }

  def nfc(c: Column): Column =
    ColumnGlue.column(NfcNormalize(ColumnGlue.expression(c)))

  /** C0 controls + DEL, EXCEPT the token-stream whitespace class \t \n \f \r
    * ([[Text.tokens]] splits on those — stripping them would join words).
    * Java∩RE2: hex escapes only, no lookarounds. */
  val ControlClass = "[\\x00-\\x08\\x0B\\x0E-\\x1F\\x7F]"

  /** U+FFFD REPLACEMENT CHARACTER — the decoder's "bytes were broken here"
    * marker. Counted as a signal, deliberately NOT removed: deleting it would
    * splice the two fragments of a broken word into a well-formed fake. */
  val ReplacementClass = "\\x{FFFD}"

  /** Number of control characters [[ControlClass]] in `c` (counted on the
    * RAW text — the audit column for what [[cleanText]] removed). */
  def controlCount(c: Column): Column = {
    val s = coalesce(c, lit(""))
    length(s) - length(regexp_replace(s, ControlClass, ""))
  }

  /** Number of U+FFFD replacement characters in `c` — a mojibake/garble
    * signal for quality gating (rows with many FFFDs came from a broken
    * decode, not broken language). */
  def replacementCount(c: Column): Column = {
    val s = coalesce(c, lit(""))
    length(s) - length(regexp_replace(s, ReplacementClass, ""))
  }

  /** The full cleanup chain: NULL→'' → control-strip → NFC → horizontal-run
    * collapse (`[ \t]+` → one space) → line-trailing-space strip → outer
    * space trim. Idempotent (every stage's output is a fixed point of every
    * earlier stage) and scan-local — zero shuffles, no UDF. */
  def cleanText(c: Column): Column = {
    val s1 = regexp_replace(coalesce(c, lit("")), ControlClass, "")
    val s2 = nfc(s1)
    val s3 = regexp_replace(s2, "[ \\t]+", " ")
    val s4 = regexp_replace(s3, " +\\n", "\n")
    trim(s4)
  }
}
