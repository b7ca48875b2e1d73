package graft.operators

import java.io.{ByteArrayInputStream, ByteArrayOutputStream}

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftshim.ColumnGlue
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String
import org.apache.spark.util.sketch.BloomFilter

/** Bloom-filter membership prescreen — the constant-space "have we seen this
  * exact content before?" gate for incremental ingest (the Bloom-dedup stage
  * of the CCNet/crawl-pipeline family). A batch is screened against a sketch
  * of the corpus's content keys WITHOUT joining the corpus: the corpus is
  * scanned ONCE to build the sketch (amortized across every subsequent
  * batch), and each batch row pays one hash probe. No false negatives ever
  * (a true duplicate is always flagged); false positives at the configured
  * rate (a `might_exist` hit needs the exact corpus lookup only for the tiny
  * flagged subset — two-phase screening).
  *
  * 100 TB sizing, stated plainly: the sketch is ~1.2 GB per 10^9 keys at 1%
  * fpp, held once per executor. That is the trade against the keyed
  * anti-join ([[graft.io.TableStore.upsertKeyed]]'s screen), which touches
  * corpus buckets per batch but holds nothing resident. Below ~10^10 corpus
  * documents the sketch wins for high-frequency small batches; beyond that,
  * bucket the key space and shard the sketch. Build-side determinism: the
  * sketch is a bitwise-OR merge of per-partition sketches — commutative and
  * associative — so the built filter is BIT-IDENTICAL regardless of
  * partitioning or merge order (spec-asserted).
  */
object BloomScreen {

  /** One corpus scan → a Bloom sketch of `keyCol` (string key — use a
    * content hash, e.g. `md5(text)`, so renames don't defeat the screen).
    * `expectedItems` oversizing is harmless (wasted bits); undersizing
    * inflates the false-positive rate, never drops a true duplicate. */
  def build(
      corpus: DataFrame,
      keyCol: String,
      expectedItems: Long,
      fpp: Double = 0.01): BloomFilter =
    corpus.stat.bloomFilter(keyCol, expectedItems, fpp)

  /** Serialize a built filter for storage alongside the corpus generation —
    * rebuildable any time, but persisting it is what amortizes the build
    * across micro-batches. */
  def toBytes(bf: BloomFilter): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    bf.writeTo(bos)
    bos.toByteArray
  }

  /** Native membership-probe expression: carries the serialized sketch in
    * the plan (deserialized once per task, not per row) and probes the
    * UTF8String's bytes directly — the same byte representation
    * `putString` hashed at build time. No UDF, no boxing. */
  case class BloomMightContain(child: Expression, filterBytes: Array[Byte])
      extends UnaryExpression with CodegenFallback {
    override def dataType: DataType = BooleanType
    @transient private lazy val bf =
      BloomFilter.readFrom(new ByteArrayInputStream(filterBytes))
    override def nullSafeEval(v: Any): Any =
      bf.mightContainBinary(v.asInstanceOf[UTF8String].getBytes)
    override protected def withNewChildInternal(c: Expression): BloomMightContain =
      copy(child = c)
  }

  /** `might_exist` probe column over a string key. NULL keys probe as
    * false — a NULL content hash matches nothing, it is not "maybe". */
  def mightContain(key: Column, bf: BloomFilter): Column =
    coalesce(
      ColumnGlue.column(BloomMightContain(ColumnGlue.expression(key), toBytes(bf))),
      lit(false))

  /** Annotate `batch` with the membership flag. Screening is a pure
    * scan-local projection: zero shuffles, zero joins — the whole point. */
  def screen(
      batch: DataFrame,
      keyCol: String,
      bf: BloomFilter,
      flagCol: String = "might_exist"): DataFrame =
    batch.withColumn(flagCol, mightContain(col(keyCol), bf))
}
