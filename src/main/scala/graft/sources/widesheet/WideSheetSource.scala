package graft.sources.widesheet

import java.io.{ObjectInputStream, ObjectOutputStream}
import java.nio.charset.StandardCharsets
import java.util

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.sources.DataSourceRegister
import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** DataSource V2 connector for the RAW "wide sheet" format — the engine-shaped
  * equivalent of the reference's spreadsheet connector role
  * (/root/reference/etl/gsheets.py:97-136): header promotion (first record =
  * column names), ragged-row normalization (short rows padded with null,
  * long rows truncated to the header width), empty cells as null, and a
  * stable per-row ordinal `src_row_idx` stamped in FILE ORDER.
  *
  * A sheet is, by data contract, a single ordered small file — row order IS
  * data (duplicate numbering D1/D2 and the positional song link D5 key off
  * it) — so the scan is one InputPartition reading the file in order on an
  * executor. This replaces the `coalesce(1).rdd.zipWithIndex` ingest with a
  * proper source: schema is inferred once on the driver (header record
  * only), the data never passes through the driver, and the ordinal is
  * attached as the rows stream. For sources too big to be "a sheet", use
  * [[graft.etl.RawSheet.fromOrdinal]] — order must then come from the source
  * itself.
  */
class WideSheetSource extends TableProvider with DataSourceRegister {

  override def shortName(): String = "widesheet"

  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    WideSheetSource.schemaFor(WideSheetSource.pathOf(options))

  override def getTable(
      schema: StructType,
      partitioning: Array[Transform],
      properties: util.Map[String, String]): Table =
    new WideSheetTable(
      WideSheetSource.pathOf(new CaseInsensitiveStringMap(properties)), schema)
}

private[graft] object WideSheetSource {
  val RowIdx = "src_row_idx"

  def pathOf(options: CaseInsensitiveStringMap): String =
    Option(options.get("path")).getOrElse(
      throw new IllegalArgumentException("widesheet requires a path, e.g. .load(path)"))

  def hadoopConf: Configuration =
    SparkSession.active.sessionState.newHadoopConf()

  def readText(path: String, conf: Configuration): String =
    readTextPrefix(path, conf, Long.MaxValue)._1

  /** Read at most `maxBytes` of the file (UTF-8); the Boolean reports whether
    * the cap was hit (the file may continue past the prefix). Used by schema
    * inference so peeking at the header never slurps an oversized file. */
  def readTextPrefix(path: String, conf: Configuration, maxBytes: Long): (String, Boolean) = {
    val p = new Path(path)
    val fs = p.getFileSystem(conf)
    val in = fs.open(p)
    try {
      val bytes = new java.io.ByteArrayOutputStream()
      val buf = new Array[Byte](64 * 1024)
      var remaining = maxBytes
      var n = in.read(buf, 0, math.min(buf.length.toLong, remaining).toInt)
      while (n >= 0 && remaining > 0) {
        bytes.write(buf, 0, n)
        remaining -= n
        n = if (remaining == 0) -1
            else in.read(buf, 0, math.min(buf.length.toLong, remaining).toInt)
      }
      val hitCap = remaining == 0 && in.read() >= 0
      (new String(bytes.toByteArray, StandardCharsets.UTF_8), hitCap)
    } finally in.close()
  }

  /** Schema inference reads at most this much of the file — far beyond any
    * real sheet header, and a hard bound on driver memory for the peek. */
  val HeaderPeekBytes: Long = 4L * 1024 * 1024

  /** Header promotion: schema = ordinal + the first record's cells as
    * nullable strings. Driver-side by design — the header is plan metadata;
    * only a bounded prefix of the file is read and only the first record is
    * parsed. Header hygiene: empty header cells become `_c<idx>` (the Spark
    * CSV placeholder, so a trailing comma cannot produce an unaddressable
    * ''-named column), and DUPLICATE header names fail fast — a sheet with
    * two identical column headers is malformed, and silently renaming them
    * (the Spark CSV dedup) would let a duplicated date column dodge the R1
    * duplicate-rehearsal-date abort downstream. */
  def schemaFor(path: String): StructType = {
    val (prefix, hitCap) = readTextPrefix(path, hadoopConf, HeaderPeekBytes)
    // a capped prefix proves the header complete only if a SECOND record
    // started inside it; otherwise the cut may be mid-record (or mid-UTF-8
    // char) and inferring from it would silently truncate every data row
    if (hitCap && CsvCodec.parseFirstTwoRecords(prefix).length < 2)
      throw new IllegalArgumentException(
        s"widesheet: header record of '$path' does not terminate within " +
          s"the $HeaderPeekBytes-byte schema peek — not a sheet")
    val header = CsvCodec.parseFirstRecord(prefix).getOrElse(
      throw new IllegalArgumentException(s"widesheet: empty file '$path' has no header"))
    val named = header.zipWithIndex.map { case (h, i) => if (h.isEmpty) s"_c$i" else h }
    val dups = named.groupBy(identity).collect { case (h, hs) if hs.size > 1 => h }
    if (dups.nonEmpty)
      throw new IllegalArgumentException(
        s"widesheet: duplicate header column(s) ${dups.mkString("'", "', '", "'")} in '$path'")
    StructType(
      StructField(RowIdx, LongType, nullable = false) +:
        named.map(h => StructField(h, StringType, nullable = true)))
  }
}

private[widesheet] class WideSheetTable(path: String, tableSchema: StructType)
    extends Table with SupportsRead {
  override def name(): String = s"widesheet(`$path`)"
  override def schema(): StructType = tableSchema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new ScanBuilder {
      override def build(): Scan = new WideSheetScan(path, tableSchema)
    }
}

private[widesheet] class WideSheetScan(path: String, schema: StructType)
    extends Scan with Batch {
  override def readSchema(): StructType = schema
  override def toBatch: Batch = this
  // ONE ordered partition: the sheet contract (see class Scaladoc)
  override def planInputPartitions(): Array[InputPartition] =
    Array(WideSheetPartition(path))
  override def createReaderFactory(): PartitionReaderFactory =
    new WideSheetReaderFactory(schema.length - 1,
      new SerializableHadoopConf(WideSheetSource.hadoopConf))
}

private[widesheet] case class WideSheetPartition(path: String) extends InputPartition

private[widesheet] class WideSheetReaderFactory(
    dataCols: Int, conf: SerializableHadoopConf)
    extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val path = partition.asInstanceOf[WideSheetPartition].path
    new PartitionReader[InternalRow] {
      private val records =
        CsvCodec.parse(WideSheetSource.readText(path, conf.value)).iterator.drop(1)
      private var idx = -1L
      private var current: InternalRow = _
      override def next(): Boolean =
        if (!records.hasNext) false
        else {
          val cells = records.next()
          idx += 1
          val values = new Array[Any](dataCols + 1)
          values(0) = idx
          var i = 0
          while (i < dataCols) { // pad short rows with null, drop extras
            values(i + 1) =
              if (i < cells.length && cells(i).nonEmpty) UTF8String.fromString(cells(i))
              else null // empty cell -> null, matching Spark CSV's nullValue=""
            i += 1
          }
          current = new GenericInternalRow(values)
          true
        }
      override def get(): InternalRow = current
      override def close(): Unit = ()
    }
  }
}

/** Minimal RFC-4180 record parser: quoted fields may contain commas, CR/LF
  * and escaped double quotes (""); records split on LF / CRLF outside
  * quotes; fully blank lines are skipped (Spark CSV parity). */
private[graft] object CsvCodec {

  /** First non-blank record only — cheap header peek for schema inference. */
  def parseFirstRecord(text: String): Option[Vector[String]] =
    parse(text, limit = 1).headOption

  /** First two records — lets a capped prefix prove record 1 terminated. */
  def parseFirstTwoRecords(text: String): Vector[Vector[String]] =
    parse(text, limit = 2)

  def parse(text: String): Vector[Vector[String]] = parse(text, limit = Int.MaxValue)

  private def parse(text: String, limit: Int): Vector[Vector[String]] = {
    val records = Vector.newBuilder[Vector[String]]
    var nRecords = 0
    var fields = Vector.newBuilder[String]
    var nFields = 0
    val cur = new StringBuilder
    var inQuotes = false
    var sawQuote = false // quote anywhere in the current record
    var i = 0
    def endField(): Unit = { fields += cur.toString; nFields += 1; cur.setLength(0) }
    def endRecord(): Unit = {
      endField()
      val rec = fields.result()
      // Skip only truly empty lines. A record of a single QUOTED empty field
      // ("") is not blank: Spark CSV emits a one-null-field row for it, and
      // so do we — the quote is an explicit "this cell exists" marker.
      if (!(rec.length == 1 && rec(0).isEmpty && !sawQuote)) { records += rec; nRecords += 1 }
      fields = Vector.newBuilder; nFields = 0; sawQuote = false
    }
    while (i < text.length && nRecords < limit) {
      val c = text.charAt(i)
      if (inQuotes) {
        if (c == '"') {
          if (i + 1 < text.length && text.charAt(i + 1) == '"') { cur.append('"'); i += 1 }
          else inQuotes = false
        } else cur.append(c)
      } else c match {
        case '"' => inQuotes = true; sawQuote = true
        case ',' => endField()
        case '\n' => endRecord()
        case '\r' =>
          if (i + 1 < text.length && text.charAt(i + 1) == '\n') i += 1
          endRecord()
        case other => cur.append(other)
      }
      i += 1
    }
    if ((cur.nonEmpty || nFields > 0 || sawQuote) && nRecords < limit)
      endRecord() // trailing record without newline
    records.result()
  }
}

/** Hadoop Configuration is not Serializable; this is the standard wrapper
  * (write/readFields through Java serialization) so executors see the
  * driver's filesystem settings. */
private[widesheet] class SerializableHadoopConf(@transient var value: Configuration)
    extends Serializable {
  private def writeObject(out: ObjectOutputStream): Unit = {
    out.defaultWriteObject()
    value.write(out)
  }
  private def readObject(in: ObjectInputStream): Unit = {
    in.defaultReadObject()
    value = new Configuration(false)
    value.readFields(in)
  }
}
