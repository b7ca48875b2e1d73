package graft.multimodal

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.catalyst.encoders.{ExpressionEncoder, RowEncoder}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal columns: images/audio/video travel as opaque `binary` columns
  * with typed metadata, and per-row media ops run as partition-batched
  * transforms over the binary payload — the Scala analogue of
  * `mapInPandas` (declared output schema, batch-at-a-time execution,
  * partition-level parallelism).
  *
  * The DECODE ITSELF IS A STUB: this container has no image/audio codecs, so
  * the payload format is a deterministic fake ("GFT0" header + width/height/
  * channels + payload bytes) and [[decodeStub]] parses that header. Swapping
  * in a real codec changes only the body of the decode function — the
  * schema contract, the batched mapPartitions plumbing, the partitioning,
  * and every downstream operator stay exactly as tested here.
  *
  * Scale notes: media work is CPU-per-row-heavy with tiny keys, so the right
  * shape is a narrow mapPartitions (no shuffle) after an optional
  * `repartition(n)` to spread decode cost; feature vectors then feed the
  * existing ANN operators ([[graft.operators.Ann]]) unchanged.
  */
object Multimodal {

  val MediaSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("kind", StringType, nullable = false), // image | audio | video
    StructField("payload", BinaryType, nullable = true)))

  val DecodedSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("kind", StringType, nullable = false),
    StructField("width", IntegerType, nullable = true),
    StructField("height", IntegerType, nullable = true),
    StructField("channels", IntegerType, nullable = true),
    StructField("n_bytes", LongType, nullable = true),
    StructField("valid", BooleanType, nullable = false)))

  private val Magic = "GFT0".getBytes("US-ASCII")

  /** Build a fake payload: magic, width/height (2 bytes each, big-endian),
    * channels, then `payloadLen` deterministic bytes from a SplitMix64
    * stream. */
  def fakePayload(seed: Long, width: Int, height: Int, channels: Int, payloadLen: Int): Array[Byte] = {
    val out = new Array[Byte](Magic.length + 5 + payloadLen)
    System.arraycopy(Magic, 0, out, 0, Magic.length)
    out(4) = ((width >> 8) & 0xff).toByte
    out(5) = (width & 0xff).toByte
    out(6) = ((height >> 8) & 0xff).toByte
    out(7) = (height & 0xff).toByte
    out(8) = (channels & 0xff).toByte
    var z = seed
    var i = 0
    while (i < payloadLen) {
      z += 0x9e3779b97f4a7c15L
      var x = z
      x = (x ^ (x >>> 30)) * 0xbf58476d1ce4e5b9L
      x = (x ^ (x >>> 27)) * 0x94d049bb133111ebL
      out(Magic.length + 5 + i) = ((x ^ (x >>> 31)) & 0xff).toByte
      i += 1
    }
    out
  }

  /** Deterministic synthetic media table (tests + registered query): ids
    * 0..n-1 cycling through kinds, sizes derived from the id. */
  def syntheticMedia(spark: SparkSession, n: Int, partitions: Int = 4): DataFrame = {
    val kinds = Array("image", "audio", "video")
    val rows = spark.sparkContext
      .parallelize(0L until n.toLong, partitions)
      .map { id =>
        val kind = kinds((id % 3).toInt)
        val w = 16 + (id % 7).toInt * 8
        val h = 16 + (id % 5).toInt * 8
        Row(id, kind, fakePayload(id, w, h, 3, 64 + (id % 32).toInt))
      }
    spark.createDataFrame(rows, MediaSchema)
  }

  /** Parse one payload's header. STUB CODEC — a real build replaces this body
    * with an actual image/audio decoder; everything around it is production
    * plumbing. Returns (width, height, channels) or None for corrupt input. */
  private def parseHeader(payload: Array[Byte]): Option[(Int, Int, Int)] = {
    if (payload == null || payload.length < Magic.length + 5) return None
    var i = 0
    while (i < Magic.length) {
      if (payload(i) != Magic(i)) return None
      i += 1
    }
    val w = ((payload(4) & 0xff) << 8) | (payload(5) & 0xff)
    val h = ((payload(6) & 0xff) << 8) | (payload(7) & 0xff)
    Some((w, h, payload(8) & 0xff))
  }

  private def rowEncoder(schema: StructType): ExpressionEncoder[Row] =
    ExpressionEncoder(RowEncoder.encoderFor(schema))

  /** Decode metadata for every media row — batched per partition, no shuffle.
    * Corrupt payloads yield valid=false rows instead of failing the job (at
    * 100 TB a fraction of corrupt media is a certainty, not an edge case). */
  def decodeStub(media: DataFrame): DataFrame = {
    val idIdx = media.schema.fieldIndex("media_id")
    val kindIdx = media.schema.fieldIndex("kind")
    val payloadIdx = media.schema.fieldIndex("payload")
    media.mapPartitions { it =>
      it.map { r =>
        val payload = r.getAs[Array[Byte]](payloadIdx)
        parseHeader(payload) match {
          case Some((w, h, c)) =>
            Row(r.getLong(idIdx), r.getString(kindIdx), w, h, c,
              payload.length.toLong, true)
          case None =>
            Row(r.getLong(idIdx), r.getString(kindIdx), null, null, null,
              Option(payload).map(_.length.toLong).orNull, false)
        }
      }
    }(rowEncoder(DecodedSchema))
  }

  /** Feature extraction: payload → fixed-dim float vector. The vector MATH is
    * a stub (hash-derived projection instead of a neural encoder); the
    * contract — binary in, `array<float>` out, partition-batched, ready for
    * [[graft.operators.Ann]] — is the real one. */
  def extractFeaturesStub(media: DataFrame, dim: Int = 16): DataFrame = {
    require(dim >= 1 && dim <= 4096, s"dim out of range: $dim")
    val schema = StructType(Seq(
      StructField("media_id", LongType, nullable = false),
      StructField("feature", ArrayType(FloatType, containsNull = false), nullable = false)))
    val idIdx = media.schema.fieldIndex("media_id")
    val payloadIdx = media.schema.fieldIndex("payload")
    media.mapPartitions { it =>
      it.map { r =>
        val payload = Option(r.getAs[Array[Byte]](payloadIdx)).getOrElse(Array.emptyByteArray)
        val v = new Array[Float](dim)
        var acc = 0xcbf29ce484222325L
        var i = 0
        while (i < payload.length) {
          acc = (acc ^ (payload(i) & 0xffL)) * 0x100000001b3L
          v(i % dim) += ((acc >>> 40).toInt / 16777216.0f) - 0.5f
          i += 1
        }
        Row(r.getLong(idIdx), v.toSeq)
      }
    }(rowEncoder(schema))
  }

  /** Resize: re-emit each image payload at `targetW`×`targetH`. The PIXEL
    * MATH is a stub (nearest-neighbor index mapping over the fake payload
    * bytes instead of a real raster op), but the contract is the production
    * one — binary in, binary out with a REWRITTEN header carrying the new
    * dimensions, so the result round-trips through [[decodeStub]] (spec'd);
    * corrupt payloads pass through unchanged with resized=false rather than
    * failing the batch. Narrow mapPartitions, no shuffle. */
  def resizeStub(media: DataFrame, targetW: Int, targetH: Int): DataFrame = {
    require(targetW >= 1 && targetW <= 0xffff && targetH >= 1 && targetH <= 0xffff,
      s"target dimensions out of range: ${targetW}x$targetH")
    val schema = StructType(Seq(
      StructField("media_id", LongType, nullable = false),
      StructField("kind", StringType, nullable = false),
      StructField("payload", BinaryType, nullable = true),
      StructField("resized", BooleanType, nullable = false)))
    val idIdx = media.schema.fieldIndex("media_id")
    val kindIdx = media.schema.fieldIndex("kind")
    val payloadIdx = media.schema.fieldIndex("payload")
    val headerLen = Magic.length + 5
    media.mapPartitions { it =>
      it.map { r =>
        val payload = r.getAs[Array[Byte]](payloadIdx)
        val resizedPayload = if (r.getString(kindIdx) != "image") None else
          parseHeader(payload).map { case (w, h, c) =>
            val body = payload.length - headerLen
            // body scales with the pixel-count ratio, sampled nearest-neighbor;
            // ALL arithmetic in Long and clamped — header dims come from DATA
            // (a lying 0x0 header upscaled to 65535² would wrap an Int), and
            // the stub bounds any one output at 64 MB instead of misallocating
            val outBody =
              if (body <= 0) 0
              else math.min(
                math.max(1L, body.toLong * targetW * targetH / math.max(1L, w.toLong * h)),
                64L * 1024 * 1024).toInt
            val out = new Array[Byte](headerLen + outBody)
            System.arraycopy(Magic, 0, out, 0, Magic.length)
            out(4) = ((targetW >> 8) & 0xff).toByte
            out(5) = (targetW & 0xff).toByte
            out(6) = ((targetH >> 8) & 0xff).toByte
            out(7) = (targetH & 0xff).toByte
            out(8) = (c & 0xff).toByte
            var i = 0
            while (i < outBody) {
              out(headerLen + i) = payload(headerLen + (i.toLong * body / outBody).toInt)
              i += 1
            }
            out
          }
        resizedPayload match {
          case Some(p) => Row(r.getLong(idIdx), r.getString(kindIdx), p, true)
          case None => Row(r.getLong(idIdx), r.getString(kindIdx), payload, false)
        }
      }
    }(rowEncoder(schema))
  }

  /** Frame sampling for video payloads: every k-th fixed-size slice of the
    * payload as one "frame" (stub for a real frame grabber; the exploded
    * (media_id, frame_idx, frame) shape is what a real one produces). */
  def frameSampleStub(media: DataFrame, frameBytes: Int = 16, everyK: Int = 2): DataFrame = {
    require(frameBytes >= 1 && everyK >= 1, "frameBytes and everyK must be positive")
    val schema = StructType(Seq(
      StructField("media_id", LongType, nullable = false),
      StructField("frame_idx", IntegerType, nullable = false),
      StructField("frame", BinaryType, nullable = false)))
    val idIdx = media.schema.fieldIndex("media_id")
    val kindIdx = media.schema.fieldIndex("kind")
    val payloadIdx = media.schema.fieldIndex("payload")
    media.mapPartitions { it =>
      it.flatMap { r =>
        if (r.getString(kindIdx) != "video") Iterator.empty
        else {
          val payload = Option(r.getAs[Array[Byte]](payloadIdx)).getOrElse(Array.emptyByteArray)
          val id = r.getLong(idIdx)
          val nFrames = payload.length / frameBytes
          (0 until nFrames by everyK).iterator.map { f =>
            Row(id, f, java.util.Arrays.copyOfRange(payload, f * frameBytes, (f + 1) * frameBytes))
          }
        }
      }
    }(rowEncoder(schema))
  }
}
