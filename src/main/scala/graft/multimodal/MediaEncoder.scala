package graft.multimodal

/** The production seam between the Spark plumbing and the feature MODEL:
  * everything distribution-shaped (partition batching, schema, corrupt-row
  * policy, the ANN bridge) lives in [[Multimodal.encodeFeatures]] and is
  * encoder-agnostic; everything model-shaped (bytes → vector) lives behind
  * this trait. Swapping the classical features for a neural encoder — an
  * ONNX runtime session, a JNI-wrapped model, an RPC to a serving tier — is
  * ONE implementation of this trait and zero changes to the pipeline: the
  * instance is serialized to executors (one per task via the closure, so an
  * implementation holding a lazy model handle loads it once per executor
  * JVM, the standard heavyweight-resource pattern).
  *
  * Contract: `encode` returns None for corrupt/unsupported payloads (the
  * pipeline turns that into valid=false rows, never a failed batch — at
  * 100 TB corrupt media is a certainty), and every Some has exactly `dim`
  * elements. Implementations must be deterministic per payload if their
  * outputs feed the driver-oracled tables.
  */
trait MediaEncoder extends Serializable {

  /** Fixed output dimensionality — the pipeline allocates schema around it. */
  def dim: Int

  /** payload bytes (possibly null) + declared kind → feature vector, or None
    * when the payload cannot be encoded. */
  def encode(kind: String, payload: Array[Byte]): Option[Array[Float]]
}

/** Classical CV/DSP features over DECODED content — the default encoder:
  * channel means + luminance histogram for rasters, RMS/peak/ZCR + amplitude
  * histogram for PCM audio, first-frame features for video containers
  * (see [[Multimodal.extractFeatures]]'s kernel docs). Every number derives
  * from decoded pixels/samples, not hashed bytes. */
final class ClassicalEncoder(
    maxPixels: Long = Multimodal.DefaultMaxImagePixels) extends MediaEncoder {
  require(maxPixels >= 1, s"maxPixels must be >= 1 (got $maxPixels)")
  override val dim: Int = Multimodal.ClassicalFeatureDim
  override def encode(kind: String, payload: Array[Byte]): Option[Array[Float]] =
    Multimodal.classicalFeature(payload, maxPixels)
}

/** Deterministic hash-projection of the RAW bytes — the disclosed
  * neural-encoder stand-in (no model weights ship in a zero-egress build):
  * an FNV-1a byte walk folded into `dim` lanes. Content-derived and
  * deterministic, so it exercises the full plumbing (schema, batching, the
  * ANN bridge) with stable fixtures, but its geometry is meaningless —
  * production swaps in a real [[MediaEncoder]]. Never returns None: any
  * byte string (even empty/null → the zero vector) projects. */
final class HashProjectionEncoder(override val dim: Int = 16) extends MediaEncoder {
  require(dim >= 1 && dim <= 4096, s"dim out of range: $dim")
  override def encode(kind: String, payload: Array[Byte]): Option[Array[Float]] = {
    val bytes = if (payload == null) Array.emptyByteArray else payload
    val v = new Array[Float](dim)
    var acc = 0xcbf29ce484222325L
    var i = 0
    while (i < bytes.length) {
      acc = (acc ^ (bytes(i) & 0xffL)) * 0x100000001b3L
      v(i % dim) += ((acc >>> 40).toInt / 16777216.0f) - 0.5f
      i += 1
    }
    Some(v)
  }
}
