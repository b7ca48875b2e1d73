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

/** NEURAL encoder over the real ONNX Runtime CPU backend, loaded by
  * REFLECTION: this build is zero-egress (no model weights, no
  * `com.microsoft.onnxruntime:onnxruntime` jar can be resolved), so the
  * dependency cannot be compile-time — but the complete production plumbing
  * CAN be, and is: vision preprocessing (decode → resize → normalized CHW
  * tensor, pure JVM, fully spec'd), one lazily-created session per executor
  * JVM (the heavyweight-resource pattern the [[MediaEncoder]] contract
  * documents), batched-1 NCHW input, output unwrapping, and tensor/result
  * lifecycle. Drop the onnxruntime jar and a model file onto the cluster
  * classpath and this class runs a real model with zero code changes; in
  * its absence, construction still succeeds (the instance must serialize to
  * executors) and the first ENCODE of a decodable payload fails loudly with
  * the missing-artifact diagnostic — a configuration error, deliberately
  * distinct from the None a corrupt payload returns (a data condition).
  *
  * API used (public, stable since onnxruntime 1.x):
  * `OrtEnvironment.getEnvironment()`, `env.createSession(path, options)`,
  * `OnnxTensor.createTensor(env, FloatBuffer, long[])`,
  * `session.run(Map[String, OnnxTensor])`, `Result#iterator` →
  * `OnnxValue#getValue`. */
final class OnnxEncoder(
    modelPath: String,
    override val dim: Int,
    inputName: String = "input",
    inputH: Int = 224,
    inputW: Int = 224) extends MediaEncoder {
  require(dim >= 1, s"dim must be >= 1 (got $dim)")
  require(inputH >= 1 && inputW >= 1, s"bad input shape ${inputH}x$inputW")

  @transient private lazy val rt = OnnxEncoder.load(modelPath)

  override def encode(kind: String, payload: Array[Byte]): Option[Array[Float]] =
    // preprocess FIRST: corrupt/undecodable payloads are a data condition
    // (None) and must never touch — or require — the runtime
    OnnxEncoder.rasterCHW(payload, inputH, inputW).map { chw =>
      val out = rt.run(inputName, chw, Array(1L, 3L, inputH.toLong, inputW.toLong))
      require(out.length == dim,
        s"model emitted ${out.length}-dim output, encoder contract says $dim")
      out
    }
}

object OnnxEncoder {

  /** Vision-model raster preprocessing, pure JVM (spec'd without any
    * runtime): decode through the same bounded ImageIO path as
    * [[Multimodal.decode]], nearest-neighbor resize to `h`×`w` (the
    * [[Multimodal.resize]] kernel), emit CHW float32 normalized to [0, 1] —
    * `out(c·h·w + y·w + x)`, RGB channel order, the standard vision-model
    * input layout. None for undecodable payloads. */
  def rasterCHW(payload: Array[Byte], h: Int, w: Int,
      maxPixels: Long = Multimodal.DefaultMaxImagePixels): Option[Array[Float]] =
    Option(payload).flatMap(Multimodal.readImageBounded(_, maxPixels)).map { img =>
      val (sw, sh) = (img.getWidth, img.getHeight)
      val out = new Array[Float](3 * h * w)
      val plane = h * w
      var y = 0
      while (y < h) {
        val srcY = (y.toLong * sh / h).toInt
        var x = 0
        while (x < w) {
          val rgb = img.getRGB((x.toLong * sw / w).toInt, srcY)
          out(y * w + x) = ((rgb >> 16) & 0xff) / 255.0f // R
          out(plane + y * w + x) = ((rgb >> 8) & 0xff) / 255.0f // G
          out(2 * plane + y * w + x) = (rgb & 0xff) / 255.0f // B
          x += 1
        }
        y += 1
      }
      out
    }

  /** One loaded session per (JVM, model path) — reflection against the
    * onnxruntime jar if present, contextual failure if not. */
  private final class Runtime(
      env: AnyRef, session: AnyRef,
      createTensor: java.lang.reflect.Method,
      runMethod: java.lang.reflect.Method) {
    def run(inputName: String, data: Array[Float], shape: Array[Long]): Array[Float] = {
      val tensor = createTensor.invoke(null, env,
        java.nio.FloatBuffer.wrap(data), shape)
      try {
        val result = runMethod.invoke(session,
          java.util.Collections.singletonMap(inputName, tensor))
        try {
          val it = result.asInstanceOf[java.lang.Iterable[java.util.Map.Entry[String, AnyRef]]]
            .iterator()
          require(it.hasNext, "model produced no outputs")
          val value = it.next().getValue
          value.getClass.getMethod("getValue").invoke(value) match {
            case a: Array[Array[Float]] => a(0) // [1, dim] batch output
            case a: Array[Float] => a // [dim]
            case other => throw new IllegalStateException(
              s"unsupported model output shape: ${other.getClass}")
          }
        } finally result.getClass.getMethod("close").invoke(result): Unit
      } finally tensor.getClass.getMethod("close").invoke(tensor): Unit
    }
  }

  private val cache =
    new java.util.concurrent.ConcurrentHashMap[String, Runtime]()

  private def load(modelPath: String): Runtime =
    cache.computeIfAbsent(modelPath, { path =>
      val (envCls, tensorCls, sessCls, optCls) =
        try (
          Class.forName("ai.onnxruntime.OrtEnvironment"),
          Class.forName("ai.onnxruntime.OnnxTensor"),
          Class.forName("ai.onnxruntime.OrtSession"),
          Class.forName("ai.onnxruntime.OrtSession$SessionOptions"))
        catch {
          case e: ClassNotFoundException => throw new IllegalStateException(
            "OnnxEncoder needs ONNX Runtime (ai.onnxruntime) on the " +
              "classpath — add com.microsoft.onnxruntime:onnxruntime and a " +
              "model file; in a zero-egress build use ClassicalEncoder or " +
              "HashProjectionEncoder instead", e)
        }
      require(new java.io.File(path).isFile,
        s"OnnxEncoder model file not found: $path")
      val env = envCls.getMethod("getEnvironment").invoke(null)
      val opts = optCls.getConstructor().newInstance().asInstanceOf[AnyRef]
      val session = envCls
        .getMethod("createSession", classOf[String], optCls)
        .invoke(env, path, opts)
      new Runtime(env, session,
        tensorCls.getMethod("createTensor", envCls,
          classOf[java.nio.FloatBuffer], classOf[Array[Long]]),
        sessCls.getMethod("run", classOf[java.util.Map[_, _]]))
    })
}

/** Deterministic hash-projection of the RAW bytes — the disclosed
  * neural-encoder stand-in (no model weights ship in a zero-egress build):
  * an FNV-1a byte walk folded into `dim` lanes. Content-derived and
  * deterministic, so it exercises the full plumbing (schema, batching, the
  * ANN bridge) with stable fixtures, but its geometry is meaningless —
  * production swaps in [[OnnxEncoder]] (one jar + one model file away) or
  * [[ClassicalEncoder]]. Never returns None: any byte string (even
  * empty/null → the zero vector) projects. */
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
