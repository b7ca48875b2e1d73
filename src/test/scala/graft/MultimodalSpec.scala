package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

import graft.multimodal.Multimodal
import graft.operators.Ann

/** Multimodal plumbing: schema contract, corrupt-payload tolerance,
  * determinism, shuffle-free decode plan, and composition with ANN. The codec
  * is a stub by design (no image libs in the container); these tests pin the
  * production-side contract a real codec drops into.
  */
class MultimodalSpec extends SparkSpec {

  test("decodeStub parses the fake header and tolerates corrupt/null payloads") {
    val good = Multimodal.fakePayload(seed = 7, width = 320, height = 200, channels = 3, payloadLen = 10)
    val rows = Seq(
      Row(1L, "image", good),
      Row(2L, "image", "not-a-media-file".getBytes),
      Row(3L, "audio", null))
    val media = spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 2), Multimodal.MediaSchema)
    val out = Multimodal.decodeStub(media).collect()
      .map(r => r.getLong(0) -> r).toMap
    assert(out(1L).getInt(2) === 320 && out(1L).getInt(3) === 200 &&
      out(1L).getInt(4) === 3 && out(1L).getBoolean(6))
    assert(!out(2L).getBoolean(6) && !out(3L).getBoolean(6))
    assert(out(2L).isNullAt(2)) // corrupt: no width, but the ROW survives
  }

  test("decode is a narrow map: no shuffle in the plan, partitions preserved") {
    val media = Multimodal.syntheticMedia(spark, 100, partitions = 5)
    val decoded = Multimodal.decodeStub(media)
    assert(!decoded.queryExecution.executedPlan.toString.contains("Exchange"))
    assert(decoded.rdd.getNumPartitions === 5)
  }

  test("extractFeaturesStub: deterministic fixed-dim vectors that feed ANN") {
    val media = Multimodal.syntheticMedia(spark, 60)
    val f1 = Multimodal.extractFeaturesStub(media, dim = 16)
    val f2 = Multimodal.extractFeaturesStub(media, dim = 16)
    val a = f1.orderBy("media_id").collect().map(_.getSeq[Float](1))
    val b = f2.orderBy("media_id").collect().map(_.getSeq[Float](1))
    assert(a.zip(b).forall { case (x, y) => x == y })
    assert(a.forall(_.length === 16))
    // composition: the feature frame is a valid ANN input as-is
    val nn = Ann.bruteForceTopK(
      f1.withColumnRenamed("feature", "embedding"), "media_id", "embedding", k = 2)
    assert(nn.count() === 60L * 2)
  }

  test("resizeStub: header rewritten to target dims, round-trips through decode; non-image passthrough") {
    val media = Multimodal.syntheticMedia(spark, 12)
    val resized = Multimodal.resizeStub(media, targetW = 8, targetH = 8)
    // every image row resized, every other row passed through untouched
    val flags = resized.collect().map(r => (r.getString(1), r.getBoolean(3)))
    assert(flags.forall { case (kind, f) => f == (kind == "image") })
    // the resized payloads decode to the NEW dimensions with valid=true
    val decoded = Multimodal.decodeStub(resized.select("media_id", "kind", "payload"))
      .filter(col("kind") === "image").collect()
    assert(decoded.nonEmpty)
    assert(decoded.forall(r => r.getInt(2) === 8 && r.getInt(3) === 8 && r.getBoolean(6)))
    // deterministic: same input, same bytes
    val again = Multimodal.resizeStub(media, 8, 8)
      .filter(col("kind") === "image").orderBy("media_id")
      .collect().map(_.getAs[Array[Byte]](2).toSeq)
    val first = resized.filter(col("kind") === "image").orderBy("media_id")
      .collect().map(_.getAs[Array[Byte]](2).toSeq)
    assert(again.toSeq === first.toSeq)
    // shuffle-free, like decode
    assert(!resized.queryExecution.executedPlan.toString.contains("Exchange"))
  }

  test("frameSampleStub: every-k fixed-size frames, videos only") {
    val media = Multimodal.syntheticMedia(spark, 30)
    val frames = Multimodal.frameSampleStub(media, frameBytes = 16, everyK = 2)
    val byId = frames.groupBy("media_id").agg(
      count(lit(1)).as("n"), collect_list("frame_idx").as("idx"))
      .collect().map(r => r.getLong(0) -> r).toMap
    // kinds cycle image/audio/video; only media_id % 3 == 2 are video
    assert(byId.keySet.forall(_ % 3 == 2))
    assert(byId.nonEmpty)
    for ((id, r) <- byId) {
      val totalLen = 9 + 64 + (id % 32).toInt // header + payload
      val expected = (0 until totalLen / 16 by 2)
      assert(r.getSeq[Int](2).sorted === expected, s"media $id")
    }
    val widths = frames.select(length(col("frame"))).distinct().collect().map(_.getInt(0))
    assert(widths.toSeq === Seq(16))
  }
}
