package graft.operators

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.catalyst.encoders.{ExpressionEncoder, RowEncoder}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** IVF (inverted-file) approximate nearest neighbors: a coarse spherical
  * k-means quantizer learned from a deterministic sample, vectors indexed
  * under their nearest centroid, queries probing their `nProbe` nearest
  * centroids. Complements hyperplane LSH ([[Ann.lshTopK]]): IVF adapts its
  * partitioning to the data distribution, LSH needs no training pass.
  *
  * Scale shape: one driver-side training pass over a bounded sample (at
  * 100 TB: a fraction-sample, not orderBy+limit), then two narrow
  * mapPartitions (assignment, no shuffle) and the candidate equi-join on
  * centroid id — the same join-on-bucket skeleton as LSH, so expected cost is
  * O(n · nProbe/nClusters · n · d). Centroid ids are low-cardinality shuffle
  * keys; AQE's skew handling covers hot clusters.
  */
object Ivf {

  /** Spherical k-means on a sample: vectors L2-normalized, assignment by max
    * dot product, centroid = normalized mean. Deterministic: evenly-spaced
    * seeds from the id-sorted sample, fixed iteration count.
    */
  private[operators] def trainCentroids(
      sample: Array[Array[Float]], nClusters: Int, iters: Int): Array[Array[Float]] = {
    require(sample.nonEmpty, "empty training sample")
    val dim = sample(0).length
    def normalize(v: Array[Float]): Array[Float] = {
      var s = 0.0
      var i = 0
      while (i < v.length) { s += v(i).toDouble * v(i); i += 1 }
      val n = math.sqrt(s)
      if (n == 0.0) v else v.map(x => (x / n).toFloat)
    }
    val data = sample.map(normalize)
    val k = math.min(nClusters, data.length)
    var centroids = Array.tabulate(k)(c => data(math.min(c * (data.length / k), data.length - 1)))
    for (_ <- 1 to iters) {
      val sums = Array.fill(k)(new Array[Double](dim))
      val counts = new Array[Int](k)
      for (v <- data) {
        val c = nearest(centroids, v)
        counts(c) += 1
        var i = 0
        while (i < dim) { sums(c)(i) += v(i); i += 1 }
      }
      centroids = Array.tabulate(k) { c =>
        if (counts(c) == 0) centroids(c)
        else normalize(sums(c).map(_.toFloat))
      }
    }
    centroids
  }

  /** Index of the centroid with the largest dot product. */
  @inline private[operators] def nearest(centroids: Array[Array[Float]], v: Array[Float]): Int = {
    var best = 0
    var bestDot = Double.MinValue
    var c = 0
    while (c < centroids.length) {
      var d = 0.0
      var i = 0
      val ctr = centroids(c)
      val n = math.min(ctr.length, v.length)
      while (i < n) { d += ctr(i).toDouble * v(i); i += 1 }
      if (d > bestDot) { bestDot = d; best = c }
      c += 1
    }
    best
  }

  /** Top-`p` centroid indices by dot product (descending). */
  private[operators] def probes(centroids: Array[Array[Float]], v: Array[Float], p: Int): Array[Int] = {
    val dots = centroids.indices.map { c =>
      var d = 0.0
      var i = 0
      val ctr = centroids(c)
      val n = math.min(ctr.length, v.length)
      while (i < n) { d += ctr(i).toDouble * v(i); i += 1 }
      c -> d
    }
    dots.sortBy(-_._2).take(p).map(_._1).toArray
  }

  /** IVF cosine top-k: (id, neighbor_id, cosine, rank). Index side lives under
    * its single nearest centroid; the query side probes `nProbe` centroids.
    */
  def ivfTopK(
      emb: DataFrame,
      idCol: String,
      vecCol: String,
      k: Int,
      nClusters: Int = 16,
      nProbe: Int = 4,
      sampleSize: Int = 2048,
      iters: Int = 8): DataFrame = {
    require(nProbe >= 1 && nProbe <= nClusters, s"nProbe $nProbe out of [1, $nClusters]")
    val spark = emb.sparkSession
    // deterministic sample: smallest ids (at lake scale: a seeded fraction
    // sample; determinism is what matters for reproducible indexes). Null
    // vectors are corrupt rows and are excluded here and in both
    // mapPartitions below — the same exclusion contract as Ann's kernels.
    val rawSample = emb.select(col(vecCol)).orderBy(col(idCol)).limit(sampleSize)
      .collect().map(_.getSeq[Float](0)).collect { case s if s != null => s.toArray }
    if (rawSample.isEmpty) {
      // empty corpus -> empty result, like every other ANN operator here
      return emb.select(
        col(idCol).as("id"), col(idCol).as("neighbor_id"),
        lit(0.0).as("cosine"), lit(0L).as("rank")).limit(0)
    }
    // reference dimension = the majority length in the sample, so a single
    // corrupt (mismatched) vector cannot silently disqualify the whole
    // well-formed corpus; ties break toward the smaller dimension
    val dim = Ann.majorityDim(rawSample.iterator.map(_.length))
    val sample = rawSample.filter(_.length == dim)
    val centroids = trainCentroids(sample, nClusters, iters)
    val bc = spark.sparkContext.broadcast(centroids)

    val idIdx = emb.schema.fieldIndex(idCol)
    val vecIdx = emb.schema.fieldIndex(vecCol)
    def enc(schema: StructType): ExpressionEncoder[Row] =
      ExpressionEncoder(RowEncoder.encoderFor(schema))

    // dimension-mismatched (corrupt) vectors are excluded up front instead of
    // being silently scored on a prefix — same must-surface policy as
    // CosineSimilarity's null-on-mismatch
    val indexSchema = StructType(Seq(
      StructField("neighbor_id", LongType), StructField("__c", IntegerType)))
    val indexed = emb.mapPartitions { it =>
      val ctrs = bc.value
      it.flatMap { r =>
        val s = r.getSeq[Float](vecIdx)
        if (s == null || s.length != dim) Iterator.empty
        else Iterator.single(Row(r.getLong(idIdx), nearest(ctrs, s.toArray)))
      }
    }(enc(indexSchema))

    val querySchema = StructType(Seq(
      StructField("id", LongType), StructField("__c", IntegerType)))
    val queries = emb.mapPartitions { it =>
      val ctrs = bc.value
      it.flatMap { r =>
        val s = r.getSeq[Float](vecIdx)
        if (s == null || s.length != dim) Iterator.empty
        else probes(ctrs, s.toArray, nProbe).iterator.map(c => Row(r.getLong(idIdx), c))
      }
    }(enc(querySchema))

    val cand = queries.join(indexed, Seq("__c"))
      .filter(col("id") =!= col("neighbor_id"))
      .select("id", "neighbor_id")
      .distinct()
    val va = emb.select(col(idCol).as("id"), col(vecCol).as("__va"))
    val vb = emb.select(col(idCol).as("neighbor_id"), col(vecCol).as("__vb"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("id").orderBy(col("cosine").desc, col("neighbor_id").asc)
    cand.join(va, Seq("id")).join(vb, Seq("neighbor_id"))
      .withColumn("cosine", graft.functions.VectorExpressions.vec_cosine(col("__va"), col("__vb")))
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select("id", "neighbor_id", "cosine", "rank")
  }
}
