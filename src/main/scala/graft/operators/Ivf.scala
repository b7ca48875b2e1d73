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
  * Scale shape: training is DISTRIBUTED k-means over a deterministic
  * hash-gated sample (per-partition partial sums, fixed-order driver
  * combine of bounded partials — no data collect), then two narrow
  * mapPartitions (assignment, no shuffle) and the candidate equi-join on
  * centroid id — the same join-on-bucket skeleton as LSH, so expected cost is
  * O(n · nProbe/nClusters · n · d). Centroid ids are low-cardinality shuffle
  * keys; AQE's skew handling covers hot clusters.
  */
object Ivf {

  private[operators] def normalize(v: Array[Float]): Array[Float] = {
    var s = 0.0
    var i = 0
    while (i < v.length) { s += v(i).toDouble * v(i); i += 1 }
    val n = math.sqrt(s)
    if (n == 0.0) v else v.map(x => (x / n).toFloat)
  }

  /** DISTRIBUTED spherical k-means: each iteration computes per-partition
    * partial sums in one narrow mapPartitions pass over the (cached) training
    * frame, collects only `partitions × k` partial (sum, count) pairs, and
    * combines them on the driver IN PARTITION-INDEX ORDER — double addition
    * is not associative, so a scheduling-order reduce (treeAggregate) would
    * make the quantizer nondeterministic run-to-run; the fixed-order combine
    * plus sorted-within-partition input keeps centroids bit-reproducible.
    * No training DATA ever reaches the driver — only the bounded partials
    * (trainPartitions × k × dim doubles).
    */
  private[operators] def trainCentroidsDistributed(
      sample: org.apache.spark.sql.Dataset[(Long, Seq[Float])],
      seeds: Array[Array[Float]],
      dim: Int,
      iters: Int): Array[Array[Float]] = {
    require(seeds.nonEmpty, "empty seed set")
    val sc = sample.sparkSession.sparkContext
    val k = seeds.length
    var centroids = seeds
    for (_ <- 1 to iters) {
      val bc = sc.broadcast(centroids)
      val partials = sample.rdd.mapPartitionsWithIndex { (pid, it) =>
        val ctrs = bc.value
        val sums = Array.fill(k)(new Array[Double](dim))
        val counts = new Array[Long](k)
        it.foreach { case (_, sv) =>
          val v = normalize(sv.toArray)
          val c = nearest(ctrs, v)
          counts(c) += 1
          var i = 0
          while (i < dim) { sums(c)(i) += v(i); i += 1 }
        }
        Iterator.single((pid, sums, counts))
      }.collect().sortBy(_._1)
      val sums = Array.fill(k)(new Array[Double](dim))
      val counts = new Array[Long](k)
      partials.foreach { case (_, ps, pc) =>
        var c = 0
        while (c < k) {
          counts(c) += pc(c)
          var i = 0
          while (i < dim) { sums(c)(i) += ps(c)(i); i += 1 }
          c += 1
        }
      }
      centroids = Array.tabulate(k) { c =>
        if (counts(c) == 0L) centroids(c)
        else normalize(sums(c).map(_.toFloat))
      }
      bc.destroy()
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
    import spark.implicits._
    // reference dimension = the corpus majority length, so a single corrupt
    // (mismatched) vector cannot silently disqualify the whole well-formed
    // corpus; None = no valid vectors at all -> empty result, like every
    // other ANN operator here
    val (dim, n) = Ann.majorityDimAndCountOf(emb, vecCol).getOrElse(
      return emb.select(
        col(idCol).as("id"), col(idCol).as("neighbor_id"),
        lit(0.0).as("cosine"), lit(0L).as("rank")).limit(0))
    val validVecs = emb
      .select(col(idCol).cast("long").as("_1"), col(vecCol).as("_2"))
      .filter(col("_2").isNotNull && size(col("_2")) === dim)
    // deterministic DISTRIBUTED sample of ~sampleSize rows: the gate is a
    // pure function of the id (hash-mod), so no data is collected and no
    // global sort happens — at lake scale the old orderBy(id).limit(n)
    // driver sample capped quantizer quality at whatever 2048 rows the
    // smallest ids happened to be. Partition count is fixed and rows are
    // sorted within partitions so the training pass is order-deterministic.
    // (n = the majority-dim row count, free with the dim aggregate above.)
    val trainPartitions = 16
    def mkSample(rate: Long) = validVecs
      .filter(pmod(xxhash64(col("_1")), lit(rate)) === 0)
      .repartition(trainPartitions, col("_1"))
      .sortWithinPartitions("_1")
      .as[(Long, Seq[Float])]
    val rate = math.max(1L, n / math.max(1, sampleSize))
    var sample = mkSample(rate).persist()
    // seeds: nClusters hash-spread sample vectors (a bounded k-row collect —
    // the only rows that ever reach the driver)
    def seedsOf(s: org.apache.spark.sql.Dataset[(Long, Seq[Float])]) =
      s.toDF("__id", "__v").orderBy(xxhash64(col("__id")), col("__id")).limit(nClusters)
        .collect().map(r => normalize(r.getSeq[Float](1).toArray))
    var seeds = seedsOf(sample)
    if (seeds.isEmpty && rate > 1) { // hash-gate missed everything (~P=e^-sampleSize)
      sample.unpersist()
      sample = mkSample(1).persist()
      seeds = seedsOf(sample)
    }
    val centroids = trainCentroidsDistributed(sample, seeds, dim, iters)
    sample.unpersist()
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
