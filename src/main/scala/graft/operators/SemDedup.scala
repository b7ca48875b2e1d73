package graft.operators

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.catalyst.encoders.{ExpressionEncoder, RowEncoder}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** SemDeDup — semantic deduplication over an embedding column (Abbas et al.
  * 2023, "SemDeDup: Data-efficient learning at web-scale through semantic
  * deduplication"): cluster the corpus with the coarse k-means quantizer,
  * form candidate pairs ONLY within a cluster, keep each ≥-threshold
  * connected group's smallest id. The scale path for embedding near-dup
  * removal — q27's exact pair scan touches all O(n²) pairs, this touches
  * O(Σ cluster²) ≈ O(n²/k), the SemDeDup trade: recall is bounded by the
  * quantizer (a true pair straddling two clusters is missed; the paper
  * accepts this, it is what makes web scale feasible).
  * (Engine-addition family — the reference has no embedding surface.)
  *
  * Composition of proven kernels: [[Ivf]]'s deterministic distributed
  * k-means (no data collect — only bounded per-partition partials and k
  * seed rows reach the driver) + a cluster-keyed equi-join pair scan (the
  * same join-on-bucket skeleton as LSH banding — never a cartesian) +
  * [[Dedup.connectedComponentsLogRoundsStrict]] (bounded star rounds).
  * Deterministic end-to-end: hash-gated sample, fixed-order centroid
  * combine, exact cosine gate, min-id canonical pick.
  *
  * Output: one row per valid-vector document — (id, canonical_id, keep)
  * with keep = (canonical_id == id); a singleton (no ≥-threshold neighbor
  * in its cluster) keeps itself. Rows with NULL / dimension-mismatched
  * vectors are excluded (the must-surface policy of the ANN kernels:
  * score nothing you cannot score correctly).
  */
object SemDedup {

  def assign(
      emb: DataFrame,
      idCol: String,
      vecCol: String,
      threshold: Double,
      nClusters: Int = 16,
      sampleSize: Int = 2048,
      iters: Int = 8): DataFrame = {
    require(threshold > 0.0 && threshold <= 1.0,
      s"threshold must be in (0, 1] (got $threshold)")
    val spark = emb.sparkSession
    import spark.implicits._
    val (dim, n) = Ann.majorityDimAndCountOf(emb, vecCol).getOrElse(
      return emb.select(
        col(idCol).cast("long").as("id"), col(idCol).cast("long").as("canonical_id"),
        lit(true).as("keep")).limit(0))
    val validVecs = emb
      .select(col(idCol).cast("long").as("_1"), col(vecCol).as("_2"))
      .filter(col("_2").isNotNull && size(col("_2")) === dim)
    // deterministic distributed sample + seeds + training — the Ivf recipe
    val trainPartitions = 16
    def mkSample(rate: Long) = validVecs
      .filter(pmod(xxhash64(col("_1")), lit(rate)) === 0)
      .repartition(trainPartitions, col("_1"))
      .sortWithinPartitions("_1")
      .as[(Long, Seq[Float])]
    val rate = math.max(1L, n / math.max(1, sampleSize))
    var sample = mkSample(rate).persist()
    def seedsOf(s: org.apache.spark.sql.Dataset[(Long, Seq[Float])]) =
      s.toDF("__id", "__v").orderBy(xxhash64(col("__id")), col("__id")).limit(nClusters)
        .collect().map(r => Ivf.normalize(r.getSeq[Float](1).toArray))
    var seeds = seedsOf(sample)
    if (seeds.isEmpty && rate > 1) {
      sample.unpersist()
      sample = mkSample(1).persist()
      seeds = seedsOf(sample)
    }
    val centroids = Ivf.trainCentroidsDistributed(sample, seeds, dim, iters)
    sample.unpersist()
    val bc = spark.sparkContext.broadcast(centroids)

    val idIdx = emb.schema.fieldIndex(idCol)
    val vecIdx = emb.schema.fieldIndex(vecCol)
    val assignedSchema = StructType(Seq(
      StructField("id", LongType), StructField("__c", IntegerType)))
    val assigned = emb.mapPartitions { it =>
      val ctrs = bc.value
      it.flatMap { r =>
        val s = r.getSeq[Float](vecIdx)
        if (s == null || s.length != dim) Iterator.empty
        else Iterator.single(Row(r.getLong(idIdx), Ivf.nearest(ctrs, s.toArray)))
      }
    }(ExpressionEncoder(RowEncoder.encoderFor(assignedSchema)))

    // within-cluster candidate pairs: a cluster-keyed equi-join (id_a < id_b
    // halves the pairs), exact cosine gate on the rejoined vectors — the
    // quadratic term is per-CLUSTER, the SemDeDup design point
    val va = emb.select(col(idCol).cast("long").as("id_a"), col(vecCol).as("__va"))
    val vb = emb.select(col(idCol).cast("long").as("id_b"), col(vecCol).as("__vb"))
    val pairs = assigned.select(col("__c"), col("id").as("id_a"))
      .join(assigned.select(col("__c"), col("id").as("id_b")), Seq("__c"))
      .filter(col("id_a") < col("id_b"))
      .select("id_a", "id_b")
      .join(va, Seq("id_a")).join(vb, Seq("id_b"))
      .filter(graft.functions.VectorExpressions.vec_cosine(
        col("__va"), col("__vb")) >= threshold)
      .select("id_a", "id_b")
    val comp = Dedup.connectedComponentsLogRoundsStrict(pairs)
    assigned.select("id")
      .join(comp, Seq("id"), "left")
      .select(
        col("id"),
        coalesce(col("comp"), col("id")).as("canonical_id"))
      .withColumn("keep", col("canonical_id") === col("id"))
  }
}
