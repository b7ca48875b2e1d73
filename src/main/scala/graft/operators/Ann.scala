package graft.operators

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.{VectorExpressions => V}

/** Approximate-nearest-neighbor search over an embedding column
  * (`array<float>`): brute-force cosine top-k as the exact baseline, and a
  * multi-table hyperplane-LSH variant as the scale path.
  *
  * Scale notes: brute force is O(n²·d) — correct, and fine up to ~10⁵ vectors,
  * but it is the *recall oracle*, not the production path. The LSH variant's
  * only shuffles are the bucket self-join (keyed on (table, bucket)) and the
  * candidate distinct; expected bucket width is n / 2^nBits per table, so cost
  * is O(n · width · d). Tune nBits up as n grows to hold width constant;
  * raise `tables` to buy recall with linearly more candidates.
  */
object Ann {

  private def topK(scored: DataFrame, k: Int): DataFrame = {
    val w = Window.partitionBy("id").orderBy(col("cosine").desc, col("neighbor_id").asc)
    scored
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select("id", "neighbor_id", "cosine", "rank")
  }

  /** Exact cosine top-k per vector: (id, neighbor_id, cosine, rank). */
  def bruteForceTopK(emb: DataFrame, idCol: String, vecCol: String, k: Int): DataFrame = {
    val a = emb.select(col(idCol).as("id"), col(vecCol).as("__va"))
    val b = emb.select(col(idCol).as("neighbor_id"), col(vecCol).as("__vb"))
    topK(
      a.join(b, col("id") =!= col("neighbor_id"))
        .withColumn("cosine", V.vec_cosine(col("__va"), col("__vb"))),
      k)
  }

  /** Exact cosine top-k via a broadcast index matrix: the corpus (id, vector)
    * is collected and broadcast, and each partition scans its queries against
    * it with a bounded top-k selection — no join, no shuffle, no O(n²) row
    * materialization. Identical output to [[bruteForceTopK]] (same double
    * arithmetic, same (cosine desc, id asc) tie-break; proven by an identity
    * spec). This is the standard distributed exact-kNN shape: it holds as
    * long as the INDEX side fits in executor memory (ids + d floats per
    * vector) — the inherent bound of exact brute force; past it, use
    * [[lshTopK]]/[[Ivf.ivfTopK]].
    */
  def bruteForceTopKBroadcast(
      emb: DataFrame, idCol: String, vecCol: String, k: Int): DataFrame = {
    val spark = emb.sparkSession
    val collected = emb.select(col(idCol), col(vecCol)).orderBy(col(idCol))
      .collect().map(r => (r.getLong(0), r.getSeq[Float](1).toArray))
    val bc = spark.sparkContext.broadcast(collected)
    val idIdx = emb.schema.fieldIndex(idCol)
    val vecIdx = emb.schema.fieldIndex(vecCol)
    val outSchema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("id", org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("neighbor_id", org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("cosine", org.apache.spark.sql.types.DoubleType),
      org.apache.spark.sql.types.StructField("rank", org.apache.spark.sql.types.LongType)))
    val enc = org.apache.spark.sql.catalyst.encoders.ExpressionEncoder(
      org.apache.spark.sql.catalyst.encoders.RowEncoder.encoderFor(outSchema))
    emb.mapPartitions { it =>
      val index = bc.value
      it.flatMap { r =>
        val qid = r.getLong(idIdx)
        val q = r.getSeq[Float](vecIdx).toArray
        var qn = 0.0
        var i = 0
        while (i < q.length) { qn += q(i).toDouble * q(i); i += 1 }
        val qNorm = math.sqrt(qn)
        // bounded selection: keep the k best (cosine desc, id asc)
        val best = new java.util.TreeSet[(Double, Long)](
          Ordering.Tuple2(Ordering[Double].reverse, Ordering[Long]))
        var j = 0
        while (j < index.length) {
          val (nid, v) = index(j)
          if (nid != qid && v.length == q.length) {
            var dot = 0.0; var vn = 0.0
            var x = 0
            while (x < v.length) {
              dot += q(x).toDouble * v(x); vn += v(x).toDouble * v(x); x += 1
            }
            val cos = if (qNorm == 0.0 || vn == 0.0) 0.0 else dot / (qNorm * math.sqrt(vn))
            best.add((cos, nid))
            if (best.size > k) best.remove(best.last)
          }
          j += 1
        }
        val out = scala.collection.mutable.ArrayBuffer.empty[Row]
        val iter = best.iterator()
        var rank = 1L
        while (iter.hasNext) {
          val (cos, nid) = iter.next()
          out += Row(qid, nid, cos, rank)
          rank += 1
        }
        out.iterator
      }
    }(enc)
  }

  /** All pairs with cosine >= `threshold` — the exact near-duplicate pair
    * scan, O(n²·d): the recall oracle for threshold dedup, not the production
    * path. At scale, run [[lshTopK]]-style bucketing first and apply the
    * threshold to candidates. */
  def cosinePairsAbove(
      emb: DataFrame, idCol: String, vecCol: String, threshold: Double): DataFrame = {
    val a = emb.select(col(idCol).as("id_a"), col(vecCol).as("__va"))
    val b = emb.select(col(idCol).as("id_b"), col(vecCol).as("__vb"))
    a.join(b, col("id_a") < col("id_b"))
      .withColumn("cosine", V.vec_cosine(col("__va"), col("__vb")))
      .filter(col("cosine") >= threshold)
      .select("id_a", "id_b", "cosine")
  }

  /** LSH-bucketed cosine top-k: candidates are pairs sharing a bucket in at
    * least one of `tables` independent hyperplane families; each candidate is
    * scored once (distinct before the vector rejoin).
    */
  def lshTopK(
      emb: DataFrame,
      idCol: String,
      vecCol: String,
      k: Int,
      nBits: Int = 12,
      tables: Int = 2): DataFrame = {
    require(tables >= 1, s"tables must be >= 1 (got $tables)")
    val withB = emb.select(
      col(idCol).as("id"),
      explode(array((0 until tables).map(s =>
        struct(lit(s).as("t"), V.lsh_bucket(col(vecCol), nBits, s.toLong).as("b"))): _*))
        .as("__tb"))
    val cand = withB
      .join(withB.select(col("id").as("neighbor_id"), col("__tb")), Seq("__tb"))
      .filter(col("id") =!= col("neighbor_id"))
      .select("id", "neighbor_id")
      .distinct()
    val va = emb.select(col(idCol).as("id"), col(vecCol).as("__va"))
    val vb = emb.select(col(idCol).as("neighbor_id"), col(vecCol).as("__vb"))
    topK(
      cand.join(va, Seq("id")).join(vb, Seq("neighbor_id"))
        .withColumn("cosine", V.vec_cosine(col("__va"), col("__vb"))),
      k)
  }
}
