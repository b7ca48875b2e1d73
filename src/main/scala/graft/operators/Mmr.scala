package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** MAXIMAL MARGINAL RELEVANCE re-ranking (Carbonell & Goldstein SIGIR'98) —
  * greedy diversity-aware top-k selection: each step picks the candidate
  * maximizing `relWeight·rel − divWeight·max_sim_to_already_selected`, so
  * the result trades query relevance against redundancy — the standard
  * answer to "my top-10 neighbors are 10 copies of the same document" in
  * RAG candidate selection, eval-set mining, and few-shot example picking
  * (where near-duplicate context slots waste tokens).
  *
  * Scale shape: MMR is inherently sequential PER QUERY but embarrassingly
  * parallel ACROSS queries, and it only ever sees the candidate lists a
  * first-stage retriever already produced — frames of queries×k rows,
  * never corpus-sized. One keyed shuffle groups each query's ≤ n
  * candidates; the greedy loop is O(k·n) cosines over vectors already in
  * memory. This is the q163 stage-2 posture: rerank cost independent of
  * corpus size.
  *
  * Determinism contract: every similarity is quantized by the explicit
  * `floor(x·1e6 + 0.5)/1e6` form — the SAME IEEE multiply/add/floor/divide
  * sequence any engine replays bit-identically (library `round()` halves
  * semantics never enter) — and each step's score is built from those
  * quantized operands with literal weights, so the greedy argmax (score
  * desc, doc_id asc — a total order) selects identically everywhere. The
  * q181 oracle replays the full greedy unrolled step-by-step in SQL. */
object Mmr {

  /** The shared quantizer: floor(x·1e6 + 0.5)/1e6 — written out so the SQL
    * oracle can state the identical ops. NaN maps to 0 FIRST (the q21
    * zero-norm policy). */
  private[graft] def q6(x: Double): Double = {
    val v = if (x.isNaN) 0.0 else x
    math.floor(v * 1000000.0 + 0.5) / 1000000.0
  }

  private[graft] def cosine(a: Array[Float], b: Array[Float]): Double = {
    val n = math.min(a.length, b.length)
    var dot = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    while (i < n) {
      val x = a(i).toDouble; val y = b(i).toDouble
      dot += x * y; na += x * x; nb += y * y
      i += 1
    }
    dot / (math.sqrt(na) * math.sqrt(nb))
  }

  /** Greedy MMR over per-query candidate lists.
    *
    * `candidates`: (query_id: long, doc_id: long, rel: double — the
    * first-stage relevance, already quantized by the caller's 6dp policy,
    * vec: array<float> — the candidate's embedding), ONE ROW per
    * (query_id, doc_id) — a duplicated candidate would be selected twice
    * (first-stage top-k output is distinct by construction; dedupe first
    * if composing anything that is not). Returns (query_id,
    * mmr_rank 1-based, doc_id, rel, max_sim — the candidate's highest
    * similarity to the PREVIOUSLY selected set at pick time (0 for the
    * first pick), mmr — the winning score), min(k, n) rows per query. */
  def rerank(
      candidates: DataFrame,
      k: Int,
      relWeight: Double,
      divWeight: Double): DataFrame = {
    require(k >= 1, s"k must be >= 1 (got $k)")
    val s = candidates.sparkSession
    import s.implicits._
    candidates
      .select(col("query_id").cast("long"), col("doc_id").cast("long"),
        col("rel").cast("double"), col("vec"))
      .as[(Long, Long, Double, Array[Float])]
      .groupByKey(_._1)
      .flatMapGroups { (qid, it) =>
        val arr = it.toArray
        val n = arr.length
        // running max sim to the selected set — genuinely signed (an
        // all-negative neighborhood must keep its negative max, exactly
        // like the oracle's max()); -inf marks "no selected yet", which
        // only survives until the first pick, where the penalty is 0
        val maxSim = Array.fill(n)(Double.NegativeInfinity)
        val chosen = new Array[Boolean](n)
        val out = Vector.newBuilder[(Long, Long, Long, Double, Double, Double)]
        var r = 1
        val kk = math.min(k, n)
        while (r <= kk) {
          var best = -1
          var bestScore = 0.0
          var bestSim = 0.0
          var i = 0
          while (i < n) {
            if (!chosen(i)) {
              val m = if (r == 1) 0.0 else maxSim(i)
              val sc = relWeight * arr(i)._3 - divWeight * m
              if (best == -1 || sc > bestScore ||
                (sc == bestScore && arr(i)._2 < arr(best)._2)) {
                best = i; bestScore = sc; bestSim = m
              }
            }
            i += 1
          }
          chosen(best) = true
          out += ((qid, r.toLong, arr(best)._2, arr(best)._3,
            bestSim, bestScore))
          // fold the new pick into every survivor's diversity penalty
          i = 0
          while (i < n) {
            if (!chosen(i)) {
              val s6 = q6(cosine(arr(i)._4, arr(best)._4))
              if (s6 > maxSim(i)) maxSim(i) = s6
            }
            i += 1
          }
          r += 1
        }
        out.result().iterator
      }
      .toDF("query_id", "mmr_rank", "doc_id", "rel", "max_sim", "mmr")
  }
}
