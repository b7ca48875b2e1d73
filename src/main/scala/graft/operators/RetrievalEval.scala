package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Retrieval-quality primitives: RECIPROCAL RANK FUSION (Cormack et al.
  * SIGIR'09) and the standard ranked-retrieval EVALUATION METRICS
  * (recall@k, MRR, binary nDCG@k) — the measurement loop every retrieval /
  * embedding-compression / index-tuning decision runs. Both are pure
  * rank-frame algebra over k-bounded inputs (a rank frame is
  * (id, neighbor_id, rank) with rank 1-based within id), so they compose
  * with ANY retriever — the exact kernels, LSH/IVF, BM25 — and cost
  * nothing beyond keyed joins on frames whose size is queries×k, never
  * corpus-sized.
  *
  * Determinism contract: every emitted float is either one exact IEEE
  * division of small integers (rrf terms, recall, MRR) or a fixed-order
  * fold of the [[ndcgDiscounts]] LITERALS (DCG) — no transcendental call
  * anywhere (log2 is libm-dependent across engines; the literal table is
  * not), so results are bit-stable across engines and partitionings with
  * NO rounding.
  */
object RetrievalEval {

  /** 1/log2(i+1) for i = 1..10, as parsed-decimal literals (identical
    * correctly-rounded doubles on any IEEE engine). */
  val ndcgDiscounts: Array[Double] = Array(
    1.0, 0.6309297535714575, 0.5, 0.43067655807339306, 0.38685280723454163,
    0.3562071871080222, 0.3333333333333333, 0.31546487678572877,
    0.3010299956639812, 0.2890648263178879)

  /** Running prefix sums of [[ndcgDiscounts]] (sequential fold order) —
    * IDCG for n relevant results, n ≤ 10. */
  val ndcgIdcgPrefix: Array[Double] = Array(
    1.0, 1.6309297535714575, 2.1309297535714578, 2.5616063116448506,
    2.9484591188793923, 3.3046663059874146, 3.637999639320748,
    3.953464516106477, 4.254494511770458, 4.543559338088346)

  /** Reciprocal rank fusion of N rank frames — each (id, neighbor_id,
    * rank): rrf = Σ over frames of 1/(k0 + rank), candidates missing from
    * a frame contribute nothing for it. Returns (id, fused_rank,
    * neighbor_id, rrf) plus one nullable `rankCols(i)` column per input
    * frame, top `topK` per id by (rrf desc, neighbor_id) — a total order.
    * The rrf sum folds the frames' terms in argument order (addition of
    * two equal-bit operands is commutative, so same-term-set ties agree
    * across engines regardless of which frame contributed which term). */
  def rrfFuse(
      rankings: Seq[DataFrame],
      rankCols: Seq[String],
      topK: Int,
      k0: Int = 60): DataFrame = {
    require(rankings.nonEmpty && rankings.size == rankCols.size,
      s"need one rank-column name per ranking " +
        s"(got ${rankings.size} rankings, ${rankCols.size} names)")
    require(rankCols.distinct.size == rankCols.size,
      s"rank-column names must be distinct (got $rankCols)")
    require(topK >= 1, s"topK must be >= 1 (got $topK)")
    require(k0 >= 1, s"k0 must be >= 1 (got $k0)")
    val named = rankings.zip(rankCols).map { case (df, c) =>
      df.select(col("id"), col("neighbor_id"), col("rank").as(c))
    }
    val joined = named.reduce(
      _.join(_, Seq("id", "neighbor_id"), "full_outer"))
    val rrf = rankCols
      .map(c => coalesce(lit(1.0) / (lit(k0) + col(c)), lit(0.0)))
      .reduce(_ + _)
    joined
      .withColumn("rrf", rrf)
      .withColumn("fused_rank", row_number().over(
        Window.partitionBy("id").orderBy(col("rrf").desc, col("neighbor_id")))
        .cast("long"))
      .filter(col("fused_rank") <= topK)
      .select(col("id") +: col("fused_rank") +: col("neighbor_id") +:
        col("rrf") +: rankCols.map(col): _*)
  }

  /** Ranked-retrieval metrics of a system ranking against a ground-truth
    * ranking, both (query_id, neighbor_id, <rank>) truncated to the SAME
    * k ≤ 10 (binary relevance: a system result is relevant iff it appears
    * in the truth frame). Per query: n_truth, n_rel, recall = n_rel /
    * n_truth, MRR = 1/rank of the first relevant system result (0 if
    * none), nDCG = Σ disc[sys_rank] over hits (ascending-rank fold of the
    * literal table) / idcg[n_truth]. TRUTH DEFINES THE QUERY UNIVERSE:
    * queries absent from `sys` (retriever returned nothing) are still
    * reported — zeros, not silence — while a sys-only query (no ground
    * truth exists) has no defined metric and is excluded; filter the sys
    * frame first if that case should be an error. */
  def metrics(
      sys: DataFrame,
      sysRankCol: String,
      truth: DataFrame,
      truthRankCol: String): DataFrame = {
    val s = sys.select(col("query_id"), col("neighbor_id"),
      col(sysRankCol).as("__sr"))
    val t = truth.select(col("query_id"), col("neighbor_id"),
      col(truthRankCol).as("__tr"))
    val nTruth = t.groupBy("query_id").agg(count(lit(1)).as("n_truth"))
    val perQ = s.join(t, Seq("query_id", "neighbor_id"), "left_outer")
      .groupBy("query_id")
      .agg(
        count(col("__tr")).as("n_rel"),
        min(when(col("__tr").isNotNull, col("__sr"))).as("__first"),
        // DCG: discount literals folded in ascending system-rank order —
        // collect_list drops non-relevant nulls, array_sort pins the
        // order, the fold is sequential (empty → the 0.0 seed)
        aggregate(
          array_sort(collect_list(when(col("__tr").isNotNull,
            struct(col("__sr"),
              element_at(lit(ndcgDiscounts), col("__sr").cast("int"))
                .as("__d"))))),
          lit(0.0), (acc, x) => acc + x.getField("__d")).as("__dcg"))
    nTruth.join(perQ, Seq("query_id"), "left_outer")
      .select(
        col("query_id"), col("n_truth"),
        coalesce(col("n_rel"), lit(0L)).as("n_rel"),
        (coalesce(col("n_rel"), lit(0L)).cast("double") /
          col("n_truth").cast("double")).as("recall"),
        when(col("__first").isNotNull, lit(1.0) / col("__first"))
          .otherwise(lit(0.0)).as("mrr"),
        (coalesce(col("__dcg"), lit(0.0)) /
          element_at(lit(ndcgIdcgPrefix), col("n_truth").cast("int")))
          .as("ndcg"))
  }
}
