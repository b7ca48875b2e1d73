package graft

import graft.operators.Mmr

class MmrSpec extends SparkSpec {
  import spark.implicits._

  private def cand(rows: (Long, Long, Double, Array[Float])*) =
    rows.toSeq.toDF("query_id", "doc_id", "rel", "vec")

  test("mmr: diversification demotes the exact duplicate below the orthogonal doc") {
    // d2 duplicates d1's direction (cosine exactly 1); d3 is orthogonal
    // (cosine exactly 0). Pure relevance would rank d1, d2, d3 — MMR at
    // equal weights must pick the orthogonal d3 second.
    val out = Mmr.rerank(cand(
        (7L, 1L, 0.9, Array(1f, 0f)),
        (7L, 2L, 0.8, Array(2f, 0f)),
        (7L, 3L, 0.5, Array(0f, 1f))),
      k = 3, relWeight = 0.5, divWeight = 0.5)
      .collect().sortBy(_.getLong(1))
      .map(r => (r.getLong(1), r.getLong(2), r.getDouble(3),
        r.getDouble(4), r.getDouble(5)))
    assert(out.toSeq === Seq(
      (1L, 1L, 0.9, 0.0, 0.45),
      (2L, 3L, 0.5, 0.0, 0.25),
      (3L, 2L, 0.8, 1.0, 0.5 * 0.8 - 0.5 * 1.0)))
  }

  test("mmr: negative similarity is a signed penalty (a bonus), never floored at 0") {
    // d4 points AWAY from d1 (cosine exactly -1): its diversity term must
    // stay -1 — the anti-parallel doc gets a positive boost, exactly like
    // the oracle's max() over signed sims
    val out = Mmr.rerank(cand(
        (1L, 1L, 0.9, Array(1f, 0f)),
        (1L, 4L, 0.1, Array(-1f, 0f))),
      k = 2, relWeight = 0.5, divWeight = 0.5)
      .collect().sortBy(_.getLong(1))
      .map(r => (r.getLong(1), r.getLong(2), r.getDouble(4), r.getDouble(5)))
    assert(out.toSeq === Seq(
      (1L, 1L, 0.0, 0.45),
      (2L, 4L, -1.0, 0.5 * 0.1 - 0.5 * -1.0)))
  }

  test("mmr: k past the candidate count returns all; ties break by doc_id; k=0 rejected") {
    // identical rel and vectors: every step ties — doc_id must win
    val tied = Mmr.rerank(cand(
        (1L, 30L, 0.5, Array(1f, 0f)),
        (1L, 10L, 0.5, Array(1f, 0f)),
        (1L, 20L, 0.5, Array(1f, 0f))),
      k = 9, relWeight = 0.7, divWeight = 0.3)
      .collect().sortBy(_.getLong(1)).map(_.getLong(2))
    assert(tied.toSeq === Seq(10L, 20L, 30L))
    intercept[IllegalArgumentException](
      Mmr.rerank(cand((1L, 1L, 0.5, Array(1f))), k = 0,
        relWeight = 0.7, divWeight = 0.3))
  }
}
