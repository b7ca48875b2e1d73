package graft

import graft.operators.RetrievalEval

class RetrievalEvalSpec extends SparkSpec {
  import spark.implicits._

  test("rrfFuse: hand-computed fusion, missing-from-one-system terms, validation") {
    val a = Seq((1L, 10L, 1L), (1L, 20L, 2L)).toDF("id", "neighbor_id", "rank")
    val b = Seq((1L, 20L, 1L), (1L, 30L, 2L)).toDF("id", "neighbor_id", "rank")
    val out = RetrievalEval.rrfFuse(Seq(a, b), Seq("ra", "rb"), topK = 3)
      .collect().sortBy(_.getLong(1))
      .map(r => (r.getLong(1), r.getLong(2), r.getDouble(3)))
    // 20 in both (1/62 + 1/61), 10 only in a (1/61), 30 only in b (1/62)
    assert(out.toSeq === Seq(
      (1L, 20L, 1.0 / 62 + 1.0 / 61),
      (2L, 10L, 1.0 / 61),
      (3L, 30L, 1.0 / 62)))
    // topK truncates by (rrf desc, neighbor asc)
    assert(RetrievalEval.rrfFuse(Seq(a, b), Seq("ra", "rb"), topK = 1)
      .collect().map(_.getLong(2)).toSeq === Seq(20L))
    intercept[IllegalArgumentException](
      RetrievalEval.rrfFuse(Seq(a, b), Seq("ra"), topK = 1))
    intercept[IllegalArgumentException](
      RetrievalEval.rrfFuse(Seq(a, b), Seq("x", "x"), topK = 1))
    intercept[IllegalArgumentException](
      RetrievalEval.rrfFuse(Seq(a), Seq("ra"), topK = 0))
  }

  test("metrics: hand-computed recall/MRR/nDCG, zero-hit and empty-system queries") {
    val truth = Seq(
      (1L, 100L, 1L), (1L, 101L, 2L), (1L, 102L, 3L),
      (2L, 200L, 1L),
      (3L, 300L, 1L)).toDF("query_id", "neighbor_id", "truth_rank")
    val sys = Seq(
      // q1: hits at sys ranks 1 and 3, miss at 2
      (1L, 100L, 1L), (1L, 999L, 2L), (1L, 102L, 3L),
      // q2: no overlap at all
      (2L, 998L, 1L)).toDF("query_id", "neighbor_id", "sys_rank")
      // q3: retriever returned nothing — still reported, zeros
    val m = RetrievalEval.metrics(sys, "sys_rank", truth, "truth_rank")
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getDouble(3), r.getDouble(4),
          r.getDouble(5)))).toMap
    val d = RetrievalEval.ndcgDiscounts
    val idcg3 = RetrievalEval.ndcgIdcgPrefix(2)
    assert(m(1L) === ((3L, 2L, 2.0 / 3.0, 1.0, (d(0) + d(2)) / idcg3)))
    assert(m(2L) === ((1L, 0L, 0.0, 0.0, 0.0)))
    assert(m(3L) === ((1L, 0L, 0.0, 0.0, 0.0)))
  }

  test("ndcg literal tables match their definition within an ulp and are fold-ordered") {
    val d = RetrievalEval.ndcgDiscounts
    (1 to 10).foreach { i =>
      assert(math.abs(d(i - 1) - 1.0 / (math.log(i + 1.0) / math.log(2.0))) < 1e-15,
        s"discount $i drifted from 1/log2(i+1)")
    }
    // prefix sums are the SEQUENTIAL fold of the discounts (bit-exact)
    assert(RetrievalEval.ndcgIdcgPrefix.toSeq ===
      d.scanLeft(0.0)(_ + _).tail.toSeq)
  }
}
