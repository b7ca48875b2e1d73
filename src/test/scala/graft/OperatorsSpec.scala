package graft

import org.apache.spark.sql.functions._

import graft.operators.{AsOfJoin, OrderedAnalytics}

/** Edge-case specs for the generic ordered-analytics operators (ADVICE round-2
  * regression items included). */
class OperatorsSpec extends SparkSpec {

  import spark.implicits._

  test("trailingStreak: streak-0 keys are reported, not dropped") {
    val df = Seq(
      ("a", 1, "miss"), ("a", 2, "miss"), ("a", 3, "hit"), // newest row breaks -> 0
      ("b", 1, "hit"), ("b", 2, "miss"), ("b", 3, "miss"), // -> 2
      ("c", 1, "miss"), ("c", 2, "miss")                   // never breaks -> 2
    ).toDF("k", "ord", "ev")
    val out = OrderedAnalytics
      .trailingStreak(df, Seq("k"), "ord", col("ev") === "hit")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(out === Map("a" -> 0L, "b" -> 2L, "c" -> 2L))
  }

  test("trailingStreak: empty input yields empty output") {
    val df = Seq.empty[(String, Int, String)].toDF("k", "ord", "ev")
    assert(OrderedAnalytics.trailingStreak(df, Seq("k"), "ord", col("ev") === "hit").count() === 0)
  }

  test("sessionize: gap splits sessions, boundary gap does not") {
    val df = Seq(
      ("u", 0L), ("u", 500L), ("u", 1500L), // gap 1000 == gapMillis -> same session
      ("u", 2501L),                          // gap 1001 > gap -> new session
      ("v", 10L)
    ).toDF("k", "ts")
    val out = OrderedAnalytics.sessionize(df, Seq("k"), "ts", "ts", gapMillis = 1000L)
      .select("k", "ts", "session_id")
      .collect().map(r => (r.getString(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(out === Map(
      ("u", 0L) -> 1L, ("u", 500L) -> 1L, ("u", 1500L) -> 1L,
      ("u", 2501L) -> 2L, ("v", 10L) -> 1L))
  }

  test("asOfJoin: inclusive bound, latest right wins, no-match yields null") {
    val left = Seq(("u", 10L, "p1"), ("u", 20L, "p2"), ("w", 5L, "p3"))
      .toDF("k", "ord", "tag")
    val right = Seq(("u", 5L, 1.0), ("u", 10L, 2.0), ("u", 15L, 3.0))
      .toDF("k", "ord", "v")
    val out = AsOfJoin.lastValueAsOf(left, right, Seq("k"), "ord", Seq("v"))
      .collect().map(r => r.getString(2) -> Option(r.get(3))).toMap
    // p1 at ord 10: right ord 10 (inclusive) -> 2.0; p2 at 20 -> 15 -> 3.0; p3: none
    assert(out === Map("p1" -> Some(2.0), "p2" -> Some(3.0), "p3" -> None))
  }

  test("asOfJoin: rejects value columns colliding with left") {
    val l = Seq(("u", 1L, 9.9)).toDF("k", "ord", "v")
    val r = Seq(("u", 1L, 1.0)).toDF("k", "ord", "v")
    val e = intercept[IllegalArgumentException] {
      AsOfJoin.lastValueAsOf(l, r, Seq("k"), "ord", Seq("v"))
    }
    assert(e.getMessage.contains("collide"))
  }
}
