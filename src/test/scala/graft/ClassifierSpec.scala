package graft

import org.apache.spark.sql.functions._

import graft.operators.Classifier
import graft.operators.Classifier.Link

/** [[graft.operators.Classifier]] — distributed full-batch logistic
  * regression: gradient math, convergence on a separable corpus, the
  * engine-exact determinism contract, and the guard rails. */
class ClassifierSpec extends SparkSpec {

  import spark.implicits._

  test("one GD step matches the hand-computed gradient exactly") {
    // two rows, one feature: x=1,y=1 and x=0,y=0; w0 = (0,0) ⇒ p = 0.5 both.
    // err = 0.5−1 = −0.5 and 0.5−0 = 0.5:
    //   g_bias = −0.5 + 0.5 = 0;  g_x = −0.5·1 + 0.5·0 = −0.5
    // w_bias = 0 − 0.5·(0/2) = 0;  w_x = 0 − 0.5·(−0.5/2) = 0.125
    val df = Seq((1.0, 1.0), (0.0, 0.0)).toDF("x", "y")
    val m = Classifier.train(df, Seq("x"), "y", iters = 1, lr = 0.5,
      link = Link.Softsign)
    assert(m.weights.toSeq === Seq(0.0, 0.125))
  }

  test("logistic link separates a planted corpus after enough steps") {
    // y = 1 iff x > 0; margin 1 around the boundary keeps it cleanly separable
    val rows = (0 until 200).map { i =>
      val y = i % 2
      val x = if (y == 1) 1.0 + (i % 7) * 0.25 else -1.0 - (i % 5) * 0.25
      (x, y.toDouble)
    }
    val df = rows.toDF("x", "y")
    val m = Classifier.train(df, Seq("x"), "y", iters = 60, lr = 1.0,
      link = Link.Logistic)
    assert(m.weights(1) > 0.0, "feature weight must align with the label")
    val acc = df.select(
        avg((((m.score(Seq(col("x"))) >= 0.5).cast("int") === col("y").cast("int"))
          .cast("double"))).as("acc"))
      .head().getDouble(0)
    assert(acc === 1.0, s"separable corpus must be fully separated (acc=$acc)")
  }

  test("softsign training is bit-deterministic across runs and partitionings") {
    val rows = (0 until 500).map { i =>
      (i.toLong, (i % 97) / 64.0, (i % 31) / 16.0, if (i % 3 == 0) 1.0 else 0.0)
    }
    val a = Classifier.train(
      rows.toDF("id", "x1", "x2", "y").repartition(7),
      Seq("x1", "x2"), "y", iters = 5, lr = 0.5, link = Link.Softsign)
    val b = Classifier.train(
      rows.reverse.toDF("id", "x1", "x2", "y").repartition(23),
      Seq("x1", "x2"), "y", iters = 5, lr = 0.5, link = Link.Softsign)
    assert(a.weights.toSeq === b.weights.toSeq,
      "decimal-exact gradient sums must make weights order- and partitioning-independent")
  }

  test("empty input returns the zero model; bad labels fail fast") {
    val empty = Seq.empty[(Double, Double)].toDF("x", "y")
    val m = Classifier.train(empty, Seq("x"), "y", iters = 3)
    assert(m.weights.toSeq === Seq(0.0, 0.0))
    val bad = Seq((1.0, 2.0)).toDF("x", "y")
    val e = intercept[IllegalArgumentException] {
      Classifier.train(bad, Seq("x"), "y", iters = 1)
    }
    assert(e.getMessage.contains("0/1"))
  }

  test("trainOnFeatures scans the projection, releases it, and scores") {
    val docs = Seq(
      (1L, "the cat sat on the mat and then slept all day long."),
      (2L, "{ code block }"),
      (3L, "a perfectly ordinary sentence that ends with punctuation marks.")
    ).toDF("doc_id", "text")
    val feats = Seq(
      "x1" -> (graft.functions.Text.tokenCount(col("text")).cast("double") / lit(1024.0)))
    val m = Classifier.trainOnFeatures(
      docs, feats, lit(1.0), iters = 2, lr = 0.5, link = Link.Softsign)
    assert(m.weights.length === 2)
    // all-ones labels push the bias positive: err = p−1 < 0 ⇒ w grows
    assert(m.weights(0) > 0.0)
  }
}
