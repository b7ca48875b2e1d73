package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Distributed full-batch logistic-regression training — the statistical
  * quality classifier every web-scale corpus recipe runs after the
  * rule-based screen (Brown et al. 2020 "Language Models are Few-Shot
  * Learners" Appendix A trains an LR quality filter over heuristic page
  * features; CCNet and RefinedWeb run the same shape). The engine story is
  * the TRAINING LOOP AS AGGREGATION: one gradient-descent step is ONE
  * `agg()` over the corpus — per-row gradient contributions combine
  * map-side (partial aggregation), only `numFeatures + 2` scalars ever
  * reach the driver per step, and the feature projection is computed once
  * and persisted, so a 100 TB corpus pays one scan plus `iters` shuffles of
  * 32-ish partial rows each. No vector library, no driver-side data.
  * (Engine-addition family — the reference has no model surface.)
  *
  * Determinism contract (what lets a DuckDB oracle replay training):
  *  - per-row gradient contributions are rounded to 6dp and summed as
  *    DECIMAL — exact integer arithmetic, ORDER-INDEPENDENT, identical
  *    under any partitioning (plain double sums would drift run-to-run);
  *  - the weight update is a fixed-order IEEE chain on exactly-convertible
  *    inputs (the decimal sums stay under 2^53 scaled, so the double cast
  *    is exact on any engine), so weights are bit-identical doubles across
  *    engines with NO intermediate rounding slack;
  *  - the [[Link.Softsign]] link is rational arithmetic only (`abs`, `+`,
  *    `/`, `*` — each correctly rounded IEEE), giving bit-identical
  *    activations; [[Link.Logistic]] (the production default elsewhere in
  *    ML practice) is also provided, but `exp`'s last ulp is libm-specific,
  *    so registered oracle rows use Softsign — the q146-9dp argument, taken
  *    to zero slack.
  *
  * Callers pass feature columns already scaled to O(1); scaling by POWERS
  * OF TWO (e.g. `n_tokens / 1024.0d`) keeps integer-count features exact in
  * binary (no representation error enters the chain at all).
  */
object Classifier {

  /** The canonical heuristic page-feature set for a text column — integer
    * counts scaled by POWERS OF TWO (exact in binary; see the object doc).
    * Shared by the q161/q167 registered queries, the `quality_lr_scores`
    * SQL table function, and their specs so the oracled path and the SQL
    * surface can never silently diverge. */
  def heuristicPageFeatures(textCol: Column): Seq[(String, Column)] = Seq(
    "x1" -> (graft.functions.Text.tokenCount(textCol).cast("double") / lit(1024.0)),
    "x2" -> (length(coalesce(textCol, lit(""))).cast("double") / lit(4096.0)),
    "x3" -> (graft.functions.Text.punctCount(textCol).cast("double") / lit(64.0)),
    "x4" -> (graft.functions.Heuristics.goodLineCount(textCol).cast("double") / lit(16.0)))

  /** The rule-based C4 keep decision as a 0/1 training label. */
  def c4Label(textCol: Column): Column = graft.functions.Heuristics.c4Keep(textCol)

  sealed trait Link
  object Link {
    /** σ(z) = 1 / (1 + e^(−z)) — the canonical logistic link. */
    case object Logistic extends Link
    /** σ̃(z) = (1 + z / (1 + |z|)) / 2 — rational softsign squashing:
      * monotone, (0, 1)-valued, σ̃(0) = 0.5; every op is exact-IEEE. */
    case object Softsign extends Link
  }

  /** Learned model: `weights(0)` is the bias, `weights(i)` pairs with
    * `featureCols(i - 1)`. */
  final case class Model(weights: Array[Double], link: Link) {
    /** The linear term w·[1, x] as a fixed-order (left-fold) column chain —
      * the same association order the training loop and any oracle must
      * use. */
    def z(featureCols: Seq[Column]): Column = {
      require(featureCols.size == weights.length - 1,
        s"model has ${weights.length - 1} features, got ${featureCols.size}")
      featureCols.zipWithIndex.foldLeft(lit(weights(0)): Column) {
        case (acc, (x, i)) => acc + x * lit(weights(i + 1))
      }
    }

    /** P(y = 1 | x) under the model's link. */
    def score(featureCols: Seq[Column]): Column = activate(z(featureCols), link)
  }

  private def activate(z: Column, link: Link): Column = link match {
    case Link.Logistic => lit(1.0) / (lit(1.0) + exp(-z))
    case Link.Softsign => lit(0.5) * (lit(1.0) + z / (lit(1.0) + abs(z)))
  }

  /** Train by full-batch gradient descent: `iters` steps of
    * w ← w − lr · (1/n) Σ (σ(w·x) − y)·x, each step one aggregation.
    *
    * `df` must be persisted by the caller if it is expensive to recompute —
    * [[trainOnFeatures]] below handles the projection + persist lifecycle
    * for the common case. `labelCol` must be 0/1 (checked). Empty input
    * returns the zero model (no step is well-defined on n = 0).
    */
  def train(
      df: DataFrame,
      featureCols: Seq[String],
      labelCol: String,
      iters: Int = 3,
      lr: Double = 0.5,
      link: Link = Link.Softsign): Model = {
    require(featureCols.nonEmpty, "at least one feature column required")
    require(iters >= 0, s"iters must be >= 0 (got $iters)")
    require(lr > 0.0, s"learning rate must be positive (got $lr)")
    val w = Array.fill(featureCols.size + 1)(0.0)
    val xs = featureCols.map(col)
    val y = col(labelCol).cast("double")
    // fail fast on a non-binary/NULL label OR a NULL/NaN/infinite feature
    // before burning iterations: either would make round(err*x, 6) NULL (or
    // poison the decimal cast), silently skipped by the gradient sum while
    // the row still counts in n — mis-scaled weights, not an error. One
    // combined scan checks both.
    val badFeat = xs.map { x =>
      val d = x.cast("double")
      d.isNull || isnan(d) || abs(d) === Double.PositiveInfinity
    }.reduce(_ || _)
    val bad = df.filter(y.isNull || (y =!= 0.0 && y =!= 1.0) || badFeat)
      .limit(1).count()
    require(bad == 0L,
      s"label column '$labelCol' must be 0/1 and non-null, and feature " +
        s"columns (${featureCols.mkString(", ")}) must be non-null and finite")
    var step = 0
    var n = -1L
    while (step < iters && n != 0L) {
      val model = Model(w.clone(), link)
      val err = round(model.score(xs), 6) - y
      // bias rides a literal-1 feature; every contribution is rounded to
      // 6dp and summed as DECIMAL — exact and order-independent (the
      // determinism contract in the object doc)
      val gradCols = ((lit(1.0): Column) +: xs).zipWithIndex.map {
        case (x, i) => sum(round(err * x, 6).cast("decimal(28,6)")).as(s"g$i")
      }
      val r = df.agg(count(lit(1L)).as("n"), gradCols: _*).head()
      n = r.getLong(0)
      if (n > 0L) {
        var i = 0
        while (i < w.length) {
          val g = r.getDecimal(i + 1).doubleValue() // exact: |Σ| < 2^53/1e6
          w(i) = w(i) - lr * (g / n.toDouble)
          i += 1
        }
      }
      step += 1
    }
    Model(w, link)
  }

  /** Projection-then-train convenience: selects `[label, features…]` once,
    * persists the (narrow, numeric) projection for the iteration loop, and
    * releases it afterwards — the corpus text is scanned exactly once
    * regardless of `iters`. */
  def trainOnFeatures(
      df: DataFrame,
      features: Seq[(String, Column)],
      label: Column,
      iters: Int = 3,
      lr: Double = 0.5,
      link: Link = Link.Softsign): Model = {
    val proj = df.select(
      (label.cast("double").as("__y") +: features.map { case (n, c) => c.as(n) }): _*)
    proj.persist()
    try train(proj, features.map(_._1), "__y", iters, lr, link)
    finally { proj.unpersist(); () }
  }
}
