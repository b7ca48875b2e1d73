package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Temperature-smoothed corpus mixing weights (the multilingual sampling
  * rule of Conneau & Lample 2019 §3.1, also mT5/XLM-R's exponential
  * smoothing): q_i = p_i^α / Σ_j p_j^α over per-stratum token shares p_i.
  * α < 1 upweights small strata (heritage languages, rare domains) at the
  * expense of dominant ones — the knob every large-scale pretraining mix
  * turns. The output is the mixing table a sampler consumes: one row per
  * stratum with its token share, smoothed weight, and the sampling factor
  * (weight / share — how much the stratum is over- or under-sampled).
  */
object Mixture {

  /** One row per stratum: n_docs, n_tokens (exact longs), p (token share),
    * weight (the smoothed simplex), sample_factor (= weight/p).
    *
    * Bit-determinism policy: counts are exact; p is ONE IEEE division; the
    * smoothing power is restricted to α ∈ {1, 0.5, 0.25} so it is computed
    * as 0–2 correctly-rounded square roots (a general `pow` is not
    * correctly rounded and would fork engines); and the simplex denominator
    * Σ p_j^α — the one cross-stratum float sum — is folded in SORTED
    * stratum order via `aggregate(array_sort(collect_list(...)))`, the
    * fixed left-to-right sequence an independent engine replays exactly.
    *
    * Scale shape: the stratum rollup is one partial-aggregated shuffle over
    * the corpus; everything after rides the ≤|strata|-row frame — the total
    * and the denominator are one-row aggregates joined back on a literal
    * key (a broadcast hash equi-join, not a BNLJ). A NULL stratum is its
    * own group, never dropped; it folds FIRST (Spark's array_sort orders
    * null struct fields first — mirrors ORDER BY ... NULLS FIRST).
    */
  def samplingWeights(
      docs: DataFrame,
      stratumCol: String,
      tokenCount: Column,
      alpha: Double = 0.5): DataFrame = {
    def smooth(c: Column): Column = alpha match {
      case 1.0 => c
      case 0.5 => sqrt(c)
      case 0.25 => sqrt(sqrt(c))
      case a => throw new IllegalArgumentException(
        s"alpha $a unsupported: only {1, 0.5, 0.25} keep the power correctly " +
          "rounded (sqrt chains) for cross-engine bit-determinism")
    }
    val bySrc = docs
      .groupBy(col(stratumCol).as("stratum"))
      .agg(count(lit(1)).as("n_docs"), sum(tokenCount).as("n_tokens"))
    val tot = bySrc.agg(sum("n_tokens").as("__total")).withColumn("__k", lit(1))
    val withP = bySrc.withColumn("__k", lit(1)).join(tot, Seq("__k"))
      .withColumn("p", col("n_tokens").cast("double") / col("__total"))
      .withColumn("__sp", smooth(col("p")))
    val denom = withP
      .agg(aggregate(
        array_sort(collect_list(struct(col("stratum"), col("__sp")))),
        lit(0.0),
        (acc, x) => acc + x.getField("__sp")).as("__denom"))
      .withColumn("__k", lit(1))
    withP.join(denom, Seq("__k"))
      .withColumn("weight", col("__sp") / col("__denom"))
      .withColumn("sample_factor", col("weight") / col("p"))
      .select("stratum", "n_docs", "n_tokens", "p", "weight", "sample_factor")
  }
}
