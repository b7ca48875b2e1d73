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
    * the corpus; the cross-stratum arithmetic (total, denominator, weights)
    * is computed JOIN-FREE by packing the ≤|strata|-row rollup into one
    * aggregate row, folding with higher-order functions, and exploding
    * back — the per-row state is bounded by the stratum count (a mixing
    * table is dozens of rows at any corpus size), and no broadcast / BNLJ /
    * single-partition window appears in the plan. A NULL stratum is its own
    * group, never dropped; it folds FIRST (Spark's array_sort orders null
    * struct fields first — mirrors ORDER BY ... NULLS FIRST).
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
    bySrc
      .agg(
        sum("n_tokens").as("__total"),
        array_sort(collect_list(
          struct(col("stratum"), col("n_docs"), col("n_tokens")))).as("__rows"))
      .withColumn("__denom",
        aggregate(col("__rows"), lit(0.0), (acc, x) =>
          acc + smooth(x.getField("n_tokens").cast("double") / col("__total"))))
      .select(explode(col("__rows")).as("r"), col("__total"), col("__denom"))
      .withColumn("p", col("r.n_tokens").cast("double") / col("__total"))
      .withColumn("weight", smooth(col("p")) / col("__denom"))
      .select(col("r.stratum").as("stratum"), col("r.n_docs").as("n_docs"),
        col("r.n_tokens").as("n_tokens"), col("p"), col("weight"),
        // a zero-token stratum has p = 0 and weight 0: sample_factor would
        // be 0/0, whose result differs by engine (NaN vs NULL vs error) —
        // surface an explicit NULL on every engine instead
        when(col("p") > 0, col("weight") / col("p")).as("sample_factor"))
  }

  /** MIXTURE-BALANCED RESAMPLE — the DoReMi-lite rebalancer: weigh every
    * row by target_share / actual_share of its stratum (target = UNIFORM
    * over strata), then ONE GLOBAL Efraimidis–Spirakis draw of `k` through
    * the strata-less [[Sampling.weightedSample]] — the drawn corpus's
    * expected stratum mix is uniform (over-represented strata down-sample,
    * rare strata surface). A NULL stratum is its own group, never dropped
    * (the [[samplingWeights]] contract): the count lookup joins NULL-SAFE
    * (`<=>`), so NULL-stratum rows draw with the same uniform-target weight
    * as any other group. Scale shape: the per-stratum counts are one
    * map-side-combined rollup broadcast back onto the scan (a stratum
    * column is low-cardinality by definition), the E-S key is scan-local,
    * and the global top-k folds through the bounded heap. Weight = two
    * divisions on exact longs — bit-stable, oracle-restatable (q169).
    * Output: (rank, id, weight, score) — join back on id for payloads. */
  def resampleUniform(
      docs: DataFrame, idCol: String, stratumCol: String, k: Int): DataFrame = {
    val d = docs.select(col(idCol), col(stratumCol))
    val bySrc = d.groupBy(col(stratumCol).as("__stratum"))
      .agg(count(lit(1)).as("__cnt"))
    val tot = bySrc.agg(
      count(lit(1)).as("__nsrc"), sum("__cnt").as("__tot"))
    val weighted = d
      .join(broadcast(bySrc), col(stratumCol) <=> col("__stratum"))
      .crossJoin(broadcast(tot))
      .withColumn("__w",
        (col("__tot").cast("double") / col("__nsrc").cast("double")) /
          col("__cnt").cast("double"))
      .select(col(idCol), col("__w"))
    Sampling.weightedSample(weighted, idCol, "__w", Seq.empty, k)
  }
}
