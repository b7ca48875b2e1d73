package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.Text

/** Hashed n-gram importance weighting — the data-selection family of DSIR
  * (Xie et al. 2023, "Data Selection for Language Models via Importance
  * Resampling"): score every raw document by how target-like its hashed
  * feature profile is, where "target" is any deterministic predicate over the
  * corpus (a quality gate, a trusted domain, a reference corpus). Documents
  * scoring high are the ones importance resampling would keep.
  * (Engine-addition family — the reference has no statistical text surface.)
  *
  * Features are word unigrams + bigrams hashed to `16^digits` buckets by md5
  * prefix (the repo's portable-hash idiom, [[graft.functions.Curation]] — any
  * engine recomputes the identical buckets). Per document the emitted columns
  * are exact longs: `n_feats` (feature occurrences), `sum_target` / `sum_raw`
  * (the document's feature occurrences weighted by the bucket's target / raw
  * corpus counts). The score is the LINEAR-SPACE importance ratio
  *
  *   dsir_score = (sum_target / sum_raw) · (N_raw / N_target)
  *
  * — the per-feature-mass analogue of the paper's log-probability ratio
  * (§2.2), deliberately log-free like [[UnigramLm]]'s `mean_tok_prob`: the
  * internals stay exact integers, the score is TWO IEEE divisions and one
  * multiply in fixed order, so an independent engine reproduces the identical
  * double (a log formulation would hang bit-equality on libm rounding).
  * score > 1 ⇔ the document's feature mass is more target-typical than the
  * raw-corpus average. Blank documents surface with `n_feats = 0` and a NULL
  * score; an empty target set yields NULL scores everywhere (surfaced, not
  * thrown — the predicate, not the data, is wrong).
  *
  * Scale shape (100 TB): feature explode is scan-local; the two bucket-count
  * rollups are map-side-combined groupBys over ≤ 16^digits rows; the
  * feature→count joins are keyed by bucket (a ≤ 16^digits-row dim — AQE
  * broadcasts it); the per-document rollup is one groupBy(id); the two corpus
  * totals ride the documented 1-row broadcast dim-probe pattern. Nothing
  * driver-side, no window, no all-pairs.
  */
object Dsir {

  /** Annotate every row of `df` with DSIR importance columns against the
    * target subset selected by `isTarget` (evaluated on `df`'s columns).
    *
    * @param digits md5-prefix hex chars per bucket (3 → 4096 buckets, the
    *               paper's 10k-bucket regime at the nearest power of 16)
    */
  def importanceWeights(
      df: DataFrame,
      idCol: String,
      textCol: String,
      isTarget: Column,
      digits: Int = 3): DataFrame = {
    require(digits >= 1 && digits <= 8, s"digits must be in 1..8 (got $digits)")
    val base = df
      .filter(Text.tokenCount(col(textCol)) > 0L)
      .select(col(idCol), Text.tokens(col(textCol)).as("__t"))
    val uni = base.select(col(idCol), explode(col("__t")).as("__feat"))
    // guard size >= 2: sequence(0, -1) would DESCEND, not be empty
    val bi = base.filter(size(col("__t")) >= 2)
      .select(col(idCol), explode(
        transform(sequence(lit(0), size(col("__t")) - 2),
          i => concat(element_at(col("__t"), i + 1), lit(" "),
            element_at(col("__t"), i + 2)))).as("__feat"))
    val feats = uni.unionAll(bi)
      .select(col(idCol),
        substring(md5(col("__feat").cast("binary")), 1, digits).as("__bk"))
    val targets = df.filter(isTarget).select(col(idCol))
    val rawCnt = feats.groupBy("__bk").agg(count(lit(1)).as("__n_raw"))
    val tgtCnt = feats.join(targets, Seq(idCol))
      .groupBy("__bk").agg(count(lit(1)).as("__n_t"))
    val totals = rawCnt.agg(coalesce(sum("__n_raw"), lit(0L)).as("__N_raw"))
      .crossJoin(tgtCnt.agg(coalesce(sum("__n_t"), lit(0L)).as("__N_t")))
    val perDoc = feats
      .join(rawCnt, Seq("__bk"))
      .join(tgtCnt, Seq("__bk"), "left")
      .groupBy(idCol)
      .agg(
        count(lit(1)).as("n_feats"),
        sum(coalesce(col("__n_t"), lit(0L))).as("sum_target"),
        sum("__n_raw").as("sum_raw"))
    df.select(col(idCol))
      .join(perDoc, Seq(idCol), "left")
      .crossJoin(broadcast(totals))
      .select(
        col(idCol),
        coalesce(col("n_feats"), lit(0L)).as("n_feats"),
        coalesce(col("sum_target"), lit(0L)).as("sum_target"),
        coalesce(col("sum_raw"), lit(0L)).as("sum_raw"),
        when(col("sum_raw") > 0L && col("__N_t") > 0L,
          (col("sum_target").cast("double") / col("sum_raw").cast("double")) *
            (col("__N_raw").cast("double") / col("__N_t").cast("double")))
          .as("dsir_score"))
  }
}
