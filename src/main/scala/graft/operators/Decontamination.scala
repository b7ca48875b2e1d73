package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.Text

/** Train/eval decontamination — the benchmark-leakage screen every serious
  * training-data pipeline runs before a model sees the corpus: a training
  * document that shares any long word n-gram with an evaluation document is
  * flagged (the n-gram-overlap criterion used for public benchmark
  * decontamination; n in the 8–13 range keeps incidental phrase collisions
  * near zero while catching verbatim and near-verbatim leakage).
  *
  * Scale shape: both sides shingle scan-locally; the eval side collapses to
  * DISTINCT shingles (in any real pipeline orders of magnitude smaller than
  * the training corpus — eval suites are fixed-size while training data
  * grows); the match is a shingle-keyed equi-join (AQE broadcasts the eval
  * side when it fits, the common case) followed by a per-document count. No
  * all-pairs stage exists at any size, and the training corpus is touched
  * exactly once.
  */
object Decontamination {

  /** Training documents that share ≥1 word `n`-gram with any eval document,
    * with the count of distinct shared shingles per training document.
    * Documents shorter than `n` tokens cannot carry an n-gram and are
    * excluded on both sides (mirrored by the oracle).
    *
    * @param train training corpus — (`idCol`, `textCol`) at minimum
    * @param eval  evaluation corpus — `textCol` at minimum (its rows need no
    *              id: only the distinct shingle set is used)
    * @return (`idCol`, n_shared) — contaminated training docs only
    */
  /** One definition of the shingling criterion for every entry point:
    * docs shorter than `n` tokens carry no n-gram, shingles deduplicate
    * within a doc, `ids` columns ride along. Both public methods go through
    * here so q52 and q57 cannot disagree on what "shares an n-gram" means. */
  private def shingled(
      df: DataFrame, textCol: String, n: Int, ids: Seq[Column]): DataFrame =
    df.filter(Text.tokenCount(col(textCol)) >= n)
      .select(ids :+ explode(array_distinct(Text.shingles(col(textCol), n))).as("shingle"): _*)

  /** Boilerplate screen: drop from the EVAL side every shingle whose
    * TRAIN-corpus document frequency exceeds `maxShingleDf`. A shingle
    * carried by thousands of training documents (license headers, site
    * chrome, disclaimer sentences) is boilerplate, not benchmark leakage —
    * and it is also the scale hazard: in the pair-level screen one such
    * shingle fans out to (train DF × eval DF) rows. Filtering the eval side
    * kills the fan-out BEFORE the match join materializes it.
    *
    * Cost shape: one extra pass over the training shingles — a semi-join
    * against the (broadcast) distinct eval shingles, then a count whose
    * map-side partial aggregation collapses each task to one row per
    * matched shingle before the exchange. The training corpus still never
    * shuffles; train shingles are distinct within a doc, so count(*) == DF.
    * `Long.MaxValue` (the default) skips the screen and its extra pass
    * entirely — the plan is byte-identical to the uncapped one. */
  private def withoutBoilerplate(
      trainSh: DataFrame, evalSh: DataFrame, maxShingleDf: Long): DataFrame =
    if (maxShingleDf == Long.MaxValue) evalSh
    else {
      val boiler = trainSh
        .join(evalSh.select("shingle").distinct(), Seq("shingle"), "left_semi")
        .groupBy("shingle")
        .agg(count(lit(1)).as("__df"))
        .filter(col("__df") > maxShingleDf)
        .select("shingle")
      evalSh.join(boiler, Seq("shingle"), "left_anti")
    }

  def sharedShingleCounts(
      train: DataFrame, eval: DataFrame,
      idCol: String, textCol: String, n: Int,
      maxShingleDf: Long = Long.MaxValue): DataFrame = {
    require(n >= 2, s"decontamination n-gram size must be >= 2 (got $n)")
    require(maxShingleDf >= 1, s"maxShingleDf must be >= 1 (got $maxShingleDf)")
    val trainSh = shingled(train, textCol, n, Seq(col(idCol)))
    val evalShingles = withoutBoilerplate(
      trainSh, shingled(eval, textCol, n, Nil).distinct(), maxShingleDf)
    // train shingles are distinct WITHIN a doc and evalShingles is globally
    // distinct, so each (train doc, shingle) pair matches at most one row:
    // count(*) == count of distinct shared shingles, no countDistinct needed
    trainSh
      .join(evalShingles, Seq("shingle"))
      .groupBy(idCol)
      .agg(count(lit(1)).as("n_shared"))
  }

  /** [[sharedShingleCounts]] with a bloom-filter prescreen on the training
    * side — the explicit semi-join reduction for the regime where the eval/
    * reference shingle set is too large to broadcast as a hash relation
    * (decontaminating against another corpus, a blocklist with billions of
    * entries): there the exact equi-join degrades to a sort-merge join that
    * shuffles EVERY training shingle, and a fixed-size sketch probed
    * scan-locally before the exchange cuts the shuffled volume to
    * (true overlap + fpp × corpus). Blooms have no false negatives, so the
    * prescreen drops only rows the join would drop anyway and the surviving
    * false positives are eliminated by the exact join — the OUTPUT is
    * bit-identical to [[sharedShingleCounts]] (spec + shared oracle).
    *
    * The sketch is one bounded driver collect (`numBits/8` bytes regardless
    * of corpus size — the IVF/PQ-centroid posture) and ships as a task-binary
    * literal; the probe is a codegen'd scan-local filter. The boilerplate
    * screen sees the SAME df counts: rows the bloom removes are outside the
    * eval shingle set and never contributed to an eval-shingle df. */
  def sharedShingleCountsBloom(
      train: DataFrame, eval: DataFrame,
      idCol: String, textCol: String, n: Int,
      maxShingleDf: Long = Long.MaxValue,
      bloomItems: Long = 1000000L, bloomBits: Long = 8388608L): DataFrame = {
    require(n >= 2, s"decontamination n-gram size must be >= 2 (got $n)")
    require(maxShingleDf >= 1, s"maxShingleDf must be >= 1 (got $maxShingleDf)")
    val trainShAll = shingled(train, textCol, n, Seq(col(idCol)))
    val evalShAll = shingled(eval, textCol, n, Nil).distinct()
    val bloom = evalShAll
      .agg(graft.functions.Sketches.bloomFilterAgg(
        col("shingle"), bloomItems, bloomBits).as("__bloom"))
      .head.getAs[Array[Byte]]("__bloom")
    if (bloom == null)
      // no eval shingles at all → nothing can be contaminated
      return trainShAll.filter(lit(false))
        .groupBy(idCol).agg(count(lit(1)).as("n_shared"))
    val trainSh = trainShAll
      .filter(graft.functions.Sketches.mightContain(bloom, col("shingle")))
    val evalShingles = withoutBoilerplate(trainSh, evalShAll, maxShingleDf)
    trainSh
      .join(evalShingles, Seq("shingle"))
      .groupBy(idCol)
      .agg(count(lit(1)).as("n_shared"))
  }

  /** The pair-level form of [[sharedShingleCounts]]: (train id, eval id,
    * n_shared) for every contaminated pair — the shape that decides the
    * remediation (drop the training doc, or retire the compromised eval
    * item). Here the eval side keeps its id (no distinct collapse), so a
    * shingle shared by e eval docs contributes to e pairs; n_shared counts
    * distinct shared shingles per pair (both sides deduplicate shingles
    * within a doc, so each (train doc, eval doc, shingle) triple matches
    * exactly once). Same scale posture: shingle-keyed equi-join, no
    * all-pairs stage — the join fan-out is bounded by actual overlap, which
    * is exactly what the screen measures. */
  def contaminationPairs(
      train: DataFrame, eval: DataFrame,
      idCol: String, textCol: String, n: Int,
      maxShingleDf: Long = Long.MaxValue): DataFrame = {
    require(n >= 2, s"decontamination n-gram size must be >= 2 (got $n)")
    require(maxShingleDf >= 1, s"maxShingleDf must be >= 1 (got $maxShingleDf)")
    val trainSh = shingled(train, textCol, n, Seq(col(idCol)))
    val evalSh = withoutBoilerplate(
      trainSh,
      shingled(eval, textCol, n, Seq(col(idCol).as(s"eval_$idCol"))), maxShingleDf)
    trainSh
      .join(evalSh, Seq("shingle"))
      .groupBy(idCol, s"eval_$idCol")
      .agg(count(lit(1)).as("n_shared"))
  }
}
