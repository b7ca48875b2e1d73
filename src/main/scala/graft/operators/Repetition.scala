package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.Text

/** Intra-document repetition statistics — the Gopher-family quality filters
  * (Rae et al. 2021, §A1.1) that catch boilerplate, keyword stuffing, and
  * template text which per-document length/stopword scores miss: the fraction
  * of word n-gram occurrences claimed by the single most frequent n-gram
  * (`top_frac`), and the fraction belonging to any n-gram that occurs more
  * than once (`dup_frac`).
  *
  * Scale shape: ONE data shuffle. The input is repartitioned by document id
  * up front (raw text bytes — strictly fewer than the exploded n-gram rows an
  * aggregation-first plan would exchange, and exchanged once rather than
  * twice); every later stage — explode, the per-(doc, gram) count, and the
  * per-doc roll-up — then runs shuffle-free, because hash-partitioning on the
  * id satisfies the clustering requirement of both aggregations. Pinned in
  * PlanSpec.
  */
object Repetition {

  /** Per-document n-gram repetition stats: (`idCol`, n_grams, top_frac,
    * dup_frac). Documents with fewer than `n` tokens carry no n-gram and are
    * excluded. Both fractions are a single integer-valued-double division —
    * exact IEEE-754, so any engine computing the same counts gets the
    * identical doubles. */
  def ngramRepetition(
      df: DataFrame, idCol: String, textCol: String, n: Int): DataFrame = {
    require(n >= 1, s"repetition n-gram size must be >= 1 (got $n)")
    val gramCounts = df
      .filter(Text.tokenCount(col(textCol)) >= n)
      .repartition(col(idCol))
      .select(col(idCol), explode(Text.shingles(col(textCol), n)).as("gram"))
      .groupBy(idCol, "gram")
      .agg(count(lit(1)).as("c"))
    gramCounts
      .groupBy(idCol)
      .agg(
        sum("c").as("n_grams"),
        (max("c").cast("double") / sum("c").cast("double")).as("top_frac"),
        (sum(when(col("c") > 1, col("c")).otherwise(0L)).cast("double") /
          sum("c").cast("double")).as("dup_frac"))
  }
}
