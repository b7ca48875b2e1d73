package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Weighted sampling without replacement (Efraimidis & Spirakis 2006,
  * "Weighted random sampling with a reservoir") — the data-mixing primitive:
  * pick k documents per stratum with inclusion probability proportional to a
  * weight column (quality score, token count, domain prior). A training-data
  * pipeline uses exactly this to downsample a crawl to a token budget while
  * preferring high-quality/long documents, per source.
  *
  * The E-S key is u_i^(1/w_i) with u_i uniform; taking the k LARGEST keys is
  * a weighted sample without replacement. Equivalently (ln is monotone) the
  * k SMALLEST values of −ln(u_i)/w_i — the form used here: all-positive, so
  * no negative-zero cross-engine ordering hazards, and it plugs straight
  * into the bounded heap ([[graft.functions.TopK]], O(k) buffer per stratum,
  * map-side partial merge — a stratum with a billion rows still aggregates
  * under k slots per partition, never a stratum-wide sort).
  *
  * DETERMINISTIC by construction (the q51/q56 hash-sampling posture): u_i
  * derives from md5 of the id — 52 hash bits as an exact integer h, then
  * u = (h + 0.5) / 2^52 ∈ (0,1), exact double arithmetic any engine
  * reproduces bit-for-bit (the +0.5 keeps u strictly positive, so ln(u) is
  * finite). The only libm call is one `ln`; the score rounds to 6dp (the
  * q94/q139 policy — absorbs last-ulp libm variation) and ranks on
  * (rounded score ASC, id ASC), a total order both engines state
  * identically. Re-running the sample is idempotent; changing the corpus
  * changes only the affected strata.
  *
  * Scale shape: one scan computes the key scan-locally (hash + ln — no
  * shuffle), one stratum-keyed bounded aggregate picks the winners. Rows
  * with w ≤ 0 or null are excluded (zero weight = never sampled — the E-S
  * domain), not an error: a weight column is typically a computed score and
  * zero is a meaningful verdict, unlike PageRank's structural edge weights.
  */
object Sampling {

  /** Exact 52-bit integer from the leading 13 md5 nibbles of the id's string
    * form — the deterministic uniform's source, identical in any engine with
    * md5 + hex arithmetic. */
  private def hash52(id: Column): Column =
    conv(substring(md5(id.cast("string")), 1, 13), 16, 10).cast("long")

  /** round(−ln((h + 0.5)/2^52) / w, 6) — the E-S sampling key (smaller =
    * more likely selected; w amplifies selection odds). */
  private[graft] def esKey(id: Column, w: Column): Column =
    round(-log((hash52(id).cast("double") + lit(0.5)) / lit(4503599627370496.0))
      / w.cast("double"), 6)

  /** k-per-stratum weighted sample: (strataCols..., rank, id, weight, score)
    * with rank 1..k by (score ASC, id ASC) within each stratum. Empty
    * `strataCols` = one global sample of k. */
  def weightedSample(
      df: DataFrame, idCol: String, weightCol: String,
      strataCols: Seq[String], k: Int): DataFrame = {
    require(k >= 1, s"k must be >= 1 (got $k)")
    val strata = strataCols.map(col)
    val scored = df
      .filter(col(weightCol).isNotNull && col(weightCol) > 0)
      .select(strata :+ col(idCol).as("id") :+
        col(weightCol).cast("double").as("weight") :+
        esKey(col(idCol), col(weightCol)).as("score"): _*)
    scored
      .groupBy(strata: _*)
      .agg(graft.functions.TopK.topKAsc(
        struct(col("score"), col("id"), col("weight")), k).as("__top"))
      .select(strata :+ posexplode(col("__top")): _*)
      .select(strata ++ Seq((col("pos") + 1).cast("long").as("rank"),
        col("col.id").as("id"), col("col.weight").as("weight"),
        col("col.score").as("score")): _*)
  }
}
