package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** CATEGORICAL DISTRIBUTION DRIFT between two snapshots of a corpus — the
  * release-gate check every training-data pipeline runs before swapping in
  * a refreshed crawl: which tokens/domains/languages moved, and by how
  * much? Per key, the total-variation term `|p_a − p_b|` stated in the
  * EXACT cross-multiplied integer form `|cnt_a·N_b − cnt_b·N_a|` — no
  * per-key division, no float accumulation, so rankings and ties are
  * engine-exact (the q185 all-integer discipline); the human-readable
  * `drift` column (= the same term divided by N_a·N_b) is ONE IEEE
  * division of exactly-represented integers (the q175 policy).
  *
  * Scale shape: two map-side-combined key counts, one keyed full-outer
  * join (a key absent from one side IS the drift signal — never dropped),
  * and a one-row totals broadcast (the documented global-anchor
  * exemption, the q74/q139/Mixture pattern). Nothing corpus-sized ever
  * sits in one partition. Exactness bound: the cross products stay in
  * 64-bit for snapshots up to ~3·10⁹ occurrences each (cnt·N < 2⁶³); at
  * full 100 TB scale run drift per shard/source — where the question is
  * asked anyway — or swap the products to DECIMAL(38,0) (the q170
  * documented-swap pattern). */
object Drift {

  /** `a`, `b`: one row per occurrence, keyed by `keyCol`. Returns
    * (key, cnt_a, cnt_b, n_a, n_b, drift_num, drift) for every key present
    * in either snapshot.
    *
    * An EMPTY snapshot fails LOUDLY (a codegen'd `raise_error` guard on the
    * one-row totals, so the report stays a lazy plan): with zero
    * occurrences on either side every drift value would come out NULL, and
    * a release gate run against an accidentally-empty refreshed snapshot
    * would read as "no signal" — exactly the failure this operator exists
    * to catch. */
  def categoricalDrift(a: DataFrame, b: DataFrame, keyCol: String): DataFrame = {
    val ca = a.groupBy(keyCol).agg(count(lit(1)).as("cnt_a"))
    val cb = b.groupBy(keyCol).agg(count(lit(1)).as("cnt_b"))
    def guarded(c: String, side: String) =
      when(coalesce(col(c), lit(0L)) > 0, col(c))
        .otherwise(raise_error(lit(
          s"drift: snapshot ${side} is empty — every drift value would be" +
            " NULL; a drift report over an empty snapshot is a broken" +
            " release gate, not a no-op")).cast("long")).as(c)
    val totals = ca.agg(sum("cnt_a").as("n_a"))
      .crossJoin(cb.agg(sum("cnt_b").as("n_b")))
      .select(guarded("n_a", "A"), guarded("n_b", "B"))
    ca.join(cb, Seq(keyCol), "full_outer")
      .select(col(keyCol),
        coalesce(col("cnt_a"), lit(0L)).as("cnt_a"),
        coalesce(col("cnt_b"), lit(0L)).as("cnt_b"))
      .crossJoin(broadcast(totals))
      .withColumn("drift_num",
        abs(col("cnt_a") * col("n_b") - col("cnt_b") * col("n_a")))
      .withColumn("drift", col("drift_num").cast("double") /
        (col("n_a") * col("n_b")).cast("double"))
  }
}
