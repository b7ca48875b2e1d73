package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** ORDER-INDEPENDENT TABLE CONTENT FINGERPRINT — the integrity check a
  * 100 TB pipeline runs after every copy, migration, backfill, or engine
  * swap: "is this table byte-identical to that one?" answered by ONE scan
  * per side and an 8-byte compare, with no sort, no shuffle of the data,
  * and no row-by-row anti-join. Each row hashes to a 60-bit integer
  * (md5-derived, so column transpositions and value swaps change it) and
  * the table digest is the exact SUM of row hashes in DECIMAL(38,0) —
  * addition is commutative/associative over exact integers, so the digest
  * is independent of row order, partitioning, and parallelism BY
  * CONSTRUCTION, and any single-row difference shifts it (a pair of
  * differences cancels only at ~2^-60). The same arithmetic replays in any
  * engine (q183's DuckDB mirror), which is the point: source and target of
  * a migration rarely run the same system.
  *
  * Scale shape: scan-local projection + md5 (codegen'd), one map-side
  * partially-aggregated global sum — a one-row result, nothing else moves.
  *
  * Canonicalization contract (documented, caller-owned): columns render
  * via CAST(c AS STRING) joined by the `\u0001` (SOH) separator, NULL renders as
  * the `\u0003` (ETX) sentinel — so the digest is over VALUES, not physical
  * encoding; the caller picks columns whose string rendering is
  * engine-portable (integers, strings, dates — NOT raw doubles, whose
  * shortest-repr formatting is engine-specific) and whose data cannot
  * contain the two control characters. */
object TableDigest {

  /** One row: (n_rows: long, digest: string — the exact decimal rendering
    * of the DECIMAL(38,0) hash sum; a string because every engine and
    * dataframe bridge renders int-decimals' digits identically, while
    * wide-decimal NUMERIC types lose exactness through some bridges). */
  def digest(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.nonEmpty, "digest needs at least one column")
    val canon = concat_ws("\u0001",
      cols.map(c => coalesce(col(c).cast("string"), lit("\u0003"))): _*)
    // 15 hex chars = 60 bits: inside BIGINT on every engine, summed exactly
    // in DECIMAL(38,0) up to ~10^20 rows
    val rowHash = conv(substring(md5(canon), 1, 15), 16, 10)
      .cast("decimal(38,0)")
    df.agg(
      count(lit(1)).as("n_rows"),
      coalesce(sum(rowHash), lit(0).cast("decimal(38,0)"))
        .cast("decimal(38,0)").cast("string").as("digest"))
  }
}
