package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Sequence packing — the step between corpus curation and pretraining:
  * documents are packed greedily into fixed-capacity token bins (context
  * windows) so batch construction wastes as little of each window as
  * possible.
  *
  * The packing rule is the deterministic sequential first-fit: within a
  * packing group, walk documents in id order, appending each to the current
  * bin unless it would overflow `capacity`, in which case a new bin starts.
  * A document larger than `capacity` gets a bin of its own (it starts a
  * fresh bin and the next document breaks again). Sequential packing is
  * inherently order-dependent, so distributing it needs a grouping choice:
  * ids are bucketed into groups of `groupSize` consecutive ids and each
  * group packs independently — bin quality is unaffected for any groupSize
  * well above the docs-per-bin ratio, and every group's packing is a pure
  * function of its members, so the result is deterministic under any
  * physical partitioning (unlike a per-Spark-partition walk, whose bins
  * would change with the partition count).
  *
  * Scale shape: ONE shuffle (the groupBy on the id bucket); the greedy walk
  * itself is a scan-local `aggregate` fold over each group's sorted items
  * (≤ `groupSize` elements of per-task state). Global bin ids are
  * `group * groupSize + bin-in-group` — unique because a group of
  * `groupSize` docs can open at most `groupSize` bins.
  */
object Packing {

  /** Pack documents into token bins: (`idCol`, n_tokens, bin_id).
    *
    * @param df        input with a numeric id and a precomputed token count
    * @param idCol     integral id, UNIQUE per row (duplicate ids overfill an
    *                  id bucket and abort the job — silent bin-id collisions
    *                  across groups are the alternative); bucketed by floor
    *                  division on `groupSize`
    * @param tokensCol token count column (long-castable)
    * @param capacity  bin capacity in tokens
    * @param groupSize consecutive-id packing-group width
    */
  def packBins(
      df: DataFrame, idCol: String, tokensCol: String,
      capacity: Long, groupSize: Int): DataFrame = {
    require(capacity >= 1, s"capacity must be >= 1 (got $capacity)")
    require(groupSize >= 1, s"groupSize must be >= 1 (got $groupSize)")
    val items = df
      .select(
        col(idCol).cast("long").as("__id"),
        col(tokensCol).cast("long").as("__tokens"))
      // floor division in INTEGER arithmetic: (id - pmod(id, g)) is an exact
      // multiple of g, and `div` keeps everything long — a double-division
      // floor would lose precision above 2^53 and disagree with the oracle's
      // integral `//` on content-derived / snowflake-style ids
      .withColumn("__grp",
        expr(s"(__id - pmod(__id, $groupSize)) div $groupSize"))
      .groupBy("__grp")
      // struct sort is lexicographic by field order → id-ascending walk
      .agg(sort_array(collect_list(struct(col("__id"), col("__tokens")))).as("items"))
    val init = struct(
      lit(0L).as("fill"), lit(0L).as("bin"),
      array().cast("array<struct<id:bigint,tokens:bigint,bin:bigint>>").as("out"))
    val packed = aggregate(
      col("items"), init,
      (acc, x) => {
        val tok = x.getField("__tokens")
        val break = acc.getField("fill") > 0L &&
          (acc.getField("fill") + tok > capacity)
        val bin = when(break, acc.getField("bin") + 1L).otherwise(acc.getField("bin"))
        val fill = when(break, tok).otherwise(acc.getField("fill") + tok)
        struct(fill.as("fill"), bin.as("bin"),
          concat(acc.getField("out"), array(struct(
            x.getField("__id").as("id"), tok.as("tokens"), bin.as("bin")))).as("out"))
      },
      acc => acc.getField("out"))
    // bin_id uniqueness rests on ≤ groupSize rows per id bucket (a group of
    // n docs opens at most n bins) — true iff ids are unique. Duplicate ids
    // would silently merge unrelated bins, so overfull buckets abort instead.
    val guarded = when(size(col("items")) <= groupSize, packed)
      .otherwise(raise_error(format_string(
        s"sequence packing: id bucket %s holds %s rows (> groupSize=$groupSize)" +
          " — ids must be unique, or bin ids would collide across groups",
        col("__grp"), size(col("items")))))
    items
      .select(col("__grp"), explode(guarded).as("a"))
      .select(
        col("a.id").as(idCol),
        col("a.tokens").as("n_tokens"),
        (col("__grp") * groupSize + col("a.bin")).as("bin_id"))
  }

  /** Packing observability: ONE summary row over a [[packBins]] result —
    * `(n_bins, n_docs, mean_fill, waste_frac)`. `waste_frac` is the unused
    * fraction of the allocated window space, `sum(max(capacity - fill, 0)) /
    * (n_bins * capacity)`: an oversize singleton bin (fill > capacity)
    * contributes zero waste rather than negative, so the fraction stays in
    * [0, 1]. Pass the composite bin key via `binCols` when bins were packed
    * per stratum (e.g. `Seq("split", "bin_id")` — bin_id alone collides
    * across splits). Two aggregations, both tiny (one row per bin, then
    * one row total) — safe at any corpus size. */
  def binStats(
      packed: DataFrame, capacity: Long,
      binCols: Seq[String] = Seq("bin_id"),
      tokensCol: String = "n_tokens"): DataFrame = {
    require(capacity >= 1, s"capacity must be >= 1 (got $capacity)")
    packed
      .groupBy(binCols.map(col): _*)
      .agg(sum(col(tokensCol)).as("fill"), count(lit(1)).as("n_docs"))
      .agg(
        count(lit(1)).as("n_bins"),
        sum("n_docs").as("n_docs"),
        avg("fill").as("mean_fill"),
        (sum(greatest(lit(capacity) - col("fill"), lit(0L))) /
          (count(lit(1)) * lit(capacity.toDouble))).as("waste_frac"))
  }
}
