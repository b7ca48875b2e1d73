package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Edit-distance similarity join (fuzzy dedup of titles, names, URLs):
  * all unordered pairs with levenshtein ≤ k, WITHOUT an all-pairs scan.
  *
  * Scheme (Pass-Join, Li et al. VLDB 2012 — segment pigeonhole): partition
  * every string into k+1 contiguous segments. If ed(s, t) ≤ k, at most k of
  * s's segments are touched by an edit, so at least ONE appears in t
  * verbatim, displaced by at most k positions. The index side emits its
  * k+1 (segment#, |s|, segment) keys; the probe side emits, for every
  * plausible source length L ∈ [|t|−k, |t|+k] and segment#, the substrings
  * of t at the segment's position ±k — a CONSTANT ≤ (2k+1)²(k+1) keys per
  * row. Candidates meet in a plain equi-join on (segment#, L, substring);
  * the exact bounded levenshtein then keeps true pairs only. Approximation
  * lives nowhere: the pigeonhole guarantees no false negatives, the filter
  * kills false positives — output is EXACT.
  *
  * Strings shorter than k+1 characters cannot host k+1 segments; they are
  * routed through one shared bucket key joined against all strings of
  * length ≤ 2k (an ed ≤ k partner of a ≤k-length string cannot be longer;
  * the bucket rides the same exploded key attribute as every segment, so
  * the join stays a single equi-join). Rare in real corpora; the segment
  * path carries everything else.
  *
  * 100 TB shape: candidate generation is scan-local (per-row array build +
  * explode), the only shuffles are the (segment#, L, substring) equi-join,
  * the pair distinct, and the two id-keyed string rejoins. Hot segment
  * values (templated prefixes) are the skew axis — AQE skew-join splits
  * them; adversarially templated corpora (shared 13-char prefixes) should
  * pre-strip the template, as with any signature scheme.
  */
object EditDistance {

  def editDistancePairs(
      df: DataFrame, idCol: String, strCol: String, k: Int): DataFrame = {
    require(k >= 1 && k <= 4, s"k must be in [1, 4] (got $k)")
    val parts = k + 1
    val base = df
      .select(col(idCol).cast("long").as("__id"), col(strCol).as("__s"))
      .filter(col("__s").isNotNull)
      .withColumn("__len", length(col("__s")))

    def seg(i: Int, len: Column, s: Column): (Column, Column) = {
      val b = floor(len / parts).cast("int")
      val rem = (len % parts).cast("int")
      val l = b + when(lit(i) < rem, 1).otherwise(0)
      val p = lit(i) * b + least(lit(i), rem) + 1
      (p, l)
    }
    def key(i: Column, l: Column, sub: Column): Column =
      struct(i.cast("int").as("i"), l.cast("int").as("l"), sub.as("sub"))

    // index side: the k+1 segments (len >= k+1), or the short bucket
    val idxKeys = (0 until parts).map { i =>
      val (p, l) = seg(i, col("__len"), col("__s"))
      when(col("__len") >= parts, key(lit(i), col("__len"), col("__s").substr(p, l)))
    } :+ when(col("__len") <= k, key(lit(-1), lit(-1), lit("")))
    val indexed = base.select(col("__id").as("id_a"),
      explode(filter(array(idxKeys: _*), c => c.isNotNull)).as("__k"))

    // probe side: substrings at every (source length, segment, shift), or
    // the short bucket for any string a short source could reach. The shift
    // window is the necessary condition of an untouched segment: with
    // x = q − p and Δ = |t| − L, edits before the segment give |x| ≤ e_b and
    // the tail lengths give |Δ − x| ≤ e_a, so |x| + |Δ − x| ≤ k — the
    // interval [min(0,Δ), max(0,Δ)] widened by ⌊(k − |Δ|)/2⌋ on each end
    // (roughly half the slots of the naive ±k window).
    val probeKeys = (for {
      d <- -k to k
      i <- 0 until parts
      delta = -d
      h = (k - math.abs(delta)) / 2
      shift <- (math.min(0, delta) - h) to (math.max(0, delta) + h)
    } yield {
      val srcLen = col("__len") + d
      val (p0, l) = seg(i, srcLen, col("__s"))
      val q = p0 + shift
      when(srcLen >= parts && q >= 1 && l >= 1 && q + l - 1 <= col("__len"),
        key(lit(i), srcLen, col("__s").substr(q, l)))
    }) :+ when(col("__len") <= 2 * k, key(lit(-1), lit(-1), lit("")))
    val probed = base.select(col("__id").as("id_b"),
      explode(array_distinct(filter(array(probeKeys: _*), c => c.isNotNull))).as("__k"))

    val cand = indexed.join(probed, Seq("__k"))
      .filter(col("id_a") =!= col("id_b"))
      .select(least(col("id_a"), col("id_b")).as("id_a"),
        greatest(col("id_a"), col("id_b")).as("id_b"))
      .distinct()
    val sa = base.select(col("__id").as("id_a"), col("__s").as("__sa"))
    val sb = base.select(col("__id").as("id_b"), col("__s").as("__sb"))
    cand.join(sa, Seq("id_a")).join(sb, Seq("id_b"))
      .withColumn("distance",
        levenshtein(col("__sa"), col("__sb"), k).cast("long"))
      .filter(col("distance") >= 0 && col("distance") <= k)
      .select("id_a", "id_b", "distance")
  }
}
