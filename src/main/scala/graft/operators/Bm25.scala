package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.Text

/** Okapi BM25 batch retrieval (Robertson et al., TREC-3 1994; the idf form
  * is Lucene's non-negative `ln(1 + (N - df + 0.5)/(df + 0.5))`): score every
  * (query, document) pair that shares a term through the corpus tf/df
  * rollups and return the top-k documents per query — the classic
  * inverted-index ranked search the q98 index only stores. This is the
  * retrieval half of a training-data pipeline: eval-set mining, targeted
  * corpus slicing ("all documents about X"), and hard-negative mining for
  * embedding training all reduce to batch BM25 over the crawl.
  *
  * Determinism (driver hash-compares values): tf/df/dl are exact longs; the
  * per-(query, doc) score folds its per-term contributions in SORTED term
  * order on both engines (Spark `aggregate(array_sort(collect_list))`,
  * DuckDB `list(... ORDER BY tok)` — the 0.0-seed matches the
  * first-element seed bitwise), every float expression is written in the
  * identical parenthesized order, and the final 6dp round absorbs `ln`'s
  * last-ulp libm variation (the q94 precedent). Ranking sorts on the
  * ROUNDED score (ties broken by doc_id), so both engines rank the
  * identical keys. Blank documents and blank queries are excluded from N
  * and emit no rows; a query whose terms never occur in the corpus emits no
  * rows — the row-count contract, not a silent drop. The bounded heap keeps
  * the identical k elements because (rounded score, doc_id) is a total order
  * within each query group — top-k is a set property there, not an
  * arrival-order artifact.
  *
  * Scale shape (the 100 TB contract): every corpus pass is scan-local
  * tokenize + map-side-combined rollup — the tf stream for scoring, the tf
  * stream again under the vocabulary df rollup (its exchange carries
  * partially-aggregated rows, so the two tf references cannot canonicalize
  * to one exchange), and the cheap tokenCount-only dl/stats scans (no
  * explode). Sharing them would mean materializing a CORPUS-SIZED tf
  * intermediate — a full shuffle-write that costs what it saves; a caller
  * amortizing many query batches should persist `docs` (or the index a
  * retrieval system would build anyway, q98's layout) and re-pay nothing.
  * N/avgdl ride a 1-row broadcast. The query batch is tiny by
  * nature (an eval suite, a probe set), so the term-keyed candidate join
  * broadcasts the query side under AQE and the corpus NEVER shuffles on
  * anything but (doc, term) — the same asymmetry the q52 decontamination
  * join pins. Top-k folds inside the per-query aggregate through the BOUNDED
  * heap ([[graft.functions.TopK]], O(k) buffer, map-side partial merge) — no
  * corpus-wide rank window, and no per-query buffer proportional to a hot
  * term's document frequency.
  */
object Bm25 {

  /** Top-k BM25 retrieval of `docs` (idCol, textCol) for each row of
    * `queries` (qidCol, qtextCol). Output: (query_id, rank, doc_id,
    * n_terms, score) with rank 1..k per query by (score DESC, doc_id).
    *
    * `maxQueryTerms` > 0 keeps only each query's RAREST terms by corpus df
    * (ties tok-ascending) — the Lucene More-Like-This discipline for
    * document-as-query retrieval: a long probe document explodes into
    * hundreds of terms whose candidate fan-out is Σ df over ALL of them,
    * dominated by stopword-frequency terms that contribute near-zero idf
    * to the score; the rarest terms are the discriminative ones AND bound
    * the fan-out. 0 (the default) keeps every term — correct for short
    * probe strings, quadratic-ish for probe documents. */
  /** The materializable BM25 corpus index — exactly q98's inverted-index
    * layout plus the length table: `tf` (doc_id, tok, tf), `df` (tok, df),
    * `dl` (doc_id, dl), `stats` (1 row: __n, __sdl). [[topK]] derives it
    * lazily per call (one-shot probes pay nothing extra); a caller serving
    * MANY query batches — or whose probe set itself needs the df table, the
    * [[topKIndexed]] `maxQueryTerms` path — persists `tf` and `dl` once and
    * every downstream frame (df, stats, scoring) reuses them: the corpus is
    * tokenized exactly once instead of once per derived frame. */
  final case class Index(tf: DataFrame, df: DataFrame, dl: DataFrame, stats: DataFrame) {
    /** Persist the two base frames (df/stats derive from them). */
    def persist(): this.type = { tf.persist(); dl.persist(); this }
    def unpersist(): Unit = { tf.unpersist(); dl.unpersist(); () }
  }

  /** Build the [[Index]] frames for `docs` (idCol, textCol). Lazy — call
    * [[Index.persist]] before serving repeated batches. */
  def buildIndex(docs: DataFrame, idCol: String, textCol: String): Index = {
    val d = docs.select(col(idCol).as("doc_id"), col(textCol).as("__text"))
      .filter(Text.tokenCount(col("__text")) > 0L)
    val toks = d.select(col("doc_id"), explode(Text.tokens(col("__text"))).as("tok"))
    val tf = toks.groupBy("doc_id", "tok").agg(count(lit(1)).as("tf"))
    // tf rows are distinct (doc, term): count(*) IS the document frequency
    val df = tf.groupBy("tok").agg(count(lit(1)).as("df"))
    val dl = d.select(col("doc_id"), Text.tokenCount(col("__text")).as("dl"))
    val stats = dl.agg(count(lit(1)).as("__n"), sum("dl").as("__sdl"))
    Index(tf, df, dl, stats)
  }

  def topK(
      docs: DataFrame, idCol: String, textCol: String,
      queries: DataFrame, qidCol: String, qtextCol: String,
      k: Int = 10, k1: Double = 1.2, b: Double = 0.75,
      maxQueryTerms: Int = 0): DataFrame =
    topKIndexed(buildIndex(docs, idCol, textCol),
      queries, qidCol, qtextCol, k, k1, b, maxQueryTerms)

  /** [[topK]] against a prebuilt (usually persisted) [[Index]].
    *
    * `deterministicFold = true` (the default, and what [[topK]] serves)
    * folds each (query, doc) score in SORTED term order through a
    * collect_list buffer — bit-reproducible across engines and runs, the
    * oracle mode. `false` is the PRODUCTION fold: a plain partial-
    * aggregable `sum` (codegen'd, map-side combined, O(1) buffer — no
    * per-group array materialization); its reorder drift over a ≤-dozens
    * term fold is ~1e-13, absorbed by the 6dp score round — the exact q146
    * sum-vs-sorted-fold argument at a far smaller fold width. */
  def topKIndexed(
      index: Index,
      queries: DataFrame, qidCol: String, qtextCol: String,
      k: Int = 10, k1: Double = 1.2, b: Double = 0.75,
      maxQueryTerms: Int = 0, deterministicFold: Boolean = true): DataFrame = {
    require(k >= 1, s"k must be >= 1 (got $k)")
    require(maxQueryTerms >= 0, s"maxQueryTerms must be >= 0 (got $maxQueryTerms)")
    val Index(tf, df, dl, stats) = index

    val qtermsAll = queries
      .select(col(qidCol).as("query_id"), col(qtextCol).as("__qtext"))
      .filter(Text.tokenCount(col("__qtext")) > 0L)
      .select(col("query_id"),
        explode(array_distinct(Text.tokens(col("__qtext")))).as("tok"))
    // rarest-first selection: terms ABSENT from the corpus are dropped by
    // the df join — they contribute no candidates either way. The window
    // runs on the query batch (tiny by contract), never the corpus.
    val qterms =
      if (maxQueryTerms == 0) qtermsAll
      else qtermsAll.join(df, Seq("tok"))
        .withColumn("__r", row_number().over(
          org.apache.spark.sql.expressions.Window
            .partitionBy("query_id").orderBy(col("df"), col("tok"))))
        .filter(col("__r") <= maxQueryTerms)
        .select("query_id", "tok")

    val nD = col("__n").cast("double")
    val avgdl = col("__sdl").cast("double") / nD
    val tfD = col("tf").cast("double")
    val dfD = col("df").cast("double")
    val idf = log((nD - dfD + lit(0.5)) / (dfD + lit(0.5)) + lit(1.0))
    val tfNorm = (tfD * (lit(k1) + lit(1.0))) /
      (tfD + lit(k1) * (lit(1.0) - lit(b) + lit(b) * (col("dl").cast("double") / avgdl)))

    val contribs = qterms
      .join(tf.join(df, Seq("tok")), Seq("tok"))
      .join(dl, Seq("doc_id"))
      .crossJoin(broadcast(stats))
      .select(col("query_id"), col("doc_id"), col("tok"), (idf * tfNorm).as("__c"))

    val foldCol =
      if (deterministicFold)
        aggregate(
          array_sort(collect_list(struct(col("tok"), col("__c")))),
          lit(0.0), (acc, x) => acc + x.getField("__c"))
      else sum(col("__c"))
    val scored = contribs
      .groupBy("query_id", "doc_id")
      .agg(count(lit(1)).as("n_terms"), foldCol.as("__s"))
      .select(col("query_id"), col("doc_id"), col("n_terms"),
        round(col("__s"), 6).as("score"))

    scored
      .groupBy("query_id")
      .agg(graft.functions.TopK.topKAsc(struct(
        (col("score") * lit(-1.0)).as("__neg"), col("doc_id"),
        col("n_terms"), col("score")), k).as("__top"))
      .select(col("query_id"), posexplode(col("__top")))
      .select(col("query_id"), (col("pos") + 1).cast("long").as("rank"),
        col("col.doc_id").as("doc_id"), col("col.n_terms").as("n_terms"),
        col("col.score").as("score"))
      .orderBy("query_id", "rank")
  }
}
