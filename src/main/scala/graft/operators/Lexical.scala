package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.GraftFunctions._

/** Lexical (keyword) retrieval: an inverted index + BM25 ranking
  * (Robertson et al., "Okapi at TREC-3", 1995) — the sparse half of
  * the retrieval story next to [[Ann]]'s dense half. A training-data
  * pipeline uses exactly this to mine contamination candidates, pull
  * topical subsets, and audit "what does the corpus say about X"
  * without embedding anything.
  *
  * Engine-portable determinism twist (the [[TextAnalysis.dsirWeights]]
  * convention): published BM25 weighs terms by `ln((N-df+0.5)/(df+0.5))`,
  * but `ln` is not guaranteed to round identically across engines, so
  * an oracle could never hash-match. We keep the RATIO in exact
  * integer arithmetic instead: `idf10k = ((2(N-df)+1)·10⁴) div (2df+1)`
  * — the same (N-df+0.5)/(df+0.5) quantity, scaled, un-logged. The
  * log is monotone, so each term's rarity ORDERING is preserved
  * exactly; summing linear instead of log ratios overweights very rare
  * terms relative to textbook BM25 (the DSIR trade, documented there).
  * The tf saturation term is exact-rational throughout: with k1 = 6/5
  * and b = 3/4,
  *   tf·(k1+1) / (tf + k1·(1-b+b·dl/avgdl))
  *     = 22·tf / (10·tf + 3 + 9·dl/avgdl),
  * computed as `sat10k = (22·tf·10⁸) div ((10·tf+3)·10⁴ + 9·dlr10k)`
  * with `dlr10k = (dl·10⁴) div max(avgdl, 1)` and `avgdl = T div N` —
  * every step an integer op any ANSI engine replays bit-identically.
  *
  * Overflow bounds: `idf10k ≤ (2N+1)·10⁴` and `sat10k ≤ 2.2·10⁴`, so a
  * term score fits a long while `N ≲ 2·10¹⁰` documents — a 100 TB
  * corpus at 5 KB/doc. ENFORCED: [[bm25Search]] folds a `raise_error`
  * branch into the idf expression (evaluated against the 1-row stats
  * broadcast, so the check is per-posting-sliver-row on an
  * already-loaded constant — free), failing loudly instead of wrapping
  * silently under non-ANSI arithmetic. `dl·10⁴` requires `dl ≲ 9·10¹⁴`
  * tokens/doc — unreachable (a doc would exceed the corpus).
  *
  * Scale shape: ONE pass over the postings table. Query terms (small
  * by definition) broadcast onto postings; the matched sliver —
  * postings of query terms only — carries df as a count window keyed
  * on token (one posting row per (token, doc), so the window count IS
  * df), then pre-reduces into the per-(query, doc) sum and a
  * per-query top-k window (rank-filter ⇒ WindowGroupLimit pushes a
  * partial top-k before the exchange). Corpus-wide N/T ride a 1-row
  * broadcast. The corpus-sized postings NEVER shuffle un-aggregated
  * and are NEVER scanned twice.
  */
object Lexical {

  /** Build the inverted index: postings (token, doc_id, tf, dl) — dl
    * denormalized into the posting row (the Lucene norms layout) so
    * scoring never joins a corpus-sized doc-length table — plus
    * doclens (doc_id, dl) for the corpus stats N and T (a doc with no
    * postings for a query still counts in N/avgdl).
    *
    * One explode → one pre-reduced (token, doc) aggregate: the
    * exchange carries post-combine rows, ≤ distinct (token, doc)
    * pairs.
    */
  def buildPostings(docs: DataFrame, idCol: String,
                    textCol: String): (DataFrame, DataFrame) = {
    // null-text docs are excluded entirely (no postings, no doclens
    // row, not in N/avgdl) — the same semantics as deriving both
    // tables from the token stream, and what the SQL replay's unnest
    // produces; they'd otherwise contribute a null dl to doclens.
    // doclens is a SEPARATE projection of the source on purpose: it
    // is a column-pruned text scan (id + token count only), while
    // deriving it from postings would pay the (token, doc) shuffle a
    // second time; in the persisted path (postingsAppend) both land
    // at rest and searches never rescan the corpus at all
    val src = docs.filter(col(textCol).isNotNull)
    // round 16 (guide §2.4): tf is a WITHIN-document count — counting
    // inside the row ([[graft.functions.TokenTf]], one native call)
    // and exploding the already-reduced (token, tf) pairs removes the
    // corpus-wide (token, doc_id, dl) Exchange + hash-agg the groupBy
    // formulation paid; the emitted row multiset is identical.
    val postings = src.select(col(idCol).as("doc_id"),
        size(tokens(col(textCol))).cast("long").as("dl"),
        explode(graft.functions.TokenTf.tokenTf(col(textCol))).as("p"))
      .select(col("p.token").as("token"), col("doc_id"), col("dl"),
        col("p.tf").as("tf"))
    val doclens = src.select(col(idCol).as("doc_id"),
      size(tokens(col(textCol))).cast("long").as("dl"))
    (postings, doclens)
  }

  /** BM25 top-k per query. `queries` is (queryIdCol, termsCol:
    * array<string>); duplicate terms within a query are deduplicated
    * (the common qtf=1 convention). Queries with no matching postings
    * produce no rows; ties break on doc_id ascending. Output:
    * (query_id, rank, doc_id, score) — all integers, hash-exact.
    */
  def bm25Search(postings: DataFrame, doclens: DataFrame,
                 queries: DataFrame, queryIdCol: String,
                 termsCol: String, k: Int): DataFrame = {
    require(k >= 1, "k >= 1")
    val qt = queries.select(col(queryIdCol).as("query_id"),
        explode(array_distinct(col(termsCol))).as("token"))
      .distinct()
    val stats = doclens.agg(count(lit(1)).as("n"), sum(col("dl")).as("t"))
    // the ONE postings scan: keep only query-term postings. df comes
    // from a count window over the matched sliver (one row per
    // (token, doc) by construction) — NOT a groupBy + join-back,
    // which would re-execute the corpus-sized postings scan for the
    // second branch
    val matched = postings
      .join(broadcast(qt.select("token").distinct()), Seq("token"))
      .withColumn("df", count(lit(1)).over(
        Window.partitionBy(col("token"))))
    val scored = matched
      .join(broadcast(qt), Seq("token"))
      .crossJoin(broadcast(stats))
      // greatest(n, 1): an empty doclens table gives n = 0 and t =
      // null — without the guard ANSI mode raises divide-by-zero
      // instead of returning the (empty) result
      .withColumn("avgdl",
        greatest(expr("t div greatest(n, 1L)"), lit(1L)))
      .withColumn("dlr10k", expr("(dl * 10000) div avgdl"))
      // loud guard on the documented long-overflow bound (see object
      // scaladoc): beyond 2e10 docs the scaled integer score would wrap
      // silently under non-ANSI arithmetic and mis-rank
      .withColumn("idf10k", expr(
        "CASE WHEN n > 20000000000 THEN CAST(raise_error(" +
          "'bm25Search: corpus size exceeds the exact-integer score " +
          "bound (2e10 docs); rescale idf10k before trusting rankings')" +
          " AS BIGINT) " +
          "ELSE ((2 * (n - df) + 1) * 10000) div (2 * df + 1) END"))
      .withColumn("sat10k", expr(
        "(22 * tf * 100000000) div ((10 * tf + 3) * 10000 + 9 * dlr10k)"))
      .groupBy(col("query_id"), col("doc_id"))
      .agg(sum(expr("idf10k * sat10k")).as("score"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("score").desc, col("doc_id"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank").cast("long").as("rank"),
        col("doc_id"), col("score"))
  }

  /** Reciprocal-rank fusion (Cormack, Clarke & Buettcher 2009) of two
    * ranked result lists — the standard hybrid-retrieval combiner
    * (sparse BM25 + dense embedding ranks): each list contributes
    * `10⁸ div (c0 + rank)` per (query, doc) and the fused ranking
    * sorts by the summed score. Exact integers throughout (published
    * RRF is Σ 1/(60+r); the scaled integer division is the same
    * ordering, engine-replayable — the DSIR convention). Fusion
    * consumes ALREADY-RANKED lists, so its cost is rows ≈
    * queries × k per side regardless of corpus size; it is agnostic
    * to how the ranks were produced. Both inputs: (query_id, doc_id,
    * rank). Output: (query_id, rank, doc_id, rrf_score); ties break
    * on doc_id.
    */
  def rrfFuse(a: DataFrame, b: DataFrame, k: Int,
              c0: Int = 60): DataFrame = {
    require(k >= 1, "k >= 1")
    val contrib = (df: DataFrame) =>
      df.select(col("query_id"), col("doc_id"),
        expr(s"100000000 div (${c0}L + CAST(rank AS BIGINT))").as("s"))
    val fused = contrib(a).unionByName(contrib(b))
      .groupBy(col("query_id"), col("doc_id"))
      .agg(sum(col("s")).as("rrf_score"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("rrf_score").desc, col("doc_id"))
    fused.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank").cast("long").as("rank"),
        col("doc_id"), col("rrf_score"))
  }

  /** Append one batch's postings + doclens as a layer of a persisted
    * index (the [[Sketches.bloomAppend]] pattern): O(batch) per fold,
    * nothing rescans earlier batches. Batches MUST be doc-disjoint
    * (the layered union is then EXACTLY the one-shot postings table —
    * tf/df/N/T all add); re-writing a batch id overwrites its own
    * layer, so crash replay is idempotent.
    */
  def postingsAppend(batch: DataFrame, idCol: String, textCol: String,
                     indexDir: String, batchId: Long): Unit = {
    val (postings, doclens) = buildPostings(batch, idCol, textCol)
    postings.write.mode("overwrite")
      .parquet(s"$indexDir/postings/batch=$batchId")
    doclens.write.mode("overwrite")
      .parquet(s"$indexDir/doclens/batch=$batchId")
  }

  /** BM25 over the at-rest index: the merged layers ARE the one-shot
    * postings/doclens tables (doc-disjoint batches), so this scores
    * identically to [[bm25Search]] over the union — incremental
    * equals one-shot exactly, no approximation anywhere.
    */
  def bm25SearchIndex(spark: SparkSession, indexDir: String,
                      queries: DataFrame, queryIdCol: String,
                      termsCol: String, k: Int): DataFrame =
    bm25Search(
      spark.read.parquet(s"$indexDir/postings")
        .select("token", "doc_id", "dl", "tf"),
      spark.read.parquet(s"$indexDir/doclens").select("doc_id", "dl"),
      queries, queryIdCol, termsCol, k)
}
