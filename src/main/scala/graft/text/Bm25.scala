package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Okapi BM25 top-k retrieval over the documents corpus — the lexical
  * ranking half of a retrieval/RAG data pipeline (TF-IDF's production
  * sibling; `TrainingPrep.tfidfTopTerms` ranks terms within a doc, this
  * ranks docs against a query set).
  *
  * Query workload: the deterministic `doc_id % queryMod == 0` slice stands
  * in for a query log (the same stand-in convention as decontamination's
  * eval slice); each query is that document's `queryTerms` RAREST
  * informative terms (df ASC, term ASC — a total order), i.e. the keyword
  * extraction a retrieval service would do before hitting the index.
  *
  * Exactness (the DuckDB oracle replays bit-for-bit):
  *   - idf is truncated to INTEGER micro-nats, `floor(ln(1 + (N − df +
  *     0.5) / (df + 0.5)) · 1e6)` — Lucene BM25Similarity's floored
  *     variant of the Robertson idf, strictly positive for every df so
  *     common-term contributions stay small but never negative (the
  *     classic unfloored form zeroes out entirely on a small-vocabulary
  *     corpus). One transcendental per DISTINCT term, the same
  *     single-`ln`-then-floor discipline as the LM-scoring family.
  *   - the tf normalization is EXACT RATIONAL arithmetic: with k1 = 6/5
  *     and b = 3/4 multiplied through by `10·T` (T = total corpus tokens,
  *     avgdl = T/N), the classic  tf·(k1+1) / (tf + k1·(1−b+b·dl/avgdl))
  *     becomes  22·T·tf / (10·T·tf + 3·T + 9·dl·N)  — integers end to
  *     end. The per-(query,doc,term) contribution is one integer floor
  *     division (`div` in Spark ≡ `//` in DuckDB on positive operands),
  *     widened through DECIMAL(38,0)/HUGEINT so `idf_micro · 22 · T · tf`
  *     cannot overflow 2^63 at any SF; the per-doc score is then an
  *     order-independent integer SUM.
  *
  * Scale shape (the sharded-BM25 plan): one corpus tokenize feeding three
  * map-side-combined aggregations (tf, dl, df); the (query, term) table
  * is model-sized and BROADCAST into the postings scan, so only postings
  * of SELECTED terms shuffle — and selection is rarest-first (df ASC), so
  * candidate volume is Σ_{chosen terms} df(t), the minimum any df-bounded
  * keyword choice allows (on a Zipf vocabulary the chosen terms are the
  * tail, never the stopword mass); the final per-query top-k is
  * `row_number ≤ k`, planned by [[graft.plans.BoundedTopKStrategy]] as a
  * two-phase bounded heap (no global sort). Nothing here is all-pairs.
  *
  * Reference behavior anchor: the reference exposes no retrieval surface;
  * this extends the training-data-pipeline family (SURVEY §2 additions)
  * the same way TF-IDF/decontamination do.
  */
object Bm25 {

  /** Top `k` documents per query with exact integer BM25 micro-scores.
    * Output: (query_id, doc_id, n_terms, score_micro, doc_rank). */
  def topK(documents: DataFrame, queryMod: Long = 97, queryTerms: Int = 16,
      k: Int = 10): DataFrame = {
    val terms = documents.select(col("doc_id"),
      explode(split(col("text"), " ")).as("term"))
    val tf = terms.groupBy("doc_id", "term").agg(count(lit(1)).as("tf"))
    val dl = terms.groupBy("doc_id").agg(count(lit(1)).as("dl"))
    // corpus totals derived from the doc-length table, not a second scan
    val totals = dl.agg(sum(col("dl")).as("tt"), count(lit(1)).as("nd"))
    // df from the per-doc-distinct tf table: one vocab-sized agg
    val dfr = tf.groupBy("term").agg(count(lit(1)).as("df"))
    val idf = dfr.crossJoin(broadcast(totals))
      // Lucene's floored idf: strictly positive for every df
      .withColumn("idf_micro",
        floor(log(lit(1.0) +
          (col("nd") - col("df") + 0.5) / (col("df") + 0.5)) * 1e6)
          .cast("long"))
      .select("term", "df", "idf_micro")

    // keyword extraction: each query doc's rarest informative terms
    val qtf = tf.filter(col("doc_id") % queryMod === 0)
      .select(col("doc_id").as("query_id"), col("term"))
    val qterms = idf.join(broadcast(qtf), "term")
      .withColumn("__r", row_number().over(
        Window.partitionBy("query_id")
          .orderBy(col("df").asc, col("term").asc)))
      .filter(col("__r") <= queryTerms)
      .select("query_id", "term", "idf_micro")

    val cand = tf.join(broadcast(qterms), "term")
      .join(dl, "doc_id")
      .crossJoin(broadcast(totals))
      // exact rational BM25 (k1=6/5, b=3/4 multiplied through by 10·T);
      // DECIMAL(38,0) keeps the product exact at any corpus size, and the
      // integer floor division matches DuckDB's HUGEINT `//` on positives
      .withColumn("sc_micro", expr(
        """CAST((CAST(idf_micro AS DECIMAL(38,0)) * 22 * tt * tf) div
          |     (CAST(10 AS DECIMAL(38,0)) * tt * tf + 3 * tt + 9 * dl * nd)
          |AS LONG)""".stripMargin))

    cand.groupBy("query_id", "doc_id")
      .agg(count(lit(1)).as("n_terms"), sum(col("sc_micro")).as("score_micro"))
      .withColumn("doc_rank", row_number().over(
        Window.partitionBy("query_id")
          .orderBy(col("score_micro").desc, col("doc_id").asc)).cast("long"))
      .filter(col("doc_rank") <= k)
      .select("query_id", "doc_id", "n_terms", "score_micro", "doc_rank")
  }
}
