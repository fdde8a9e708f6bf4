package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distributed BPE tokenizer TRAINING — the full merge loop, not just
  * the pair statistic ([[TrainingPrep.bpePairCounts]] is one round's
  * ranking). Byte-pair encoding (Sennrich et al. 2016, "Neural Machine
  * Translation of Rare Words with Subword Units"): start from
  * characters, repeatedly merge the most frequent adjacent symbol pair;
  * the learned merge list IS the tokenizer.
  *
  * Shaped the way real trainers shape it: the corpus collapses ONCE to
  * the (distinct word, frequency) table — by Zipf that table is orders
  * of magnitude smaller than the token stream, and every merge round
  * iterates over IT, never the corpus again. At 100 TB the word table
  * is still distributed (web-scale corpora hold 10^8+ distinct words),
  * so each round is one map-side-combined pair-count aggregation plus a
  * bounded argmax; only the single winning pair (the model artifact)
  * ever reaches the driver. Per-round frames are lineage-truncated
  * (same reliable-checkpoint-or-local discipline as
  * `graft.dedup.Dedup.dupClusters` — plans stay bounded across rounds).
  *
  * Determinism: the argmax total-orders by (count DESC, pair ASC) and
  * the merge application is a left fold (greedy leftmost-first,
  * non-overlapping — the standard BPE application order), so the merge
  * list is engine-exact and the DuckDB oracle replays the whole
  * training round for round.
  */
object BpeTrain {

  // local path lazy as of r14: each round's argmax collect is the
  // materializing action, so the eager per-round checkpoint job is
  // saved — and the LAST round's merged table (which nothing reads;
  // the loop output is the merge list) is never computed at all. The
  // reliable path stays eager (a lazy reliable checkpoint recomputes
  // its lineage for the checkpoint write).
  private def truncateLineage(df: DataFrame): DataFrame =
    if (df.sparkSession.sparkContext.getCheckpointDir.isDefined)
      df.checkpoint()
    else df.localCheckpoint(eager = false)

  /** The initial symbol table: distinct `[a-z]+` words with corpus
    * frequency and their character-split symbol string (space-joined,
    * `_` end-of-word marker — "hello" -> "h e l l o _"). One corpus
    * shuffle; everything after runs on this frame. */
  def wordSymbols(documents: DataFrame): DataFrame =
    withSymbols(documents
      .select(explode(split(col("text"), " ")).as("word"))
      .filter(col("word").rlike("^[a-z]+$"))
      .groupBy("word").agg(count(lit(1)).as("freq")))

  /** Attach the initial symbol string to a (word, freq) frame. */
  def withSymbols(words: DataFrame): DataFrame =
    words.withColumn("cur",
      concat(array_join(split(col("word"), ""), " "), lit(" _")))

  /** Adjacent-pair frequencies of the current symbol strings, weighted
    * by word frequency: (pair "a b", n). Map-side combined; the pair
    * universe is bounded by (live vocabulary)², in practice the active
    * adjacencies. */
  def pairCounts(words: DataFrame): DataFrame =
    words
      .withColumn("__w", split(col("cur"), " "))
      .select(col("freq"), explode(expr(
        "zip_with(slice(__w, 1, size(__w) - 1), slice(__w, 2, size(__w) - 1)," +
          " (a, b) -> concat(a, ' ', b))")).as("pair"))
      .groupBy("pair").agg(sum(col("freq")).as("n"))

  /** One merge applied to every word's symbol string: greedy leftmost
    * non-overlapping replacement of adjacent (lhs, rhs) with lhs+rhs,
    * as a left fold over the symbol sequence — `acc` ends with ` lhs`
    * and the next symbol is `rhs` iff the pair is adjacent (symbols
    * never contain spaces, so the suffix test is exact), and a fold
    * consumes each match before rescanning, which is precisely BPE's
    * application order. Runs inside whole-stage codegen (builtin HOF,
    * no UDF). Symbols are `[a-z_]+` by construction — safe to inline. */
  def applyMerge(words: DataFrame, lhs: String, rhs: String): DataFrame = {
    require(lhs.matches("[a-z_]+") && rhs.matches("[a-z_]+"),
      s"unexpected symbol alphabet: '$lhs' '$rhs'")
    val merged = lhs + rhs
    words
      .withColumn("__w", split(col("cur"), " "))
      .withColumn("cur", expr(
        s"""aggregate(slice(__w, 2, size(__w) - 1), element_at(__w, 1),
           |  (acc, x) -> CASE
           |    WHEN x = '$rhs' AND (acc = '$lhs' OR endswith(acc, ' $lhs'))
           |    THEN CASE WHEN acc = '$lhs' THEN '$merged'
           |         ELSE concat(substring(acc, 1, length(acc) - ${lhs.length}), '$merged') END
           |    ELSE concat(acc, ' ', x) END)""".stripMargin))
      .drop("__w")
  }

  /** The trained merge list after `rounds` rounds:
    * (merge_rank, lhs, rhs, merged, pair_n), rank ascending — the
    * tokenizer artifact, model-sized (one row per round). Stops early
    * if no adjacent pair remains (fully merged vocabulary). */
  def train(documents: DataFrame, rounds: Int = 6): DataFrame =
    trainFromWords(wordSymbols(documents), rounds)

  /** The merge loop from an already-built symbol table
    * ([[wordSymbols]] / [[withSymbols]] output) — the entry point when
    * the (word, freq) collapse is maintained elsewhere (incremental
    * corpora, scale probes). */
  def trainFromWords(symbols: DataFrame, rounds: Int): DataFrame = {
    val spark = symbols.sparkSession
    import spark.implicits._
    var words = truncateLineage(symbols)
    val merges = scala.collection.mutable.ArrayBuffer.empty[(Long, String, String, String, Long)]
    var r = 1
    var exhausted = false
    while (r <= rounds && !exhausted) {
      val best = pairCounts(words)
        .orderBy(col("n").desc, col("pair"))
        .limit(1).collect()
      if (best.isEmpty) exhausted = true
      else {
        val pair = best.head.getString(0)
        val n = best.head.getLong(1)
        val Array(lhs, rhs) = pair.split(' ')
        merges += ((r.toLong, lhs, rhs, lhs + rhs, n))
        words = truncateLineage(applyMerge(words, lhs, rhs))
        r += 1
      }
    }
    merges.toSeq.toDF("merge_rank", "lhs", "rhs", "merged", "pair_n")
  }

  /** Tokenize `documents` with a trained merge list — the application
    * side of the artifact, shaped like the trainer: merges replay IN
    * RANK ORDER (BPE application is defined by training order) over the
    * DISTINCT-WORD table — one fold chain per distinct word, never per
    * token occurrence — and the per-word subword counts join back to
    * the exploded corpus on the word key (Zipf again: the expensive
    * fold runs on the small side; the corpus side is one explode + one
    * co-partitioned join + one per-doc aggregation, and AQE broadcasts
    * the word map while it fits). Returns (doc_id, n_words, n_tokens):
    * the subword inflation statistic. */
  def tokenize(documents: DataFrame, mergeList: Seq[(String, String)]): DataFrame = {
    val perWord = mergeList.foldLeft(wordSymbols(documents)) {
      case (df, (lhs, rhs)) => applyMerge(df, lhs, rhs)
    }.withColumn("n_toks", size(split(col("cur"), " ")).cast("long"))
      .select("word", "n_toks")
    documents
      .select(col("doc_id"), explode(split(col("text"), " ")).as("word"))
      .filter(col("word").rlike("^[a-z]+$"))
      .join(perWord, "word")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_words"), sum(col("n_toks")).as("n_tokens"))
  }
}
