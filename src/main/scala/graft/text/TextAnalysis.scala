package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text-analysis operators over the `documents` table (LLM-data-pipeline
  * extension set): language ID, quality scoring, token counting,
  * fingerprinting.
  *
  * Everything is built-in Catalyst expressions (higher-order array
  * functions) plus the custom [[graft.functions.Fnv1a64]] expression —
  * fully codegen'd, no UDFs, embarrassingly parallel per row: at 100 TB
  * these run as a single scan stage with zero shuffle.
  */
object TextAnalysis {

  /** Tiny per-language stopword profiles for the n-gram/stopword heuristic.
    * (Real corpora would use larger profiles; the operator shape — per-row
    * array intersection ratios + argmax — is the same.) */
  val stopwords: Map[String, Seq[String]] = Map(
    "en" -> Seq("the", "a", "of", "and", "to", "in", "is"),
    "fr" -> Seq("le", "la", "et", "de", "un", "les", "des"),
    "es" -> Seq("el", "la", "y", "de", "en", "los", "que"),
    "de" -> Seq("der", "die", "und", "das", "ein", "ist", "nicht"),
    "zh" -> Seq("的", "是", "了", "在", "和", "有", "我"))

  /** Deterministic language order for argmax tie-breaking. */
  val langOrder: Seq[String] = Seq("en", "fr", "es", "de", "zh")

  /** 6-dp truncation via explicit IEEE ops (`floor(x*1e6)/1e6`). Used
    * instead of `round()` for ratio outputs: the ratios are rationals with
    * small denominators, so `round` regularly lands on exact half-way ties
    * where Spark (BigDecimal-exact HALF_UP) and DuckDB (scaled-multiply)
    * disagree by 1e-6; floor of the identical double multiply is
    * bit-identical across engines. */
  def floor6(c: Column): Column = floor(c * 1000000.0) / 1000000.0

  /** The DuckDB rendering of [[floor6]] — keep the two in lockstep. */
  def floor6Sql(e: String): String = s"floor(($e) * 1000000.0) / 1000000.0"

  /** Fraction of whitespace tokens that hit `lang`'s stopword profile. */
  def stopwordRatio(words: Column, lang: String): Column = {
    val profile = array(stopwords(lang).map(lit): _*)
    size(filter(words, w => array_contains(profile, w))) / size(words)
  }

  /** Language-ID by stopword-profile ratio with first-max tie-break in
    * [[langOrder]]. Input must expose a `__words` array column. */
  def predictLang: Column = {
    val scores = langOrder.map(l => l -> col(s"score_$l"))
    // first language whose score >= all others (deterministic argmax)
    scores.foldRight(lit(langOrder.last)) { case ((l, s), rest) =>
      when(scores.filter(_._1 != l).map(_._2).foldLeft(lit(true))((acc, o) => acc && s >= o), l)
        .otherwise(rest)
    }
  }

  /** The per-row annotation core shared by [[langId]], [[quality]] and the
    * streaming ingest gate ([[graft.streaming.DocIngestApp]]): raw
    * language scores (predictLang compares UNfloored ratios), predicted
    * language, and the quality columns, added to the input frame. Pure
    * scan stage — no join, no shuffle — which is exactly why the
    * streaming ingest can reuse it ahead of its stateful dedup. ONE
    * definition of the scoring arithmetic: batch and stream cannot
    * drift. */
  def annotate(documents: DataFrame): DataFrame = {
    val withWords = documents
      .withColumn("__words", split(col("text"), " "))
    val withScores = langOrder.foldLeft(withWords)((df, l) =>
      df.withColumn(s"score_$l", stopwordRatio(col("__words"), l)))
    withScores
      .withColumn("pred_lang", predictLang)
      .withColumn("n_chars_actual", length(col("text")).cast("long"))
      .withColumn("n_tokens", size(col("__words")).cast("long"))
      .withColumn("avg_token_len",
        floor6((col("n_chars_actual") - (col("n_tokens") - 1)) / col("n_tokens")))
      .withColumn("stopword_ratio", floor6(stopwordRatio(col("__words"), "en")))
      .withColumn("quality_score",
        floor6(
          least(col("n_tokens") / 100.0, lit(1.0)) * 0.5 +
          least(col("avg_token_len") / 8.0, lit(1.0)) * 0.3 +
          col("stopword_ratio") * 0.2))
  }

  /** doc_id, per-language ratios (6 dp), predicted language. */
  def langId(documents: DataFrame): DataFrame =
    annotate(documents)
      .select(Seq(col("doc_id")) ++
        langOrder.map(l => floor6(col(s"score_$l")).as(s"score_$l")) :+
        col("pred_lang"): _*)

  /** Quality scoring: structural ratios blended into a [0,1] score.
    * Weights are arbitrary but fixed; the operator shape (cheap per-row
    * features -> bounded score -> filter) is the production pattern. */
  def quality(documents: DataFrame): DataFrame =
    annotate(documents)
      .select("doc_id", "n_chars_actual", "n_tokens", "avg_token_len",
        "stopword_ratio", "quality_score")

  /** Token counting: whitespace tokens, regex word/punct tokens (BPE-ish
    * pre-tokenization), and the chars/4 BPE estimate. */
  def tokenCounts(documents: DataFrame): DataFrame =
    documents
      .withColumn("ws_tokens", size(split(col("text"), " ")).cast("long"))
      .withColumn("subword_tokens",
        expr("size(regexp_extract_all(text, '[a-z]+|[0-9]+|[^a-z0-9 ]+', 0))").cast("long"))
      .withColumn("est_bpe_tokens", ceil(length(col("text")) / 4.0).cast("long"))
      .select("doc_id", "ws_tokens", "subword_tokens", "est_bpe_tokens")

  /** PII patterns shared by the scrubber and its oracle (kept to syntax
    * with identical semantics in Java regex and RE2). */
  val EmailPattern = "[a-z0-9._%+-]+@[a-z0-9.-]+\\.[a-z]{2,}"
  val PhonePattern = "\\+[0-9][0-9-]{6,}"

  /** PII scrubbing: redact emails/phone numbers, count redactions.
    * The corpus has no PII, so deterministic synthetic contact strings are
    * appended first — the operator (regex redaction over a text column at
    * scan speed, zero shuffle) is the production shape. */
  def piiScrub(documents: DataFrame): DataFrame =
    documents
      .withColumn("text2", concat(col("text"),
        lit(" contact u"), col("doc_id"), lit("@mail.com or +234-80"),
        col("doc_id"), lit("-55")))
      .select(
        col("doc_id"),
        // Column API, not expr(): SQL-literal backslash unescaping would
        // silently alter the pattern
        size(regexp_extract_all(col("text2"), lit(EmailPattern), lit(0)))
          .cast("long").as("n_emails"),
        size(regexp_extract_all(col("text2"), lit(PhonePattern), lit(0)))
          .cast("long").as("n_phones"),
        regexp_replace(
          regexp_replace(col("text2"), EmailPattern, "<EMAIL>"),
          PhonePattern, "<PHONE>").as("scrubbed"))

  /** End-to-end corpus curation — the training-data pipeline this library
    * exists for, composed from the library's own operators: language gate
    * (predicted profile) ∧ quality gate (score >= threshold) ∧ exact-dedup
    * keeper set (left-semi join against [[graft.dedup.Dedup.exact]]).
    * Two scan-stage passes + one tiny semi join; at 100 TB each gate is a
    * pushed filter and the keeper set is a digest join — no wide shuffle. */
  def curate(documents: DataFrame, lang: String, minQuality: Double): DataFrame = {
    // ONE annotation scan: language and quality gates come from the same
    // per-row [[annotate]] columns (the quality(...) ⋈ langId(...) join
    // this replaces scanned the corpus twice and shuffled both sides on
    // doc_id — measured ~2× the scan cost at sf1 for identical output)
    val gates = annotate(documents)
      .filter(col("pred_lang") === lang && col("quality_score") >= minQuality)
    val keepers = graft.dedup.Dedup.exact(documents)
      .select(col("keep_doc_id").as("doc_id"))
    gates.join(keepers, Seq("doc_id"), "left_semi")
      .select("doc_id", "pred_lang", "quality_score", "n_tokens")
  }

  /** Document fingerprints via the custom FNV-1a 64 Catalyst expression:
    * whole-document fingerprint + min token fingerprint (a 1-perm minhash —
    * the rolling/winnowed variant lives in dedup.MinHashLSH). Requires
    * [[graft.functions.GraftFunctions.register]]. */
  def fingerprints(documents: DataFrame): DataFrame =
    documents.select(
      col("doc_id"),
      expr("graft_fnv64(text)").as("doc_fp"),
      expr("array_min(transform(split(text, ' '), w -> graft_fnv64(w)))").as("min_token_fp"))

  /** Winnowed rolling-hash fingerprints (custom codegen'd expression
    * [[graft.functions.Winnow]]): any substring of >= w+k-1 chars shared by
    * two documents yields a shared fingerprint — the containment-detection
    * primitive for plagiarism/near-dup at corpus scale. Emitted as scalar
    * summaries (array outputs don't hash uniformly across engines);
    * pairwise overlap runs on the exploded fingerprints. */
  def winnowFingerprints(documents: DataFrame, k: Int = 8, w: Int = 16): DataFrame =
    documents
      .withColumn("__fps", expr(s"graft_winnow(text, $k, $w)"))
      .select(col("doc_id"),
        size(col("__fps")).cast("long").as("n_fps"),
        array_min(col("__fps")).as("fp_min"),
        // xor-fold, not sum: full-range 64-bit values overflow ANSI addition
        expr("aggregate(__fps, 0L, (a, x) -> a ^ x)").as("fp_xor"))

  /** PMI collocations: adjacent word pairs whose co-occurrence is
    * disproportionate to their marginals — pointwise mutual information
    * (Church & Hanks, ACL 1989), THE standard multiword-expression
    * detector for vocabulary curation and tokenizer seeding:
    *
    *   pmi = ln( P(w1 w2) / (P(w1) · P(w2)) )
    *       = ln( (c12 / T_bi) / ((c1 / T_uni) · (c2 / T_uni)) )
    *
    * truncated to INTEGER micro-nats (the corpus-LM discipline from
    * [[TrainingPrep.unigramLogProb]]): the ratio is ONE double-typed
    * scalar expression — identical shape in the oracle, IEEE-exact
    * per row — floored to a long before anything aggregates, so the
    * output has no cross-engine float drift. `minCount` prunes the
    * unstable low-frequency tail FIRST (PMI's known bias toward
    * hapax pairs — also what keeps the output corpus-scale-bounded).
    *
    * Shuffle shape: one bigram-type aggregation with map-side combine
    * (the count-pruned type table is what survives), one unigram
    * aggregation; the pruned pair table joins its two marginals —
    * vocabulary-sized joins, never the corpus. Returns
    * (w1, w2, pair_n, w1_n, w2_n, pmi_micro), pairs with pair_n >=
    * minCount only. */
  def collocations(documents: DataFrame, minCount: Long = 5): DataFrame = {
    require(minCount >= 1, s"minCount $minCount must be >= 1")
    val words = documents.select(split(col("text"), " ").as("w"))
    val uni = words.select(explode(col("w")).as("t"))
      .groupBy("t").agg(count(lit(1)).as("n"))
    val totals = uni.agg(sum(col("n")).as("t_uni"))
    val bg = words.select(explode(expr(
        """if(size(w) < 2, array(),
          |  transform(sequence(1, size(w) - 1),
          |    i -> struct(w[i-1] AS w1, w[i] AS w2)))""".stripMargin)).as("b"))
      .select(col("b.w1").as("w1"), col("b.w2").as("w2"))
    val pairs = bg.groupBy("w1", "w2").agg(count(lit(1)).as("pair_n"))
      .filter(col("pair_n") >= minCount)
    val tBi = bg.agg(count(lit(1)).as("t_bi"))
    pairs
      .join(uni.select(col("t").as("w1"), col("n").as("w1_n")), "w1")
      .join(uni.select(col("t").as("w2"), col("n").as("w2_n")), "w2")
      .crossJoin(broadcast(tBi))
      .crossJoin(broadcast(totals))
      .select(col("w1"), col("w2"), col("pair_n"), col("w1_n"), col("w2_n"),
        floor(log(
          (col("pair_n") / col("t_bi").cast("double")) /
            ((col("w1_n") / col("t_uni").cast("double")) *
              (col("w2_n") / col("t_uni").cast("double")))) * 1e6)
          .cast("long").as("pmi_micro"))
  }

  /** [[collocations]] oracle — the same scalar formula verbatim over the
    * same aggregations. Needs `docs(text)` in scope. */
  def collocationsOracleSql(minCount: Long = 5): String =
    s"""w AS (SELECT string_split(text, ' ') AS w FROM docs),
       |uni AS (SELECT t, CAST(count(*) AS BIGINT) AS n
       |        FROM (SELECT unnest(w) AS t FROM w) GROUP BY 1),
       |tu AS (SELECT CAST(sum(n) AS BIGINT) AS t_uni FROM uni),
       |bg AS (SELECT w[i] AS w1, w[i+1] AS w2
       |       FROM w, LATERAL (SELECT unnest(range(1, len(w))) AS i)),
       |p AS (SELECT w1, w2, CAST(count(*) AS BIGINT) AS pair_n FROM bg
       |      GROUP BY 1, 2 HAVING count(*) >= $minCount),
       |tb AS (SELECT CAST(count(*) AS BIGINT) AS t_bi FROM bg)
       |SELECT p.w1, p.w2, p.pair_n, u1.n AS w1_n, u2.n AS w2_n,
       |  CAST(floor(ln((p.pair_n / CAST(t_bi AS DOUBLE)) /
       |    ((u1.n / CAST(t_uni AS DOUBLE)) * (u2.n / CAST(t_uni AS DOUBLE))))
       |    * 1e6) AS BIGINT) AS pmi_micro
       |FROM p JOIN uni u1 ON p.w1 = u1.t
       |       JOIN uni u2 ON p.w2 = u2.t
       |       CROSS JOIN tb CROSS JOIN tu""".stripMargin
}
