package graft.dedup

import org.apache.spark.sql.{DataFrame, Encoder}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** MinHash + LSH banding and SimHash near-dup candidate generation
  * (LLM-data-pipeline extension set; engine-side only — hash-dependent, so
  * verified by property tests rather than a SQL oracle).
  *
  * Scale posture (the whole point of these operators): candidate pairs come
  * from equi-joins on (band, bucket) keys — cost is linear in postings and
  * in bucket collision counts, never O(n²) document pairs. Signatures are
  * computed per-row with zero shuffle ([[signaturesPerRow]]); the groupBy
  * form ([[signatures]]/[[signaturesFromShingles]]) exists for callers
  * that already materialized the shingle postings for exact verification.
  */
object MinHashLSH {

  val NumPerms = 64
  val Bands = 16           // 16 bands x 4 rows: catches J >= ~0.7 w.h.p.
  val RowsPerBand: Int = NumPerms / Bands
  val MersennePrime = 2147483647L // 2^31 - 1

  /** Deterministic permutation parameters (odd multiplier, fixed-stride
    * offset) — stable across runs and partitions. */
  private def perm(i: Int): (Long, Long) =
    (2L * i + 1, (i * 0x9E3779B9L) & 0x7fffffffL)

  /** (doc_id, sig array<long>[64]) — minhash signature over word 3-gram
    * shingles. Base hash = murmur3 (`hash`) of the shingle, folded to 31
    * bits; perm_i(h) = (a_i*h + b_i) mod (2^31-1). */
  def signatures(documents: DataFrame): DataFrame =
    signaturesFromShingles(Dedup.shingles(documents))

  /** Same, over an existing (doc_id, shingle) postings frame — lets
    * callers that already materialized the postings (e.g. [[verifiedPairs]])
    * avoid re-running the shingle explode. */
  def signaturesFromShingles(shingles: DataFrame): DataFrame = {
    val sh = shingles
      .withColumn("h31", (hash(col("shingle")).cast("long")
        .bitwiseAND(lit(0x7fffffffL))))
    val minCols = (0 until NumPerms).map { i =>
      val (a, b) = perm(i)
      min((col("h31") * a + b) % MersennePrime).as(s"m$i")
    }
    sh.groupBy("doc_id")
      .agg(minCols.head, minCols.tail: _*)
      .select(col("doc_id"),
        array((0 until NumPerms).map(i => col(s"m$i")): _*).as("sig"))
  }

  /** The same signature as a single PER-ROW expression — ZERO shuffle.
    * A document's whole shingle set lives inside its own row, so each of
    * the 64 permutation minima is an `array_min` fold over a per-row hash
    * array instead of a min-aggregate over exploded postings. Bit-identical
    * to [[signatures]] (same murmur3 fold, same permutation arithmetic,
    * minimized over the same distinct-shingle multiset; asserted in
    * MinHashLSHSpec), and documents with no shingle (< n words) vanish
    * from both.
    *
    * Scale: the signature stage becomes a pure scan — the only shuffle
    * left in banded candidate generation is the (band, bucket) equi-join
    * itself. It is also the only form a STREAMING dedup can use: a groupBy
    * signature is an update-mode aggregation, which cannot precede the
    * stateful bucket operator ([[graft.streaming.DocStream]]). */
  def signaturesPerRow(documents: DataFrame,
      carry: Seq[String] = Nil): DataFrame = {
    val sigCols = (0 until NumPerms).map { i =>
      val (a, b) = perm(i)
      expr(s"array_min(transform(__h31, h -> (h * ${a}L + ${b}L) % $MersennePrime))")
    }
    val keep = col("doc_id") +: carry.map(col)
    documents
      .select(keep :+ split(col("text"), " ").as("__w"): _*)
      .withColumn("__sh", array_distinct(Dedup.shingleArray(3)))
      .filter(size(col("__sh")) > 0)
      .withColumn("__h31",
        expr("transform(__sh, s -> CAST(hash(s) AS BIGINT) & 2147483647)"))
      .select(keep :+ array(sigCols: _*).as("sig"): _*)
  }

  /** The same signature as a single custom [[Aggregator]] (Spark's public
    * UDAF surface): ONE aggregation pass with a 64-slot min buffer per key
    * instead of 64 separate min-aggregate expressions. Same shuffle shape
    * (partial aggregation map-side), but one buffer update per row rather
    * than 64 expression evaluations — and it demonstrates the typed custom
    * aggregation extension point (SURVEY §2.6: the reference's only custom
    * aggregation surface). Verified equal to [[signatures]] in tests. */
  object MinHashSigAgg extends Aggregator[Long, Array[Long], Array[Long]] {
    override def zero: Array[Long] = Array.fill(NumPerms)(Long.MaxValue)
    override def reduce(buf: Array[Long], h31: Long): Array[Long] = {
      var i = 0
      while (i < NumPerms) {
        val (a, b) = perm(i)
        val v = (a * h31 + b) % MersennePrime
        if (v < buf(i)) buf(i) = v
        i += 1
      }
      buf
    }
    override def merge(x: Array[Long], y: Array[Long]): Array[Long] = {
      var i = 0
      while (i < NumPerms) { if (y(i) < x(i)) x(i) = y(i); i += 1 }
      x
    }
    override def finish(buf: Array[Long]): Array[Long] = buf
    override def bufferEncoder: Encoder[Array[Long]] = ExprEnc
    override def outputEncoder: Encoder[Array[Long]] = ExprEnc
    private lazy val ExprEnc: Encoder[Array[Long]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
  }

  /** [[signatures]] computed through [[MinHashSigAgg]]. */
  def signaturesViaAggregator(documents: DataFrame): DataFrame = {
    val agg = udaf(MinHashSigAgg)
    Dedup.shingles(documents)
      .withColumn("h31", hash(col("shingle")).cast("long")
        .bitwiseAND(lit(0x7fffffffL)))
      .groupBy("doc_id")
      .agg(agg(col("h31")).as("sig"))
  }

  /** Raw banding collisions over a signature frame: pairs agreeing on at
    * least one full band — the pure candidate-generation stage, before any
    * estimate or verification. Equi-join on (band, bucket), linear in
    * postings. */
  /** Explode a (doc_id, sig) frame into one (doc_id, band, bucket) row per
    * band; `carry` columns pass through (the streaming twin carries its
    * event-time column). Bucket = xxhash64 of the band's signature slice. */
  def bandedSignatures(sigs: DataFrame, carry: Seq[String] = Nil): DataFrame = {
    val bandCols = (0 until Bands).map { b =>
      val elems = (0 until RowsPerBand)
        .map(r => s"sig[${b * RowsPerBand + r}]").mkString(", ")
      struct(lit(b).as("band"), expr(s"xxhash64($elems)").as("bucket"))
    }
    val keep = col("doc_id") +: carry.map(col)
    sigs.select(keep :+ explode(array(bandCols: _*)).as("bk"): _*)
      .select(keep ++ Seq(col("bk.band").as("band"),
        col("bk.bucket").as("bucket")): _*)
  }

  def bandingCandidates(sigs: DataFrame): DataFrame = {
    val banded = bandedSignatures(sigs)

    banded.as("a")
      .join(banded.as("b"),
        col("a.band") === col("b.band") && col("a.bucket") === col("b.bucket") &&
          col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .distinct()
  }

  /** Candidate pairs from banding + signature-agreement estimate.
    * Emits pairs with estimated Jaccard >= `threshold`. */
  def candidatePairs(documents: DataFrame, threshold: Double): DataFrame = {
    // Signatures are referenced three times (banding + both sides of the
    // verify join); persist the small (doc_id, 64-long) frame so the
    // per-row signature scan runs once (at full scale this is a
    // materialized signature table). Per-row, not groupBy: the signature
    // stage shuffles nothing. Ownership note: blocks stay cached
    // until LRU eviction — long-lived sessions calling this repeatedly
    // should unpersist after materializing.
    val sigs = signaturesPerRow(documents).persist()

    bandingCandidates(sigs)
      .join(sigs.withColumnRenamed("doc_id", "doc_a").withColumnRenamed("sig", "sig_a"), "doc_a")
      .join(sigs.withColumnRenamed("doc_id", "doc_b").withColumnRenamed("sig", "sig_b"), "doc_b")
      .withColumn("est_jaccard", round(expr(
        s"aggregate(zip_with(sig_a, sig_b, (x, y) -> IF(x = y, 1.0D, 0.0D)), 0D, (acc, x) -> acc + x) / $NumPerms"), 6))
      .filter(col("est_jaccard") >= threshold)
      .select("doc_a", "doc_b", "est_jaccard")
  }

  /** The full MinHash dedup composition with EXACT verification: banding
    * candidates -> per-candidate exact n-gram Jaccard (shingle intersection
    * computed ONLY for candidate pairs, not all pairs) -> threshold. The
    * scale shape of a production dedup pass: the quadratic stage is the
    * banding equi-join, and exact set arithmetic touches only survivors.
    *
    * Recall analysis (this bounds where the exhaustive-oracle equality
    * holds): a pair at true Jaccard j escapes all 16 4-row bands with
    * probability (1 - j^4)^16 — ~35% at j=0.5, ~1.2% at j=0.7, ~2e-4 at
    * j=0.8, ~5e-12 at the planted-dup level (~0.95). `threshold` should
    * therefore sit at or above the banding S-curve's high-probability
    * region (>= ~0.8); the registered query uses
    * `SparkEntry.MinhashVerifyThreshold` = 0.8, where the deterministic
    * hashes retain every corpus pair and the result EQUALS the exhaustive
    * exact-Jaccard answer the DuckDB oracle computes. Callers passing a
    * lower threshold get the same candidates-then-verify shape but only
    * S-curve recall against an exhaustive ground truth.
    *
    * The shingle postings are built once, persisted, and reused by the
    * signature build, the pair-size table, and both intersection join
    * sides (ownership: cached until LRU eviction — long-lived sessions
    * should unpersist after materializing, same policy as
    * [[candidatePairs]]). */
  def verifiedPairs(documents: DataFrame, threshold: Double): DataFrame = {
    val sh = Dedup.shingles(documents).persist()
    val cands = bandingCandidates(signaturesFromShingles(sh).persist())
    verifyJaccard(cands, sh, threshold)
  }

  /** The exact-verification stage shared by every candidates-then-verify
    * dedup composition ([[verifiedPairs]], [[verifiedSimhashPairs]]):
    * per-candidate exact n-gram Jaccard, computed ONLY for the given
    * `(doc_a, doc_b)` candidate pairs over the `(doc_id, shingle)`
    * postings frame — the quadratic stage stays in candidate generation,
    * exact set arithmetic touches only survivors. */
  def verifyJaccard(cands: DataFrame, sh: DataFrame,
      threshold: Double): DataFrame = {
    // r14 (guide §2.3/§2.4): one per-doc set-array row replaces the two
    // postings-sized probe sides — candidates get both arrays attached
    // and the overlap is counted in-row (array_intersect; `sh` is
    // distinct per (doc_id, shingle) by the callers' contract, so
    // |array| == the old count and |intersect| == the old matched-row
    // count), instead of exploding candidates × |doc_a| shingles through
    // a (doc_b, shingle) exchange and re-aggregating. The explicit
    // n_inter > 0 filter preserves the old inner-join-on-postings
    // semantics (a candidate pair sharing no shingle never surfaced).
    val sets = sh.groupBy("doc_id")
      .agg(collect_set(col("shingle")).as("__ss"))
      .withColumn("__n", size(col("__ss")).cast("long"))

    cands.select("doc_a", "doc_b")
      .join(sets.select(col("doc_id").as("doc_a"), col("__ss").as("__sa"),
        col("__n").as("n_a")), "doc_a")
      .join(sets.select(col("doc_id").as("doc_b"), col("__ss").as("__sb"),
        col("__n").as("n_b")), "doc_b")
      .withColumn("n_inter",
        size(array_intersect(col("__sa"), col("__sb"))).cast("long"))
      .filter(col("n_inter") > 0)
      .withColumn("jaccard", graft.text.TextAnalysis.floor6(
        col("n_inter") / (col("n_a") + col("n_b") - col("n_inter"))))
      .filter(col("jaccard") >= threshold)
      .select("doc_a", "doc_b", "n_inter", "jaccard")
  }

  /** The postings-join verify (the pre-r14 [[verifyJaccard]] body), kept
    * for LOW-selectivity candidate sets: when candidates are numerous
    * relative to the corpus (the wide-radius simhash verifier), pairing
    * only the MATCHED postings rows shuffles less than attaching two
    * full shingle arrays to every candidate. Identical output. */
  def verifyJaccardPostings(cands: DataFrame, sh: DataFrame,
      threshold: Double): DataFrame = {
    val sizes = sh.groupBy("doc_id").agg(count(lit(1)).as("n_sh"))

    val inter = cands.select("doc_a", "doc_b")
      .join(sh.withColumnRenamed("doc_id", "doc_a"), "doc_a")
      .join(sh.withColumnRenamed("doc_id", "doc_b"), Seq("doc_b", "shingle"))
      .groupBy("doc_a", "doc_b")
      .agg(count(lit(1)).as("n_inter"))

    inter
      .join(broadcast(sizes.withColumnRenamed("doc_id", "doc_a")
        .withColumnRenamed("n_sh", "n_a")), "doc_a")
      .join(broadcast(sizes.withColumnRenamed("doc_id", "doc_b")
        .withColumnRenamed("n_sh", "n_b")), "doc_b")
      .withColumn("jaccard", graft.text.TextAnalysis.floor6(
        col("n_inter") / (col("n_a") + col("n_b") - col("n_inter"))))
      .filter(col("jaccard") >= threshold)
      .select("doc_a", "doc_b", "n_inter", "jaccard")
  }

  /** The persistable MinHash LSH index of a corpus: one `(doc_id, band,
    * bucket)` row per band — [[bandedSignatures]] over the zero-shuffle
    * per-row signatures. At production scale this frame is WRITTEN ONCE
    * (parquet, partitioned by `band`) when the corpus is ingested; the
    * 100 TB of document text is never re-signed afterwards. 16 rows of
    * (long, int, long) per document ≈ 300 B/doc — ~0.3% of a 100 KB
    * document, so the index is the thing that fits where the corpus
    * doesn't. */
  def signatureIndex(documents: DataFrame): DataFrame =
    bandedSignatures(signaturesPerRow(documents))

  /** Incremental near-dup detection of a NEW BATCH against an already-
    * indexed corpus — the production shape of continuous ingest: sign and
    * band ONLY the batch (per-row scan, zero shuffle), equi-join its
    * bands against the persisted [[signatureIndex]] plus itself for
    * batch-internal dups, then exact-verify candidates with shingles
    * built ONLY for touched documents (a semi-join prunes the text scan
    * to candidate doc_ids, so corpus text is re-read for the few docs a
    * candidate names — at 100 TB that is a pushed-down id filter, not a
    * corpus pass).
    *
    * `corpusText` must cover every doc_id in `index` (it is scanned only
    * semi-join-pruned); `batch` docs must carry ids disjoint from the
    * corpus. Output = exactly the >= `threshold` pairs TOUCHING the
    * batch, `doc_a < doc_b` (corpus–corpus pairs were already found when
    * the corpus itself was ingested — by induction the union of all
    * incremental outputs equals the full-corpus [[verifiedPairs]]; the
    * banding recall bound is the same S-curve as documented there).
    * Candidate-stage equality with the one-shot composition is pinned in
    * MinHashLSHSpec. */
  def incrementalVerifiedPairs(index: DataFrame, corpusText: DataFrame,
      batch: DataFrame, threshold: Double): DataFrame = {
    // the batch is read three times (banding + semi-join + shingles) and
    // is small by definition — persist its banded signatures
    val batchBanded = signatureIndex(batch).persist()
    val vsCorpus = index.as("a")
      .join(batchBanded.as("b"),
        col("a.band") === col("b.band") && col("a.bucket") === col("b.bucket"))
      .select(least(col("a.doc_id"), col("b.doc_id")).as("doc_a"),
        greatest(col("a.doc_id"), col("b.doc_id")).as("doc_b"))
    val vsBatch = batchBanded.as("a")
      .join(batchBanded.as("b"),
        col("a.band") === col("b.band") && col("a.bucket") === col("b.bucket") &&
          col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
    val cands = vsCorpus.union(vsBatch).distinct().persist()

    val touched = cands.select(col("doc_a").as("doc_id"))
      .union(cands.select(col("doc_b").as("doc_id"))).distinct()
    val sh = Dedup.shingles(
      corpusText.select("doc_id", "text").union(batch.select("doc_id", "text"))
        .join(touched, Seq("doc_id"), "left_semi")).persist()
    verifyJaccard(cands, sh, threshold)
  }

  /** Containment candidates from winnowing fingerprints: documents sharing
    * >= `minShared` winnowed rolling-hash fingerprints
    * ([[graft.functions.Winnow]]) — catches substring CONTAINMENT that
    * set-overlap measures miss when document sizes differ a lot (a 100-word
    * quote inside a 10k-word document barely moves Jaccard but is
    * guaranteed shared winnow fingerprints). Inverted-index equi-join on
    * the fingerprint, linear in postings. Requires
    * [[graft.functions.GraftFunctions.register]].
    *
    * `maxDf` is the production scale knob: a fingerprint shared by `df`
    * documents contributes `df*(df-1)/2` join rows, so one hot
    * boilerplate n-gram (page headers, license blocks) turns the
    * candidate join quadratic — the standard inverted-index fix is to
    * DROP ultra-common postings before pairing (they carry no containment
    * signal; they are the corpus's stop-shingles). The default keeps
    * every posting: that is the form the DuckDB oracle replays, and the
    * form [[verifiedContainmentPairs]]'s superset bound is proved for
    * (a capped index can miss a contained doc whose fingerprints are ALL
    * ultra-common, so the cap is opt-in, not silent). */
  def winnowContainmentPairs(documents: DataFrame, minShared: Long,
      k: Int = 16, w: Int = 16, maxDf: Long = Long.MaxValue): DataFrame = {
    // the winnow scan (rolling hash over every char of the corpus) is the
    // expensive stage and the postings frame is two longs per fingerprint
    // — persist it so the self-join's two sides (and the capped path's
    // hot-set aggregation) reuse ONE pass instead of re-hashing the
    // corpus 2-3x (ownership: cached until LRU eviction, same policy as
    // candidatePairs)
    val raw = documents
      .select(col("doc_id"), explode(expr(s"graft_winnow(text, $k, $w)")).as("fp"))
      .persist()
    val fps =
      if (maxDf == Long.MaxValue) raw
      else {
        // the HOT set (df > maxDf) is tiny by definition — broadcast it
        // and anti-join, pruning hot postings BEFORE the pair join sees
        // them (broadcasting the keep-side would ship nearly the whole
        // fingerprint vocabulary)
        val hot = raw.groupBy("fp").agg(count(lit(1)).as("__df"))
          .filter(col("__df") > maxDf).select("fp")
        raw.join(broadcast(hot), Seq("fp"), "left_anti")
      }
    fps.as("a")
      .join(fps.as("b"),
        col("a.fp") === col("b.fp") && col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .agg(count(lit(1)).as("n_shared_fps"))
      .filter(col("n_shared_fps") >= minShared)
  }

  /** Containment composition with EXACT verification: winnow-fingerprint
    * candidates -> full-text substring check computed ONLY for candidate
    * pairs, the same construction as [[verifiedPairs]]. Requires
    * [[graft.functions.GraftFunctions.register]].
    *
    * Superset bound (where the exhaustive-oracle equality holds): a
    * contained text of length L yields at least (L - k - w + 2) / w
    * guaranteed-shared interior fingerprints, so `minShared` = 5 needs
    * L >= ~k + w·(minShared + 1) — documents SHORTER than `minTextLen`
    * could be fully contained yet never become candidates. Both this
    * operator and its oracle therefore gate on `length(text) >=
    * minTextLen`, making the equality hold by construction rather than by
    * corpus accident. */
  def verifiedContainmentPairs(documents: DataFrame,
      minShared: Long = 5, minTextLen: Int = 120): DataFrame = {
    val docs = documents.filter(length(col("text")) >= minTextLen)
    val cands = winnowContainmentPairs(docs, minShared)
      .select("doc_a", "doc_b")
    val t = docs.select(col("doc_id"), col("text"))
    cands
      .join(t.select(col("doc_id").as("doc_a"), col("text").as("text_a")), "doc_a")
      .join(t.select(col("doc_id").as("doc_b"), col("text").as("text_b")), "doc_b")
      .filter(col("text_b").contains(col("text_a")) ||
        col("text_a").contains(col("text_b")))
      .select("doc_a", "doc_b")
  }

  /** 64-bit SimHash per document from per-word xxhash64 bit votes, computed
    * entirely in codegen'd higher-order functions (no explode — one pass per
    * row). Word hashes are computed ONCE (inner transform), then folded into
    * 64 bit-vote counters; hashing per (word × bit) would be 64× the work. */
  def simhash(documents: DataFrame): DataFrame =
    documents.select(
      col("doc_id"),
      expr(
        """aggregate(
          |  transform(split(text, ' '), w -> xxhash64(w)),
          |  array_repeat(0L, 64),
          |  (acc, h) -> zip_with(acc, sequence(0, 63),
          |                (a, j) -> a + IF((shiftright(h, j) & 1) = 1, 1L, -1L)),
          |  acc -> aggregate(zip_with(acc, sequence(0, 63),
          |                     (a, j) -> IF(a > 0, shiftleft(1L, j), 0L)),
          |                   0L, (s, x) -> s + x))""".stripMargin).as("simhash"))

  /** SimHash near-dup pairs: bucket on `64/nChunks`-bit chunks, then verify
    * with bit_count(xor). Recall guarantee comes from the pigeonhole: a
    * pair within hamming distance `nChunks - 1` MUST share one chunk, so
    * `maxHamming` above chunks-1 is rejected — it would silently lose
    * pairs whose differing bits spread across all chunks. More chunks buy
    * a wider guaranteed hamming radius at the cost of smaller (noisier)
    * bucket keys; the default 4x16 is the precision-leaning choice. */
  def simhashPairs(documents: DataFrame, maxHamming: Int = 3,
      nChunks: Int = 4): DataFrame =
    simhashPairsFromSignatures(simhash(documents), maxHamming, nChunks)

  /** The chunk-bucketed hamming candidate stage over an ALREADY-COMPUTED
    * `(doc_id, simhash)` signature frame — the machinery [[simhashPairs]]
    * (text word-vote signatures) and the multimodal frame-signature
    * composition ([[graft.multimodal.Multimodal.nearDupPairs]]) share.
    * Same pigeonhole recall guarantee: differing bits of a pair within
    * `nChunks - 1` hamming cannot cover every chunk, so the pair shares
    * at least one bucket. */
  def simhashPairsFromSignatures(signatures: DataFrame, maxHamming: Int,
      nChunks: Int): DataFrame = {
    require(nChunks >= 2 && 64 % nChunks == 0,
      "chunks must evenly divide the 64-bit fingerprint")
    require(maxHamming <= nChunks - 1,
      s"$nChunks-chunk bucketing only guarantees recall for hamming <= ${nChunks - 1}")
    val bits = 64 / nChunks
    val mask = (1L << bits) - 1
    // tiny (doc_id, long) frame reused on both sides of the self-join —
    // persist so the signature pass over the corpus runs once, not twice
    val sh = signatures.persist()
    val chunked = sh.select(col("doc_id"), col("simhash"),
        explode(array((0 until nChunks).map(k =>
          struct(lit(k).as("k"),
            expr(s"(shiftright(simhash, ${k * bits}) & $mask)").as("chunk"))): _*)).as("c"))
      .select(col("doc_id"), col("simhash"), col("c.k").as("k"), col("c.chunk").as("chunk"))

    chunked.as("a")
      .join(chunked.as("b"),
        col("a.k") === col("b.k") && col("a.chunk") === col("b.chunk") &&
          col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"),
        expr("bit_count(a.simhash ^ b.simhash)").as("hamming"))
      .distinct()
      .filter(col("hamming") <= maxHamming)
  }

  /** SimHash composition with EXACT verification: chunk-bucketed hamming
    * candidates -> per-candidate exact n-gram Jaccard, the same
    * construction as [[verifiedPairs]].
    *
    * Where the exhaustive-oracle equality holds: the pigeonhole `require`
    * inside [[simhashPairs]] guarantees the candidate stage misses nothing
    * within `maxHamming`; but UNLIKE minhash banding there is no
    * distribution-free bound linking exact Jaccard to simhash hamming — a
    * high-Jaccard pair CAN land beyond any fixed radius when its few
    * differing words flip low-margin bit votes (observed: planted ~0.95
    * dups reach hamming 9 under 64-bit fingerprints once the verifier
    * window covers the sf0.1 corpus's dup range). The library defaults
    * stay at 8x8-bit chunks / hamming <= 7 — 256-value chunk keys keep
    * the candidate join selective on open-world corpora (4-bit chunks
    * would collapse to 16 keys ⇒ ~n²/16 joined rows per position). The
    * REGISTERED verifier query instead passes 16x4-bit chunks / radius 15
    * explicitly: its window is a constant 1000 docs, where selectivity is
    * irrelevant and the wider radius covers the observed hamming-9 pair
    * with margin. SimhashVerifiedSpec asserts the precondition — every
    * exact pair at `threshold` sits within the radius used — directly
    * against the shipped corpora, so drift fails a test instead of
    * silently breaking the equality. Callers on open-world
    * corpora get candidates-then-verify precision 1 and empirically-high
    * (not guaranteed) recall — that caveat is inherent to simhash, and is
    * why [[verifiedPairs]] is the default dedup composition. */
  def verifiedSimhashPairs(documents: DataFrame, threshold: Double,
      nChunks: Int = 8, maxHamming: Int = 7): DataFrame = {
    val cands = simhashPairs(documents, maxHamming, nChunks)
    // postings-join verify, NOT the array-set variant: a wide hamming
    // radius makes this candidate set large relative to the corpus, and
    // attaching two full shingle arrays to every candidate was measured
    // SLOWER at sf0.1 (1.8 → 2.7 s) than streaming only the matched
    // postings rows — the opposite trade of the selective-candidate
    // callers (r14; see verifyJaccard)
    verifyJaccardPostings(cands, Dedup.shingles(documents).persist(),
      threshold)
  }
}
