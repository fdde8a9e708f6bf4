package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.cdc.{DimensionCdc, EnvelopeOps, SnapshotDiff}
import graft.dedup.{Dedup, DupSpans, MinHashLSH}
import graft.functions.GraftFunctions
import graft.multimodal.Multimodal
import graft.ops.{AsOfJoin, Enrich, LatestByKey, Notify, Predicates, Reconcile, Windows}
import graft.sim.Similarity
import graft.text.TextAnalysis

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Each entry in [[queries]] is one operator from SURVEY §2 (or a
  * scale-extension operator) expressed over the driver's parquet corpus;
  * [[oracleSql]] carries the DuckDB-equivalent SQL for hash verification.
  * Column names/aliases match between the two by construction (the driver
  * sorts columns by name before hashing).
  */
object SparkEntry {

  // ---- thresholds (analog of reference application.conf values, scaled to
  //      the test corpus's value range 0..~330) -------------------------------
  val HighValueThreshold = 200.0   // analog of ₦500,000 (inclusive >=)
  val VelocityWindowSec  = 3600    // analog of 60 s (corpus is ~30 days sparse)
  val VelocityMinTxns    = 2L      // analog of >=5
  val VelocityAdvanceSec = 1800    // hopping advance: 2 overlapping windows
  // the q_velocity_hopping oracle fans each event out over EXACTLY
  // window/advance integer hops (generate_series 0 .. w/a - 1); Spark's
  // two-arg window() also handles non-divisible hops (ceil expansion), so
  // a knob change to a non-multiple would silently desync the oracle —
  // fail at class-load instead
  require(VelocityWindowSec % VelocityAdvanceSec == 0,
    s"VelocityWindowSec ($VelocityWindowSec) must be a multiple of " +
      s"VelocityAdvanceSec ($VelocityAdvanceSec): the hopping-window oracle " +
      "derives its per-event fan-out as window/advance exact hops")
  val DailySpendAlert    = 150.0   // analog of ₦1,000,000 / 24 h (~p90 of daily sums)
  val DormancyGap        = "48 hours" // analog of 30-day inactivity gap
  val BigramMinCount     = 2L      // LM count cutoff: singleton bigram types prune
  val DormancyGapUs      = 48L * 3600 * 1000000 // same gap in epoch-micros

  // ---- extension-operator knobs (tuned to the corpus distributions) --------
  /** Committed golden binary-media fixture (scripts/gen_media.py) — the
    * DuckDB oracles read it by absolute path since it lives in the repo,
    * not in the sfDir corpus. Keep in sync with [[Tables.media]]. */
  val MediaFixturePath   = sys.env.getOrElse("GRAFT_MEDIA_PATH",
    "/root/repo/testdata/media/media.parquet")
  val JaccardThreshold   = 0.5    // exact n-gram pairs (planted near-dups ~0.95)
  val JaccardMaxDocId    = 1000L  // bounded candidate set for the oracle
                                  // path. 1000, not 200: the sf0.1-derived
                                  // corpora plant their first near-dup
                                  // pairs above id 200 (7 pairs < 1000),
                                  // so the cluster/verified queries were
                                  // trivially empty at the gated SFs —
                                  // correct, but zero-row evidence. Still
                                  // a CONSTANT window: verifier cost does
                                  // not grow with SF
  val MultimodalDupThreshold = 0.5 // frame-SET Jaccard cut: the planted
                                   // near-dups differ by ONE 64-char frame
                                   // (frame overlap (n-1)/(n+1) ≥ 0.5 from
                                   // n=3), while unrelated docs share no
                                   // frames — 0.5 splits the two cleanly
  val MinhashEstThreshold = 0.7   // banding est-jaccard cut
  val MinhashVerifyThreshold = 0.8 // verified-pairs cut — at/above the 16x4
                                   // banding S-curve so candidate recall ~1
                                   // and the exhaustive-oracle equality
                                   // holds (MinHashLSH.verifiedPairs doc)
  val ContainMinTextLen  = 120    // verified containment length gate (winnow
                                  // fingerprint-count superset bound)
  val ContainmentMaxDf   = 64L    // hot-postings cap for the capped variant
                                  // (df^2 pair-row blowup guard; SCALING.md)
  val EmbDupThreshold    = 0.45   // cosine near-dup cut (corpus max ~0.51)
  val EmbDupMaxVecId     = 500L
  val SimNumQueries      = 10L    // ANN query set = vec_id < 10
  val SimTopK            = 5
  val SemDedupBits       = 8      // sign-LSH bucket width for semantic dedup
  val DupSpanGram        = 8      // word-gram width for substring-level dedup
  val DupSpanMaxFraction = 0.5    // flag docs whose dup-token share exceeds this
  val IvfStride          = 23     // IVF coarse-quantizer knobs — shared by the
  val IvfNprobe          = 14     // query registration AND its SQL oracle so
  val IvfIters           = 2      // the two can never desynchronize
  val PqM                = 16     // PQ subspaces (graft.sim.PQ defaults —
  val PqKsub             = 16     // shared with the SQL oracle like the IVF
  val PqRerank           = 8      // knobs above)
  val PqOpqGrid          = 1024   // OPQ rotation grid (graft.sim.Opq)
  val LargeOrderQty      = 300L   // Q18-shaped HAVING cut (~top 0.1% of
                                  // orders; corpus avg order qty ~103)
  val BoilerplateMinDocs = 5L     // segment-frequency boilerplate cut

  /** Decode the parity-encoded bipartite node id (customer 2k ↔ "c<k>",
    * supplier 2k+1 ↔ "s<k>") back to the oracle's string name — the
    * graph queries iterate on fixed-width longs and stringify only here
    * (r12; see the q_triangles registration note). */
  private def bipartiteNodeName(node: Column): Column =
    // shiftRight, not `/`: Column `/` is double division + cast, exact
    // only below 2^53 — the shift keeps the decode exact at any id width
    when(node % 2 === 0, concat(lit("c"), shiftright(node, 1)))
      .otherwise(concat(lit("s"), shiftright(node, 1)))

  /** Symmetrize a directed (src, dst) edge frame by emitting BOTH
    * orientations of each row through one 1→2 explode — plan-equivalent
    * to `e.union(e.select(dst, src))` but the upstream derivation (for
    * the graph queries a join + distinct) sits UNDER a single operator
    * instead of under both union branches, so it computes once per
    * materialization (r14, guide §2.4). */
  private def symmetrized(e0: DataFrame): DataFrame =
    e0.select(explode(array(
        struct(col("src").as("src"), col("dst").as("dst")),
        struct(col("dst").as("src"), col("src").as("dst")))).as("__e"))
      .select(col("__e.src").as("src"), col("__e.dst").as("dst"))

  /** Canonical part↔part co-purchase edges (a < b, distinct, long ids)
    * — the graph substrate of q_triangles and q_kcore.
    *
    * r14 (guide §2.4): per-basket pairs are generated by a groupBy-
    * collect + in-row combination expression instead of the previous
    * (ok, pk)-distinct SELF-JOIN on the order key. Same edge set —
    * collect_set is the per-order distinct, sort_array + index-slice
    * emits exactly the x < y combinations — but the plan drops from
    * three exchanges + a join (distinct(ok, pk), join-on-ok, distinct
    * pairs) to two exchanges and no join (groupBy ok with map-side
    * partial collect, distinct pairs); the ≤C(7,2)-per-order expansion
    * happens AFTER the shuffle, inside the scan stage. */
  private[graft] def partPairEdges(s: SparkSession, dir: String): DataFrame =
    Tables.table(s, dir, "lineitem")
      .select(col("l_orderkey").as("ok"),
        col("l_partkey").cast("long").as("pk"))
      .groupBy("ok").agg(sort_array(collect_set(col("pk"))).as("ps"))
      .select(explode(
        graft.ops.Association.pairCombinations("ps")).as("p"))
      .select(col("p.a").as("a"), col("p.b").as("b"))
      .distinct()

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    queries("q_high_value_enrich")(spark, "/root/testdata/sf0.001")

  // ---- shared building blocks ----------------------------------------------

  private def parsed(s: SparkSession, dir: String): DataFrame =
    EnvelopeOps.parsedTransactions(Tables.events(s, dir))

  private def upserts(s: SparkSession, dir: String): DataFrame =
    EnvelopeOps.upsertsOnly(parsed(s, dir))

  private def completed(s: SparkSession, dir: String): DataFrame =
    upserts(s, dir).filter(Predicates.isCompleted(col("status")))

  /** One-row content digest of a written postings index: EVERY relation
    * contributes aggregated content, not just a row count — vocab
    * (count, max df, Σctf), postings (count, Σtf), doclen (count, Σdl),
    * totals (nd, tt) — so a truncated shard or a corrupted value in any
    * of the four relations breaks the oracle hash. The crossJoins are
    * all 1-row aggregates (model-sized by construction). Shared by
    * `q_postings_build` and `q_postings_build_incremental`, whose DuckDB
    * oracle re-derives the same nine quantities from scratch. */
  private def indexDigest(idx: graft.text.InvIndex): DataFrame =
    idx.vocab.agg(
        count(lit(1)).as("n_terms"),
        max(col("df")).as("max_df"),
        sum(col("ctf")).as("sum_ctf"))
      .crossJoin(idx.postings.agg(
        count(lit(1)).as("n_postings"),
        sum(col("tf")).as("sum_tf")))
      .crossJoin(idx.doclen.agg(
        count(lit(1)).as("n_docs"),
        sum(col("dl")).as("sum_dl")))
      .crossJoin(idx.totals.select(col("nd"), col("tt")))

  /** Materialize a tiny (model-sized, here one-row) result eagerly, then
    * delete the throwaway directory it was derived from — the index-
    * build queries' cleanup: without it, bench/correctness harnesses
    * re-running the query accumulate full index copies under tmpdir.
    * Returns the rows as a local-relation DataFrame so the caller's
    * lazy-DataFrame contract is preserved after the files are gone. */
  private def materializeThenDelete(s: SparkSession, df: DataFrame,
      dir: java.nio.file.Path): DataFrame = {
    val rows = df.collect()
    scala.util.Try(graft.text.PostingsIndex.deleteRecursively(dir))
    s.createDataFrame(java.util.Arrays.asList(rows: _*), df.schema)
  }

  /** Deterministic synthetic boilerplate: an 8-word header (two variants)
    * prepended to 4 of 5 documents — the corpus itself has no repeated
    * segments, so the strip operator needs planted ones, exactly as the
    * PII scrubber plants contact strings. Kept in lockstep with the
    * `q_boilerplate_strip` oracle's `d0` CTE. */
  private def withBoilerplate(docs: DataFrame): DataFrame =
    docs.withColumn("text",
      when(col("doc_id") % 5 < 4,
        concat(lit("© graft corp all rights reserved footer v"),
          col("doc_id") % 2, lit(" "), col("text")))
        .otherwise(col("text")))

  /** One per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // S4 + P1-P5: envelope synthesis -> typed parse (conversions of §1.2)
    "q_envelope_parse" -> ((s, dir) => parsed(s, dir)),

    // P2/P4: tombstone + validity filtering (keeps c/u/r, drops d)
    "q_cdc_upserts_only" -> ((s, dir) => upserts(s, dir)),

    // P6: domain predicates isDebit/isCompleted
    "q_debit_filter" -> ((s, dir) =>
      upserts(s, dir)
        .filter(Predicates.isDebit(col("txn_type")) &&
          Predicates.isCompleted(col("status")))
        .select("txn_id", "account_id", "txn_type", "amount", "event_time_ms")),

    // Rolling trailing-24h spend per account at EVERY completed debit
    // (RANGE frame over integer event time, integer-kobo money — the
    // continuous fraud-feature form of the tumbling daily spend)
    "q_rolling_spend" -> ((s, dir) =>
      Windows.rollingSpend(
        upserts(s, dir).filter(Predicates.isDebit(col("txn_type")) &&
          Predicates.isCompleted(col("status"))),
        windowSec = 86400L)),

    // Funnel conversion: first purchase strictly after each click within
    // 1h — one forward-looking conditional RANGE frame per user, no
    // (click, purchase) pair explosion
    "q_funnel_conversion" -> ((s, dir) =>
      graft.ops.EventAnalytics.clickToPurchase(Tables.events(s, dir),
        withinSec = 3600L)),

    // First-order Markov transition matrix over the event stream
    // (row-normalized; one user-partitioned window + one tiny agg)
    "q_event_transitions" -> ((s, dir) =>
      graft.ops.EventAnalytics.eventTransitions(Tables.events(s, dir))),

    // Weekly cohort retention triangle over the raw event stream
    "q_weekly_retention" -> ((s, dir) =>
      graft.ops.EventAnalytics.weeklyRetention(Tables.events(s, dir))),

    // Time-series gap fill: per-account daily spend densified to every day
    // between the account's first and last activity (zero-filled, flagged)
    // — integer kobo + integer epoch days, engine-exact
    "q_gap_fill_daily" -> ((s, dir) =>
      graft.ops.EventAnalytics.gapFillDailySpend(
        completed(s, dir).filter(Predicates.isDebit(col("txn_type"))))),

    // CEP / MATCH_RECOGNIZE stand-in: click -> view -> purchase, each step
    // strictly later and within 1h of the previous — one shared window
    // pass + a narrow co-partitioned join, never an A×B×C explosion
    "q_funnel_3step" -> ((s, dir) =>
      graft.ops.EventAnalytics.threeStepPattern(Tables.events(s, dir),
        withinSec = 3600L)),

    // k-step CEP: the same pruned-window construction folded over an
    // arbitrary chain — here k=4 (signup -> click -> view -> purchase),
    // each hop strictly later and within 1h of the PREVIOUS matched
    // event; one shared window annotation + k-2 narrow co-partitioned
    // stage joins, never a k-way candidate explosion
    "q_funnel_k" -> ((s, dir) =>
      graft.ops.EventAnalytics.kStepPattern(Tables.events(s, dir),
        Seq("signup", "click", "view", "purchase"), withinSec = 3600L)),

    // Time-weighted average balance: each running balance weighted by its
    // holding duration over the account's own transaction span — integer
    // kobo deltas, exact DECIMAL(38,0) numerator, ONE final IEEE division
    "q_time_weighted_balance" -> ((s, dir) =>
      graft.ops.EventAnalytics.timeWeightedBalance(completed(s, dir))),

    // Per-account OLS spend trend over the gap-filled dense series —
    // sufficient-statistics slope in one map-side-combined pass, exact
    // integer moments in DECIMAL(38,0), slope emitted as exact
    // micro-kobo/day (sign-separated truncating division)
    "q_spend_trend" -> ((s, dir) =>
      graft.ops.EventAnalytics.spendTrend(
        completed(s, dir).filter(Predicates.isDebit(col("txn_type"))))),

    // Anomaly capstone over the DENSE series: days >= 2 sigma from the
    // account's own mean, moments as whole-partition window aggs over the
    // gap-filled grid (sparse-log moments would omit the zero days)
    "q_spend_anomaly" -> ((s, dir) =>
      graft.ops.EventAnalytics.spendAnomaly(
        completed(s, dir).filter(Predicates.isDebit(col("txn_type"))))),

    // Rank-exact winsorization at the p99 order statistic per currency —
    // the cut comes from the cumulative DISTINCT-VALUE histogram (only
    // distinct (currency, kobo) pairs sort; the fact table never does)
    "q_winsorize" -> ((s, dir) =>
      graft.ops.Features.winsorize(completed(s, dir))),

    // Exact per-currency p50/p90/p99 as order statistics (rank
    // ceil(p*n), duplicates counted) via range-narrowing selection —
    // exact unlike percentile_approx, sort-free unlike a row_number
    // window; the oracle replays the ranks with a per-group row_number
    "q_exact_percentiles" -> ((s, dir) =>
      graft.ops.Features.exactPercentiles(completed(s, dir))),

    // Approximate percentiles from ONE bottom-k priority-sample pass
    // (graft_qsample, a native TypedImperativeAggregate: map-side
    // partials, the shuffle moves <= 16k bytes per group-partition) —
    // the single-pass bounded-state counterpart of q_exact_percentiles;
    // sample membership = k smallest xxhash64(txn_id), replayed exactly
    // by the oracle
    "q_approx_percentiles" -> ((s, dir) =>
      graft.ops.Sketches.approxPercentiles(
        completed(s, dir)
          .withColumn("kobo", round(col("amount") * 100).cast("long")),
        "currency", expr("xxhash64(txn_id)"), col("kobo"), k = 64)),

    // Robust outliers: |x - median| > 3*MAD, both medians exact order
    // statistics (two selection passes, broadcast back) — heavy-tail-safe
    // where the z-score gate is whale-dragged; all-integer, no float
    "q_mad_outliers" -> ((s, dir) =>
      graft.ops.Features.madOutliers(completed(s, dir))),

    // Per-currency z-scores from exact integer moments (Σx, Σx² in kobo;
    // the float mean/σ/z are one fixed-order IEEE expression per row)
    "q_zscore" -> ((s, dir) =>
      graft.ops.Features.zscore(completed(s, dir))),

    // Equal-width amount histogram per currency (integer-exact bin edges;
    // two map-side-combined aggs + a broadcast, no sort)
    "q_amount_histogram" -> ((s, dir) =>
      graft.ops.Features.amountHistogram(completed(s, dir))),

    // Fraud feature matrix capstone: rolling spend + z-score + winsorize
    // flag for every completed debit, composed in ONE pipeline (a single
    // account window + two broadcast joins — no fact-to-fact join)
    "q_fraud_features" -> ((s, dir) =>
      graft.ops.Features.fraudFeatures(
        completed(s, dir).filter(Predicates.isDebit(col("txn_type"))))),

    // P7: inclusive >= high-value threshold
    "q_high_value_filter" -> ((s, dir) =>
      completed(s, dir)
        .filter(Predicates.isHighValue(col("amount"), HighValueThreshold))
        .select("txn_id", "account_id", "amount", "currency", "event_time_ms")),

    // F1: formatAmount — ₦/ISO prefix + thousands-grouped 2 dp
    "q_format_amount" -> ((s, dir) =>
      upserts(s, dir)
        .withColumn("amount_scaled", round(col("amount") * 1001, 2))
        .select(col("txn_id"), col("currency"), col("amount_scaled"),
          Notify.formatAmount(col("amount_scaled"), col("currency")).as("formatted"))),

    // F2: formatTimestampMs — Africa/Lagos display rendering
    "q_format_ts" -> ((s, dir) =>
      upserts(s, dir)
        .select(col("txn_id"),
          Notify.formatTimestampMs(col("event_time_ms")).as("lagos_ts"))),

    // S3: JSON serde round-trip (permissive parse -> re-serialize)
    "q_json_roundtrip" -> ((s, dir) =>
      Tables.events(s, dir)
        .select(col("event_id"),
          from_json(col("props"), org.apache.spark.sql.types.StructType(Seq(
            org.apache.spark.sql.types.StructField("k",
              org.apache.spark.sql.types.IntegerType)))).getField("k").as("k"))
        .withColumn("rejson", to_json(struct(col("k").as("k"))))),

    // J2: KTable materialization — latest row per key (deterministic
    // tiebreak). max_by with a NARROW pre-projected payload: the agg
    // buffer copies the carried struct on every better row, so projecting
    // first matters — measured at 10M rows: 0.8s narrow max_by vs 0.9s
    // window vs 6.8s max_by over the full wide row (see LatestByKey doc)
    "q_latest_by_key" -> ((s, dir) =>
      LatestByKey.latestByMaxBy(
          upserts(s, dir).select("account_id", "txn_id", "amount",
            "event_time_ms", "event_time_us"),
          Seq("account_id"), struct(col("event_time_us"), col("txn_id")))
        .select(col("account_id"), col("txn_id").as("last_txn_id"),
          col("amount").as("last_amount"),
          col("event_time_ms").as("last_event_time_ms"))),

    // J2b: KTable with tombstones APPLIED — a key whose newest version is
    // a delete vanishes from the materialized table
    "q_latest_with_tombstones" -> ((s, dir) =>
      LatestByKey.latestWithTombstones(
          parsed(s, dir).filter(col("account_id").isNotNull && col("account_id") =!= 0),
          Seq("account_id"), Seq(col("event_time_us"), col("txn_id")))
        .select(col("account_id"), col("txn_id").as("last_txn_id"),
          col("amount").as("last_amount"), col("op").as("last_op"))),

    // SCD2: CDC changelog -> dimension history with validity intervals
    "q_scd2_history" -> ((s, dir) =>
      LatestByKey.scd2(upserts(s, dir), Seq("account_id"),
          Seq(col("event_time_us"), col("txn_id")), "event_time_ms")
        .select("txn_id", "account_id", "amount", "valid_from_ms",
          "valid_to_ms", "is_current")),

    // J1: high-value stream enriched against the account dimension
    // (broadcast hash join; "N/A" fallback on missing dim row)
    "q_high_value_enrich" -> ((s, dir) => {
      val hv = completed(s, dir)
        .filter(Predicates.isHighValue(col("amount"), HighValueThreshold))
      Enrich.withDim(hv,
          Tables.customer(s, dir).withColumnRenamed("c_custkey", "account_id"),
          "account_id")
        .select(col("txn_id"), col("account_id"), col("amount"), col("currency"),
          coalesce(col("c_name"), lit("N/A")).as("account_name"),
          coalesce(col("c_mktsegment"), lit("N/A")).as("segment"),
          Notify.formatAmount(col("amount"), col("currency")).as("formatted_amount"),
          col("event_time_ms"))
    }),

    // J3: declared-but-unwired second hop — customer -> nation
    "q_two_hop_enrich" -> ((s, dir) => {
      val hv = completed(s, dir)
        .filter(Predicates.isHighValue(col("amount"), HighValueThreshold))
      Enrich.twoHop(hv, "account_id",
          Tables.customer(s, dir), "c_custkey",
          Tables.nation(s, dir), "c_nationkey", "n_nationkey")
        .select(col("txn_id"), col("account_id"), col("amount"),
          coalesce(col("c_name"), lit("N/A")).as("customer_name"),
          coalesce(col("n_name"), lit("N/A")).as("nation_name"))
    }),

    // J2 over a true CDC changelog: the ACCOUNTS KTable of the reference
    // (`topology/ABBankTopology.java:107-125`) — synthesized envelope
    // versions -> JSON wire payload -> from_json(accountEnvelope) -> typed
    // rows -> latest-by-key with tombstones applied
    "q_cdc_account_dim" -> ((s, dir) =>
      DimensionCdc.accountsDim(Tables.customer(s, dir))
        .select("account_id", "customer_id", "account_number", "account_type",
          "balance", "currency", "account_status", "cdc_ts_us")),

    // the same ACCOUNTS KTable with the changelog carried over the BINARY
    // Avro wire (Confluent frame -> scan-stage AvroWireDecode) instead of
    // its JSON shadow — S1 is three Avro topics, not one
    "q_cdc_account_dim_avro" -> ((s, dir) =>
      DimensionCdc.accountsDimAvro(Tables.customer(s, dir))
        .select("account_id", "customer_id", "account_number", "account_type",
          "balance", "currency", "account_status", "cdc_ts_us")),

    // J2 over the CUSTOMERS CDC changelog (the second KTable the reference
    // builds, `ABBankTopology.java:127-144`) — EMAIL is the versioned field
    "q_cdc_customer_dim" -> ((s, dir) =>
      DimensionCdc.customersDim(Tables.customer(s, dir))
        .select("customer_id", "first_name", "last_name", "email", "segment",
          "cdc_ts_us")),

    // CUSTOMERS KTable over the Avro wire (third of the three S1 topics)
    "q_cdc_customer_dim_avro" -> ((s, dir) =>
      DimensionCdc.customersDimAvro(Tables.customer(s, dir))
        .select("customer_id", "first_name", "last_name", "email", "segment",
          "cdc_ts_us")),

    // TRANSACTION_AUDIT wire parse — the reference DECLARES key+value
    // Avro schemas for this table but consumes them in no topology
    // (SURVEY §1.3 dead surface); capability parity keeps the StructType
    // + the full synthesize -> JSON wire -> from_json -> typed-rows path,
    // nullable fields (reason/reviewer/reviewed_at/notes) exercised so
    // null transport is proven
    "q_audit_parse" -> ((s, dir) =>
      DimensionCdc.auditChangelog(Tables.table(s, dir, "orders"))),

    // SCD2 over the ACCOUNTS CDC changelog: every version becomes a
    // dimension row with a validity interval — the warehouse
    // materialization of the same changelog the KTable reduces
    "q_cdc_account_scd2" -> ((s, dir) => {
      val log = DimensionCdc.accountChangelog(Tables.customer(s, dir))
        .filter(col("op") =!= "d")
      LatestByKey.scd2(log, Seq("account_id"), Seq(col("cdc_ts_us")),
          "cdc_ts_us")
        .select(col("account_id"), col("balance"), col("account_status"),
          col("valid_from_ms").as("valid_from_us"),
          col("valid_to_ms").as("valid_to_us"), col("is_current"))
    }),

    // One-pass snapshot diff of the per-account KTable (the
    // q_latest_with_tombstones state) between the stream's temporal
    // midpoint and its head: which accounts were added / tombstoned /
    // changed in the second half. Both horizons' latest states are
    // recovered from ONE keyed conditional-struct-max aggregation —
    // neither snapshot materializes, only (key, ts, op, digest) shuffles.
    // (The synthesized ACCOUNTS changelog is key-banded in time — every
    // horizon splits it by key — so the txn stream, whose per-account
    // events genuinely interleave, is the changelog worth diffing.)
    "q_snapshot_diff" -> ((s, dir) => {
      val cl = parsed(s, dir).filter(col("account_id") =!= 0)
      val hz = cl.agg(
        expr("(min(event_time_us) + max(event_time_us)) div 2").as("__t1"),
        max("event_time_us").as("__t2"))
      val digest = SnapshotDiff.valueDigest(Seq(col("txn_id"),
        expr("CAST(round(amount * 100) AS BIGINT)"),
        col("txn_type"), col("status")))
      SnapshotDiff.changelogDiff(cl.crossJoin(broadcast(hz)),
          Seq("account_id"), "event_time_us", "op", digest,
          col("__t1"), col("__t2"), tieCols = Seq(col("txn_id")))
        .select(col("account_id"), col("change"),
          col("old_seq").as("old_ts_us"), col("new_seq").as("new_ts_us"))
    }),

    // J1 against the CDC-built dimension: high-value transactions left-join
    // the accounts KTable (the reference's actual enrichment data flow —
    // `topology/ABBankTopology.java:233-240`; deleted accounts fall back to
    // "N/A" like missing KV-store rows)
    "q_enrich_cdc_dim" -> ((s, dir) => {
      val hv = completed(s, dir)
        .filter(Predicates.isHighValue(col("amount"), HighValueThreshold))
      Enrich.withDim(hv, DimensionCdc.accountsDim(Tables.customer(s, dir)),
          "account_id")
        .select(col("txn_id"), col("account_id"), col("amount"),
          coalesce(col("account_number"), lit("N/A")).as("account_number"),
          coalesce(col("customer_id"), lit(-1L)).as("customer_id"),
          coalesce(col("balance"), lit(-1.0)).as("account_balance"),
          coalesce(col("account_status"), lit("N/A")).as("account_status"))
    }),

    // J1+J3 full reference flow: transactions -> accounts KTable (CDC) ->
    // customers KTable (CDC), surfacing getFullName/contact info
    // (reference builds both KTables at `ABBankTopology.java:107-144`)
    "q_enrich_cdc_two_hop" -> ((s, dir) => {
      val hv = completed(s, dir)
        .filter(Predicates.isHighValue(col("amount"), HighValueThreshold))
      val acct = DimensionCdc.accountsDim(Tables.customer(s, dir))
        .select("account_id", "customer_id", "account_number")
      val cust = DimensionCdc.customersDim(Tables.customer(s, dir))
        .select("customer_id", "first_name", "last_name", "email", "segment")
      hv.join(broadcast(acct), Seq("account_id"), "left")
        .join(broadcast(cust), Seq("customer_id"), "left")
        .select(col("txn_id"), col("account_id"), col("amount"),
          coalesce(col("account_number"), lit("N/A")).as("account_number"),
          when(col("first_name").isNull, lit("N/A"))
            .otherwise(Notify.fullName(col("first_name"), col("last_name")))
            .as("customer_name"),
          coalesce(col("email"), lit("N/A")).as("email"),
          coalesce(col("segment"), lit("N/A")).as("segment"))
    }),

    // W1: velocity fraud check — tumbling window count >= threshold
    "q_velocity_count" -> ((s, dir) =>
      Windows.velocityCount(upserts(s, dir), VelocityWindowSec, VelocityMinTxns)),

    // W1b (declared-intent extension): HOPPING-window velocity — the
    // reference's dead VelocityState model (model/VelocityState.java:15-63)
    // hand-rolls a sliding count the topology never wired; Kafka Streams
    // ofSizeAndAdvance == Spark's two-arg window(). Oracle replays the
    // per-event window fan-out with a generate_series cross join
    "q_velocity_hopping" -> ((s, dir) =>
      Windows.velocityHopping(upserts(s, dir), VelocityWindowSec,
        VelocityAdvanceSec, VelocityMinTxns)),

    // W2: daily spend — 24 h tumbling debit sum >= threshold + Lagos label
    "q_daily_spend_sum" -> ((s, dir) =>
      Windows.dailySpend(
        completed(s, dir).filter(Predicates.isDebit(col("txn_type"))),
        DailySpendAlert)),

    // W3: dormancy — session windows (gap inactivity), single-event flag
    "q_dormancy_session" -> ((s, dir) =>
      Windows.dormancySessions(upserts(s, dir), DormancyGap)),

    // Platform-wide session concurrency by day: ±1 session boundaries ->
    // running sum via the distributed two-pass PREFIX SCAN (per-partition
    // scans + driver offsets over the partition-count table) — the
    // cumulative-output case where a global ordered window would be a
    // one-task wall and no broadcast cut value can stand in for the curve
    "q_session_concurrency" -> ((s, dir) =>
      graft.ops.EventAnalytics.sessionConcurrencyDaily(
        Windows.dormancySessions(upserts(s, dir), DormancyGap))),

    // O1: balance reconciliation — per-account ordered scan w/ lag()
    "q_balance_reconcile" -> ((s, dir) => Reconcile.reconcile(completed(s, dir))),

    // O2: notification JSON assembly (deterministic id; uuid()/now() live
    // only in the streaming sinks, excluded from verification)
    "q_notification_json" -> ((s, dir) => {
      val hv = completed(s, dir)
        .filter(Predicates.isHighValue(col("amount"), HighValueThreshold))
      val enriched = Enrich.withDim(hv,
        Tables.customer(s, dir).withColumnRenamed("c_custkey", "account_id"),
        "account_id")
      val fmt = Notify.formatAmount(col("amount"), col("currency"))
      enriched.select(
        col("txn_id"),
        Notify.notificationJson(
          idPrefix = "HV",
          notificationType = "HIGH_VALUE_ALERT",
          severity = "HIGH",
          channel = "BOTH",
          entityId = col("txn_id"),
          accountId = col("account_id"),
          subject = lit("High value transaction alert"),
          body = concat(lit("Account "), col("account_id"), lit(" spent "), fmt),
          metadata = map(
            lit("amount"), fmt,
            lit("currency"), col("currency"),
            lit("accountName"), coalesce(col("c_name"), lit("N/A")))
        ).as("notification"))
    }),

    // O2 × pipeline 1 (velocity): FRAUD_ALERT notification JSON
    // (reference `topology/ABBankTopology.java:181-205`)
    "q_velocity_alert_json" -> ((s, dir) => {
      val v = Windows.velocityCount(upserts(s, dir), VelocityWindowSec, VelocityMinTxns)
      v.select(col("account_id"), col("window_start_ms"),
        Notify.notificationJson(
          idPrefix = "FRAUD",
          notificationType = "FRAUD_ALERT",
          severity = "CRITICAL",
          channel = "BOTH",
          entityId = concat(col("account_id"), lit("-"), col("window_start_ms")),
          accountId = col("account_id"),
          subject = lit("Suspicious activity detected on your account"),
          body = concat(lit("We detected "), col("n_txns"),
            lit(s" transactions on your account within $VelocityWindowSec seconds starting at "),
            Notify.formatTimestampMs(col("window_start_ms")),
            lit(". Contact AB Bank immediately if this was not you.")),
          metadata = map(
            lit("windowStartMs"), col("window_start_ms").cast("string"),
            lit("windowEndMs"), col("window_end_ms").cast("string"),
            lit("transactionCount"), col("n_txns").cast("string"),
            lit("windowSizeSec"), lit(VelocityWindowSec.toString))
        ).as("notification"))
    }),

    // O2 × pipeline 4 (dormancy): DORMANCY_ALERT notification JSON
    // (reference `topology/ABBankTopology.java:343-367`)
    "q_dormancy_alert_json" -> ((s, dir) => {
      val d = Windows.dormancySessions(upserts(s, dir), DormancyGap)
        .filter(col("is_dormant"))
      d.select(col("account_id"), col("session_start_ms"),
        Notify.notificationJson(
          idPrefix = "DORM",
          notificationType = "DORMANCY_ALERT",
          severity = "LOW",
          channel = "EMAIL",
          entityId = concat(col("account_id"), lit("-"), col("session_start_ms")),
          accountId = col("account_id"),
          subject = lit("Your AB Bank account has been inactive"),
          body = concat(lit("Your AB Bank account (ID: "), col("account_id"),
            lit(") has had no follow-up activity. Make at least one transaction to keep it active.")),
          metadata = map(
            lit("sessionStartMs"), col("session_start_ms").cast("string"),
            lit("sessionEndMs"), col("session_end_ms").cast("string"))
        ).as("notification"))
    }),

    // O2 × pipeline 5 (daily spend): DAILY_SPEND_SUMMARY notification JSON
    // (reference `topology/ABBankTopology.java:401-424`)
    "q_daily_spend_json" -> ((s, dir) => {
      val d = Windows.dailySpend(
        completed(s, dir).filter(Predicates.isDebit(col("txn_type"))),
        DailySpendAlert)
      val fmt = Notify.formatAmount(col("total_spend"), lit("NGN"))
      d.select(col("account_id"), col("day_start_ms"),
        Notify.notificationJson(
          idPrefix = "DS",
          notificationType = "DAILY_SPEND_SUMMARY",
          severity = "MEDIUM",
          channel = "SMS",
          entityId = concat(col("account_id"), lit("-"), col("day_start_ms")),
          accountId = col("account_id"),
          subject = concat(lit("Daily spend alert - "), col("lagos_date")),
          body = concat(lit("AB Bank: your total debits on "), col("lagos_date"),
            lit(" reached "), fmt,
            lit(s", exceeding your alert threshold of ${"₦"}${"%.2f".format(DailySpendAlert)}. Reply STOP to unsubscribe.")),
          metadata = map(
            lit("date"), col("lagos_date"),
            lit("totalDebit"), col("total_spend").cast("string"),
            lit("thresholdNgn"), lit("%.2f".format(DailySpendAlert)))
        ).as("notification"))
    }),

    // O2 × pipeline 3 (reconciliation): BALANCE_UPDATE discrepancy JSON
    // (reference `topology/BalanceReconciliationProcessor.java:95-144`;
    // discrepancy branch — severity HIGH, channel BOTH)
    "q_reconcile_alert_json" -> ((s, dir) => {
      val r = Reconcile.reconcile(completed(s, dir))
        .filter(col("recon_status") === "DISCREPANCY")
      def ngn(c: org.apache.spark.sql.Column) = Notify.formatAmount(c, lit("NGN"))
      r.select(col("txn_id"), col("account_id"),
        Notify.notificationJson(
          idPrefix = "RECON",
          notificationType = "BALANCE_UPDATE",
          severity = "HIGH",
          channel = "BOTH",
          entityId = col("txn_id"),
          accountId = col("account_id"),
          subject = lit("Balance discrepancy detected"),
          body = concat(lit("AB Bank detected a balance discrepancy on account "),
            col("account_id"),
            lit(". Our records show: "), ngn(col("stored_balance")),
            lit(". Reported balance before this transaction: "), ngn(col("balance_before")),
            lit(". Difference: "), ngn(col("discrepancy")),
            lit(". Our team will investigate.")),
          metadata = map(
            lit("balanceBefore"), col("balance_before").cast("string"),
            lit("balanceAfter"), col("balance_after").cast("string"),
            lit("discrepancyAmount"), col("discrepancy").cast("string"),
            lit("hasDiscrepancy"), lit("true"))
        ).as("notification"))
    }),

    // General analytics over the star schema's big tables (lineitem is
    // the table the bench SF is sized by): TPC-H Q1-shaped pricing
    // summary. Money aggregates run in DECIMAL — exact and
    // order-independent, so engines agree regardless of partitioning —
    // and cast to double once at the end
    "q_pricing_summary" -> ((s, dir) => {
      val li = Tables.table(s, dir, "lineitem")
        .filter(col("l_shipdate") <= lit("2001-09-01"))
      val ext = col("l_extendedprice").cast("decimal(18,2)")
      val one = lit(1).cast("decimal(4,2)")
      val disc = col("l_discount").cast("decimal(4,2)")
      val tax = col("l_tax").cast("decimal(4,2)")
      // corpus-scaling money sums leave the engine as their exact
      // unscaled integer (micro-NGN BIGINT; ANSI overflows loud), never
      // as rounded doubles: at sf2 the DECIMAL(38,6) sums exceed 2^53 in
      // unscaled magnitude, where decimal->double conversion is engine-
      // dependent (DuckDB double-rounds) AND downscaling to cents hits
      // half-way ties — 2dp x 2dp x 2dp products end in ...5000 often —
      // where the engines' tie modes disagree. Integer out, no rounding
      // anywhere (the bigram LM's integer micro-nats discipline; caught
      // by the sf2 probe: sum_charge off by one cent / one ulp).
      // sum_base_price stays 2dp-exact (sum of DECIMAL(18,2)) and its
      // unscaled value fits 2^53 up to ~sf1000
      li.groupBy("l_returnflag", "l_linestatus")
        .agg(
          sum(col("l_quantity")).as("sum_qty"), // whole-number doubles: exact
          sum(ext).cast("double").as("sum_base_price"),
          (sum(ext * (one - disc)) * lit(1000000))
            .cast("decimal(38,0)").cast("long").as("sum_disc_price_micros"),
          (sum(ext * (one - disc) * (one + tax)) * lit(1000000))
            .cast("decimal(38,0)").cast("long").as("sum_charge_micros"),
          count(lit(1)).as("count_order"))
        .withColumn("avg_qty", col("sum_qty") / col("count_order"))
    }),

    // TPC-H Q5-shaped local-supplier volume: the 6-way star join — three
    // broadcast dims (region->nation pruning the fact rows, supplier with
    // the same-nation colocation predicate), one large-large
    // lineitem-orders join, decimal-exact revenue per nation
    "q_local_supplier_volume" -> ((s, dir) => {
      val region = Tables.table(s, dir, "region").filter(col("r_name") === "ASIA")
      val nation = Tables.table(s, dir, "nation")
      val cust = Tables.customer(s, dir)
      val ord = Tables.table(s, dir, "orders")
        .filter(col("o_orderdate") >= lit("1996-01-01") &&
          col("o_orderdate") < lit("1997-01-01"))
      val li = Tables.table(s, dir, "lineitem")
      val supp = Tables.table(s, dir, "supplier")
      val rev = col("l_extendedprice").cast("decimal(18,2)") *
        (lit(1).cast("decimal(4,2)") - col("l_discount").cast("decimal(4,2)"))
      li.join(ord, col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(cust), col("o_custkey") === col("c_custkey"))
        .join(broadcast(supp), col("l_suppkey") === col("s_suppkey") &&
          col("s_nationkey") === col("c_nationkey"))
        .join(broadcast(nation), col("s_nationkey") === col("n_nationkey"))
        .join(broadcast(region), col("n_regionkey") === col("r_regionkey"))
        .groupBy(col("n_name"))
        // corpus-scaling money sum -> exact micro-NGN integer (see the
        // q_pricing_summary note: decimal->double and cent-rounding are
        // both engine-dependent once the sum outgrows 2^53 unscaled)
        .agg((sum(rev) * lit(1000000)).cast("decimal(38,0)")
          .cast("long").as("revenue_micros"))
        .orderBy(col("revenue_micros").desc, col("n_name"))
    }),

    // TPC-H Q3-shaped shipping priority: selective dimension filter,
    // two joins, decimal-exact revenue, TakeOrderedAndProject top-10
    "q_ship_priority" -> ((s, dir) => {
      val cust = Tables.customer(s, dir)
        .filter(col("c_mktsegment") === "BUILDING")
      val ord = Tables.table(s, dir, "orders")
        .filter(col("o_orderdate") < lit("2000-03-15"))
      val li = Tables.table(s, dir, "lineitem")
        .filter(col("l_shipdate") > lit("2000-03-15"))
      val rev = col("l_extendedprice").cast("decimal(18,2)") *
        (lit(1).cast("decimal(4,2)") - col("l_discount").cast("decimal(4,2)"))
      li.join(ord, col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(cust), col("o_custkey") === col("c_custkey"))
        .groupBy(col("l_orderkey"), col("o_orderdate"), col("o_orderpriority"))
        // per-ORDER revenue is bounded by order size, not corpus size:
        // the DECIMAL(38,4) sum stays far under 2^53 unscaled at any SF,
        // so the native-scale double cast is exact in both engines
        .agg(sum(rev).cast("double").as("revenue"))
        .select(col("l_orderkey").as("orderkey"),
          // parquet timestamp[ms] arrives as TIMESTAMP_NTZ; the session
          // is pinned UTC so the cast is wall-clock-identity
          unix_millis(col("o_orderdate").cast("timestamp")).as("orderdate_ms"),
          col("o_orderpriority").as("orderpriority"), col("revenue"))
        .orderBy(col("revenue").desc, col("orderkey"))
        .limit(10)
    }),

    // TPC-H Q13-shaped order-count distribution: large-large LEFT OUTER
    // join (every customer kept — orderless customers land in the c_count
    // = 0 bucket), per-customer count, then a tiny second aggregation
    // over the counts. The outer join is the operator under test: the
    // fact side shuffles once on the join key and the partial count
    // combines map-side
    "q_order_count_dist" -> ((s, dir) =>
      Tables.customer(s, dir)
        .join(Tables.table(s, dir, "orders"),
          col("c_custkey") === col("o_custkey"), "left")
        .groupBy(col("c_custkey"))
        .agg(count(col("o_orderkey")).as("c_count"))
        .groupBy(col("c_count"))
        .agg(count(lit(1)).as("custdist"))),

    // TPC-H Q16-shaped supplier diversity: distinct suppliers per part
    // attribute bucket, excluding flagged suppliers via an ANTI join on a
    // NOT-IN subquery (the flagged set is tiny — broadcast anti, the fact
    // never shuffles for it); the distinct-count agg is the only shuffle
    "q_part_supplier_cnt" -> ((s, dir) => {
      val flagged = Tables.table(s, dir, "supplier")
        .filter(col("s_acctbal") < 0).select(col("s_suppkey"))
      Tables.table(s, dir, "lineitem")
        .join(broadcast(flagged), col("l_suppkey") === col("s_suppkey"),
          "left_anti")
        .join(broadcast(Tables.table(s, dir, "part")
          .filter(col("p_brand") =!= "Brand#1")),
          col("l_partkey") === col("p_partkey"))
        .groupBy("p_brand", "p_type", "p_size")
        .agg(countDistinct(col("l_suppkey")).as("supplier_cnt"))
    }),

    // PageRank centrality over the symmetrized customer↔supplier
    // co-purchase graph, 4 passes of fully integer rank arithmetic
    // (scaled longs + truncating division — engine-exact, the oracle
    // replays every iteration as chained CTEs). Per pass: one
    // co-partitioned ranks⋈edges shuffle + one map-side-combined per-dst
    // sum; rank frame localCheckpoint-truncated each round
    // The bipartite namespace lives in the id's PARITY (customer 2k,
    // supplier 2k+1) so all four rank passes shuffle longs, and the
    // "c"/"s" node strings are decoded only in the final projection
    // (same r12 change as q_triangles — fixed-width keys through every
    // per-pass shuffle)
    "q_pagerank" -> ((s, dir) => {
      val e0 = Tables.table(s, dir, "lineitem").select("l_orderkey", "l_suppkey")
        .join(Tables.table(s, dir, "orders").select("o_orderkey", "o_custkey"),
          col("l_orderkey") === col("o_orderkey"))
        .select((col("o_custkey").cast("long") * 2).as("src"),
          (col("l_suppkey").cast("long") * 2 + 1).as("dst"))
        .distinct()
      // symmetrize via a 1→2 explode instead of union-with-self: the
      // join+distinct above is computed ONCE per materialization (the
      // union's two branches each re-derived it — guide §2.4); same edge
      // set, same ranks
      graft.graph.PageRank.ranks(symmetrized(e0), symmetric = true)
        .select(bipartiteNodeName(col("node")).as("node"),
          col("rank_scaled"))
    }),

    // TrustRank over the same graph: ALL teleport mass seeded at the
    // BUILDING-segment customers — suppliers earn rank only as the
    // trusted segment's purchases vouch for them (Gyöngyi et al. 2004,
    // the quality-propagation gate). Same integer iteration + oracle
    "q_trustrank" -> ((s, dir) => {
      val e0 = Tables.table(s, dir, "lineitem").select("l_orderkey", "l_suppkey")
        .join(Tables.table(s, dir, "orders").select("o_orderkey", "o_custkey"),
          col("l_orderkey") === col("o_orderkey"))
        .select((col("o_custkey").cast("long") * 2).as("src"),
          (col("l_suppkey").cast("long") * 2 + 1).as("dst"))
        .distinct()
      val seeds = Tables.table(s, dir, "customer")
        .filter(col("c_mktsegment") === "BUILDING")
        .select((col("c_custkey").cast("long") * 2).as("node"))
      // single-compute symmetrization — see the q_pagerank note
      graft.graph.PageRank.trustRanks(symmetrized(e0), seeds,
          symmetric = true)
        .select(bipartiteNodeName(col("node")).as("node"),
          col("rank_scaled"))
    }),

    // Exact per-node triangle counts over the part↔part co-purchase
    // graph (parts sharing an order; ≤C(7,2) pairs per order, so the
    // edge build is bounded per group). Degree-ordered orientation caps
    // the wedge join at O(√(2m)) per apex — the skew-proof formulation;
    // the oracle is the direct triple self-join. The graph computes on
    // LONG node ids (the raw partkey) and stringifies only in the final
    // projection: the r12 sf1 spill adjudication measured the
    // string-keyed pipeline shuffling 7.9 GB and spilling 44 GB at an
    // 8 GB heap — dictionary-width keys through every sort/join are the
    // kind of cost that compounds at 100 TB. Undirected edge SET and
    // per-node counts are canonicalization-order-independent, so numeric
    // a<b vs the oracle's string x.pn<y.pn yield identical results.
    "q_triangles" -> ((s, dir) =>
      graft.graph.Triangles.perNode(partPairEdges(s, dir))
        .select(concat(lit("p"), col("node")).as("node"),
          col("deg"), col("tri_cnt"))),

    // k-core of the part co-purchase graph: exactly 6 peels at k=80 —
    // the dense-region cohesion filter; per round one map-side-combined
    // degree agg + two node-sized semi-joins, edges localCheckpoint-
    // truncated (fixed-pass contract, chained-CTE oracle)
    // Long node ids through all six peels, strings only in the final
    // projection (same r12 change as q_triangles — see its note)
    "q_kcore" -> ((s, dir) =>
      graft.graph.KCore.survivors(partPairEdges(s, dir), k = 80, rounds = 6)
        .select(concat(lit("p"), col("node")).as("node"), col("deg"))),

    // Market-basket frequent pairs over order baskets: joint + marginal
    // counts and integer-scaled lift/confidence for every part pair
    // co-purchased in >= 2 orders. The pair expansion is co-partitioned
    // on the order key and bounded by C(basket,2); the support filter
    // prunes the singleton tail right after the map-side-combined count
    "q_frequent_pairs" -> ((s, dir) =>
      graft.ops.Association.frequentPairs(
        Tables.table(s, dir, "lineitem")
          .select(col("l_orderkey").as("basket"),
            col("l_partkey").as("item")),
        minSupport = 2)),

    // Exact set-similarity self-join with prefix filtering (PPJoin
    // shape) over 3-gram shingle sets: every doc pair with shingle
    // Jaccard >= 0.6, recall 1.0 by theorem — only each doc's rarest
    // |x|-ceil(t|x|)+1 shingles are indexed, so frequent-shingle
    // postings never explode the join. The UNCAPPED exact path next to
    // the capped inverted index (q_dedup_ngram_jaccard) and the
    // probabilistic MinHash tier; oracle = direct all-pairs join
    "q_prefix_jaccard_join" -> ((s, dir) =>
      graft.dedup.PrefixJoin.jaccardJoinOnSets(
        graft.dedup.Dedup.shingles(Tables.documents(s, dir), n = 3)
          .withColumnRenamed("shingle", "term"),
        tPct = 60)),

    // PMI collocations over the document corpus: count-pruned adjacent
    // word pairs scored by integer micro-nat pointwise mutual
    // information — multiword-expression detection for vocab curation.
    // Both aggregations combine map-side; the joins are vocab-sized
    "q_pmi_collocations" -> ((s, dir) =>
      graft.text.TextAnalysis.collocations(
        Tables.documents(s, dir), minCount = 5)),

    // Reciprocal-rank fusion of three supplier scoreboards (revenue,
    // distinct customers, distinct orders) — the retrieval-tier fusion
    // operator exercised on exact lists. Lists are dimension-sized by
    // contract; fusion is one union + one map-side-combined aggregation
    "q_rank_fusion" -> ((s, dir) => {
      val li = Tables.table(s, dir, "lineitem")
      // DECIMAL(18,2) sum: the ranking key must be EXACT — a double sum
      // here rank-swaps float-near-tied suppliers between engines (caught
      // by the sf1 gate: 1681 rrf rows off after one adjacent swap)
      val rev = li.groupBy(col("l_suppkey").as("key"))
        .agg(sum(expr("CAST(l_extendedprice AS DECIMAL(18,2))")).as("score"))
      val cust = li.select("l_orderkey", "l_suppkey")
        .join(Tables.table(s, dir, "orders").select("o_orderkey", "o_custkey"),
          col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("l_suppkey").as("key"))
        .agg(countDistinct(col("o_custkey")).as("score"))
      val ord = li.groupBy(col("l_suppkey").as("key"))
        .agg(countDistinct(col("l_orderkey")).as("score"))
      graft.ops.RankFusion.fuse(Seq(rev, cust, ord))
    }),

    // Referential-integrity audit across the star schema's FK relations
    // (incl. the events stream's user linkage): per relation, child
    // rows, null/distinct FKs, orphan keys and rows. Each relation is
    // one map-side-combined key aggregation + one key-sized left join —
    // the fact tables never join row-for-row
    "q_fk_audit" -> ((s, dir) => {
      val li = Tables.table(s, dir, "lineitem")
      val ord = Tables.table(s, dir, "orders")
      val cust = Tables.customer(s, dir)
      graft.ops.Profile.fkAudit(Seq(
        ("lineitem.l_orderkey->orders", li, "l_orderkey",
          ord, "o_orderkey"),
        ("lineitem.l_partkey->part", li, "l_partkey",
          Tables.table(s, dir, "part"), "p_partkey"),
        ("lineitem.l_suppkey->supplier", li, "l_suppkey",
          Tables.table(s, dir, "supplier"), "s_suppkey"),
        ("orders.o_custkey->customer", ord, "o_custkey",
          cust, "c_custkey"),
        ("customer.c_nationkey->nation", cust, "c_nationkey",
          Tables.nation(s, dir), "n_nationkey"),
        ("events.user_id->customer", Tables.events(s, dir), "user_id",
          cust, "c_custkey")))
    }),

    // Bucketed order-independent content checksum of the fact table —
    // the anti-entropy primitive for validating a CDC replica seam:
    // 48-bit md5-derived row digests folded per orderkey bucket by
    // count + xor + sum. One scan, one map-side-combined aggregation;
    // every column rendered engine-exactly (ints, cents, UTC strings)
    "q_table_checksum" -> ((s, dir) => {
      val repr = concat_ws("|",
        col("l_orderkey"), col("l_partkey"), col("l_suppkey"),
        col("l_linenumber"),
        col("l_quantity").cast("long"),
        expr("CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT)"),
        expr("CAST(CAST(l_discount AS DECIMAL(4,2)) * 100 AS BIGINT)"),
        expr("CAST(CAST(l_tax AS DECIMAL(4,2)) * 100 AS BIGINT)"),
        col("l_returnflag"), col("l_linestatus"),
        date_format(col("l_shipdate"), "yyyy-MM-dd HH:mm:ss"))
      graft.cdc.Checksum.contentChecksum(
        Tables.table(s, dir, "lineitem"), repr, expr("l_orderkey % 64"))
    }),

    // PSI drift of order totals between the 1996 reference and the 1997+
    // current snapshot, per priority: buckets from the REFERENCE's exact
    // equi-depth edges, per-bucket micro-nat terms (floor before sum) —
    // the ML-observability feature-drift monitor
    "q_psi_drift" -> ((s, dir) => {
      val cents =
        expr("CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)")
      val o = Tables.table(s, dir, "orders")
        .select(col("o_orderpriority").as("grp"), cents.as("v"),
          col("o_orderdate"))
      graft.ops.Features.psiDrift(
        o.filter(col("o_orderdate") < lit("1997-01-01")).select("grp", "v"),
        o.filter(col("o_orderdate") >= lit("1997-01-01")).select("grp", "v"),
        nBuckets = 8)
    }),

    // Equi-depth histogram of order totals (cents) per priority: 8
    // equal-count buckets with EXACT edges from range-narrowing
    // selection (no sort); one scan assigns buckets against the
    // broadcast edge arrays
    "q_equidepth_hist" -> ((s, dir) =>
      graft.ops.Features.equiDepthHistogram(
        Tables.table(s, dir, "orders").select(
          col("o_orderpriority").as("grp"),
          expr("CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)")
            .as("v")),
        nBuckets = 8)),

    // Benford first-digit conformance of order totals (cents): the
    // forensic data-quality screen; one scan, one 9-group count, the
    // irrational expectations frozen as shared micro-integer literals
    "q_benford" -> ((s, dir) =>
      graft.ops.Benford.firstDigit(
        Tables.table(s, dir, "orders"),
        expr("CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)"))),

    // Chi-square cross-tab of market segment x order priority: per
    // cell, observed vs independence-expected counts and the exact
    // integer chi-square contribution (cross-multiplied, DECIMAL(38,0)
    // widened). One fact aggregation; marginals from the cells
    "q_chi_square" -> ((s, dir) =>
      graft.ops.Contingency.chiSquare(
        Tables.table(s, dir, "orders")
          .join(Tables.customer(s, dir),
            col("o_custkey") === col("c_custkey"))
          .select(col("c_mktsegment").as("row_key"),
            col("o_orderpriority").as("col_key")))),

    // Exact-integer EWMA (alpha=1/2, power-of-two weights) over each
    // customer's last 8 order totals — recency-biased spend score with
    // zero float decay; per-key window, k-pruned before aggregation
    "q_ewma_spend" -> ((s, dir) =>
      graft.ops.EventAnalytics.ewmaRecency(
        Tables.table(s, dir, "orders").select(
          col("o_custkey").as("key"), col("o_orderdate").as("ts"),
          col("o_orderkey").as("seq"),
          expr("CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)")
            .as("amount_cents")))),

    // ---- subquery-decorrelation family (r8): the TPC-H shapes whose SQL
    //      form is a correlated EXISTS / NOT EXISTS / scalar subquery,
    //      expressed directly as the decorrelated plan Catalyst would have
    //      to derive — semi joins, anti joins, broadcast scalar attachment,
    //      and the one-grouped-pass rewrite of a double self-join ----------

    // TPC-H Q4-shaped priority check: orders having SOME late-shipping
    // lineitem (EXISTS with a correlated range predicate) -> LEFT SEMI join
    // on the order key with the range condition in the join predicate. The
    // fact side is projected to (l_orderkey, l_shipdate) before the
    // exchange; the semi join dedupes order-side matches inside the join
    // (no DISTINCT stage), one shuffle each side.
    "q_priority_semi" -> ((s, dir) => {
      val ord = Tables.table(s, dir, "orders")
        .filter(col("o_orderdate") >= lit("1997-01-01") &&
          col("o_orderdate") < lit("1997-04-01"))
      val li = Tables.table(s, dir, "lineitem")
        .select("l_orderkey", "l_shipdate")
      ord.join(li,
          col("l_orderkey") === col("o_orderkey") &&
            col("l_shipdate") > col("o_orderdate") + expr("INTERVAL 60 DAYS"),
          "left_semi")
        .groupBy(col("o_orderpriority"))
        .agg(count(lit(1)).as("order_count"))
    }),

    // TPC-H Q17-shaped small-quantity revenue: the correlated scalar-agg
    // subquery (per-part average quantity) decorrelated into a grouped
    // pass over ONLY the brand-filtered lines (the broadcast part prune
    // runs before the agg, so the per-part stats job is 1/#brands of the
    // fact), then broadcast back. avg compare is cross-multiplied
    // (qty * 5 * n < sum) so no engine-dependent division ever happens —
    // quantities are whole-number doubles, exact.
    "q_small_qty_revenue" -> ((s, dir) => {
      val brandParts = Tables.table(s, dir, "part")
        .filter(col("p_brand") === "Brand#13").select("p_partkey")
      val li = Tables.table(s, dir, "lineitem")
        .join(broadcast(brandParts), col("l_partkey") === col("p_partkey"))
        .select("l_partkey", "l_quantity", "l_extendedprice")
      val stats = li.groupBy("l_partkey")
        .agg(sum(col("l_quantity")).as("sum_q"), count(lit(1)).as("n_q"))
      li.join(broadcast(stats), "l_partkey")
        .filter(col("l_quantity") * lit(5) * col("n_q") < col("sum_q"))
        .agg((sum(col("l_extendedprice").cast("decimal(18,2)")) * lit(1000000))
          .cast("decimal(38,0)").cast("long").as("revenue_micros"),
          count(lit(1)).as("n_lines"))
    }),

    // TPC-H Q21-shaped waiting-supplier scan: the classic EXISTS(other
    // supplier on the order) AND NOT EXISTS(other FLAGGED supplier) double
    // self-join, rewritten as ONE grouped pass over the fact — per order,
    // count distinct suppliers and distinct flagged suppliers; a supplier's
    // flagged line "waits" iff the order is multi-supplier and they are its
    // only flagged one. Two narrow shuffles on the order key replace two
    // fact-size self-joins (the decorrelation a 100 TB plan needs — the
    // EXISTS pair would scan lineitem three times).
    "q_waiting_supplier" -> ((s, dir) => {
      // r14 (guide §2.4): one per-order aggregation carries the flagged
      // supplier SET alongside the distinct counts — when exactly one
      // supplier is flagged, that set has one element and IS the
      // waiting supplier, so the former second fact scan + fact-fact
      // join on l_orderkey are gone (collect_set drops the non-R nulls;
      // per-order cardinality is basket-bounded). Same numwait rows.
      Tables.table(s, dir, "lineitem")
        .groupBy("l_orderkey").agg(
          collect_set(col("l_suppkey")).as("__ss"),
          collect_set(when(col("l_returnflag") === "R", col("l_suppkey")))
            .as("__fs"))
        .filter(size(col("__ss")) > 1 && size(col("__fs")) === 1)
        .select(element_at(col("__fs"), 1).as("l_suppkey"))
        .join(broadcast(Tables.table(s, dir, "supplier")),
          col("l_suppkey") === col("s_suppkey"))
        .groupBy(col("s_name"))
        .agg(count(lit(1)).as("numwait"))
    }),

    // TPC-H Q22-shaped idle-customer stats: scalar subquery (positive-
    // balance average) + NOT EXISTS recent order. The scalar arrives as a
    // broadcast one-row (sum, count) pair and the avg compare is
    // cross-multiplied in DECIMAL (c_acctbal * n > sum) — division-free,
    // engine-exact; the NOT EXISTS is a LEFT ANTI join against the
    // date-pruned order keys. Money out as exact integer cents.
    "q_idle_customer_stats" -> ((s, dir) => {
      val cust = Tables.customer(s, dir)
      val bal = col("c_acctbal").cast("decimal(18,2)")
      val posAvg = cust.filter(col("c_acctbal") > 0)
        .agg(sum(bal).as("pos_sum"), count(lit(1)).as("pos_n"))
      val recent = Tables.table(s, dir, "orders")
        .filter(col("o_orderdate") >= lit("2000-01-01")).select("o_custkey")
      cust.crossJoin(broadcast(posAvg))
        .filter(bal * col("pos_n") > col("pos_sum"))
        .join(recent, col("c_custkey") === col("o_custkey"), "left_anti")
        .groupBy(col("c_nationkey"))
        .agg(count(lit(1)).as("numcust"),
          (sum(bal) * lit(100)).cast("decimal(38,0)").cast("long")
            .as("totacctbal_cents"))
    }),

    // TPC-H Q2-shaped minimum-cost supplier: the correlated scalar-MIN
    // subquery (cheapest offer per part, ties kept) decorrelated into a
    // whole-partition window min over the size-pruned offers — ONE fact
    // scan, one partkey shuffle; the agg-then-join-back form would rescan
    // the fact for the min side (the keep-best lesson). Unit price is one
    // IEEE division — bit-identical across engines
    "q_min_cost_supplier" -> ((s, dir) => {
      val sized = Tables.table(s, dir, "part")
        .filter(col("p_size") === 25).select("p_partkey")
      val offers = Tables.table(s, dir, "lineitem")
        .join(broadcast(sized), col("l_partkey") === col("p_partkey"))
        .select(col("l_partkey"), col("l_suppkey"),
          (col("l_extendedprice") / col("l_quantity")).as("unit_price"))
      val w = org.apache.spark.sql.expressions.Window.partitionBy("l_partkey")
      offers.withColumn("min_price", min(col("unit_price")).over(w))
        .filter(col("unit_price") === col("min_price"))
        .select(col("l_partkey").as("partkey"), col("l_suppkey").as("suppkey"),
          col("min_price"))
        .distinct()
    }),

    // RFM customer segmentation (recency / frequency / monetary quartile
    // scores, 4 = best): one account-level agg, then the nine quartile
    // CUT VALUES come from exact range-narrowing selection
    // (EventAnalytics.rfmScores / OrderStatistics.kthSmallest — nothing
    // sorts, nothing single-tasks; the previous three global cume_dist
    // windows were the repo's one single-reducer plan, and the histogram
    // form degrades on all-distinct monetary) and enter the plan as
    // LITERALS. Cut semantics are exactly cume_dist's: cut_k = the
    // (⌊kN/4⌋+1)-th smallest = min value with 4·cnt(<=v) > k·N — ties
    // share a count, so they can never split a quartile; recency negates
    // so "fresher = higher" rides the same ascending machinery.
    "q_rfm_segments" -> ((s, dir) => {
      val nowMs = 1706659200000L // 2024-02-01: just past the corpus window
      graft.ops.EventAnalytics.rfmScores(
        completed(s, dir).groupBy("account_id").agg(
          expr(s"CAST(($nowMs - max(event_time_ms)) div 86400000 AS BIGINT)")
            .as("recency_days"),
          count(lit(1)).as("frequency"),
          sum(expr("CAST(round(amount * 100) AS BIGINT)")).as("monetary_kobo")))
    }),

    // CUBE multi-level aggregation (the full 2^n grouping-set lattice;
    // ROLLUP's q_rollup_spend covers the hierarchy form) — grouping_id
    // disambiguates aggregated-away NULLs; integer-kobo money. One
    // shuffle: Spark expands the lattice map-side and combines partials
    "q_cube_spend" -> ((s, dir) => {
      val t = completed(s, dir)
        .select(col("currency"), col("txn_type"),
          expr("CAST(round(amount * 100) AS BIGINT)").as("kobo"))
      t.cube("currency", "txn_type")
        .agg(grouping_id().cast("long").as("gid"),
          sum(col("kobo")).as("spend_kobo"), count(lit(1)).as("n_txns"))
    }),

    // Set operation EXCEPT as a first-class query (churn: accounts active
    // active in the corpus window, silent in its final days) —
    // plans as distinct + left-anti, both shuffling once on account_id
    "q_churn_accounts" -> ((s, dir) => {
      val t = completed(s, dir).select("account_id", "event_time_ms")
      val active = t.filter(col("event_time_ms") < lit(1706486400000L))
        .select("account_id").distinct()
      val lastDays = t.filter(col("event_time_ms") >= lit(1706486400000L))
        .select("account_id").distinct()
      active.except(lastDays)
    }),

    // Z-order clustering key: Morton interleave of the two quantized
    // filter dimensions — the published lakehouse Z-ORDER layout trick.
    // Bounds come from ONE broadcast min/max scalar; quantization is
    // integer-exact; the interleave runs as the codegen'd graft_zorder
    // kernel in the scan stage. ZOrderSpec measures the actual skipping
    // win (per-file min/max envelopes vs a box predicate)
    "q_zorder_curve" -> ((s, dir) => {
      GraftFunctions.register(s)
      graft.sources.ZOrderLayout.withZValue(
        Tables.table(s, dir, "lineitem")
          .select("l_orderkey", "l_linenumber", "l_partkey", "l_suppkey"),
        "l_partkey", "l_suppkey")
    }),

    // TPC-H Q15-shaped top supplier: the view-plus-global-max shape — the
    // per-supplier revenue agg computed once, its max attached as a
    // broadcast one-row scalar, equality on exact integer micros (ties
    // would surface as multiple rows, as in the spec's Q15). The fact
    // scans once; everything after the agg is supplier-cardinality.
    "q_top_supplier" -> ((s, dir) => {
      val rev = Tables.table(s, dir, "lineitem")
        .filter(col("l_shipdate") >= lit("1996-01-01") &&
          col("l_shipdate") < lit("1996-04-01"))
        .groupBy("l_suppkey")
        .agg((sum(col("l_extendedprice").cast("decimal(18,2)") *
            (lit(1).cast("decimal(4,2)") - col("l_discount").cast("decimal(4,2)"))) *
          lit(1000000)).cast("decimal(38,0)").cast("long").as("total_rev_micros"))
      val mx = rev.agg(max(col("total_rev_micros")).as("max_rev_micros"))
      rev.crossJoin(broadcast(mx))
        .filter(col("total_rev_micros") === col("max_rev_micros"))
        .join(broadcast(Tables.table(s, dir, "supplier")),
          col("l_suppkey") === col("s_suppkey"))
        .select(col("s_suppkey").as("suppkey"), col("s_name"),
          col("total_rev_micros"))
    }),

    // ---- LLM-data-pipeline extensions (SURVEY §7.2 step 8) -----------------

    // Text analysis: stopword-profile language ID (argmax w/ fixed tiebreak)
    "q_text_langid" -> ((s, dir) => TextAnalysis.langId(Tables.documents(s, dir))),

    // Text analysis: structural quality scoring
    "q_text_quality" -> ((s, dir) => TextAnalysis.quality(Tables.documents(s, dir))),

    // Text analysis: whitespace / regex-subword / BPE-estimate token counts
    "q_token_count" -> ((s, dir) => TextAnalysis.tokenCounts(Tables.documents(s, dir))),

    // Text analysis: FNV-1a64 fingerprints via custom codegen'd Expression
    // — oracle replays the hash in SQL (HUGEINT mod-2^64, see SqlHash)
    "q_doc_fingerprint" -> ((s, dir) => {
      GraftFunctions.register(s)
      TextAnalysis.fingerprints(Tables.documents(s, dir))
    }),

    // Text analysis: winnowed rolling-hash fingerprints (custom codegen'd
    // Expression) — oracle replays the polynomial hash + window minima
    "q_doc_winnow" -> ((s, dir) => {
      GraftFunctions.register(s)
      TextAnalysis.winnowFingerprints(Tables.documents(s, dir))
    }),

    // Dedup: exact (digest-grouped keep-min)
    "q_dedup_exact" -> ((s, dir) => Dedup.exact(Tables.documents(s, dir))),

    // Dedup: exact n-gram Jaccard pairs via inverted shingle index
    "q_dedup_ngram_jaccard" -> ((s, dir) =>
      Dedup.ngramJaccardPairs(Tables.documents(s, dir), JaccardThreshold, JaccardMaxDocId)),

    // Dedup: MinHash signatures + LSH banding candidates — oracle replays
    // murmur3, the perms, and the xxhash64 band buckets in SQL
    "q_dedup_minhash" -> ((s, dir) =>
      MinHashLSH.candidatePairs(Tables.documents(s, dir), MinhashEstThreshold)),

    // Dedup: the full MinHash composition with exact verification —
    // banding candidates, then exact Jaccard computed ONLY for candidates;
    // equals the exhaustive answer on this corpus (planted dups sit at
    // ~0.95 against a 16x4 banding S-curve), so the exact-Jaccard oracle
    // verifies the hash-defined candidate stage end to end
    "q_dedup_minhash_verified" -> ((s, dir) =>
      MinHashLSH.verifiedPairs(
        Tables.documents(s, dir).filter(col("doc_id") < JaccardMaxDocId),
        MinhashVerifyThreshold)),

    // Dedup: INCREMENTAL near-dup — a new batch (doc_id % 10 == 7) signed
    // and banded per-row, equi-joined against the corpus's persisted-shape
    // signature index (+ itself for batch-internal dups), exact verify
    // only for candidates with shingles built only for TOUCHED docs. The
    // continuous-ingest production shape: the corpus is never re-signed.
    // Equals the exhaustive >= 0.8 pairs touching the batch (same banding
    // S-curve argument as q_dedup_minhash_verified); the union over
    // successive batches reconstructs verifiedPairs by induction.
    "q_dedup_incremental" -> ((s, dir) => {
      val docs = Tables.documents(s, dir).filter(col("doc_id") < JaccardMaxDocId)
      val corpus = docs.filter(pmod(col("doc_id"), lit(10)) =!= 7)
      val batch = docs.filter(pmod(col("doc_id"), lit(10)) === 7)
      MinHashLSH.incrementalVerifiedPairs(
        MinHashLSH.signatureIndex(corpus), corpus, batch, MinhashVerifyThreshold)
    }),

    // Dedup: winnow-fingerprint containment candidates (substring reuse
    // that size-skewed Jaccard misses) — oracle replays the winnow hash
    "q_dedup_containment" -> ((s, dir) => {
      GraftFunctions.register(s)
      MinHashLSH.winnowContainmentPairs(Tables.documents(s, dir), minShared = 5)
    }),

    // Dedup: the SAME containment candidates under the production hot-
    // postings cap (one boilerplate fingerprint contributes df^2/2 join
    // rows — the sf1 gate measured the blowup; SCALING.md round 5). The
    // cap itself is oracle-verified: the SQL replays the winnow hashes,
    // prunes fingerprints with df > cap, then pairs.
    "q_dedup_containment_capped" -> ((s, dir) => {
      GraftFunctions.register(s)
      MinHashLSH.winnowContainmentPairs(Tables.documents(s, dir),
        minShared = 5, maxDf = ContainmentMaxDf)
    }),

    // Dedup: containment composition with exact verification — winnow
    // candidates, then a full-text substring check only for candidates;
    // equals the exhaustive containment answer (winnow's shared-
    // fingerprint guarantee makes candidates a superset), so the
    // position() oracle checks the fingerprint stage end to end
    "q_dedup_containment_verified" -> ((s, dir) => {
      GraftFunctions.register(s)
      MinHashLSH.verifiedContainmentPairs(
        Tables.documents(s, dir).filter(col("doc_id") < JaccardMaxDocId),
        minShared = 5, minTextLen = ContainMinTextLen)
    }),

    // Dedup: pairs -> connected duplicate clusters (keeper = min doc_id
    // per component; exact pairs as input so the oracle can reproduce the
    // transitive closure with a recursive CTE)
    "q_dedup_clusters" -> ((s, dir) =>
      Dedup.dupClusters(
        Dedup.ngramJaccardPairs(Tables.documents(s, dir), JaccardThreshold, JaccardMaxDocId))),

    // Dedup: the same components via ALTERNATING STAR CONTRACTION —
    // O(log d) rounds vs min-label's O(d), the long-path-component
    // alternative; identical output contract, same recursive-CTE oracle
    "q_dedup_clusters_star" -> ((s, dir) =>
      Dedup.dupClustersStar(
        Dedup.ngramJaccardPairs(Tables.documents(s, dir), JaccardThreshold, JaccardMaxDocId))),

    // Dedup: INCREMENTAL cluster maintenance — the standing corpus
    // labeling (batch split % 10 == 7 held out) folded together with the
    // batch-touching pairs on a REDUCED graph sized by the new pairs, the
    // corpus graph never re-propagated; equals full-closure clustering
    // over all pairs (same recursive-CTE oracle as q_dedup_clusters)
    "q_dedup_clusters_incremental" -> ((s, dir) => {
      val allPairs = Dedup.ngramJaccardPairs(
        Tables.documents(s, dir), JaccardThreshold, JaccardMaxDocId).persist()
      val corpusPairs = allPairs.filter(
        pmod(col("doc_a"), lit(10)) =!= 7 && pmod(col("doc_b"), lit(10)) =!= 7)
      val newPairs = allPairs.filter(
        pmod(col("doc_a"), lit(10)) === 7 || pmod(col("doc_b"), lit(10)) === 7)
      Dedup.dupClustersIncremental(Dedup.dupClusters(corpusPairs), newPairs)
    }),

    // Dedup: SimHash bit-vote fingerprints + chunk-bucketed hamming pairs
    // — oracle replays per-word xxhash64 and the bit votes in SQL
    "q_dedup_simhash" -> ((s, dir) => MinHashLSH.simhashPairs(Tables.documents(s, dir))),

    // Dedup: SimHash composition with exact verification — 16x4-bit-chunk
    // hamming candidates (radius 15: the verifier window is a CONSTANT
    // 1000 docs, so selectivity is irrelevant and the wide radius covers
    // the corpus's observed hamming-9 exact pair with margin; the library
    // default stays at the selective 8x8), exact Jaccard ONLY for
    // candidates; equals the exhaustive answer under the hamming-radius
    // precondition asserted in SimhashVerifiedSpec
    "q_dedup_simhash_verified" -> ((s, dir) =>
      MinHashLSH.verifiedSimhashPairs(
        Tables.documents(s, dir).filter(col("doc_id") < JaccardMaxDocId),
        MinhashVerifyThreshold, nChunks = 16, maxHamming = 15)),

    // Dedup: embedding-cosine near-dup pairs — banded sign-LSH candidates
    // (equi-join, no cross product) + exact cosine verify; the DuckDB
    // oracle recomputes the same result as bounded all-pairs
    "q_dedup_embedding" -> ((s, dir) =>
      Dedup.embeddingNearDupPairsBanded(
        Tables.embeddings(s, dir).filter(col("vec_id") < EmbDupMaxVecId),
        EmbDupThreshold)),

    // Semantic dedup (SemDedup-style): one keeper per sign-LSH bucket —
    // scan-only bucketing, one scalar-column shuffle; the oracle replays
    // the xxhash64 hyperplanes + sign buckets in SQL
    "q_semantic_dedup" -> ((s, dir) =>
      Dedup.semanticDedup(Tables.embeddings(s, dir), SemDedupBits)),

    // Substring-level dedup (Lee et al. 2022 shape): maximal duplicated
    // token spans per document via positional 8-gram df>=2 + interval
    // islands — linear in corpus grams, no pairwise doc join; the oracle
    // replays the fnv64 gram fingerprints and the island arithmetic
    "q_dup_spans" -> ((s, dir) => {
      GraftFunctions.register(s)
      DupSpans.dupSpans(Tables.documents(s, dir), DupSpanGram)
    }),

    // Per-document duplicated-token report + keep/flag verdict at 50%
    "q_dup_doc_report" -> ((s, dir) => {
      GraftFunctions.register(s)
      DupSpans.dupFractions(Tables.documents(s, dir), DupSpanGram,
        DupSpanMaxFraction)
    }),

    // The strip pass: documents rebuilt with duplicated spans removed
    // (span-free docs pass through byte-identical, no rejoin round-trip)
    "q_dup_span_strip" -> ((s, dir) => {
      GraftFunctions.register(s)
      DupSpans.stripDupSpans(Tables.documents(s, dir), DupSpanGram)
    }),

    // INCREMENTAL span dedup (continuous-ingest shape): a new batch
    // (doc_id % 10 == 7) folds against the standing gram-df index —
    // only the batch tokenizes; corpus positions retro-flag through the
    // df==1 exemplars the index kept. Union over batches reconstructs
    // the full-corpus duplicated-position set (DupSpansSpec pins the
    // induction); the oracle recomputes both sides from scratch with
    // corpus/batch doc-frequencies split
    "q_dup_spans_incremental" -> ((s, dir) => {
      GraftFunctions.register(s)
      val docs = Tables.documents(s, dir)
      val corpus = docs.filter(pmod(col("doc_id"), lit(10)) =!= 7)
      val batch = docs.filter(pmod(col("doc_id"), lit(10)) === 7)
      DupSpans.dupPositionsIncremental(
        DupSpans.gramIndex(corpus, DupSpanGram), batch, DupSpanGram)
    }),

    // Similarity: brute-force cosine top-k (broadcast queries, no shuffle)
    "q_sim_bruteforce_topk" -> ((s, dir) =>
      Similarity.bruteForceTopK(Tables.embeddings(s, dir), SimNumQueries, SimTopK)),

    // Contrastive-training data prep: per query, the k most-similar vectors
    // of a DIFFERENT label (hard negatives) — the label-mismatch predicate
    // prunes in the scan stage next to the fused dot product, and the
    // candidate generator swaps for the IVF/IVF-PQ tier unchanged at scale
    "q_hard_negatives" -> ((s, dir) =>
      Similarity.hardNegatives(Tables.embeddings(s, dir), SimNumQueries, SimTopK)),

    // Similarity: IVF-style pruned ANN (recall-tested vs brute force).
    // Fully oracle-replayable since the quantizer moved to driver-side
    // Lloyd over a vec_id-sorted sample: every float accumulates in a
    // DETERMINISTIC order, so the DuckDB oracle reproduces the centroids
    // bit-for-bit with order-forced list_reduce folds (this was the one
    // no-oracle query while the means came from shuffled avg())
    "q_sim_ivf_topk" -> ((s, dir) =>
      Similarity.ivfTopK(Tables.embeddings(s, dir), SimNumQueries, SimTopK,
        IvfStride, IvfNprobe, IvfIters)),

    // Similarity: sign-random-projection LSH with multi-probe (training-
    // free scale path; recall-tested vs brute force — on this near-
    // orthogonal corpus IVF prunes better, see Scaladoc). Oracle replays
    // the whole path in SQL, xxhash64 hyperplanes included
    "q_sim_lsh_topk" -> ((s, dir) =>
      Similarity.lshTopK(Tables.embeddings(s, dir), SimNumQueries, SimTopK)),

    // Embedding storage: per-vector int8 range quantization + error bound
    "q_embed_quantize" -> ((s, dir) =>
      Similarity.quantizeInt8(Tables.embeddings(s, dir))),

    // Second-moment (Gram) matrix of the embedding table — the
    // whitening/PCA/OPQ training statistic, accumulated as ONE
    // map-side-combined aggregate whose partial state is the d(d+1)/2
    // upper triangle itself (shuffle moves partitions x d^2/2 longs,
    // never a row); integer-grid quantized so sums are exact longs and
    // the oracle replays them bit-for-bit
    "q_embed_gram" -> ((s, dir) =>
      graft.sim.Gram.gramUpperTriangle(Tables.embeddings(s, dir), dims = 64)),

    // Johnson-Lindenstrauss projection 64->16 with a DERIVED +-1 matrix
    // (R(j,i) = parity of xxhash64(j*64+i) — no stored state, any
    // engine re-derives it): per-row integer fold, zero shuffles; the
    // oracle replays the hash matrix and every projected coordinate
    "q_embed_project" -> ((s, dir) =>
      graft.sim.Projection.jlProject(Tables.embeddings(s, dir),
        dIn = 64, dOut = 16)),

    // Two-stage search on int8 codes: integer code-dot + scalar fixups
    // prune, exact cosine reranks (recall 1.0 vs brute force at 2x rerank)
    "q_sim_quantized_topk" -> ((s, dir) =>
      Similarity.quantizedTopK(Tables.embeddings(s, dir), SimNumQueries, SimTopK)),

    // Product quantization encode: 16 4-bit codes per vector (8 bytes —
    // 32x smaller than the floats). ALL-integer pipeline (unit-sphere
    // grid + integer-L2 Lloyd + argmin encode), so the oracle replays
    // training/encoding value-exact with no float-fold forcing
    "q_pq_encode" -> ((s, dir) =>
      graft.sim.PQ.encodeQuery(Tables.embeddings(s, dir), m = PqM,
        ksub = PqKsub)),

    // PQ ADC search: per-query integer LUT against codebook literals, m
    // lookups per candidate, float rerank on survivors only (recall@5
    // 0.86 vs brute force at the shipped defaults)
    "q_sim_pq_topk" -> ((s, dir) =>
      graft.sim.PQ.topKQuery(Tables.embeddings(s, dir), SimNumQueries,
        SimTopK, m = PqM, ksub = PqKsub, rerankFactor = PqRerank)),

    // IVF-PQ — the full FAISS layering from the two tiers above: coarse
    // cells PRUNE the scan (nprobe cells per query), PQ codes SCORE the
    // survivors (integer ADC over 8-byte codes), floats rerank only
    // k*rerankFactor rows. One corpus scan computes cell + codes via two
    // codegen kernels; fully oracle-replayed (IVF float CTEs + PQ integer
    // CTEs composed in one WITH)
    "q_sim_ivfpq_topk" -> ((s, dir) =>
      graft.sim.PQ.ivfPqTopK(Tables.embeddings(s, dir), SimNumQueries,
        SimTopK, IvfStride, IvfNprobe, IvfIters, m = PqM, ksub = PqKsub,
        rerankFactor = PqRerank)),

    // OPQ — rotation-then-PQ (Ge et al. 2014): deterministic sign-flip +
    // Walsh-Hadamard rotation over global-grid INTEGER codes, then the
    // LEARNED variance snake-allocation permutation (exact integer
    // variances, n*sum(t^2) - sum(t)^2, ranked and dealt boustrophedon),
    // then plain PQ trains/encodes/ADC-searches the rotated space; floats
    // rerank on the ORIGINALS. All-integer transform -> the whole learned
    // pipeline replays bit-for-bit in the oracle (the PCA-rotation form
    // stays spec-pinned in Whitening — float eigenbases have no
    // cross-engine identity). Recall >= plain PQ at the same candidate
    // fraction (RecallProbe; floor pinned in RecallSpec)
    "q_sim_opq_topk" -> ((s, dir) =>
      graft.sim.Opq.topKQuery(Tables.embeddings(s, dir), SimNumQueries,
        SimTopK, m = PqM, ksub = PqKsub, rerankFactor = PqRerank,
        grid = PqOpqGrid)),

    // Multimodal: GENUINE binary payloads (committed golden fixture,
    // full 0..255 byte range incl. non-ASCII) + typed metadata -> batched
    // stub-decode features; oracle is byte-level over hex(payload)
    "q_multimodal_meta" -> ((s, _) => Multimodal.decodeMedia(s, Tables.media(s))),

    // Multimodal: BYTE-stride frame sampling over the binary fixture
    // (1 -> N controlled explosion + 0x2E pad-resize); frames project as
    // hex for oracle transport — the operator emits raw binary frames
    "q_multimodal_frames" -> ((s, _) =>
      Multimodal.sampleFrameBytes(Tables.media(s))
        .select(col("doc_id"), col("frame_idx"),
          hex(col("frame")).as("frame_hex"), col("frame_len"),
          hex(col("frame_resized")).as("frame_resized_hex"))),

    // Multimodal: perceptual near-dup pairs — frame fingerprints ->
    // doc-level SimHash -> chunk-bucketed hamming candidates (shared
    // MinHashLSH machinery, bucketed equi-join, never all-pairs) -> exact
    // frame-set Jaccard verify. 32x2-bit chunks / radius 27: few-frame
    // docs give noisy majority-vote signatures (observed pair hamming up
    // to 20 on the shipped corpora) — MultimodalSpec asserts the radius
    // covers every exact pair, so candidates ⊇ truth and the exhaustive
    // oracle equality holds (the q_dedup_simhash_verified contract)
    "q_multimodal_near_dup" -> ((s, dir) =>
      Multimodal.nearDupPairs(
        Tables.documents(s, dir).filter(col("doc_id") < JaccardMaxDocId),
        MultimodalDupThreshold)),

    // Multimodal: the near-dup composition resolved to a corpus manifest —
    // label-propagation clusters + keep-best election (most frames = the
    // longest media survives, doc_id tiebreak); clusters/keepers are
    // pair-touched-only frames broadcast back, the corpus never shuffles
    "q_multimodal_manifest" -> ((s, dir) =>
      Multimodal.nearDupManifest(
        Tables.documents(s, dir).filter(col("doc_id") < JaccardMaxDocId),
        MultimodalDupThreshold)),

    // Training prep: GPT-style sequence packing — per-shard concat-then-
    // chunk layout; one hash shuffle on shard, partitioned running sum
    "q_seq_pack" -> ((s, dir) =>
      graft.text.TrainingPrep.packSequences(Tables.documents(s, dir),
        maxTokens = 256)),

    // Training prep: deterministic id-keyed train/val/test split (scan-only)
    "q_train_val_split" -> ((s, dir) =>
      graft.text.TrainingPrep.trainValSplit(Tables.documents(s, dir))),

    // Training prep: TF-IDF top terms per doc (two aggs + broadcast df)
    "q_tfidf_terms" -> ((s, dir) =>
      graft.text.TrainingPrep.tfidfTopTerms(Tables.documents(s, dir))),

    // Retrieval: Okapi BM25 top-10 per query — rarest-16 keyword queries
    // from the eval slice; Lucene-floored idf in integer micro-nats +
    // EXACT RATIONAL tf normalization (k1=6/5, b=3/4 multiplied
    // through); query terms broadcast into the postings scan (candidate
    // volume = sum of the chosen rare terms' df), per-query top-k
    // bounded. The synthetic corpus has a head-only ~31-term vocabulary
    // (no informative tail), so the stop-term guard that bounds real
    // corpora would empty every query here: the guard is DISABLED
    // (maxDfDen=1) and candidate volume is bounded by the 1-per-997
    // query log instead. All four retrieval queries run over the
    // MATERIALIZED postings index (PostingsIndex.ensure: built once per
    // session under the temp dir, scanned by every retrieval query —
    // the production shape the Bm25 scale note names; r11 measured and
    // rejected the persist() alternative)
    "q_bm25_topk" -> ((s, dir) =>
      graft.text.Bm25.topKIndexed(graft.text.PostingsIndex.ensure(s, dir),
        queryMod = 997, queryTerms = 16, k = 10, maxDfDen = 1)),

    // Retrieval: query-likelihood (Dirichlet-smoothed LM) ranking over
    // the SAME query log and the SAME materialized index — matched-
    // postings decomposition, so the plan is the identical broadcast-
    // candidate join (see q_bm25_topk note on the disabled stop-term
    // guard)
    "q_ql_topk" -> ((s, dir) =>
      graft.text.Bm25.queryLikelihoodTopKIndexed(
        graft.text.PostingsIndex.ensure(s, dir),
        queryMod = 997, queryTerms = 16, k = 10, mu = 2000L,
        maxDfDen = 1)),

    // Hybrid retrieval: reciprocal-rank fusion of the lexical (BM25) and
    // probabilistic (QL) top-10 lists — pure integer 1e6/(60+rank)
    // contributions over two model-sized inputs, both branches scanning
    // the shared materialized index
    "q_hybrid_rrf" -> ((s, dir) => {
      val idx = graft.text.PostingsIndex.ensure(s, dir)
      graft.text.Bm25.rrfFuse(
        graft.text.Bm25.topKIndexed(idx, queryMod = 997, queryTerms = 16,
          k = 10, maxDfDen = 1),
        graft.text.Bm25.queryLikelihoodTopKIndexed(idx, queryMod = 997,
          queryTerms = 16, k = 10, mu = 2000L, maxDfDen = 1))
    }),

    // Index maintenance: the materialized postings-index BUILD job
    // itself, first-class (r13) — previously its ~seconds cost was
    // visible only as contamination of the first retrieval query's
    // warm-up sample. Forces a FRESH build (never the session cache)
    // through the atomic staging path into a unique temp dir, then
    // digests the round-tripped index into one summary row, so the
    // oracle verifies the whole written index content against a
    // from-scratch derivation. r14: the digest now aggregates EVERY
    // relation's content (postings tf sum, doclen count+sum — not just
    // their row counts), so a truncated doclen shard or a corrupted tf
    // value inside a postings row breaks the hash; and the one-row
    // digest is materialized eagerly so the throwaway index dir is
    // deleted before the query returns (bench/correctness harnesses run
    // each query several times — without the eager cleanup, full
    // sf-sized index copies accumulated unbounded under tmpdir).
    "q_postings_build" -> ((s, dir) => {
      val out = java.nio.file.Paths.get(
        System.getProperty("java.io.tmpdir"), "graft-postings-build",
        "idx-" + java.util.UUID.randomUUID.toString.take(8))
      val idx = graft.text.PostingsIndex.buildAtomic(
        Tables.documents(s, dir), s, out.toString)
      materializeThenDelete(s, indexDigest(idx), out)
    }),

    // Index maintenance, INCREMENTAL (r14): the production posture where
    // corpus growth costs a DELTA, not a rebuild. Splits the corpus into
    // a standing part (6/7 of docs) and an arrival batch (1/7), builds
    // the standing segmented index, lands the arrivals via
    // PostingsSegments.appendDelta — which scans ONLY the new docs —
    // then compacts (generation flip) and digests the compacted index.
    // The oracle is the SAME from-scratch full-corpus derivation as
    // q_postings_build: delta + merge + compaction must equal a full
    // rebuild bit-for-bit on every relation's aggregated content.
    "q_postings_build_incremental" -> ((s, dir) => {
      val out = java.nio.file.Paths.get(
        System.getProperty("java.io.tmpdir"), "graft-postings-incr",
        "idx-" + java.util.UUID.randomUUID.toString.take(8))
      val docs = Tables.documents(s, dir)
      graft.text.PostingsSegments.init(
        docs.filter(col("doc_id") % 7 =!= 0), s, out.toString)
      graft.text.PostingsSegments.appendDelta(
        docs.filter(col("doc_id") % 7 === 0), s, out.toString)
      graft.text.PostingsSegments.compact(s, out.toString)
      val idx = graft.text.PostingsSegments.readMerged(s, out.toString)
      materializeThenDelete(s, indexDigest(idx), out)
    }),

    // Data mixing: EXACT-SIZE token-weighted sample without replacement
    // (Efraimidis-Spirakis hash-exponential keys: one scan + one bounded
    // global top-k — the distributed reservoir)
    "q_weighted_sample" -> ((s, dir) =>
      graft.text.TrainingPrep.weightedSample(Tables.documents(s, dir))),

    // Privacy audit: k-anonymity group sizes over the (nation, segment,
    // balance-band) quasi-identifier — one hash agg, QI-domain output
    "q_k_anonymity" -> ((s, dir) =>
      graft.ops.Privacy.kAnonymity(Tables.customer(s, dir))),

    // Privacy audit: distinct l-diversity over the same QI tuple —
    // groups whose sensitive attribute (exact balance) takes < l
    // distinct values leak even when k-anonymous; one two-level
    // map-side-combined distinct agg, QI-domain-bounded output
    "q_l_diversity" -> ((s, dir) =>
      graft.ops.Privacy.lDiversity(Tables.customer(s, dir))),

    // Retrieval eval: per-query nDCG@10 of the hybrid (RRF) ranking
    // judged by RANKING-INDEPENDENT token-overlap qrels (grades derived
    // from content only — distinct-token overlap with the query doc over
    // a ±150 judging pool — so the eval cannot favor either ranker under
    // test, unlike the r11 QL-derived grades). Model-sized inputs,
    // natural-log discount, integer micro units end to end; both ranking
    // branches scan the shared materialized index
    "q_retrieval_ndcg" -> ((s, dir) => {
      val idx = graft.text.PostingsIndex.ensure(s, dir)
      val bm = graft.text.Bm25.topKIndexed(idx, queryMod = 997,
        queryTerms = 16, k = 10, maxDfDen = 1)
      val ql = graft.text.Bm25.queryLikelihoodTopKIndexed(idx,
        queryMod = 997, queryTerms = 16, k = 10, mu = 2000L, maxDfDen = 1)
      graft.text.Bm25.ndcgAtK(
        graft.text.Bm25.rrfFuse(bm, ql)
          .withColumnRenamed("fused_rank", "doc_rank"),
        graft.text.Bm25.tokenOverlapQrels(Tables.documents(s, dir),
          queryMod = 997))
    }),

    // Leakage-safe split: train/val/test assigned per NEAR-DUP CLUSTER
    // (hash of the cluster root), so correlated documents never straddle
    // the eval boundary; unclustered docs hash on their own id
    "q_leakage_safe_split" -> ((s, dir) => {
      val docs = Tables.documents(s, dir)
      graft.text.TrainingPrep.leakageSafeSplit(docs,
        Dedup.dupClusters(Dedup.ngramJaccardPairs(
          docs, JaccardThreshold, JaccardMaxDocId)))
    }),

    // Tokenizer training: BPE merge statistics — corpus collapsed to
    // (distinct word, freq) first, then frequency-weighted adjacent
    // character pairs, deterministic top-100 (bounded heap, no global sort)
    "q_bpe_pairs" -> ((s, dir) =>
      graft.text.TrainingPrep.bpePairCounts(Tables.documents(s, dir))),

    // Distributed BPE tokenizer TRAINING — the full merge loop over the
    // Zipf-collapsed distinct-word table (corpus scanned once; each
    // round = one map-side-combined pair count + bounded argmax; only
    // the winning pair reaches the driver). Oracle replays all 6
    // training rounds as chained CTEs: pair count, deterministic
    // argmax, left-fold greedy merge — round for round
    "q_bpe_train" -> ((s, dir) =>
      graft.text.BpeTrain.train(Tables.documents(s, dir), rounds = 6)),

    // The artifact applied: per-distinct-word merge replay + count join
    // back to the exploded corpus (the fold never runs per occurrence)
    "q_bpe_tokenize" -> ((s, dir) => {
      val docs = Tables.documents(s, dir)
      val merges = graft.text.BpeTrain.train(docs, rounds = 6)
        .collect().map(r => (r.getString(1), r.getString(2))).toSeq
      graft.text.BpeTrain.tokenize(docs, merges)
    }),

    // Quality scoring: add-one-smoothed bigram LM score per doc (integer
    // micro-nats; the sequence-aware sharpening of q_unigram_logprob)
    "q_bigram_logprob" -> ((s, dir) =>
      graft.text.TrainingPrep.bigramLogProb(Tables.documents(s, dir))),

    // Production guard for the LM-scoring join: Katz-style count pruning
    // of the bigram type table (count < minCount scores as UNSEEN) — the
    // surviving frequent-type table broadcasts, so the postings never
    // shuffle. Oracle replays the prune as a HAVING clause
    "q_bigram_logprob_capped" -> ((s, dir) =>
      graft.text.TrainingPrep.bigramLogProbCapped(Tables.documents(s, dir),
        BigramMinCount)),

    // Multinomial Naive Bayes (the fastText-shaped trained filter):
    // fitted model = one train-slice count pass, model-sized grid
    "q_nb_model" -> ((s, dir) =>
      graft.text.NaiveBayes.model(Tables.documents(s, dir))),

    // NB applied to the UNtrained doc_id%5==0 slice — exercises the
    // out-of-vocabulary smoothing path under the oracle; argmax is a
    // rank-1 window planned as bounded top-k
    "q_nb_predict" -> ((s, dir) =>
      graft.text.NaiveBayes.predict(Tables.documents(s, dir))),

    // Held-out confusion matrix — the accuracy evidence for gating
    "q_nb_eval" -> ((s, dir) =>
      graft.text.NaiveBayes.confusion(Tables.documents(s, dir))),

    // Token-budget curation: each language's budget filled with its
    // highest-quality docs (greedy prefix, strict budget, total order)
    "q_token_budget" -> ((s, dir) =>
      graft.text.TrainingPrep.tokenBudgetCurate(Tables.documents(s, dir),
        budgetPerLang = 5000L)),

    // Quality rule: intra-doc 3-gram repetition ratio (boilerplate/spam
    // signal — scan + one agg, no joins)
    "q_repetition_filter" -> ((s, dir) =>
      graft.text.TrainingPrep.repetitionScore(Tables.documents(s, dir))),

    // Decontamination: training docs sharing any 8-gram with the eval
    // slice (the deterministic doc_id % 50 == 0 sample standing in for a
    // benchmark suite), via inverted n-gram index (linear in postings)
    "q_decontaminate" -> ((s, dir) => {
      val docs = Tables.documents(s, dir)
      graft.text.TrainingPrep.decontaminate(
        docs.filter(col("doc_id") % 50 =!= 0),
        docs.filter(col("doc_id") % 50 === 0))
    }),

    // Decontamination at the 100 TB shape: eval n-grams folded into a
    // broadcast Bloom bitset probed in the scan stage; only admitted
    // grams reach the exact verify join, so the training side never
    // shuffles. No false negatives -> equals q_decontaminate's exact
    // answer, and the exact SQL is the oracle
    "q_decontaminate_bloom" -> ((s, dir) => {
      val docs = Tables.documents(s, dir)
      graft.text.TrainingPrep.bloomDecontaminate(
        docs.filter(col("doc_id") % 50 =!= 0),
        docs.filter(col("doc_id") % 50 === 0))
    }),

    // Data mixing: deterministic hash-resampler — downsample the dominant
    // language (en 1/2), keep the rest whole; scan-only, no window
    "q_mixture_sample" -> ((s, dir) =>
      graft.text.TrainingPrep.mixtureSample(Tables.documents(s, dir),
        Map("en" -> (1, 2)))),

    // Quality score: per-doc mean unigram log-probability (perplexity
    // proxy; vocabulary broadcast)
    "q_unigram_logprob" -> ((s, dir) =>
      graft.text.TrainingPrep.unigramLogProb(Tables.documents(s, dir))),

    // Chunking: overlapping windows (RAG/embedding-index layout)
    "q_doc_chunks" -> ((s, dir) =>
      graft.text.TrainingPrep.chunkDocs(Tables.documents(s, dir))),

    // Data mixing: per-language document cap (deterministic order)
    "q_lang_cap" -> ((s, dir) =>
      graft.text.TrainingPrep.langCap(Tables.documents(s, dir))),

    // Training prep: adaptive gate at the exact corpus median token count
    "q_token_gate_adaptive" -> ((s, dir) =>
      graft.text.TrainingPrep.adaptiveTokenGate(Tables.documents(s, dir))),

    // Training prep capstone: one-row integer-exact dataset card
    "q_dataset_card" -> ((s, dir) =>
      graft.text.TrainingPrep.datasetCard(Tables.documents(s, dir))),

    // Skew-immune salted two-phase aggregation (== plain groupBy result)
    "q_salt_skew_agg" -> ((s, dir) =>
      graft.ops.Salt.saltedSumCount(upserts(s, dir), Seq("account_id"),
          "amount", col("txn_id"), buckets = 32)
        .select(col("account_id"), round(col("sum_amount"), 2).as("sum_amount"),
          col("n_rows"))),

    // S1/S2 serde seam: envelope -> JSON wire payload -> decode -> parse
    // (the Kafka value-codec path; JSON stands in for Avro — no spark-avro
    // jar in this container)
    "q_envelope_json_serde" -> ((s, dir) =>
      EnvelopeOps.parseTxnEnvelope(
        EnvelopeOps.decodeJsonEnvelope(
          EnvelopeOps.encodeJsonEnvelope(
            EnvelopeOps.synthesizeTxnEnvelope(Tables.events(s, dir)))))),

    // S1/S2 serde seam over the REAL wire format: envelope -> Confluent-
    // framed Avro BINARY -> minimal Avro reader -> parse (graft.cdc
    // .AvroWire — magic byte + schema id + zigzag/LE-IEEE binary body;
    // swap for to_avro/from_avro + registry when the jars are present;
    // byte fixtures pinned against the Avro spec in GoldenWireSpec)
    "q_envelope_avro_serde" -> ((s, dir) =>
      EnvelopeOps.parseTxnEnvelope(
        graft.cdc.AvroWire.decodeAvroEnvelope(
          graft.cdc.AvroWire.encodeAvroEnvelope(
            EnvelopeOps.synthesizeTxnEnvelope(Tables.events(s, dir)))))),

    // Temporal as-of join: each debit sees the newest CREDIT "profile
    // version" at-or-before its own event time (union+sort+carry-forward —
    // one shuffle, no range explosion; oracle = DuckDB's native ASOF JOIN)
    "q_asof_enrich" -> ((s, dir) => {
      val up = upserts(s, dir)
      val facts = up
        .filter(Predicates.isCompleted(col("status")) &&
          Predicates.isDebit(col("txn_type")))
        .select("txn_id", "account_id", "amount", "event_time_us", "event_time_ms")
      val versions = up.filter(col("txn_type") === "CREDIT")
        .select(col("account_id"), col("event_time_us").as("ver_ts_us"),
          col("amount").as("profile_score"), col("txn_id").as("ver_txn_id"))
      val deduped = LatestByKey.latest(versions,
          Seq("account_id", "ver_ts_us"), Seq(col("ver_txn_id")))
        .drop("ver_txn_id")
      AsOfJoin.asOfLeft(facts, deduped, "account_id", "event_time_us", "ver_ts_us")
        .select(col("txn_id"), col("account_id"), col("amount"),
          expr("ver_ts_us div 1000").as("ver_ts_ms"), col("profile_score"))
    }),

    // Top-k ranking over a pre-aggregated frame (absent from the
    // reference, added as extension surface). orderBy().limit(k) plans as
    // TakeOrderedAndProject — per-partition top-k, driver merges only
    // k×partitions rows — so no single task ever sorts all accounts; the
    // rank window then runs over just the k surviving rows
    "q_topk_spenders" -> ((s, dir) => {
      val totals = completed(s, dir)
        .filter(Predicates.isDebit(col("txn_type")))
        .groupBy("account_id")
        .agg(round(sum(col("amount")), 2).as("total_spend"))
      totals
        .orderBy(col("total_spend").desc, col("account_id"))
        .limit(10)
        // rank over the 10 surviving rows only. The partition key is a
        // constant-valued but non-foldable expression: it pins the bounded
        // 10-row input to one WindowExec partition BY DECLARATION (a bare
        // literal would be optimized away, reverting to the global-window
        // shape that cannot scale)
        .withColumn("rank", row_number().over(
          org.apache.spark.sql.expressions.Window
            .partitionBy(pmod(col("account_id"), lit(1L)))
            .orderBy(col("total_spend").desc, col("account_id"))).cast("long"))
    }),

    // Multi-level aggregation: ROLLUP over (currency, txn_type) with
    // grouping indicators (absent category §2.8, added as extension).
    // round(sum(double),2) is engine-safe here because amounts are exact
    // 2-dp values: the true total is on the 2-dp grid, and summation-order
    // noise (~1e-9) cannot move it across a .005 rounding boundary.
    "q_rollup_spend" -> ((s, dir) =>
      completed(s, dir)
        .rollup(col("currency"), col("txn_type"))
        .agg(round(sum(col("amount")), 2).as("total_amount"),
          count(lit(1)).as("n_txns"))
        .select(
          coalesce(col("currency"), lit("ALL")).as("currency"),
          coalesce(col("txn_type"), lit("ALL")).as("txn_type"),
          col("total_amount"), col("n_txns"))),

    // Exact distinct counts per group (approx_count_distinct is
    // engine-specific; its <5% error is asserted in DistinctSpec)
    "q_distinct_users" -> ((s, dir) =>
      upserts(s, dir)
        .groupBy("txn_type")
        .agg(countDistinct(col("account_id")).as("n_accounts"),
          count(lit(1)).as("n_txns"))),

    // Frequency analysis: exact top-5 accounts per txn_type (partitioned
    // top-k; the approximate CMS twin is property-tested in SketchesSpec)
    "q_heavy_hitters" -> ((s, dir) =>
      graft.ops.Sketches.heavyHitters(upserts(s, dir), "txn_type",
        "account_id", k = 5)),

    // KMV bottom-k distinct sketch per source (graft_kmv, a native
    // TypedImperativeAggregate: map-side partial buffers, the shuffle
    // moves kilobytes) — content identity = xxhash64 over the FNV-1a64
    // text fingerprint, both replayed exactly by the oracle
    "q_kmv_doc_sketch" -> ((s, dir) => {
      val docs = Tables.documents(s, dir)
      graft.ops.Sketches.kmvPerGroup(docs, "source",
          expr("xxhash64(graft_fnv64(text))"), k = 64)
        .select(col("source"), col("n_rows"),
          posexplode(col("kmv")).as(Seq("pos", "h")))
        .select(col("source"), col("n_rows"),
          (col("pos") + 1).cast("long").as("rank"), col("h"))
    }),

    // Cross-source distinct-document overlap from the KMV sketches —
    // exact while unsaturated (k=64 > docs/source at sf<=0.01), the
    // integral KMV estimator once saturated; all arithmetic `div`-exact
    "q_kmv_doc_overlap" -> ((s, dir) =>
      graft.ops.Sketches.kmvOverlap(Tables.documents(s, dir), "source",
        expr("xxhash64(graft_fnv64(text))"), k = 64)),

    // The same overlap question at 3-gram granularity: cross-source
    // vocabulary/contamination overlap — saturated estimator path (every
    // source has >> 256 distinct grams), one corpus scan total
    "q_kmv_gram_overlap" -> ((s, dir) => {
      val grams = Tables.documents(s, dir)
        .select(col("source"), split(col("text"), " ").as("__w"))
        .select(col("source"),
          explode(array_distinct(graft.dedup.Dedup.shingleArray(3)))
            .as("gram"))
      graft.ops.Sketches.kmvOverlap(grams, "source",
        expr("xxhash64(graft_fnv64(gram))"), k = 256)
    }),

    // Exact-size per-stratum sample: rank by xxhash64(doc_id) inside each
    // language, keep 5 — uniform-without-replacement, deterministic, and
    // planned as the bounded-heap top-k (never a per-stratum sort)
    "q_stratified_sample" -> ((s, dir) =>
      graft.text.TrainingPrep.stratifiedSample(
        Tables.documents(s, dir), "lang", n = 5)),

    // Deterministic training shuffle: (shard, pos) assignment from the
    // same hash — per-shard parallel sorts, no global order anywhere
    "q_corpus_shuffle" -> ((s, dir) =>
      graft.text.TrainingPrep.shuffleShards(
        Tables.documents(s, dir), nShards = 32)),

    // PII scrubbing: regex redaction + counts at scan speed (no shuffle)
    "q_text_scrub" -> ((s, dir) => TextAnalysis.piiScrub(Tables.documents(s, dir))),

    // One-pass table profiler (ANALYZE shape): per column, rows / nulls /
    // exact distinct / engine-stable min-max representations from a
    // single aggregation over lineitem; the oracle is GENERATED from the
    // same schema walk (Profile.oracleSql) so they cannot drift
    "q_profile" -> ((s, dir) => graft.ops.Profile.profile(
      Tables.table(s, dir, "lineitem").select(ProfileCols.map(col): _*))),

    // Analytic statistics per group: exact median (sort-based), mean,
    // sample stddev — rounded coarsely enough (4 dp) that the engines'
    // different accumulation orders cannot flip a digit
    "q_stats_summary" -> ((s, dir) =>
      completed(s, dir)
        .groupBy("txn_type")
        .agg(
          round(median(col("amount")), 4).as("med_amount"),
          round(avg(col("amount")), 4).as("avg_amount"),
          round(stddev_samp(col("amount")), 4).as("std_amount"),
          count(lit(1)).as("n_txns"))),

    // Capstone composition: language gate + quality gate + dedup keepers
    "q_corpus_curate" -> ((s, dir) =>
      TextAnalysis.curate(Tables.documents(s, dir), lang = "en", minQuality = 0.5)),

    // The shipping composition: curation gates ∧ not-contaminated
    // (bloom) ∧ mixture-sampled, with the deterministic split — every
    // stage individually oracle-verified, composed end to end
    "q_training_manifest" -> ((s, dir) =>
      graft.text.TrainingPrep.trainingManifest(Tables.documents(s, dir))),

    // Interval (range) join: debits counted against credits of the same
    // account within ±1 h — bucketized candidate generation, never a
    // per-key cross product (stream-stream twin in Pipelines)
    "q_interval_join" -> ((s, dir) => {
      val up = upserts(s, dir)
      val debits = up
        .filter(Predicates.isCompleted(col("status")) &&
          Predicates.isDebit(col("txn_type")))
        .select("txn_id", "account_id", "event_time_us")
      val credits = up.filter(Predicates.isCredit(col("txn_type")))
        .select(col("txn_id").as("credit_txn_id"), col("account_id"),
          col("event_time_us").as("credit_ts_us"))
      val hourUs = 3600000000L
      val counts = graft.ops.IntervalJoin.inner(debits, credits,
          "account_id", "event_time_us", "credit_ts_us", -hourUs, hourUs)
        .groupBy("txn_id").agg(count(lit(1)).as("n_nearby_credits"))
      debits.join(counts, Seq("txn_id"), "left")
        .select(col("txn_id"), col("account_id"),
          coalesce(col("n_nearby_credits"), lit(0L)).as("n_nearby_credits"))
    }),

    // Pivot: currency columns x txn_type rows (explicit value list keeps
    // the output schema static and plannable — one shuffle, map-side
    // partials; round-safe because amounts are exact 2-dp)
    "q_pivot_currency" -> ((s, dir) =>
      completed(s, dir)
        .groupBy("txn_type")
        .pivot("currency", Seq("USD", "NGN", "EUR"))
        .agg(round(sum(col("amount")), 2))
        .select(col("txn_type"),
          coalesce(col("USD"), lit(0.0)).as("usd_total"),
          coalesce(col("NGN"), lit(0.0)).as("ngn_total"),
          coalesce(col("EUR"), lit(0.0)).as("eur_total"))),

    // Post-dedup corpus manifest: what the pipeline hands downstream —
    // every in-scope doc with its duplicate-cluster id and the canonical
    // keep/drop decision (pairs/labels alone leave the caller to derive it)
    "q_dedup_manifest" -> ((s, dir) =>
      Dedup.dedupManifest(Tables.documents(s, dir), JaccardThreshold,
        JaccardMaxDocId)),

    // Keeper-by-quality variant: per duplicate cluster the LONGEST member
    // survives (doc_id tiebreak) — the keep-the-best-copy policy; keeper
    // election is one cluster-keyed window over (len, doc_id) scalars,
    // keeping the candidate lineage in a single plan branch
    "q_dedup_keep_best" -> ((s, dir) =>
      Dedup.dedupManifestKeepBest(Tables.documents(s, dir), JaccardThreshold,
        JaccardMaxDocId)),

    // Cross-document boilerplate removal over deterministic planted headers
    // (the corpus has none — same planting pattern as the PII scrubber);
    // the cleaning pass itself is scan-only against a plan-constant set
    "q_boilerplate_strip" -> ((s, dir) =>
      graft.text.TrainingPrep.boilerplateStrip(
        withBoilerplate(Tables.documents(s, dir)),
        minDocs = BoilerplateMinDocs)),

    // DSIR-style importance resampling: keep raw docs the target-slice
    // unigram LM prefers (integer micro-nat scores, engine-exact)
    "q_importance_resample" -> ((s, dir) =>
      graft.text.TrainingPrep.importanceResample(Tables.documents(s, dir))),

    // Curriculum deciles of quality score per predicted language
    "q_curriculum_bins" -> ((s, dir) =>
      graft.text.TrainingPrep.curriculumBins(Tables.documents(s, dir))),

    // Per-source corpus mix profile (docs/tokens/chars/unique texts by
    // domain — the per-source table a curation report leads with);
    // uniqueness counts a 256-bit digest so wide text never shuffles
    "q_source_mix" -> ((s, dir) =>
      Tables.documents(s, dir)
        .groupBy("source")
        .agg(count(lit(1)).as("n_docs"),
          sum(size(split(col("text"), " "))).cast("long").as("total_ws_tokens"),
          sum(length(col("text"))).cast("long").as("total_chars"),
          countDistinct(sha2(lower(trim(col("text"))), 256)).as("n_unique_texts"))),

    // Integer-exact per-label centroid sums over the shared int8 codes
    // (grouped-vector mean in mergeable form, via the VecSumAgg UDAF)
    "q_label_centroids" -> ((s, dir) =>
      Similarity.labelCentroidSums(Tables.embeddings(s, dir))),

    // TPC-H Q18-shaped large-volume orders: the aggregate-then-join-back
    // shape — the HAVING survivors are tiny, so THEY broadcast and the
    // fact/dim tables never shuffle
    "q_large_orders" -> ((s, dir) => {
      val big = Tables.table(s, dir, "lineitem")
        .groupBy("l_orderkey")
        .agg(sum(col("l_quantity")).cast("long").as("total_qty")) // whole-number doubles: exact
        .filter(col("total_qty") > LargeOrderQty)
      val enriched = Tables.table(s, dir, "orders")
        .join(broadcast(big), col("o_orderkey") === col("l_orderkey"))
      broadcast(enriched)
        .join(Tables.customer(s, dir), col("o_custkey") === col("c_custkey"))
        .select(col("c_name"), col("o_custkey").as("custkey"),
          col("o_orderkey").as("orderkey"),
          unix_millis(col("o_orderdate").cast("timestamp")).as("orderdate_ms"),
          col("o_totalprice").as("totalprice"), col("total_qty"))
        .orderBy(col("totalprice").desc, col("orderkey"))
        .limit(100)
    }),
  )

  // ---- DuckDB oracle SQL ----------------------------------------------------

  /** Shared CTE prelude: the same envelope analog mapping as
    * [[graft.cdc.EnvelopeOps]] (flat form — DuckDB verifies outputs, not the
    * nested round-trip, which is Spark-side behavior under test). */
  private val P =
    """WITH txns AS (
      |  SELECT event_id AS txn_id,
      |         user_id AS account_id,
      |         'TXN-' || event_id AS txn_ref,
      |         CASE event_type WHEN 'purchase' THEN 'DEBIT' WHEN 'click' THEN 'TRANSFER_OUT'
      |              WHEN 'error' THEN 'FEE' WHEN 'signup' THEN 'CREDIT' ELSE 'TRANSFER_IN' END AS txn_type,
      |         value AS amount,
      |         CASE user_id % 3 WHEN 0 THEN 'USD' WHEN 1 THEN 'NGN' ELSE 'EUR' END AS currency,
      |         CASE WHEN event_type = 'error' THEN 'FAILED' ELSE 'COMPLETED' END AS status,
      |         epoch_us(CAST(ts AS TIMESTAMP)) // 1000 AS event_time_ms,
      |         epoch_us(CAST(ts AS TIMESTAMP)) AS event_time_us,
      |         CASE event_id % 10 WHEN 0 THEN 'd' WHEN 1 THEN 'u' WHEN 2 THEN 'r' ELSE 'c' END AS op
      |  FROM events
      |), upserts AS (
      |  SELECT * FROM txns WHERE op <> 'd' AND account_id <> 0
      |), completed AS (
      |  SELECT * FROM upserts WHERE status = 'COMPLETED'
      |)
      |""".stripMargin

  /** DuckDB fragments of the language-ID heuristic, shared by the langid
    * and corpus-curation oracles. */
  private lazy val sqlLangScores: String = TextAnalysis.langOrder.map { l =>
    val set = TextAnalysis.stopwords(l).map(w => s"'$w'").mkString("[", ", ", "]")
    s"len(list_filter(w, x -> list_contains($set, x))) * 1.0 / len(w) AS raw_$l"
  }.mkString(",\n  ")

  /** The lineitem columns `q_profile` profiles, with their testdata
    * dtypes — pinned here so the Spark query (select order) and the
    * generated DuckDB oracle walk the SAME schema. `Tables.schemaProbe`
    * fails loud on corpus drift before this could silently diverge. */
  private val ProfileSchema = org.apache.spark.sql.types.StructType(Seq(
    org.apache.spark.sql.types.StructField("l_orderkey",
      org.apache.spark.sql.types.LongType),
    org.apache.spark.sql.types.StructField("l_partkey",
      org.apache.spark.sql.types.LongType),
    org.apache.spark.sql.types.StructField("l_suppkey",
      org.apache.spark.sql.types.LongType),
    org.apache.spark.sql.types.StructField("l_linenumber",
      org.apache.spark.sql.types.IntegerType),
    org.apache.spark.sql.types.StructField("l_quantity",
      org.apache.spark.sql.types.DoubleType),
    org.apache.spark.sql.types.StructField("l_extendedprice",
      org.apache.spark.sql.types.DoubleType),
    org.apache.spark.sql.types.StructField("l_discount",
      org.apache.spark.sql.types.DoubleType),
    org.apache.spark.sql.types.StructField("l_tax",
      org.apache.spark.sql.types.DoubleType),
    org.apache.spark.sql.types.StructField("l_returnflag",
      org.apache.spark.sql.types.StringType),
    org.apache.spark.sql.types.StructField("l_linestatus",
      org.apache.spark.sql.types.StringType),
    org.apache.spark.sql.types.StructField("l_shipdate",
      org.apache.spark.sql.types.TimestampNTZType)))
  private val ProfileCols: Seq[String] = ProfileSchema.fields.map(_.name).toSeq

  /** Shared CTE prefix for the Naive Bayes oracles: train slice → per-class
    * term counts → full smoothed log-likelihood grid, mirroring
    * [[graft.text.NaiveBayes.model]] micro-nat for micro-nat. */
  private lazy val nbCtes: String =
    """WITH train AS (SELECT * FROM documents WHERE doc_id % 5 <> 0),
      |t AS (SELECT lang AS label, unnest(string_split(text, ' ')) AS term FROM train),
      |tc AS (SELECT label, term, CAST(count(*) AS BIGINT) AS term_n FROM t GROUP BY 1, 2),
      |ct AS (SELECT label, CAST(sum(term_n) AS BIGINT) AS class_tokens FROM tc GROUP BY 1),
      |vocab AS (SELECT DISTINCT term FROM tc),
      |v AS (SELECT CAST(count(*) AS BIGINT) AS vn FROM vocab),
      |grid AS (SELECT ct.label, vocab.term,
      |    CAST(coalesce(tc.term_n, 0) AS BIGINT) AS term_n,
      |    CAST(floor(ln((coalesce(tc.term_n, 0) + 1) / CAST(ct.class_tokens + v.vn AS DOUBLE)) * 1e6) AS BIGINT) AS lp_micro
      |  FROM ct CROSS JOIN vocab CROSS JOIN v
      |  LEFT JOIN tc ON tc.label = ct.label AND tc.term = vocab.term)""".stripMargin

  /** Extends [[nbCtes]] with per-class priors/OOV mass and held-out
    * per-(doc, class) scores — shared by the predict and eval oracles. */
  private lazy val nbScoreCtes: String = nbCtes +
    """,
      |priors AS (SELECT lang AS label, CAST(count(*) AS BIGINT) AS n_docs FROM train GROUP BY 1),
      |tot AS (SELECT CAST(count(*) AS BIGINT) AS n_total FROM train),
      |cls AS (SELECT priors.label,
      |    CAST(floor(ln(priors.n_docs / CAST(tot.n_total AS DOUBLE)) * 1e6) AS BIGINT) AS prior_micro,
      |    CAST(floor(ln(1 / CAST(ct.class_tokens + v.vn AS DOUBLE)) * 1e6) AS BIGINT) AS unseen_micro
      |  FROM priors JOIN ct USING (label) CROSS JOIN tot CROSS JOIN v),
      |ap AS (SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents WHERE doc_id % 5 = 0),
      |sc AS (SELECT ap.doc_id, cls.label,
      |    cls.prior_micro + CAST(sum(coalesce(g.lp_micro, cls.unseen_micro)) AS BIGINT) AS score_micro,
      |    CAST(count(*) AS BIGINT) AS n_tokens
      |  FROM ap CROSS JOIN cls
      |  LEFT JOIN grid g ON g.label = cls.label AND g.term = ap.term
      |  GROUP BY ap.doc_id, cls.label, cls.prior_micro),
      |pred AS (SELECT doc_id, label AS pred_label, score_micro, n_tokens
      |  FROM (SELECT sc.*, row_number() OVER (PARTITION BY doc_id ORDER BY score_micro DESC, label ASC) AS rn FROM sc)
      |  WHERE rn = 1)""".stripMargin

  private lazy val sqlLangPred: String = {
    val arms = TextAnalysis.langOrder.map { l =>
      val others = TextAnalysis.langOrder.filter(_ != l)
        .map(o => s"raw_$l >= raw_$o").mkString(" AND ")
      s"WHEN $others THEN '$l'"
    }.mkString(" ")
    s"CASE $arms ELSE 'zh' END"
  }

  /** DuckDB reimplementation of the engine-side 64-bit hash kernels, built
    * from HUGEINT mod-2^64 arithmetic so the "engine-defined" fingerprint
    * queries get REAL cross-engine oracles instead of rows-only checks.
    * Byte access is `ord(substr(s, i, 1))`, which equals the UTF-8 byte the
    * Spark kernels hash because the shipped corpora are pure ASCII (the
    * Spark side is byte-correct for any input; only the ORACLE needs the
    * ASCII precondition). */
  private object SqlHash {
    /** Unsigned 2^64 wrap-around constants. */
    val U64 = "18446744073709551616::HUGEINT"
    val I64Min = "9223372036854775808::HUGEINT"

    /** Unsigned HUGEINT -> signed BIGINT (two's complement). */
    def toSigned(h: String): String =
      s"CAST(CASE WHEN ($h) >= $I64Min THEN ($h) - $U64 ELSE ($h) END AS BIGINT)"

    /** FNV-1a 64 over the bytes of string expression `s` (ASCII oracle
      * twin of [[graft.functions.Fnv1a64Helper]]); lambda vars must be
      * unique per inlining site. */
    def fnv1a64(s: String, acc: String, b: String): String =
      s"""list_reduce(
         |  list_prepend(14695981039346656037::HUGEINT,
         |    list_transform(range(1, length($s)+1), __fi -> ord(substr($s, __fi, 1))::HUGEINT)),
         |  ($acc, $b) -> (($acc // 256 * 256 + xor(($acc % 256)::BIGINT, $b::BIGINT)::HUGEINT) * 1099511628211::HUGEINT) % $U64)""".stripMargin

    /** Signed BIGINT -> unsigned HUGEINT in [0, 2^64). */
    def toUnsigned(x: String): String =
      s"(CASE WHEN ($x) < 0 THEN ($x)::HUGEINT + $U64 ELSE ($x)::HUGEINT END)"

    /** Bitwise xor of two unsigned-represented 64-bit values (via the
      * two's-complement BIGINT round trip — same bits). */
    def uxor(a: String, b: String): String =
      toUnsigned(s"xor(${toSigned(a)}, ${toSigned(b)})")

    /** (a * c) mod 2^64 for unsigned `a` < 2^64 and a 64-bit constant.
      * A direct product can reach 2^128 and overflow signed INT128, so
      * the constant is split into 32-bit halves: a*c = a*c0 + (a*c1
      * mod 2^32)*2^32 (mod 2^64), keeping every intermediate < 2^97. */
    def umul(a: String, c: BigInt): String = {
      val c0 = c & 0xffffffffL
      val c1 = c >> 32
      if (c1 == 0) s"((($a) * $c0::HUGEINT) % $U64)"
      else s"(((($a) * $c0::HUGEINT) + (((($a) * $c1::HUGEINT) % 4294967296::HUGEINT) * 4294967296::HUGEINT)) % $U64)"
    }

    def shr(a: String, n: Int): String =
      s"(($a) // ${BigInt(2).pow(n)}::HUGEINT)"

    /** 64-bit rotate-left: the two shifted halves occupy disjoint bit
      * ranges, so their sum equals the bitwise or. */
    def rotl(a: String, r: Int): String =
      s"((${umul(a, BigInt(2).pow(r))}) + (($a) // ${BigInt(2).pow(64 - r)}::HUGEINT))"

    val XxP1 = BigInt("11400714785074694791") // 0x9E3779B185EBCA87
    val XxP2 = BigInt("14029467366897019727") // 0xC2B2AE3D27D4EB4F
    val XxP3 = BigInt("1609587929392839161")  // 0x165667B19E3779F9
    val XxP5 = BigInt("2870177450012600261")  // 0x27D4EB2F165667C5

    /** Spark's XXH64.hashInt(input, seed) as a chain of named column
      * steps (each step references only the previous one, so wrapping
      * SELECTs keep the expression tree linear instead of exponential).
      * Verified step-for-step against `xxhash64()` output in tests; for
      * multi-arg `xxhash64(a, b)` chain two invocations — the first
      * result is the second's seed. Returns (steps, finalCol). */
    def xxh64IntSteps(input: String, seed: String, p: String): (Seq[(String, String)], String) = {
      val steps = Seq(
        s"${p}1" -> uxor(s"((($seed) + ${XxP5 + 4}::HUGEINT) % $U64)", umul(input, XxP1)),
        s"${p}2" -> s"((${umul(rotl(s"${p}1", 23), XxP2)} + $XxP3::HUGEINT) % $U64)",
        s"${p}3" -> uxor(s"${p}2", shr(s"${p}2", 33)),
        s"${p}4" -> umul(s"${p}3", XxP2),
        s"${p}5" -> uxor(s"${p}4", shr(s"${p}4", 29)),
        s"${p}6" -> umul(s"${p}5", XxP3),
        s"${p}7" -> uxor(s"${p}6", shr(s"${p}6", 32)))
      (steps, s"${p}7")
    }

    /** Wrap `inner` in one SELECT per step, adding each column. */
    def applySteps(inner: String, steps: Seq[(String, String)]): String =
      steps.foldLeft(inner) { case (q, (c, e)) => s"SELECT *, $e AS $c FROM ($q)" }

    val XxP4 = BigInt("9650029242287828579") // 0x85EBCA77C2B2AE63

    /** Spark's XXH64.hashLong(input, seed) — same shape as
      * [[xxh64IntSteps]] with the 8-byte mixing constants. */
    def xxh64LongSteps(input: String, seed: String, p: String): (Seq[(String, String)], String) = {
      val steps = Seq(
        s"${p}1" -> uxor(s"((($seed) + ${XxP5 + 8}::HUGEINT) % $U64)",
          umul(rotl(umul(input, XxP2), 31), XxP1)),
        s"${p}2" -> s"((${umul(rotl(s"${p}1", 27), XxP1)} + $XxP4::HUGEINT) % $U64)",
        s"${p}3" -> uxor(s"${p}2", shr(s"${p}2", 33)),
        s"${p}4" -> umul(s"${p}3", XxP2),
        s"${p}5" -> uxor(s"${p}4", shr(s"${p}4", 29)),
        s"${p}6" -> umul(s"${p}5", XxP3),
        s"${p}7" -> uxor(s"${p}6", shr(s"${p}6", 32)))
      (steps, s"${p}7")
    }

    // 32-bit lane (murmur3): values stay in [0, 2^32), so products fit
    // HUGEINT directly and xor can round-trip through BIGINT unsigned
    def m32(a: String, c: BigInt): String =
      s"((($a) * $c::HUGEINT) % 4294967296::HUGEINT)"
    def rotl32(a: String, r: Int): String =
      s"((${m32(a, BigInt(2).pow(r))}) + (($a) // ${BigInt(2).pow(32 - r)}::HUGEINT))"
    def xor32(a: String, b: String): String =
      s"xor(($a)::BIGINT, ($b)::BIGINT)::HUGEINT"

    /** Spark's Murmur3_x86_32 over the bytes of string column `col`
      * (seed 42), as one fold + fmix steps: 4-byte little-endian words
      * and tail bytes go through the identical mixK1+mixH1 round, so one
      * uniform list_reduce covers both; returns (foldExpr over column
      * `col` with length column `lenCol`, fmix steps ending in `__mm`). */
    def murmur3Fold(col: String): String = {
      val k1 = m32(rotl32(m32("__e", BigInt(3432918353L)), 15), BigInt(461845907))
      val mixbody = s"(((${rotl32(xor32("__a", k1), 13)}) * 5::HUGEINT + 3864292196::HUGEINT) % 4294967296::HUGEINT)"
      s"""list_reduce(list_prepend(42::HUGEINT, list_concat(
         |  list_transform(range(0, length($col) // 4), __j ->
         |    (ord(substr($col, 4*__j + 1, 1)) + ord(substr($col, 4*__j + 2, 1)) * 256
         |     + ord(substr($col, 4*__j + 3, 1)) * 65536 + ord(substr($col, 4*__j + 4, 1)) * 16777216)::HUGEINT),
         |  list_transform(range(length($col) - length($col) % 4 + 1, length($col) + 1),
         |    __i -> ord(substr($col, __i, 1))::HUGEINT))), (__a, __e) -> $mixbody)""".stripMargin
    }

    /** Murmur3 finalization over fold column `__m0` and byte-length
      * column `__n`; final unsigned 32-bit hash lands in `__mm`. */
    val murmur3FmixSteps: Seq[(String, String)] = Seq(
      "__f1" -> xor32("__m0", "__n"),
      "__f2" -> m32(xor32("__f1", shr("__f1", 16)), BigInt(2246822507L)),
      "__f3" -> m32(xor32("__f2", shr("__f2", 13)), BigInt(3266489909L)),
      "__mm" -> xor32("__f3", shr("__f3", 16)))

    /** Spark's XXH64.hashUnsafeBytes over the bytes of short string
      * column `w` (seed 42), valid for lengths < 16 — covers the one
      * 8-byte chunk, one 4-byte chunk, and tail bytes of the reference
      * finalization (the 32-byte stripe loop never runs). The corpus'
      * max whitespace token is 8 bytes; lengths >= 16 would need the
      * extra 8-byte rounds. Final unsigned hash lands in `__hu`. */
    def xxh64ShortStringSteps: Seq[(String, String)] = {
      def leBytes(startPlus: String, n: Int): String =
        (0 until n).map(i =>
          s"ord(substr(w, $startPlus${i + 1}, 1))::HUGEINT * ${BigInt(256).pow(i)}::HUGEINT")
          .mkString("(", " + ", ")")
      val byteFold =
        s"""list_reduce(list_prepend(__h2,
           |  list_transform(range((__o1)::BIGINT + 1, (__L)::BIGINT + 1), __i -> ord(substr(w, __i::INT, 1))::HUGEINT)),
           |  (__a, __b) -> ${umul(rotl(uxor("__a", umul("__b", XxP5)), 11), XxP1)})""".stripMargin
      Seq(
        "__L" -> "length(w)::HUGEINT",
        "__h0" -> s"((42::HUGEINT + $XxP5::HUGEINT + __L) % $U64)",
        "__k8" -> s"(CASE WHEN __L >= 8 THEN ${leBytes("", 8)} ELSE 0::HUGEINT END)",
        "__h0aux" -> uxor("__h0", umul(rotl(umul("__k8", XxP2), 31), XxP1)),
        "__h1" -> s"(CASE WHEN __L >= 8 THEN ((${umul(rotl("__h0aux", 27), XxP1)} + $XxP4::HUGEINT) % $U64) ELSE __h0 END)",
        "__o4" -> "(CASE WHEN __L >= 8 THEN 8::HUGEINT ELSE 0::HUGEINT END)",
        "__k4" -> ("(CASE WHEN __L - __o4 >= 4 THEN (ord(substr(w, (__o4)::INT + 1, 1))::HUGEINT" +
          " + ord(substr(w, (__o4)::INT + 2, 1))::HUGEINT * 256::HUGEINT" +
          " + ord(substr(w, (__o4)::INT + 3, 1))::HUGEINT * 65536::HUGEINT" +
          " + ord(substr(w, (__o4)::INT + 4, 1))::HUGEINT * 16777216::HUGEINT) ELSE 0::HUGEINT END)"),
        "__h2" -> s"(CASE WHEN __L - __o4 >= 4 THEN ((${umul(rotl(uxor("__h1", umul("__k4", XxP1)), 23), XxP2)} + $XxP3::HUGEINT) % $U64) ELSE __h1 END)",
        "__o1" -> "(CASE WHEN __L - __o4 >= 4 THEN __o4 + 4 ELSE __o4 END)",
        "__h3" -> byteFold,
        "__a1" -> uxor("__h3", shr("__h3", 33)),
        "__a2" -> umul("__a1", XxP2),
        "__a3" -> uxor("__a2", shr("__a2", 29)),
        "__a4" -> umul("__a3", XxP3),
        "__hu" -> uxor("__a4", shr("__a4", 32)))
    }
  }

  /** DuckDB CTEs for the curation gates (language + quality + exact-dedup
    * keepers) over `documents WHERE docFilter` — shared by the curate
    * capstone and the training manifest. */
  private def sqlCurateCtes(docFilter: String): String =
    s"""WITH d AS (
       |  SELECT doc_id, text, string_split(text, ' ') AS w,
       |         CAST(length(text) AS BIGINT) AS n_chars_actual,
       |         CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
       |  FROM documents WHERE $docFilter
       |), lang AS (
       |  SELECT doc_id, $sqlLangPred AS pred_lang
       |  FROM (SELECT doc_id, $sqlLangScores FROM d)
       |), qual AS (
       |  SELECT doc_id, n_tokens,
       |    ${TextAnalysis.floor6Sql("least(n_tokens / 100.0, 1.0) * 0.5 + least(avg_token_len / 8.0, 1.0) * 0.3 + stopword_ratio * 0.2")} AS quality_score
       |  FROM (SELECT doc_id, n_tokens,
       |          ${TextAnalysis.floor6Sql("(n_chars_actual - (n_tokens - 1)) * 1.0 / n_tokens")} AS avg_token_len,
       |          ${TextAnalysis.floor6Sql("len(list_filter(w, x -> list_contains(['the','a','of','and','to','in','is'], x))) * 1.0 / n_tokens")} AS stopword_ratio
       |        FROM d)
       |), keep AS (
       |  SELECT min(doc_id) AS doc_id FROM documents WHERE $docFilter GROUP BY lower(trim(text))
       |)""".stripMargin

  /** Shared retrieval CTE chain (the materialized postings index, the
    * rarest-16 / mod-997 keyword query log, and BOTH rankers — BM25 as
    * `bmr`, query-likelihood as `qlr`), replaying [[graft.text.Bm25]]
    * expression for expression: every transcendental is a single
    * elementwise `ln` floored to integer micro units, the BM25 tf
    * normalization is a HUGEINT floor division (≡ Spark DECIMAL(38,0)
    * `div` on positives), and the QL per-doc Dirichlet constant is
    * floored BEFORE the integer qlen multiply. Composed by the
    * q_bm25_topk / q_ql_topk / q_hybrid_rrf oracles. */
  /** From-scratch re-derivation of [[indexDigest]]'s nine quantities —
    * the shared oracle of both index-build jobs (full and incremental).
    * Column names/order must match indexDigest positionally. */
  private lazy val sqlIndexDigest: String =
    s"""WITH $sqlRetrievalCtes
       |SELECT (SELECT CAST(count(*) AS BIGINT) FROM voc) AS n_terms,
       |       (SELECT max(df) FROM voc) AS max_df,
       |       (SELECT CAST(sum(ctf) AS BIGINT) FROM voc) AS sum_ctf,
       |       (SELECT CAST(count(*) AS BIGINT) FROM tf) AS n_postings,
       |       (SELECT CAST(sum(tf) AS BIGINT) FROM tf) AS sum_tf,
       |       (SELECT CAST(count(*) AS BIGINT) FROM dl) AS n_docs,
       |       (SELECT CAST(sum(dl) AS BIGINT) FROM dl) AS sum_dl,
       |       (SELECT nd FROM tot) AS nd,
       |       (SELECT tt FROM tot) AS tt""".stripMargin

  private lazy val sqlRetrievalCtes: String =
    """t AS (SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents),
      |tf AS MATERIALIZED (SELECT doc_id, term, CAST(count(*) AS BIGINT) AS tf FROM t GROUP BY 1, 2),
      |dl AS (SELECT doc_id, CAST(sum(tf) AS BIGINT) AS dl FROM tf GROUP BY 1),
      |tot AS (SELECT CAST(sum(dl) AS BIGINT) AS tt, CAST(count(*) AS BIGINT) AS nd FROM dl),
      |voc AS (SELECT term, CAST(count(*) AS BIGINT) AS df, CAST(sum(tf) AS BIGINT) AS ctf FROM tf GROUP BY 1),
      |qsel AS (SELECT tf.doc_id AS query_id, tf.term, ctf,
      |        row_number() OVER (PARTITION BY tf.doc_id
      |          ORDER BY df ASC, tf.term ASC) AS r
      |      FROM tf JOIN voc USING (term) WHERE tf.doc_id % 997 = 0),
      |qt AS (SELECT query_id, term, ctf FROM qsel WHERE r <= 16),
      |qlen AS (SELECT query_id, CAST(count(*) AS BIGINT) AS qlen FROM qt GROUP BY 1),
      |bmidf AS (SELECT term,
      |        greatest(CAST(floor(ln(1 + (nd - df + 0.5) / (df + 0.5)) * 1e6) AS BIGINT), 1) AS idf_micro
      |      FROM voc CROSS JOIN tot),
      |bms AS (SELECT qt.query_id, tf.doc_id,
      |        CAST((CAST(idf_micro AS HUGEINT) * 22 * tt * tf) //
      |             (CAST(10 AS HUGEINT) * tt * tf + 3 * tt + 9 * dl * nd) AS BIGINT) AS sc_micro
      |      FROM tf JOIN qt USING (term) JOIN bmidf USING (term)
      |        JOIN dl USING (doc_id) CROSS JOIN tot),
      |bmp AS (SELECT query_id, doc_id, CAST(count(*) AS BIGINT) AS n_terms,
      |         CAST(sum(sc_micro) AS BIGINT) AS score_micro
      |       FROM bms GROUP BY 1, 2),
      |bmr AS (SELECT *, CAST(row_number() OVER (PARTITION BY query_id
      |          ORDER BY score_micro DESC, doc_id ASC) AS BIGINT) AS doc_rank
      |       FROM bmp),
      |qls AS (SELECT qt.query_id, tf.doc_id,
      |        CAST(floor(ln(1.0 + (CAST(tf AS DOUBLE) * tt) / (2000 * CAST(ctf AS DOUBLE))) * 1e6) AS BIGINT) AS m_micro
      |      FROM tf JOIN qt USING (term) CROSS JOIN tot),
      |qlp AS (SELECT query_id, doc_id, CAST(count(*) AS BIGINT) AS n_terms,
      |         CAST(sum(m_micro) AS BIGINT) AS msum
      |       FROM qls GROUP BY 1, 2),
      |qld AS (SELECT query_id, qlp.doc_id, n_terms,
      |        msum + qlen * CAST(floor(ln(CAST(2000 AS DOUBLE) / (dl + 2000)) * 1e6) AS BIGINT) AS score_micro
      |      FROM qlp JOIN dl USING (doc_id) JOIN qlen USING (query_id)),
      |qlr AS (SELECT *, CAST(row_number() OVER (PARTITION BY query_id
      |          ORDER BY score_micro DESC, doc_id ASC) AS BIGINT) AS doc_rank
      |       FROM qld)""".stripMargin

  /** DuckDB CTEs replaying [[graft.functions.WinnowHelper]]: base-257
    * polynomial k-gram hashes (the rolling update is an optimization of
    * the same value) + distinct sliding-window minima as `sel(doc_id,
    * fps)`. Shared by the fingerprint-summary and containment oracles. */
  private def sqlWinnowCtes(k: Int, w: Int): String = {
    val gram = s"""list_reduce(
       |      list_prepend(0::HUGEINT,
       |        list_transform(range(__i, __i + $k), __j -> ord(substr(text, __j, 1))::HUGEINT)),
       |      (__a, __b) -> (__a * 257::HUGEINT + __b) % ${SqlHash.U64})""".stripMargin
    s"""WITH h AS (
       |  SELECT doc_id, length(text) - $k + 1 AS m,
       |    CASE WHEN length(text) >= $k
       |      THEN list_transform(range(1, length(text) - $k + 2), __i -> ${SqlHash.toSigned(gram)})
       |      ELSE [] END AS hs
       |  FROM documents
       |), sel AS (
       |  SELECT doc_id,
       |    CASE WHEN m < 1 THEN []
       |         WHEN m <= $w THEN [list_min(hs)]
       |         ELSE list_distinct(list_transform(range(1, m - $w + 2),
       |                __s -> list_min(list_slice(hs, __s, __s + $w - 1)))) END AS fps
       |  FROM h
       |)""".stripMargin
  }

  /** DuckDB CTEs for the bounded exact n-gram Jaccard pairs, shared by the
    * pair and cluster oracles (`jpairs` = pairs at `threshold`). */
  private def sqlJaccardCtesAt(threshold: Double): String =
    s"""WITH d AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents WHERE doc_id < $JaccardMaxDocId),
       |sh AS (SELECT DISTINCT doc_id, w[i] || ' ' || w[i+1] || ' ' || w[i+2] AS shingle
       |       FROM (SELECT doc_id, w, unnest(generate_series(1, greatest(len(w) - 2, 0))) AS i FROM d)),
       |sz AS (SELECT doc_id, count(*) AS n_sh FROM sh GROUP BY 1),
       |inter AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, CAST(count(*) AS BIGINT) AS n_inter
       |          FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id GROUP BY 1, 2),
       |jall AS (SELECT doc_a, doc_b, n_inter,
       |        floor((n_inter * 1.0 / (x.n_sh + y.n_sh - n_inter)) * 1000000.0) / 1000000.0 AS jaccard
       |      FROM inter JOIN sz x ON doc_a = x.doc_id JOIN sz y ON doc_b = y.doc_id),
       |jpairs AS (SELECT * FROM jall WHERE jaccard >= $threshold)""".stripMargin

  private lazy val sqlJaccardCtes: String = sqlJaccardCtesAt(JaccardThreshold)

  /** DuckDB replay of [[graft.dedup.DupSpans.dupSpans]] as a WITH-body
    * CTE chain ending in `spans(doc_id, span_start, span_end,
    * span_tokens)`: positional word `n`-grams (1-based), fnv64 gram
    * fingerprints, df>=2 keys, and the interval-island merge (gap > n
    * breaks), step-for-step the Spark arithmetic. */
  private def sqlDupSpanCtes(n: Int): String = {
    val w = n - 1
    s"""__ds0 AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
       |__dsg AS (SELECT doc_id, CAST(i AS BIGINT) AS pos,
       |            array_to_string(w[i:i+$w], ' ') AS gram
       |          FROM (SELECT doc_id, w,
       |                  unnest(generate_series(1, greatest(len(w) - $w, 0))) AS i
       |                FROM __ds0)),
       |__dshr AS (SELECT doc_id, pos,
       |            ${SqlHash.fnv1a64("gram", "__dsa", "__dsb")} AS hraw
       |          FROM __dsg),
       |__dsh AS MATERIALIZED (SELECT doc_id, pos,
       |            ${SqlHash.toSigned("hraw")} AS h
       |          FROM __dshr),
       |__dsk AS (SELECT h FROM (SELECT h, count(DISTINCT doc_id) AS df
       |                         FROM __dsh GROUP BY 1) WHERE df >= 2),
       |__dshit AS (SELECT DISTINCT doc_id, pos FROM __dsh JOIN __dsk USING (h)),
       |__dsgap AS (SELECT doc_id, pos,
       |              CASE WHEN pos - lag(pos) OVER (PARTITION BY doc_id ORDER BY pos) > $n
       |                   THEN 1 ELSE 0 END AS gap
       |            FROM __dshit),
       |__dsisl AS (SELECT doc_id, pos,
       |              sum(gap) OVER (PARTITION BY doc_id ORDER BY pos) AS island
       |            FROM __dsgap),
       |spans AS (SELECT doc_id, min(pos) AS span_start,
       |            max(pos) + $w AS span_end,
       |            max(pos) + $w - min(pos) + 1 AS span_tokens
       |          FROM __dsisl GROUP BY doc_id, island)""".stripMargin
  }

  /** DuckDB replay of [[graft.ops.Sketches.kmvOverlap]]: distinct
    * (source, h) -> per-source bottom-k -> pairwise union bottom-k ->
    * the integral KMV estimator, bit-for-bit. `inner0` must yield
    * (source, __f) with `__f` the UNSIGNED HUGEINT content fingerprint
    * (the FNV-1a64 replay); the xxh64 chain and every division are the
    * same integer ops the Spark side runs. `p` prefixes the step
    * columns (unique per inlining site). */
  /** DuckDB replay of [[graft.text.BpeTrain.train]]: `rounds` chained
    * CTE blocks — per round a pair count (`p{r}`), the deterministic
    * argmax (`b{r}`, count DESC / pair ASC), and the greedy left-fold
    * merge application (`w{r+1}`, `list_reduce` — the exact fold
    * `BpeTrain.applyMerge` runs as a Spark `aggregate` HOF). CTEs are
    * MATERIALIZED so each round evaluates once. Returns the full WITH
    * clause (starting at `w0`); the caller appends its final SELECT. */
  private def sqlBpeCtes(rounds: Int): String = {
    val w0 =
      """w0 AS MATERIALIZED (
        |  SELECT word, CAST(count(*) AS BIGINT) AS freq,
        |         array_to_string(string_split(word, ''), ' ') || ' _' AS cur
        |  FROM (SELECT unnest(string_split(text, ' ')) AS word FROM documents)
        |  WHERE regexp_full_match(word, '[a-z]+')
        |  GROUP BY 1)""".stripMargin
    val perRound = (0 until rounds).map { r =>
      s"""p$r AS MATERIALIZED (
         |  SELECT pair, CAST(sum(freq) AS BIGINT) AS n
         |  FROM (SELECT freq,
         |          unnest(list_transform(range(1, len(string_split(cur, ' '))),
         |            __i -> string_split(cur, ' ')[__i] || ' ' || string_split(cur, ' ')[__i + 1])) AS pair
         |        FROM w$r)
         |  GROUP BY 1),
         |b$r AS MATERIALIZED (
         |  SELECT pair, n, split_part(pair, ' ', 1) AS lhs, split_part(pair, ' ', 2) AS rhs,
         |         replace(pair, ' ', '') AS mrg
         |  FROM p$r ORDER BY n DESC, pair ASC LIMIT 1),
         |w${r + 1} AS MATERIALIZED (
         |  SELECT w.word, w.freq,
         |    CASE WHEN b.pair IS NULL THEN w.cur
         |    ELSE list_reduce(string_split(w.cur, ' '), (__acc, __x) ->
         |      CASE WHEN __x = b.rhs AND (__acc = b.lhs OR ends_with(__acc, ' ' || b.lhs))
         |           THEN CASE WHEN __acc = b.lhs THEN b.mrg
         |                ELSE left(__acc, length(__acc) - length(b.lhs)) || b.mrg END
         |           ELSE __acc || ' ' || __x END)
         |    END AS cur
         |  FROM w$r w LEFT JOIN b$r b ON TRUE)""".stripMargin
    }
    (w0 +: perRound).mkString("WITH ", ",\n", "")
  }

  private def sqlKmvOverlap(inner0: String, k: Int, p: String): String = {
    val (steps, hCol) = SqlHash.xxh64LongSteps("__f", "42", p)
    val inner = SqlHash.applySteps(inner0, steps)
    s"""hh AS MATERIALIZED (SELECT source, ${SqlHash.toSigned(hCol)} AS h FROM ($inner)),
       |dd AS (SELECT DISTINCT source, h FROM hh),
       |rr AS (SELECT source, h, row_number() OVER (PARTITION BY source ORDER BY h) AS rk FROM dd),
       |sk AS (SELECT source, h FROM rr WHERE rk <= $k),
       |gs AS (SELECT DISTINCT source FROM sk),
       |pr AS (SELECT a.source AS sa, b.source AS sb FROM gs a JOIN gs b ON a.source < b.source),
       |pu AS (SELECT pr.sa, pr.sb, s.h,
       |         max(CASE WHEN s.source = pr.sa THEN 1 ELSE 0 END) AS in_a,
       |         max(CASE WHEN s.source = pr.sb THEN 1 ELSE 0 END) AS in_b
       |       FROM pr JOIN sk s ON s.source = pr.sa OR s.source = pr.sb
       |       GROUP BY 1, 2, 3),
       |ru AS (SELECT *, row_number() OVER (PARTITION BY sa, sb ORDER BY h) AS rk,
       |         count(*) OVER (PARTITION BY sa, sb) AS usz FROM pu),
       |uk AS (SELECT * FROM ru WHERE rk <= $k),
       |ag AS (SELECT sa AS source_a, sb AS source_b,
       |         CAST(count(*) AS BIGINT) AS union_k,
       |         max(CASE WHEN usz >= $k AND rk = $k THEN h END) AS theta,
       |         CAST(sum(in_a * in_b) AS BIGINT) AS rho
       |       FROM uk GROUP BY 1, 2),
       |es AS (SELECT *,
       |         CAST(CASE WHEN theta IS NULL THEN union_k
       |              ELSE (($k - 1)::HUGEINT * ${SqlHash.U64}) //
       |                   greatest(theta::HUGEINT + ${SqlHash.I64Min}, 1::HUGEINT) END AS BIGINT) AS est_union,
       |         CAST(rho * 1000000 // union_k AS BIGINT) AS jaccard_micro
       |       FROM ag)
       |SELECT source_a, source_b, union_k, theta, rho, est_union, jaccard_micro,
       |  CAST(CASE WHEN theta IS NULL THEN rho
       |       ELSE est_union * jaccard_micro // 1000000 END AS BIGINT) AS est_inter
       |FROM es""".stripMargin
  }

  /** Shared CTE chain replaying [[graft.sim.Similarity.lshBucket]] at
    * `nBits` in DuckDB SQL — xxhash64-derived hyperplane components
    * (seed 42, step-for-step HUGEINT arithmetic), sign tests, bucket ids.
    * Ends with `n(vec_id, v, norm)` and `buck(vec_id, bucket)`; callers
    * append their own CTEs/SELECT. Used by the LSH ANN oracle (nBits=4)
    * and the semantic-dedup oracle (nBits=[[SemDedupBits]]). */
  /** DuckDB replay of the FULL product-quantization pipeline
    * (`graft.sim.PQ`) — unit-sphere normalization, per-dimension grid,
    * hash-gated training sample, integer-L2 Lloyd (2 passes, unrolled),
    * argmin codes. All-integer after the grid, so no order-forced float
    * folds are needed anywhere (the advantage the PQ design was chosen
    * for). Ends with `codes(vec_id, s, code)` and `n(vec_id, v, norm)`;
    * callers append their pivot/search CTEs. */
  /** The shared `e` (vectors) + `n` (norms) CTE pair every ANN oracle
    * starts from — emitted ONCE per WITH, so fragments that compose
    * (IVF cells + PQ codes) don't redefine them. */
  private val sqlAnnBaseCtes: String =
    s"""e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
       |n AS (SELECT vec_id, v, sqrt(list_dot_product(v, v)) AS norm FROM e)""".stripMargin

  /** PQ pipeline CTEs (everything after `e`/`n` — see [[sqlPqCodesCtes]]
    * for the full story). Internal names are `pq_`-prefixed where they
    * would collide with the IVF fragment's (`hv`/`modEff`/`tr`/`seeds`),
    * so [[sqlIvfCellCtes]] + this can share one WITH for the IVF-PQ
    * composition. Ends with `codes(vec_id, s, code)`. */
  private def sqlPqCodesInner: String = sqlPqCodesInnerOn("e", "n")

  /** [[sqlPqCodesInner]] parameterized on the source CTE pair —
    * `eName(vec_id, v)` / `nName(vec_id, v, norm)` — so the SAME replay
    * runs over the raw embedding table (q_pq_encode / q_sim_pq_topk /
    * q_sim_ivfpq_topk, via `e`/`n`) and over the OPQ-transformed view
    * (q_sim_opq_topk, via `te`/`tn`). Dims come from the source CTE
    * (`max(len(v))` ≡ the old `max(len(embedding))` on the raw pair). */
  private def sqlPqCodesInnerOn(eName: String, nName: String): String = {
    val (kSteps, kCol) = SqlHash.xxh64LongSteps("vec_id::HUGEINT", "42", "__k")
    val seedInner = SqlHash.applySteps(s"SELECT vec_id FROM $eName", kSteps)
    // one Lloyd pass: assign each sampled subvector to its nearest
    // centroid (integer L2, tie -> lowest c_id), rebuild centroids as
    // elementwise integer-division means; empty cells drop out
    def lloyd(cin: String, i: Int): String =
      s"""d$i AS (SELECT t.vec_id, t.s, c.c_id,
         |    sum((t.g - c.cg) * (t.g - c.cg)) AS dist
         |  FROM trg t JOIN $cin c ON t.s = c.s AND t.dl = c.dl
         |  GROUP BY t.vec_id, t.s, c.c_id),
         |a$i AS (SELECT vec_id, s, c_id FROM (
         |  SELECT vec_id, s, c_id, row_number() OVER (PARTITION BY vec_id, s
         |    ORDER BY dist, c_id) AS rn FROM d$i) WHERE rn = 1),
         |cen$i AS (SELECT a.s, a.c_id, t.dl, sum(t.g) // count(*) AS cg
         |  FROM a$i a JOIN trg t ON a.vec_id = t.vec_id AND a.s = t.s
         |  GROUP BY a.s, a.c_id, t.dl)""".stripMargin
    s"""un AS (SELECT vec_id,
       |         list_transform(v, x -> x / greatest(norm, 1e-12)) AS u FROM $nName),
       |sdim AS (SELECT CAST((SELECT max(len(v)) FROM $eName) // $PqM AS BIGINT) AS sd),
       |gstat AS (SELECT d, min(u[d]) AS dmin,
       |    greatest((max(u[d]) - min(u[d])) / 256.0, 1e-12) AS dscale
       |  FROM un CROSS JOIN (SELECT unnest(range(1,
       |    (SELECT max(len(v)) FROM $eName) + 1)) AS d)
       |  GROUP BY d),
       |sub AS (SELECT un.vec_id, gs.d,
       |    least(CAST(floor((un.u[gs.d] - gs.dmin) / gs.dscale) AS BIGINT), 255) AS g,
       |    CAST((gs.d - 1) // (SELECT sd FROM sdim) AS BIGINT) AS s,
       |    CAST((gs.d - 1) % (SELECT sd FROM sdim) AS BIGINT) AS dl
       |  FROM un CROSS JOIN gstat gs),
       |-- MATERIALIZED: same planner trap as the IVF/mixture oracles
       |pq_hv AS MATERIALIZED (SELECT vec_id, ${SqlHash.toSigned(kCol)} AS hv FROM ($seedInner)),
       |pq_mod AS (SELECT greatest(1, CAST(ceil(CAST(count(*) AS DOUBLE) /
       |  65536.0) AS BIGINT)) AS m FROM $eName),
       |pq_tr AS (SELECT vec_id FROM pq_hv WHERE hv % (SELECT m FROM pq_mod) = 0),
       |pq_seeds AS (SELECT vec_id, CAST(rn - 1 AS BIGINT) AS c_id FROM (
       |  SELECT vec_id, row_number() OVER (ORDER BY vec_id) AS rn FROM pq_tr)
       |  WHERE rn <= $PqKsub),
       |trg AS (SELECT s.* FROM sub s JOIN pq_tr USING (vec_id)),
       |cen0 AS (SELECT sd.c_id, t.s, t.dl, t.g AS cg
       |  FROM trg t JOIN pq_seeds sd USING (vec_id)),
       |${lloyd("cen0", 1)},
       |${lloyd("cen1", 2)},
       |ed AS (SELECT t.vec_id, t.s, c.c_id,
       |    sum((t.g - c.cg) * (t.g - c.cg)) AS dist
       |  FROM sub t JOIN cen2 c ON t.s = c.s AND t.dl = c.dl
       |  GROUP BY t.vec_id, t.s, c.c_id),
       |codes AS (SELECT vec_id, s, c_id AS code FROM (
       |  SELECT vec_id, s, c_id, row_number() OVER (PARTITION BY vec_id, s
       |    ORDER BY dist, c_id) AS rn FROM ed) WHERE rn = 1)""".stripMargin
  }

  private def sqlPqCodesCtes: String =
    s"$sqlAnnBaseCtes,\n$sqlPqCodesInner"

  /** IVF coarse-quantizer CTEs (extracted verbatim from the r4
    * q_sim_ivf_topk oracle so that query AND the IVF-PQ composition share
    * one replay): float Lloyd with order-forced folds, XXH64 seeds,
    * adaptive stride/sample. Starts after `e`/`n` ([[sqlAnnBaseCtes]]);
    * ends with `asg(vec_id, v, norm, cell)` and
    * `probes(q_id, qv, qnorm, cell)`. */
  private def sqlIvfCellCtes: String = {
    val (kSteps, kCol) = SqlHash.xxh64LongSteps("vec_id::HUGEINT", "42", "__k")
    val seedInner = SqlHash.applySteps("SELECT vec_id FROM e", kSteps)
    // one Lloyd pass: assign every vector to its best centroid from
    // `cin`, then rebuild centroids as order-forced per-dim means
    def lloyd(cin: String, i: Int): String =
      s"""asg$i AS (
         |  SELECT vec_id, v, c_id FROM (
         |    SELECT tr.vec_id, tr.v, c.c_id,
         |      row_number() OVER (PARTITION BY tr.vec_id
         |        ORDER BY list_dot_product(tr.v, c.cv) / (tr.norm * c.cnorm) DESC, c.c_id) AS rn
         |    FROM tr CROSS JOIN $cin c) WHERE rn = 1
         |),
         |m$i AS (
         |  SELECT c_id, d,
         |    list_reduce(list_prepend(0.0::DOUBLE, list(v[d] ORDER BY vec_id)),
         |      (acc, x) -> acc + x) / count(*) AS x
         |  FROM asg$i, dims GROUP BY c_id, d),
         |c$i AS (
         |  SELECT c_id, cv, sqrt(list_dot_product(cv, cv)) AS cnorm
         |  FROM (SELECT c_id, list(x ORDER BY d) AS cv FROM m$i GROUP BY c_id))""".stripMargin
    s"""dims AS (SELECT unnest(range(1, (SELECT max(len(embedding)) FROM embeddings) + 1)) AS d),
       |-- MATERIALIZED stops the seed predicate being pushed down through
       |-- the 7 wrapped hash-step SELECTs (inlining doubles the expression
       |-- tree per layer — same planner trap as the mixture oracle)
       |hv AS MATERIALIZED (SELECT vec_id, ${SqlHash.toSigned(kCol)} AS hv FROM ($seedInner)),
       |-- adaptive seed stride (Similarity.kmeansCentroids): cells are
       |-- floored at ~4*sqrt(n) so training stays sub-quadratic; identity
       |-- (= $IvfStride) for n <= ~8.5k, and the ceil/sqrt expression is
       |-- the same correctly-rounded IEEE arithmetic in both engines
       |strideEff AS (SELECT greatest($IvfStride, CAST(ceil(CAST(count(*) AS DOUBLE) /
       |  ceil(4.0 * sqrt(CAST(count(*) AS DOUBLE)))) AS BIGINT)) AS s FROM e),
       |-- adaptive training-sample modulus (same auto-derivation: corpora
       |-- above maxTrainSamples/2 = 65536 vectors train on a bounded
       |-- hash-sample; identity at every gated SF). Sample and seeds
       |-- share ONE hash: pmod(xxhash64(vec_id), m | s) = 0
       |modEff AS (SELECT greatest(1, CAST(ceil(CAST(count(*) AS DOUBLE) /
       |  65536.0) AS BIGINT)) AS m FROM e),
       |tr AS (SELECT n.* FROM n JOIN hv USING (vec_id)
       |       WHERE hv % (SELECT m FROM modEff) = 0),
       |seeds AS (SELECT vec_id FROM hv
       |          WHERE hv % (SELECT m FROM modEff) = 0
       |            AND hv % (SELECT s FROM strideEff) = 0),
       |c0 AS (SELECT tr.vec_id AS c_id, tr.v AS cv, tr.norm AS cnorm
       |       FROM tr JOIN seeds USING (vec_id)),
       |${lloyd("c0", 1)},
       |${lloyd("c1", 2)},
       |asg AS (
       |  SELECT vec_id, v, norm, c_id AS cell FROM (
       |    SELECT n.vec_id, n.v, n.norm, c.c_id,
       |      row_number() OVER (PARTITION BY n.vec_id
       |        ORDER BY list_dot_product(n.v, c.cv) / (n.norm * c.cnorm) DESC, c.c_id) AS rn
       |    FROM n CROSS JOIN c2 c) WHERE rn = 1),
       |q AS (SELECT vec_id AS q_id, v AS qv, norm AS qnorm FROM n WHERE vec_id < $SimNumQueries),
       |probes AS (
       |  SELECT q_id, qv, qnorm, c_id AS cell FROM (
       |    SELECT q.q_id, q.qv, q.qnorm, c.c_id,
       |      row_number() OVER (PARTITION BY q.q_id
       |        ORDER BY list_dot_product(q.qv, c.cv) / (q.qnorm * c.cnorm) DESC, c.c_id) AS rn
       |    FROM q CROSS JOIN c2 c) WHERE rn <= $IvfNprobe)""".stripMargin
  }

  private def sqlLshBucketCtes(nBits: Int): String = {
    val (seedSteps, seedCol) = SqlHash.xxh64IntSteps("b", "42", "__s")
    val (compSteps, compCol) = SqlHash.xxh64IntSteps("d", seedCol, "__t")
    // the table-function range() only takes constants; the dimension
    // count comes from the data, so derive d via the scalar list range
    val grid = s"SELECT b, unnest(range(0, (SELECT max(len(embedding)) FROM embeddings))) AS d " +
      s"FROM range(0, $nBits) t1(b)"
    val comps = s"SELECT b, d, ${SqlHash.toSigned(compCol)}::DOUBLE / 9.223372036854776e18 AS comp " +
      s"FROM (${SqlHash.applySteps(grid, seedSteps ++ compSteps)})"
    s"""comps AS ($comps),
       |planes AS (SELECT b, list(comp ORDER BY d) AS pv FROM comps GROUP BY b),
       |e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
       |n AS (SELECT vec_id, v, sqrt(list_dot_product(v, v)) AS norm FROM e),
       |sgn AS (SELECT vec_id, CASE WHEN list_dot_product(v, pv) > 0 THEN (1::BIGINT << b) ELSE 0 END AS bit
       |        FROM n CROSS JOIN planes),
       |buck AS (SELECT vec_id, CAST(sum(bit) AS BIGINT) AS bucket FROM sgn GROUP BY vec_id)""".stripMargin
  }

  /** DuckDB CTEs reproducing the synthesized ACCOUNTS CDC changelog + its
    * latest-per-key KTable reduction (the flat twin of
    * [[graft.cdc.DimensionCdc.accountsDim]] — the nested JSON serde round
    * trip is Spark-side behavior under test). */
  private val sqlAcctDim =
    """acct_ver AS (
      |  SELECT c_custkey AS account_id, c_custkey AS customer_id,
      |         'ACCT-' || c_custkey AS account_number,
      |         CASE WHEN c_custkey % 2 = 0 THEN 'SAVINGS' ELSE 'CURRENT' END AS account_type,
      |         c_acctbal + v * 100.0 AS balance,
      |         CASE c_custkey % 3 WHEN 0 THEN 'USD' WHEN 1 THEN 'NGN' ELSE 'EUR' END AS currency,
      |         CASE WHEN c_custkey % 11 = 0 THEN 'INACTIVE' ELSE 'ACTIVE' END AS account_status,
      |         (c_custkey * 10 + v) * 1000000 AS cdc_ts_us,
      |         CASE WHEN c_custkey % 13 = 0 AND v = c_custkey % 3 THEN 'd'
      |              WHEN v = 0 THEN 'c' ELSE 'u' END AS op
      |  FROM (SELECT c_custkey, c_acctbal, unnest(generate_series(0, c_custkey % 3)) AS v FROM customer)
      |),
      |acct_dim AS (
      |  SELECT * FROM (SELECT *, row_number() OVER (PARTITION BY account_id ORDER BY cdc_ts_us DESC) AS rn
      |                 FROM acct_ver)
      |  WHERE rn = 1 AND op <> 'd'
      |)""".stripMargin

  /** Same for the synthesized CUSTOMERS changelog
    * ([[graft.cdc.DimensionCdc.customersDim]]). */
  private val sqlCustDim =
    """cust_ver AS (
      |  SELECT c_custkey AS customer_id,
      |         'F' || (c_custkey % 100) AS first_name,
      |         'L' || c_custkey AS last_name,
      |         'c' || c_custkey || '.v' || v || '@abbank.example' AS email,
      |         c_mktsegment AS segment,
      |         (c_custkey * 10 + v) * 1000000 + 500000 AS cdc_ts_us,
      |         CASE WHEN c_custkey % 17 = 0 AND v = c_custkey % 2 THEN 'd'
      |              WHEN v = 0 THEN 'c' ELSE 'u' END AS op
      |  FROM (SELECT c_custkey, c_mktsegment, unnest(generate_series(0, c_custkey % 2)) AS v FROM customer)
      |),
      |cust_dim AS (
      |  SELECT * FROM (SELECT *, row_number() OVER (PARTITION BY customer_id ORDER BY cdc_ts_us DESC) AS rn
      |                 FROM cust_ver)
      |  WHERE rn = 1 AND op <> 'd'
      |)""".stripMargin

  /** DuckDB rendering of [[graft.ops.Notify.formatAmount]] (DuckDB's fmt
    * format() lacks thousands grouping for floats, so group the integer part
    * and append the 2-dp fraction). */
  private def sqlFormatted(amount: String, currency: String): String =
    s"(CASE WHEN $currency = 'NGN' THEN '₦' ELSE $currency || ' ' END" +
      s" || format('{:,}', CAST(floor($amount) AS BIGINT)) || '.'" +
      s" || lpad(CAST(CAST(round(($amount - floor($amount)) * 100) AS BIGINT) AS VARCHAR), 2, '0'))"

  /** NGN-only signed rendering of formatAmount (balances can be negative;
    * DuckDB format() has no signed thousands-grouping for floats). */
  private def sqlNgnSigned(amount: String): String =
    s"('₦' || CASE WHEN $amount < 0 THEN '-' ELSE '' END" +
      s" || format('{:,}', CAST(floor(abs($amount)) AS BIGINT)) || '.'" +
      s" || lpad(CAST(CAST(round((abs($amount) - floor(abs($amount))) * 100) AS BIGINT) AS VARCHAR), 2, '0'))"

  /** Lagos-rendered timestamp string (the DuckDB twin of
    * [[graft.ops.Notify.formatTimestampMs]]). */
  private def sqlLagosTs(epochMs: String): String =
    s"(strftime(make_timestamp(($epochMs) * 1000) + INTERVAL 1 HOUR, '%Y-%m-%d %H:%M:%S') || ' WAT')"

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] = Map(
    "q_envelope_parse" -> (P +
      "SELECT txn_id, account_id, txn_ref, txn_type, amount, currency, status, event_time_ms, event_time_us, op FROM txns"),

    "q_cdc_upserts_only" -> (P +
      "SELECT txn_id, account_id, txn_ref, txn_type, amount, currency, status, event_time_ms, event_time_us, op FROM upserts"),

    "q_debit_filter" -> (P +
      """SELECT txn_id, account_id, txn_type, amount, event_time_ms FROM upserts
        |WHERE txn_type IN ('DEBIT','TRANSFER_OUT','FEE','LOAN_REPAYMENT') AND status = 'COMPLETED'""".stripMargin),

    "q_rolling_spend" -> (P +
      """SELECT txn_id, account_id, event_time_us,
        |  CAST(sum(CAST(round(amount * 100) AS BIGINT)) OVER w AS BIGINT) AS rolling_spend_kobo,
        |  CAST(count(*) OVER w AS BIGINT) AS rolling_n_txns
        |FROM completed
        |WHERE txn_type IN ('DEBIT','TRANSFER_OUT','FEE','LOAN_REPAYMENT')
        |WINDOW w AS (PARTITION BY account_id ORDER BY event_time_us
        |             RANGE BETWEEN 86400000000 PRECEDING AND CURRENT ROW)""".stripMargin),

    "q_funnel_conversion" ->
      """WITH e AS (SELECT event_id, user_id,
        |             epoch_us(CAST(ts AS TIMESTAMP)) AS ts_us, event_type
        |           FROM events),
        |c AS (SELECT *,
        |        min(CASE WHEN event_type = 'purchase' THEN ts_us END) OVER
        |          (PARTITION BY user_id ORDER BY ts_us
        |           RANGE BETWEEN 1 FOLLOWING AND 3600000000 FOLLOWING) AS next_purchase_us
        |      FROM e)
        |SELECT event_id, user_id, ts_us, next_purchase_us,
        |  next_purchase_us IS NOT NULL AS converted
        |FROM c WHERE event_type = 'click'""".stripMargin,

    "q_weekly_retention" ->
      """WITH w AS (SELECT DISTINCT user_id,
        |             epoch_us(CAST(ts AS TIMESTAMP)) // 604800000000 AS week
        |           FROM events),
        |f AS (SELECT user_id, min(week) AS cohort_week FROM w GROUP BY 1)
        |SELECT cohort_week, week - cohort_week AS weeks_since,
        |  CAST(count(DISTINCT w.user_id) AS BIGINT) AS n_users
        |FROM w JOIN f USING (user_id) GROUP BY 1, 2""".stripMargin,

    "q_event_transitions" ->
      """WITH ev AS (SELECT event_id, user_id, event_type,
        |             epoch_us(CAST(ts AS TIMESTAMP)) AS ts_us FROM events),
        |pr AS (SELECT event_type AS next_event,
        |         lag(event_type) OVER (PARTITION BY user_id
        |           ORDER BY ts_us, event_id) AS prev_event
        |       FROM ev),
        |c AS (SELECT prev_event, next_event, CAST(count(*) AS BIGINT) AS n
        |      FROM pr WHERE prev_event IS NOT NULL GROUP BY 1, 2)
        |SELECT prev_event, next_event, n,
        |  n / CAST(sum(n) OVER (PARTITION BY prev_event) AS DOUBLE) AS p
        |FROM c""".stripMargin,

    "q_funnel_3step" ->
      """WITH e AS (SELECT event_id, user_id,
        |             epoch_us(CAST(ts AS TIMESTAMP)) AS ts_us, event_type
        |           FROM events),
        |a AS (SELECT *,
        |        min(CASE WHEN event_type = 'view' THEN ts_us END) OVER
        |          (PARTITION BY user_id ORDER BY ts_us
        |           RANGE BETWEEN 1 FOLLOWING AND 3600000000 FOLLOWING) AS next_view_us,
        |        min(CASE WHEN event_type = 'purchase' THEN ts_us END) OVER
        |          (PARTITION BY user_id ORDER BY ts_us
        |           RANGE BETWEEN 1 FOLLOWING AND 3600000000 FOLLOWING) AS next_purchase_us
        |      FROM e),
        |v AS (SELECT user_id AS v_user, ts_us AS view_ts,
        |        min(next_purchase_us) AS purchase_us
        |      FROM a WHERE event_type = 'view' GROUP BY 1, 2)
        |SELECT event_id, user_id, ts_us, next_view_us, purchase_us,
        |  next_view_us IS NOT NULL AND purchase_us IS NOT NULL AS completed
        |FROM a LEFT JOIN v ON user_id = v_user AND next_view_us = view_ts
        |WHERE event_type = 'click'""".stripMargin,

    // the k=4 chain in the same correlated window/collapse/join form the
    // 3-step oracle uses, one collapse CTE per intermediate hop
    "q_funnel_k" ->
      """WITH e AS (SELECT event_id, user_id,
        |             epoch_us(CAST(ts AS TIMESTAMP)) AS ts_us, event_type
        |           FROM events),
        |a AS (SELECT *,
        |        min(CASE WHEN event_type = 'click' THEN ts_us END) OVER w AS n1,
        |        min(CASE WHEN event_type = 'view' THEN ts_us END) OVER w AS n2,
        |        min(CASE WHEN event_type = 'purchase' THEN ts_us END) OVER w AS n3
        |      FROM e
        |      WINDOW w AS (PARTITION BY user_id ORDER BY ts_us
        |                   RANGE BETWEEN 1 FOLLOWING AND 3600000000 FOLLOWING)),
        |c AS (SELECT user_id AS cu, ts_us AS ct, min(n2) AS c_next
        |      FROM a WHERE event_type = 'click' GROUP BY 1, 2),
        |v AS (SELECT user_id AS vu, ts_us AS vt, min(n3) AS v_next
        |      FROM a WHERE event_type = 'view' GROUP BY 1, 2)
        |SELECT event_id, user_id, ts_us,
        |  n1 AS step1_us, c_next AS step2_us, v_next AS step3_us,
        |  n1 IS NOT NULL AND c_next IS NOT NULL AND v_next IS NOT NULL AS completed
        |FROM a
        |LEFT JOIN c ON user_id = cu AND n1 = ct
        |LEFT JOIN v ON user_id = vu AND c_next = vt
        |WHERE event_type = 'signup'""".stripMargin,

    "q_time_weighted_balance" -> (P +
      """, t AS (
        |  SELECT account_id, txn_id, event_time_us,
        |    CASE WHEN txn_type IN ('DEBIT','TRANSFER_OUT','FEE','LOAN_REPAYMENT')
        |         THEN -CAST(round(amount * 100) AS BIGINT)
        |         ELSE CAST(round(amount * 100) AS BIGINT) END AS delta_kobo
        |  FROM completed
        |), b AS (
        |  SELECT account_id, event_time_us,
        |    sum(delta_kobo) OVER w AS bal_kobo,
        |    lead(event_time_us) OVER w AS next_us
        |  FROM t
        |  WINDOW w AS (PARTITION BY account_id ORDER BY event_time_us, txn_id)
        |), a AS (
        |  SELECT account_id,
        |    CAST(count(*) AS BIGINT) AS n_intervals,
        |    CAST(max(next_us) - min(event_time_us) AS BIGINT) AS span_us,
        |    sum(CAST(bal_kobo AS HUGEINT) * (next_us - event_time_us)) AS num
        |  FROM b WHERE next_us IS NOT NULL
        |  GROUP BY 1
        |)
        |SELECT account_id, n_intervals, span_us,
        |  CAST(CASE WHEN num < 0 THEN -((-num) * 1000000 // span_us)
        |       ELSE (num * 1000000 // span_us) END AS BIGINT) AS twab_micro_kobo
        |FROM a WHERE span_us > 0""".stripMargin),

    "q_spend_anomaly" -> (P +
      """, daily AS (
        |  SELECT account_id, event_time_ms // 86400000 AS day,
        |    sum(CAST(round(amount * 100) AS BIGINT)) AS spend_kobo,
        |    CAST(count(*) AS BIGINT) AS n_txns
        |  FROM completed
        |  WHERE txn_type IN ('DEBIT','TRANSFER_OUT','FEE','LOAN_REPAYMENT')
        |  GROUP BY 1, 2
        |), spans AS (
        |  SELECT account_id, min(day) AS d0, max(day) AS d1 FROM daily GROUP BY 1
        |), grid AS (
        |  SELECT account_id, unnest(generate_series(d0, d1)) AS day FROM spans
        |), filled AS (
        |  SELECT g.account_id, g.day,
        |    coalesce(d.spend_kobo, 0) AS spend_kobo,
        |    d.n_txns IS NULL AS filled
        |  FROM grid g LEFT JOIN daily d USING (account_id, day)
        |), sc AS (
        |  SELECT *, CAST(count(*) OVER w AS BIGINT) AS n_days,
        |    sum(spend_kobo) OVER w AS s1,
        |    sum(spend_kobo * spend_kobo) OVER w AS s2
        |  FROM filled
        |  WINDOW w AS (PARTITION BY account_id)
        |), z AS (
        |  SELECT account_id, day, CAST(spend_kobo AS BIGINT) AS spend_kobo,
        |    filled, n_days,
        |    s1 / CAST(n_days AS DOUBLE) AS mean_kobo,
        |    (n_days * s2 - s1 * s1) / CAST(n_days * n_days AS DOUBLE) AS var_kobo,
        |    CASE WHEN (n_days * s2 - s1 * s1) / CAST(n_days * n_days AS DOUBLE) > 0
        |         THEN (spend_kobo - s1 / CAST(n_days AS DOUBLE))
        |              / sqrt((n_days * s2 - s1 * s1) / CAST(n_days * n_days AS DOUBLE))
        |         ELSE 0.0 END AS z
        |  FROM sc
        |)
        |SELECT * FROM z WHERE abs(z) >= 2.0""".stripMargin),

    "q_gap_fill_daily" -> (P +
      """, daily AS (
        |  SELECT account_id, event_time_ms // 86400000 AS day,
        |    sum(CAST(round(amount * 100) AS BIGINT)) AS spend_kobo,
        |    CAST(count(*) AS BIGINT) AS n_txns
        |  FROM completed
        |  WHERE txn_type IN ('DEBIT','TRANSFER_OUT','FEE','LOAN_REPAYMENT')
        |  GROUP BY 1, 2
        |), spans AS (
        |  SELECT account_id, min(day) AS d0, max(day) AS d1 FROM daily GROUP BY 1
        |), grid AS (
        |  SELECT account_id, unnest(generate_series(d0, d1)) AS day FROM spans
        |)
        |SELECT g.account_id, g.day,
        |  CAST(coalesce(d.spend_kobo, 0) AS BIGINT) AS spend_kobo,
        |  CAST(coalesce(d.n_txns, 0) AS BIGINT) AS n_txns,
        |  d.n_txns IS NULL AS filled
        |FROM grid g LEFT JOIN daily d USING (account_id, day)""".stripMargin),

    // OLS slope from exact integer moments over the same dense grid;
    // HUGEINT internally, sign-separated truncating division at the end
    "q_spend_trend" -> (P +
      """, daily AS (
        |  SELECT account_id, event_time_ms // 86400000 AS day,
        |    sum(CAST(round(amount * 100) AS BIGINT)) AS spend_kobo
        |  FROM completed
        |  WHERE txn_type IN ('DEBIT','TRANSFER_OUT','FEE','LOAN_REPAYMENT')
        |  GROUP BY 1, 2
        |), spans AS (
        |  SELECT account_id, min(day) AS d0, max(day) AS d1 FROM daily GROUP BY 1
        |), grid AS (
        |  SELECT account_id, unnest(generate_series(d0, d1)) AS day FROM spans
        |), dense AS (
        |  SELECT g.account_id, g.day, coalesce(d.spend_kobo, 0) AS y
        |  FROM grid g LEFT JOIN daily d USING (account_id, day)
        |), m AS (
        |  SELECT account_id, CAST(count(*) AS BIGINT) AS n_days,
        |    sum(CAST(day AS HUGEINT)) AS sx, sum(CAST(y AS HUGEINT)) AS sy,
        |    sum(CAST(day AS HUGEINT) * y) AS sxy,
        |    sum(CAST(day AS HUGEINT) * day) AS sxx
        |  FROM dense GROUP BY 1
        |)
        |SELECT account_id, n_days,
        |  CAST(CASE WHEN (n_days * sxy - sx * sy) < 0
        |       THEN -((-(n_days * sxy - sx * sy)) * 1000000 // (n_days * sxx - sx * sx))
        |       ELSE (n_days * sxy - sx * sy) * 1000000 // (n_days * sxx - sx * sx) END
        |    AS BIGINT) AS slope_micro_kobo_per_day
        |FROM m WHERE n_days >= 2""".stripMargin),

    "q_exact_percentiles" -> (P +
      """, t AS (SELECT currency, CAST(round(amount * 100) AS BIGINT) AS kobo
        |        FROM completed),
        |n AS (SELECT currency, CAST(count(*) AS BIGINT) AS cnt FROM t GROUP BY 1),
        |r AS (SELECT currency, kobo,
        |        row_number() OVER (PARTITION BY currency ORDER BY kobo) AS rk
        |      FROM t),
        |tgt AS (SELECT currency, CAST(num AS DOUBLE) / den AS p,
        |          (num * cnt + den - 1) // den AS rank
        |        FROM n CROSS JOIN (VALUES (1, 2), (9, 10), (99, 100)) v(num, den))
        |SELECT g.currency, g.p, CAST(g.rank AS BIGINT) AS rank, r.kobo
        |FROM tgt g JOIN r ON g.currency = r.currency AND r.rk = g.rank""".stripMargin),

    // bottom-64-by-xxhash64(txn_id) sample per currency, then the
    // sample's own ceil-rank order statistics — the hash ranking, the
    // min-on-collision dedup, and the rank arithmetic all replayed
    "q_approx_percentiles" -> {
      val (steps, hCol) = SqlHash.xxh64LongSteps("txn_id::HUGEINT", "42", "__qp")
      val inner = SqlHash.applySteps(
        "SELECT currency, txn_id, kobo FROM t", steps)
      P +
        s""", t AS (SELECT currency, txn_id, CAST(round(amount * 100) AS BIGINT) AS kobo
           |        FROM completed),
           |hh AS (SELECT currency, kobo, ${SqlHash.toSigned(hCol)} AS h FROM ($inner)),
           |mm AS (SELECT currency, h, min(kobo) AS v FROM hh GROUP BY 1, 2),
           |rr AS (SELECT currency, h, v,
           |         row_number() OVER (PARTITION BY currency ORDER BY h) AS rk
           |       FROM mm),
           |ss AS (SELECT currency, v FROM rr WHERE rk <= 64),
           |nn AS (SELECT currency, CAST(count(*) AS BIGINT) AS n_rows FROM t GROUP BY 1),
           |ms AS (SELECT currency, CAST(count(*) AS BIGINT) AS m FROM ss GROUP BY 1),
           |vr AS (SELECT currency, v,
           |         row_number() OVER (PARTITION BY currency ORDER BY v) AS vrk
           |       FROM ss)
           |SELECT nn.currency, nn.n_rows, ms.m AS n_sample,
           |  (SELECT v FROM vr WHERE vr.currency = nn.currency
           |     AND vr.vrk = greatest(1, (1 * ms.m + 1) // 2)) AS p1_2,
           |  (SELECT v FROM vr WHERE vr.currency = nn.currency
           |     AND vr.vrk = greatest(1, (9 * ms.m + 9) // 10)) AS p9_10,
           |  (SELECT v FROM vr WHERE vr.currency = nn.currency
           |     AND vr.vrk = greatest(1, (99 * ms.m + 99) // 100)) AS p99_100
           |FROM nn JOIN ms USING (currency)""".stripMargin
    },

    "q_mad_outliers" -> (P +
      """, t AS (SELECT txn_id, currency, CAST(round(amount * 100) AS BIGINT) AS kobo
        |        FROM completed),
        |n AS (SELECT currency, CAST(count(*) AS BIGINT) AS cnt FROM t GROUP BY 1),
        |r1 AS (SELECT currency, kobo,
        |         row_number() OVER (PARTITION BY currency ORDER BY kobo) AS rk
        |       FROM t),
        |med AS (SELECT r1.currency, kobo AS med_kobo
        |        FROM r1 JOIN n USING (currency) WHERE rk = (cnt + 1) // 2),
        |d AS (SELECT t.txn_id, t.currency, t.kobo, med_kobo,
        |        abs(t.kobo - med_kobo) AS adev
        |      FROM t JOIN med USING (currency)),
        |r2 AS (SELECT currency, adev,
        |         row_number() OVER (PARTITION BY currency ORDER BY adev) AS rk
        |       FROM d),
        |mad AS (SELECT r2.currency, adev AS mad_kobo
        |        FROM r2 JOIN n USING (currency) WHERE rk = (cnt + 1) // 2)
        |SELECT txn_id, d.currency, kobo, med_kobo, mad_kobo,
        |  adev > 3 * mad_kobo AS is_outlier
        |FROM d JOIN mad USING (currency)""".stripMargin),

    "q_winsorize" -> (P +
      """, t AS (SELECT txn_id, currency, CAST(round(amount * 100) AS BIGINT) AS kobo
        |        FROM completed),
        |h AS (SELECT currency, kobo, CAST(count(*) AS BIGINT) AS cnt FROM t GROUP BY 1, 2),
        |rc AS (SELECT *,
        |         sum(cnt) OVER (PARTITION BY currency ORDER BY kobo
        |                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
        |         sum(cnt) OVER (PARTITION BY currency) AS n
        |       FROM h),
        |c AS (SELECT currency, min(kobo) AS cut_kobo FROM rc
        |      WHERE cum >= ceil(0.99 * n) GROUP BY 1)
        |SELECT txn_id, t.currency, kobo, cut_kobo,
        |  least(kobo, cut_kobo) AS kobo_winsorized,
        |  kobo > cut_kobo AS is_clipped
        |FROM t JOIN c USING (currency)""".stripMargin),

    "q_zscore" -> (P +
      """, t AS (SELECT txn_id, currency, CAST(round(amount * 100) AS BIGINT) AS kobo
        |        FROM completed),
        |-- s1/s2 and the variance numerator stay in HUGEINT (the Spark side
        |-- uses DECIMAL(38,0)): both are exact, so the single cast to
        |-- DOUBLE rounds the same value to the same bits
        |m AS (SELECT currency, CAST(count(*) AS BIGINT) AS n,
        |        sum(kobo) AS s1,
        |        sum(kobo * kobo) AS s2
        |      FROM t GROUP BY 1)
        |SELECT txn_id, t.currency, kobo,
        |  s1 / CAST(n AS DOUBLE) AS mean_kobo,
        |  (n * s2 - s1 * s1) / CAST(n * n AS DOUBLE) AS var_kobo,
        |  CASE WHEN (n * s2 - s1 * s1) / CAST(n * n AS DOUBLE) > 0
        |       THEN (kobo - s1 / CAST(n AS DOUBLE))
        |            / sqrt((n * s2 - s1 * s1) / CAST(n * n AS DOUBLE))
        |       ELSE 0.0 END AS z
        |FROM t JOIN m USING (currency)""".stripMargin),

    "q_amount_histogram" -> (P +
      """, t AS (SELECT currency, CAST(round(amount * 100) AS BIGINT) AS kobo
        |        FROM completed),
        |ext AS (SELECT currency, min(kobo) AS min_kobo, max(kobo) AS max_kobo
        |        FROM t GROUP BY 1)
        |SELECT t.currency,
        |  ((kobo - min_kobo) * 10) // (max_kobo - min_kobo + 1) AS bin,
        |  CAST(count(*) AS BIGINT) AS n_txns, min_kobo, max_kobo
        |FROM t JOIN ext USING (currency)
        |GROUP BY 1, 2, min_kobo, max_kobo""".stripMargin),

    "q_fraud_features" -> (P +
      """, t AS (SELECT txn_id, account_id, currency, event_time_us,
        |          CAST(round(amount * 100) AS BIGINT) AS kobo
        |        FROM completed
        |        WHERE txn_type IN ('DEBIT','TRANSFER_OUT','FEE','LOAN_REPAYMENT')),
        |m AS (SELECT currency, CAST(count(*) AS BIGINT) AS n,
        |        sum(kobo) AS s1, sum(kobo * kobo) AS s2 FROM t GROUP BY 1),
        |h AS (SELECT currency, kobo, CAST(count(*) AS BIGINT) AS cnt FROM t GROUP BY 1, 2),
        |rc AS (SELECT *,
        |         sum(cnt) OVER (PARTITION BY currency ORDER BY kobo
        |                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
        |         sum(cnt) OVER (PARTITION BY currency) AS nn
        |       FROM h),
        |c AS (SELECT currency, min(kobo) AS cut_kobo FROM rc
        |      WHERE cum >= ceil(0.99 * nn) GROUP BY 1)
        |SELECT txn_id, account_id, t.currency, kobo,
        |  CAST(sum(kobo) OVER wnd AS BIGINT) AS rolling_spend_kobo,
        |  CAST(count(*) OVER wnd AS BIGINT) AS rolling_n_txns,
        |  CASE WHEN CAST(n * s2 - s1 * s1 AS DOUBLE) > 0
        |       THEN (kobo - s1 / CAST(n AS DOUBLE))
        |            / sqrt(CAST(n * s2 - s1 * s1 AS DOUBLE) / CAST(n * n AS DOUBLE))
        |       ELSE 0.0 END AS z,
        |  kobo > cut_kobo AS is_clipped
        |FROM t JOIN m USING (currency) JOIN c USING (currency)
        |WINDOW wnd AS (PARTITION BY account_id ORDER BY event_time_us
        |               RANGE BETWEEN 86400000000 PRECEDING AND CURRENT ROW)""".stripMargin),

    "q_high_value_filter" -> (P +
      s"SELECT txn_id, account_id, amount, currency, event_time_ms FROM completed WHERE amount >= $HighValueThreshold"),

    "q_format_amount" -> (P +
      """SELECT txn_id, currency, amount_scaled,
        |  CASE WHEN currency = 'NGN' THEN '₦' ELSE currency || ' ' END
        |    || format('{:,}', CAST(floor(amount_scaled) AS BIGINT)) || '.'
        |    || lpad(CAST(CAST(round((amount_scaled - floor(amount_scaled)) * 100) AS BIGINT) AS VARCHAR), 2, '0')
        |    AS formatted
        |FROM (SELECT txn_id, currency, round(amount * 1001, 2) AS amount_scaled FROM upserts)""".stripMargin),

    "q_format_ts" -> (P +
      """SELECT txn_id,
        |  strftime(make_timestamp(event_time_ms * 1000) + INTERVAL 1 HOUR, '%Y-%m-%d %H:%M:%S') || ' WAT' AS lagos_ts
        |FROM upserts""".stripMargin),

    "q_json_roundtrip" ->
      """SELECT event_id,
        |       CAST(json_extract(props, '$.k') AS INTEGER) AS k,
        |       '{"k":' || CAST(json_extract(props, '$.k') AS INTEGER) || '}' AS rejson
        |FROM events""".stripMargin,

    "q_latest_by_key" -> (P +
      """SELECT account_id, txn_id AS last_txn_id, amount AS last_amount, event_time_ms AS last_event_time_ms
        |FROM (SELECT *, row_number() OVER (PARTITION BY account_id ORDER BY event_time_us DESC, txn_id DESC) AS rn
        |      FROM upserts) WHERE rn = 1""".stripMargin),

    "q_latest_with_tombstones" -> (P +
      """SELECT account_id, txn_id AS last_txn_id, amount AS last_amount, op AS last_op
        |FROM (SELECT *, row_number() OVER (PARTITION BY account_id ORDER BY event_time_us DESC, txn_id DESC) AS rn
        |      FROM txns WHERE account_id <> 0)
        |WHERE rn = 1 AND op <> 'd'""".stripMargin),

    "q_scd2_history" -> (P +
      """SELECT txn_id, account_id, amount,
        |  event_time_ms AS valid_from_ms,
        |  lead(event_time_ms) OVER w AS valid_to_ms,
        |  lead(event_time_ms) OVER w IS NULL AS is_current
        |FROM upserts
        |WINDOW w AS (PARTITION BY account_id ORDER BY event_time_us, txn_id)""".stripMargin),

    "q_high_value_enrich" -> (P +
      s"""SELECT txn_id, account_id, amount, currency,
         |  coalesce(c_name, 'N/A') AS account_name,
         |  coalesce(c_mktsegment, 'N/A') AS segment,
         |  ${sqlFormatted("amount", "currency")} AS formatted_amount,
         |  event_time_ms
         |FROM completed LEFT JOIN customer ON account_id = c_custkey
         |WHERE amount >= $HighValueThreshold""".stripMargin),

    "q_two_hop_enrich" -> (P +
      s"""SELECT txn_id, account_id, amount,
         |  coalesce(c_name, 'N/A') AS customer_name,
         |  coalesce(n_name, 'N/A') AS nation_name
         |FROM completed
         |LEFT JOIN customer ON account_id = c_custkey
         |LEFT JOIN nation ON c_nationkey = n_nationkey
         |WHERE amount >= $HighValueThreshold""".stripMargin),

    "q_cdc_account_dim" ->
      (s"WITH $sqlAcctDim\n" +
        """SELECT account_id, customer_id, account_number, account_type,
          |       balance, currency, account_status, cdc_ts_us
          |FROM acct_dim""".stripMargin),

    // wire format differs (Avro binary vs JSON), typed KTable is the
    // contract — same oracle as the JSON-shadow query
    "q_cdc_account_dim_avro" ->
      (s"WITH $sqlAcctDim\n" +
        """SELECT account_id, customer_id, account_number, account_type,
          |       balance, currency, account_status, cdc_ts_us
          |FROM acct_dim""".stripMargin),

    "q_cdc_customer_dim" ->
      (s"WITH $sqlCustDim\n" +
        "SELECT customer_id, first_name, last_name, email, segment, cdc_ts_us FROM cust_dim"),

    "q_cdc_customer_dim_avro" ->
      (s"WITH $sqlCustDim\n" +
        "SELECT customer_id, first_name, last_name, email, segment, cdc_ts_us FROM cust_dim"),

    // the serde round trip is the Spark-side operator under test; the
    // oracle replays the synthesis arithmetic + flat projection (the
    // established cdc-dim discipline)
    "q_audit_parse" ->
      """SELECT o_orderkey AS audit_id,
        |  o_orderkey * 2 + 1 AS transaction_id,
        |  CASE WHEN o_orderkey % 3 = 0 THEN 'FLAGGED'
        |       WHEN o_orderkey % 3 = 1 THEN 'REVIEWED'
        |       ELSE 'CLEARED' END AS audit_action,
        |  CASE WHEN o_orderkey % 3 = 0 THEN
        |    CASE WHEN o_orderkey % 2 = 0 THEN 'AMOUNT_THRESHOLD' ELSE 'VELOCITY' END
        |  END AS flagged_reason,
        |  CASE WHEN o_orderkey % 3 = 1 THEN 'analyst-' || (o_orderkey % 7) END AS reviewed_by,
        |  CASE WHEN o_orderkey % 3 = 1 THEN o_orderkey * 1000000 + 3600000000 END AS reviewed_at_us,
        |  CASE WHEN o_orderkey % 5 = 0 THEN 'case ' || o_orderkey END AS notes,
        |  o_orderkey * 1000000 AS created_at_us,
        |  o_orderkey * 1000000 AS cdc_ts_us,
        |  CASE WHEN o_orderkey % 10 = 0 THEN 'r' ELSE 'c' END AS op
        |FROM orders""".stripMargin,

    "q_cdc_account_scd2" ->
      (s"WITH $sqlAcctDim,\n" +
        """scd AS (
          |  SELECT account_id, balance, account_status, cdc_ts_us AS valid_from_us,
          |    lead(cdc_ts_us) OVER (PARTITION BY account_id ORDER BY cdc_ts_us) AS valid_to_us
          |  FROM acct_ver WHERE op <> 'd'
          |)
          |SELECT account_id, balance, account_status, valid_from_us, valid_to_us,
          |  valid_to_us IS NULL AS is_current
          |FROM scd""".stripMargin),

    // the diff compares VALUES where Spark compares value digests —
    // equivalent (collision-free sha2 over the same normalized fields);
    // horizons are integer-exact ((min + max) // 2)
    "q_snapshot_diff" -> (P +
      """, cl AS (SELECT * FROM txns WHERE account_id <> 0),
        |hz AS (SELECT (min(event_time_us) + max(event_time_us)) // 2 AS t1,
        |              max(event_time_us) AS t2 FROM cl),
        |o AS (SELECT * FROM (
        |    SELECT v.*, row_number() OVER (PARTITION BY account_id ORDER BY event_time_us DESC, txn_id DESC) AS rn
        |    FROM cl v CROSS JOIN hz WHERE event_time_us <= t1)
        |  WHERE rn = 1 AND op <> 'd'),
        |n AS (SELECT * FROM (
        |    SELECT v.*, row_number() OVER (PARTITION BY account_id ORDER BY event_time_us DESC, txn_id DESC) AS rn
        |    FROM cl v CROSS JOIN hz WHERE event_time_us <= t2)
        |  WHERE rn = 1 AND op <> 'd'),
        |d AS (SELECT coalesce(o.account_id, n.account_id) AS account_id,
        |    CASE WHEN o.account_id IS NULL THEN 'added'
        |         WHEN n.account_id IS NULL THEN 'deleted'
        |         WHEN o.txn_id <> n.txn_id
        |           OR CAST(round(o.amount * 100) AS BIGINT) <> CAST(round(n.amount * 100) AS BIGINT)
        |           OR o.txn_type <> n.txn_type
        |           OR o.status <> n.status THEN 'changed'
        |    END AS change,
        |    o.event_time_us AS old_ts_us, n.event_time_us AS new_ts_us
        |  FROM o FULL JOIN n ON o.account_id = n.account_id)
        |SELECT account_id, change, old_ts_us, new_ts_us
        |FROM d WHERE change IS NOT NULL""".stripMargin),

    "q_enrich_cdc_dim" -> (P + s", $sqlAcctDim\n" +
      s"""SELECT txn_id, t.account_id, amount,
         |  coalesce(account_number, 'N/A') AS account_number,
         |  coalesce(d.customer_id, -1) AS customer_id,
         |  coalesce(balance, -1.0) AS account_balance,
         |  coalesce(account_status, 'N/A') AS account_status
         |FROM completed t LEFT JOIN acct_dim d ON t.account_id = d.account_id
         |WHERE amount >= $HighValueThreshold""".stripMargin),

    "q_enrich_cdc_two_hop" -> (P + s", $sqlAcctDim,\n$sqlCustDim\n" +
      s"""SELECT t.txn_id, t.account_id, t.amount,
         |  coalesce(a.account_number, 'N/A') AS account_number,
         |  CASE WHEN c.first_name IS NULL THEN 'N/A'
         |       ELSE c.first_name || ' ' || c.last_name END AS customer_name,
         |  coalesce(c.email, 'N/A') AS email,
         |  coalesce(c.segment, 'N/A') AS segment
         |FROM completed t
         |LEFT JOIN acct_dim a ON t.account_id = a.account_id
         |LEFT JOIN cust_dim c ON a.customer_id = c.customer_id
         |WHERE t.amount >= $HighValueThreshold""".stripMargin),

    "q_velocity_count" -> (P +
      s"""SELECT account_id,
         |  (event_time_ms // ${VelocityWindowSec}000) * ${VelocityWindowSec}000 AS window_start_ms,
         |  (event_time_ms // ${VelocityWindowSec}000) * ${VelocityWindowSec}000 + ${VelocityWindowSec}000 AS window_end_ms,
         |  CAST(count(*) AS BIGINT) AS n_txns
         |FROM upserts GROUP BY 1, 2, 3 HAVING count(*) >= $VelocityMinTxns""".stripMargin),

    // each event belongs to window/advance epoch-aligned hopping windows:
    // start = floor(ts/advance)*advance - k*advance for k in
    // [0, window/advance) — start <= ts < start+window holds for exactly
    // these k, matching Spark's two-arg window() expansion
    "q_velocity_hopping" -> (P +
      s"""SELECT account_id,
         |  (event_time_ms // ${VelocityAdvanceSec}000) * ${VelocityAdvanceSec}000 - k.k * ${VelocityAdvanceSec}000 AS window_start_ms,
         |  (event_time_ms // ${VelocityAdvanceSec}000) * ${VelocityAdvanceSec}000 - k.k * ${VelocityAdvanceSec}000 + ${VelocityWindowSec}000 AS window_end_ms,
         |  CAST(count(*) AS BIGINT) AS n_txns
         |FROM upserts
         |CROSS JOIN (SELECT unnest(generate_series(0, ${VelocityWindowSec / VelocityAdvanceSec} - 1)) AS k) k
         |GROUP BY 1, 2, 3 HAVING count(*) >= $VelocityMinTxns""".stripMargin),

    "q_daily_spend_sum" -> (P +
      s"""SELECT account_id,
         |  (event_time_ms // 86400000) * 86400000 AS day_start_ms,
         |  strftime(make_timestamp((event_time_ms // 86400000) * 86400000 * 1000) + INTERVAL 1 HOUR, '%Y-%m-%d') AS lagos_date,
         |  round(sum(amount), 2) AS total_spend,
         |  CAST(count(*) AS BIGINT) AS n_txns
         |FROM completed
         |WHERE txn_type IN ('DEBIT','TRANSFER_OUT','FEE','LOAN_REPAYMENT')
         |GROUP BY 1, 2, 3 HAVING round(sum(amount), 2) >= $DailySpendAlert""".stripMargin),

    "q_dormancy_session" -> (P +
      s""", ordered AS (
         |  SELECT account_id, txn_id, event_time_us,
         |    CASE WHEN lag(event_time_us) OVER w IS NULL THEN 1
         |         WHEN event_time_us - lag(event_time_us) OVER w >= $DormancyGapUs THEN 1
         |         ELSE 0 END AS new_sess
         |  FROM upserts
         |  WINDOW w AS (PARTITION BY account_id ORDER BY event_time_us, txn_id)
         |), sess AS (
         |  SELECT *, sum(new_sess) OVER (PARTITION BY account_id ORDER BY event_time_us, txn_id
         |                               ROWS UNBOUNDED PRECEDING) AS sess_id
         |  FROM ordered
         |)
         |SELECT account_id,
         |  min(event_time_us) // 1000 AS session_start_ms,
         |  (max(event_time_us) + $DormancyGapUs) // 1000 AS session_end_ms,
         |  CAST(count(*) AS BIGINT) AS n_events,
         |  count(*) = 1 AS is_dormant
         |FROM sess GROUP BY account_id, sess_id""".stripMargin),

    // dormancy sessions -> ±1 boundaries -> running concurrency -> day max
    // (the oracle's one-task ORDER BY window is exactly the formulation
    // the Spark side's distributed prefix scan replaces)
    "q_session_concurrency" -> (P +
      s""", ordered AS (
         |  SELECT account_id, txn_id, event_time_us,
         |    CASE WHEN lag(event_time_us) OVER w IS NULL THEN 1
         |         WHEN event_time_us - lag(event_time_us) OVER w >= $DormancyGapUs THEN 1
         |         ELSE 0 END AS new_sess
         |  FROM upserts
         |  WINDOW w AS (PARTITION BY account_id ORDER BY event_time_us, txn_id)
         |), sess AS (
         |  SELECT *, sum(new_sess) OVER (PARTITION BY account_id ORDER BY event_time_us, txn_id
         |                               ROWS UNBOUNDED PRECEDING) AS sess_id
         |  FROM ordered
         |), s2 AS (
         |  SELECT min(event_time_us) // 1000 AS session_start_ms,
         |         (max(event_time_us) + $DormancyGapUs) // 1000 AS session_end_ms
         |  FROM sess GROUP BY account_id, sess_id
         |), b AS (
         |  SELECT session_start_ms AS ts_ms, 1 AS delta FROM s2
         |  UNION ALL
         |  SELECT session_end_ms, -1 FROM s2
         |), c AS (
         |  SELECT ts_ms, sum(delta) OVER (ORDER BY ts_ms, delta
         |                                 ROWS UNBOUNDED PRECEDING) AS running
         |  FROM b
         |)
         |SELECT ts_ms // 86400000 AS day,
         |  CAST(max(running) AS BIGINT) AS max_concurrent,
         |  CAST(count(*) AS BIGINT) AS n_boundaries
         |FROM c GROUP BY 1""".stripMargin),

    "q_balance_reconcile" -> (P +
      s""", signedt AS (
         |  SELECT txn_id, account_id, event_time_ms, event_time_us,
         |    CASE WHEN txn_type IN ('DEBIT','TRANSFER_OUT','FEE','LOAN_REPAYMENT')
         |         THEN -amount ELSE amount END AS signed_amount
         |  FROM completed
         |), bal AS (
         |  SELECT *,
         |    round(sum(signed_amount) OVER (PARTITION BY account_id ORDER BY event_time_us, txn_id
         |                                  ROWS UNBOUNDED PRECEDING), 2) + 0.0 AS balance_after
         |  FROM signedt
         |), bb AS (
         |  SELECT *,
         |    round(balance_after - signed_amount
         |          + CASE WHEN txn_id % 97 = 0 THEN ${Reconcile.InjectedError} ELSE 0.0 END, 2) + 0.0 AS balance_before,
         |    lag(balance_after) OVER (PARTITION BY account_id ORDER BY event_time_us, txn_id) AS stored_balance
         |  FROM bal
         |), disc AS (
         |  SELECT *,
         |    CASE WHEN stored_balance IS NULL THEN 0.0
         |         ELSE round(abs(balance_before - stored_balance), 2) END AS discrepancy
         |  FROM bb
         |)
         |SELECT txn_id, account_id, event_time_ms, balance_before, balance_after, stored_balance, discrepancy,
         |  CASE WHEN stored_balance IS NULL THEN 'BOOTSTRAP'
         |       WHEN discrepancy > ${Reconcile.ToleranceNgn} THEN 'DISCREPANCY'
         |       ELSE 'BALANCE_UPDATE' END AS recon_status,
         |  CASE WHEN stored_balance IS NOT NULL AND discrepancy > ${Reconcile.ToleranceNgn}
         |       THEN 'HIGH' ELSE 'LOW' END AS severity
         |FROM disc""".stripMargin),

    "q_notification_json" -> (P +
      s""", enriched AS (
         |  SELECT txn_id, account_id, amount, currency,
         |    coalesce(c_name, 'N/A') AS account_name,
         |    ${sqlFormatted("amount", "currency")} AS fmt
         |  FROM completed LEFT JOIN customer ON account_id = c_custkey
         |  WHERE amount >= $HighValueThreshold
         |)
         |SELECT txn_id,
         |  '{"notificationId":"HV-' || txn_id
         |    || '","notificationType":"HIGH_VALUE_ALERT","severity":"HIGH","channel":"BOTH","accountId":'
         |    || account_id
         |    || ',"subject":"High value transaction alert","body":"Account ' || account_id
         |    || ' spent ' || fmt
         |    || '","metadata":{"amount":"' || fmt
         |    || '","currency":"' || currency
         |    || '","accountName":"' || account_name || '"}}' AS notification
         |FROM enriched""".stripMargin),

    "q_velocity_alert_json" -> (P +
      s""", vel AS (
         |  SELECT account_id,
         |    (event_time_ms // ${VelocityWindowSec}000) * ${VelocityWindowSec}000 AS window_start_ms,
         |    (event_time_ms // ${VelocityWindowSec}000) * ${VelocityWindowSec}000 + ${VelocityWindowSec}000 AS window_end_ms,
         |    CAST(count(*) AS BIGINT) AS n_txns
         |  FROM upserts GROUP BY 1, 2, 3 HAVING count(*) >= $VelocityMinTxns
         |)
         |SELECT account_id, window_start_ms,
         |  '{"notificationId":"FRAUD-' || account_id || '-' || window_start_ms
         |    || '","notificationType":"FRAUD_ALERT","severity":"CRITICAL","channel":"BOTH","accountId":'
         |    || account_id
         |    || ',"subject":"Suspicious activity detected on your account","body":"We detected '
         |    || n_txns || ' transactions on your account within $VelocityWindowSec seconds starting at '
         |    || ${sqlLagosTs("window_start_ms")}
         |    || '. Contact AB Bank immediately if this was not you.","metadata":{"windowStartMs":"'
         |    || window_start_ms || '","windowEndMs":"' || window_end_ms
         |    || '","transactionCount":"' || n_txns
         |    || '","windowSizeSec":"$VelocityWindowSec"}}' AS notification
         |FROM vel""".stripMargin),

    "q_dormancy_alert_json" -> (P +
      s""", ordered AS (
         |  SELECT account_id, txn_id, event_time_us,
         |    CASE WHEN lag(event_time_us) OVER w IS NULL THEN 1
         |         WHEN event_time_us - lag(event_time_us) OVER w >= $DormancyGapUs THEN 1
         |         ELSE 0 END AS new_sess
         |  FROM upserts
         |  WINDOW w AS (PARTITION BY account_id ORDER BY event_time_us, txn_id)
         |), sess AS (
         |  SELECT *, sum(new_sess) OVER (PARTITION BY account_id ORDER BY event_time_us, txn_id
         |                               ROWS UNBOUNDED PRECEDING) AS sess_id
         |  FROM ordered
         |), dorm AS (
         |  SELECT account_id,
         |    min(event_time_us) // 1000 AS session_start_ms,
         |    (max(event_time_us) + $DormancyGapUs) // 1000 AS session_end_ms
         |  FROM sess GROUP BY account_id, sess_id HAVING count(*) = 1
         |)
         |SELECT account_id, session_start_ms,
         |  '{"notificationId":"DORM-' || account_id || '-' || session_start_ms
         |    || '","notificationType":"DORMANCY_ALERT","severity":"LOW","channel":"EMAIL","accountId":'
         |    || account_id
         |    || ',"subject":"Your AB Bank account has been inactive","body":"Your AB Bank account (ID: '
         |    || account_id
         |    || ') has had no follow-up activity. Make at least one transaction to keep it active.","metadata":{"sessionStartMs":"'
         |    || session_start_ms || '","sessionEndMs":"' || session_end_ms
         |    || '"}}' AS notification
         |FROM dorm""".stripMargin),

    "q_daily_spend_json" -> (P +
      s""", daily AS (
         |  SELECT account_id,
         |    (event_time_ms // 86400000) * 86400000 AS day_start_ms,
         |    strftime(make_timestamp((event_time_ms // 86400000) * 86400000 * 1000) + INTERVAL 1 HOUR, '%Y-%m-%d') AS lagos_date,
         |    round(sum(amount), 2) AS total_spend
         |  FROM completed
         |  WHERE txn_type IN ('DEBIT','TRANSFER_OUT','FEE','LOAN_REPAYMENT')
         |  GROUP BY 1, 2, 3 HAVING round(sum(amount), 2) >= $DailySpendAlert
         |)
         |SELECT account_id, day_start_ms,
         |  '{"notificationId":"DS-' || account_id || '-' || day_start_ms
         |    || '","notificationType":"DAILY_SPEND_SUMMARY","severity":"MEDIUM","channel":"SMS","accountId":'
         |    || account_id
         |    || ',"subject":"Daily spend alert - ' || lagos_date
         |    || '","body":"AB Bank: your total debits on ' || lagos_date
         |    || ' reached ' || ${sqlNgnSigned("total_spend")}
         |    || ', exceeding your alert threshold of ₦${"%.2f".format(DailySpendAlert)}. Reply STOP to unsubscribe.","metadata":{"date":"'
         |    || lagos_date || '","totalDebit":"' || CAST(total_spend AS VARCHAR)
         |    || '","thresholdNgn":"${"%.2f".format(DailySpendAlert)}"}}' AS notification
         |FROM daily""".stripMargin),

    "q_reconcile_alert_json" -> (P +
      s""", signedt AS (
         |  SELECT txn_id, account_id, event_time_ms, event_time_us,
         |    CASE WHEN txn_type IN ('DEBIT','TRANSFER_OUT','FEE','LOAN_REPAYMENT')
         |         THEN -amount ELSE amount END AS signed_amount
         |  FROM completed
         |), bal AS (
         |  SELECT *,
         |    round(sum(signed_amount) OVER (PARTITION BY account_id ORDER BY event_time_us, txn_id
         |                                  ROWS UNBOUNDED PRECEDING), 2) + 0.0 AS balance_after
         |  FROM signedt
         |), bb AS (
         |  SELECT *,
         |    round(balance_after - signed_amount
         |          + CASE WHEN txn_id % 97 = 0 THEN ${Reconcile.InjectedError} ELSE 0.0 END, 2) + 0.0 AS balance_before,
         |    lag(balance_after) OVER (PARTITION BY account_id ORDER BY event_time_us, txn_id) AS stored_balance
         |  FROM bal
         |), disc AS (
         |  SELECT *, round(abs(balance_before - stored_balance), 2) AS discrepancy
         |  FROM bb WHERE stored_balance IS NOT NULL
         |), alerts AS (
         |  SELECT * FROM disc WHERE discrepancy > ${Reconcile.ToleranceNgn}
         |)
         |SELECT txn_id, account_id,
         |  '{"notificationId":"RECON-' || txn_id
         |    || '","notificationType":"BALANCE_UPDATE","severity":"HIGH","channel":"BOTH","accountId":'
         |    || account_id
         |    || ',"subject":"Balance discrepancy detected","body":"AB Bank detected a balance discrepancy on account '
         |    || account_id
         |    || '. Our records show: ' || ${sqlNgnSigned("stored_balance")}
         |    || '. Reported balance before this transaction: ' || ${sqlNgnSigned("balance_before")}
         |    || '. Difference: ' || ${sqlNgnSigned("discrepancy")}
         |    || '. Our team will investigate.","metadata":{"balanceBefore":"'
         |    || CAST(balance_before AS VARCHAR) || '","balanceAfter":"' || CAST(balance_after AS VARCHAR)
         |    || '","discrepancyAmount":"' || CAST(discrepancy AS VARCHAR)
         |    || '","hasDiscrepancy":"true"}}' AS notification
         |FROM alerts""".stripMargin),

    "q_pricing_summary" ->
      """SELECT l_returnflag, l_linestatus,
        |  sum(l_quantity) AS sum_qty,
        |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
        |  CAST(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(4,2)) - CAST(l_discount AS DECIMAL(4,2)))) * 1000000 AS DECIMAL(38,0)) AS BIGINT) AS sum_disc_price_micros,
        |  CAST(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(4,2)) - CAST(l_discount AS DECIMAL(4,2))) * (CAST(1 AS DECIMAL(4,2)) + CAST(l_tax AS DECIMAL(4,2)))) * 1000000 AS DECIMAL(38,0)) AS BIGINT) AS sum_charge_micros,
        |  CAST(count(*) AS BIGINT) AS count_order,
        |  sum(l_quantity) / count(*) AS avg_qty
        |FROM lineitem WHERE l_shipdate <= TIMESTAMP '2001-09-01'
        |GROUP BY 1, 2""".stripMargin,

    "q_local_supplier_volume" ->
      """SELECT n_name,
        |  CAST(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(4,2)) - CAST(l_discount AS DECIMAL(4,2)))) * 1000000 AS DECIMAL(38,0)) AS BIGINT) AS revenue_micros
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN supplier ON l_suppkey = s_suppkey AND s_nationkey = c_nationkey
        |JOIN nation ON s_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |WHERE r_name = 'ASIA'
        |  AND o_orderdate >= TIMESTAMP '1996-01-01'
        |  AND o_orderdate < TIMESTAMP '1997-01-01'
        |GROUP BY 1""".stripMargin,

    "q_ship_priority" ->
      """SELECT l_orderkey AS orderkey,
        |  epoch_ms(o_orderdate) AS orderdate_ms,
        |  o_orderpriority AS orderpriority,
        |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(4,2)) - CAST(l_discount AS DECIMAL(4,2)))) AS DOUBLE) AS revenue
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |WHERE c_mktsegment = 'BUILDING'
        |  AND o_orderdate < TIMESTAMP '2000-03-15'
        |  AND l_shipdate > TIMESTAMP '2000-03-15'
        |GROUP BY 1, 2, 3
        |ORDER BY revenue DESC, orderkey LIMIT 10""".stripMargin,

    "q_order_count_dist" ->
      """SELECT c_count, CAST(count(*) AS BIGINT) AS custdist
        |FROM (SELECT c_custkey, CAST(count(o_orderkey) AS BIGINT) AS c_count
        |      FROM customer LEFT JOIN orders ON c_custkey = o_custkey
        |      GROUP BY 1)
        |GROUP BY 1""".stripMargin,

    "q_pagerank" ->
      (s"""WITH eo AS MATERIALIZED (
          |  SELECT DISTINCT 'c' || o_custkey AS src, 's' || l_suppkey AS dst
          |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey),
          |e AS MATERIALIZED (
          |  SELECT src, dst FROM eo UNION ALL SELECT dst, src FROM eo),
          |""".stripMargin +
        graft.graph.PageRank.oracleSql() +
        "\nSELECT node, r AS rank_scaled FROM r4"),

    "q_trustrank" ->
      (s"""WITH eo AS MATERIALIZED (
          |  SELECT DISTINCT 'c' || o_custkey AS src, 's' || l_suppkey AS dst
          |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey),
          |e AS MATERIALIZED (
          |  SELECT src, dst FROM eo UNION ALL SELECT dst, src FROM eo),
          |seeds AS MATERIALIZED (
          |  SELECT DISTINCT 'c' || c_custkey AS node FROM customer
          |  WHERE c_mktsegment = 'BUILDING'),
          |""".stripMargin +
        graft.graph.PageRank.oracleSqlTrust() +
        "\nSELECT node, r AS rank_scaled FROM r4"),

    "q_triangles" ->
      ("""WITH lp AS MATERIALIZED (
         |  SELECT DISTINCT l_orderkey AS ok, 'p' || l_partkey AS pn
         |  FROM lineitem),
         |e AS MATERIALIZED (SELECT DISTINCT x.pn AS a, y.pn AS b
         |      FROM lp x JOIN lp y ON x.ok = y.ok AND x.pn < y.pn),
         |""".stripMargin + graft.graph.Triangles.oracleSql),

    "q_kcore" ->
      ("""WITH lp AS MATERIALIZED (
         |  SELECT DISTINCT l_orderkey AS ok, 'p' || l_partkey AS pn
         |  FROM lineitem),
         |e AS MATERIALIZED (SELECT DISTINCT x.pn AS a, y.pn AS b
         |      FROM lp x JOIN lp y ON x.ok = y.ok AND x.pn < y.pn),
         |""".stripMargin + graft.graph.KCore.oracleSql(k = 80, rounds = 6)),

    "q_frequent_pairs" ->
      ("""WITH bk AS (SELECT DISTINCT l_orderkey AS basket, l_partkey AS item
         |  FROM lineitem),
         |""".stripMargin + graft.ops.Association.oracleSql(minSupport = 2)),

    "q_prefix_jaccard_join" ->
      ("""WITH w AS (SELECT doc_id, string_split(text, ' ') AS w
         |  FROM documents),
         |tk AS (SELECT DISTINCT doc_id,
         |    w[i] || ' ' || w[i+1] || ' ' || w[i+2] AS term
         |  FROM w, LATERAL (SELECT unnest(range(1, len(w) - 1)) AS i)),
         |""".stripMargin + graft.dedup.PrefixJoin.oracleSql(tPct = 60)),

    "q_pmi_collocations" ->
      ("WITH docs AS (SELECT text FROM documents),\n" +
        graft.text.TextAnalysis.collocationsOracleSql(minCount = 5)),

    "q_rank_fusion" ->
      ("""WITH l1 AS (SELECT l_suppkey AS key,
         |    sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS score
         |  FROM lineitem GROUP BY 1),
         |l2 AS (SELECT l_suppkey AS key, count(DISTINCT o_custkey) AS score
         |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey GROUP BY 1),
         |l3 AS (SELECT l_suppkey AS key, count(DISTINCT l_orderkey) AS score
         |  FROM lineitem GROUP BY 1),
         |""".stripMargin +
        graft.ops.RankFusion.oracleSql(Seq("l1", "l2", "l3"))),

    "q_fk_audit" ->
      graft.ops.Profile.fkAuditOracleSql(Seq(
        ("lineitem.l_orderkey->orders", "lineitem", "l_orderkey",
          "orders", "o_orderkey"),
        ("lineitem.l_partkey->part", "lineitem", "l_partkey",
          "part", "p_partkey"),
        ("lineitem.l_suppkey->supplier", "lineitem", "l_suppkey",
          "supplier", "s_suppkey"),
        ("orders.o_custkey->customer", "orders", "o_custkey",
          "customer", "c_custkey"),
        ("customer.c_nationkey->nation", "customer", "c_nationkey",
          "nation", "n_nationkey"),
        ("events.user_id->customer", "events", "user_id",
          "customer", "c_custkey"))),

    "q_table_checksum" ->
      ("""WITH src AS (SELECT l_orderkey % 64 AS bucket,
         |    concat_ws('|', l_orderkey, l_partkey, l_suppkey, l_linenumber,
         |      CAST(l_quantity AS BIGINT),
         |      CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT),
         |      CAST(CAST(l_discount AS DECIMAL(4,2)) * 100 AS BIGINT),
         |      CAST(CAST(l_tax AS DECIMAL(4,2)) * 100 AS BIGINT),
         |      l_returnflag, l_linestatus,
         |      strftime(l_shipdate, '%Y-%m-%d %H:%M:%S')) AS repr
         |  FROM lineitem)
         |""".stripMargin + graft.cdc.Checksum.oracleSql),

    "q_psi_drift" ->
      ("""WITH oo AS (SELECT o_orderpriority AS grp,
         |    CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS v,
         |    o_orderdate AS d
         |  FROM orders),
         |refsrc AS (SELECT grp, v FROM oo WHERE d < TIMESTAMP '1997-01-01'),
         |cursrc AS (SELECT grp, v FROM oo WHERE d >= TIMESTAMP '1997-01-01'),
         |""".stripMargin + graft.ops.Features.psiOracleSql(nBuckets = 8)),

    "q_equidepth_hist" ->
      ("""WITH src AS (SELECT o_orderpriority AS grp,
         |    CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS v
         |  FROM orders),
         |""".stripMargin +
        graft.ops.Features.equiDepthOracleSql(nBuckets = 8)),

    "q_benford" ->
      ("""WITH src AS (SELECT
         |    CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS v
         |  FROM orders),
         |""".stripMargin + graft.ops.Benford.oracleSql),

    "q_chi_square" ->
      ("""WITH src AS (SELECT c_mktsegment AS row_key,
         |    o_orderpriority AS col_key
         |  FROM orders JOIN customer ON o_custkey = c_custkey),
         |""".stripMargin + graft.ops.Contingency.oracleSql),

    "q_ewma_spend" ->
      ("""WITH src AS (SELECT o_custkey AS key, o_orderdate AS ts,
         |    o_orderkey AS seq,
         |    CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)
         |      AS amount_cents
         |  FROM orders),
         |""".stripMargin +
        graft.ops.EventAnalytics.ewmaRecencyOracleSql()),

    "q_part_supplier_cnt" ->
      """SELECT p_brand, p_type, p_size,
        |  CAST(count(DISTINCT l_suppkey) AS BIGINT) AS supplier_cnt
        |FROM lineitem JOIN part ON l_partkey = p_partkey
        |WHERE p_brand <> 'Brand#1'
        |  AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
        |GROUP BY 1, 2, 3""".stripMargin,

    // the oracle keeps the CORRELATED form on purpose: DuckDB decorrelates
    // it itself, independently verifying the Spark-side manual rewrite
    "q_priority_semi" ->
      """SELECT o_orderpriority, CAST(count(*) AS BIGINT) AS order_count
        |FROM orders o
        |WHERE o_orderdate >= TIMESTAMP '1997-01-01'
        |  AND o_orderdate < TIMESTAMP '1997-04-01'
        |  AND EXISTS (SELECT 1 FROM lineitem l
        |              WHERE l.l_orderkey = o.o_orderkey
        |                AND l.l_shipdate > o.o_orderdate + INTERVAL 60 DAY)
        |GROUP BY 1""".stripMargin,

    "q_small_qty_revenue" ->
      """WITH li AS (
        |  SELECT l_partkey, l_quantity, l_extendedprice
        |  FROM lineitem JOIN part ON l_partkey = p_partkey
        |  WHERE p_brand = 'Brand#13'
        |), st AS (
        |  SELECT l_partkey, sum(l_quantity) AS sum_q, count(*) AS n_q
        |  FROM li GROUP BY 1
        |)
        |SELECT
        |  CAST(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) * 1000000 AS DECIMAL(38,0)) AS BIGINT) AS revenue_micros,
        |  CAST(count(*) AS BIGINT) AS n_lines
        |FROM li JOIN st USING (l_partkey)
        |WHERE l_quantity * 5 * n_q < sum_q""".stripMargin,

    // correlated EXISTS/NOT-EXISTS form kept as the oracle — the engine
    // runs the one-grouped-pass decorrelation; equality here proves the
    // rewrite
    "q_waiting_supplier" ->
      """SELECT s_name, CAST(count(*) AS BIGINT) AS numwait
        |FROM (SELECT DISTINCT l_orderkey, l_suppkey FROM lineitem
        |      WHERE l_returnflag = 'R') l1
        |JOIN supplier ON l1.l_suppkey = s_suppkey
        |WHERE EXISTS (SELECT 1 FROM lineitem l2
        |              WHERE l2.l_orderkey = l1.l_orderkey
        |                AND l2.l_suppkey <> l1.l_suppkey)
        |  AND NOT EXISTS (SELECT 1 FROM lineitem l3
        |                  WHERE l3.l_orderkey = l1.l_orderkey
        |                    AND l3.l_suppkey <> l1.l_suppkey
        |                    AND l3.l_returnflag = 'R')
        |GROUP BY 1""".stripMargin,

    "q_idle_customer_stats" ->
      """SELECT c_nationkey, CAST(count(*) AS BIGINT) AS numcust,
        |  CAST(CAST(sum(CAST(c_acctbal AS DECIMAL(18,2))) * 100 AS DECIMAL(38,0)) AS BIGINT) AS totacctbal_cents
        |FROM customer c,
        |  (SELECT sum(CAST(c_acctbal AS DECIMAL(18,2))) AS pos_sum,
        |          count(*) AS pos_n
        |   FROM customer WHERE c_acctbal > 0) p
        |WHERE CAST(c_acctbal AS DECIMAL(18,2)) * pos_n > pos_sum
        |  AND NOT EXISTS (SELECT 1 FROM orders o
        |                  WHERE o.o_custkey = c.c_custkey
        |                    AND o.o_orderdate >= TIMESTAMP '2000-01-01')
        |GROUP BY 1""".stripMargin,

    "q_min_cost_supplier" ->
      """WITH po AS (
        |  SELECT l_partkey, l_suppkey, l_extendedprice / l_quantity AS unit_price
        |  FROM lineitem JOIN part ON l_partkey = p_partkey
        |  WHERE p_size = 25
        |), m AS (
        |  SELECT *, min(unit_price) OVER (PARTITION BY l_partkey) AS min_price
        |  FROM po
        |)
        |SELECT DISTINCT l_partkey AS partkey, l_suppkey AS suppkey, min_price
        |FROM m WHERE unit_price = min_price""".stripMargin,

    "q_rfm_segments" -> (P +
      """, t AS (
        |  SELECT account_id,
        |    CAST((1706659200000 - max(event_time_ms)) // 86400000 AS BIGINT) AS recency_days,
        |    CAST(count(*) AS BIGINT) AS frequency,
        |    CAST(sum(CAST(round(amount * 100) AS BIGINT)) AS BIGINT) AS monetary_kobo
        |  FROM completed GROUP BY 1
        |), sc AS (
        |  SELECT *,
        |    cume_dist() OVER (ORDER BY recency_days DESC) AS cd_r,
        |    cume_dist() OVER (ORDER BY frequency) AS cd_f,
        |    cume_dist() OVER (ORDER BY monetary_kobo) AS cd_m
        |  FROM t
        |)
        |SELECT account_id, recency_days, frequency, monetary_kobo,
        |  CAST(1 + (cd_r > 0.25)::INT + (cd_r > 0.5)::INT + (cd_r > 0.75)::INT AS BIGINT) AS r_score,
        |  CAST(1 + (cd_f > 0.25)::INT + (cd_f > 0.5)::INT + (cd_f > 0.75)::INT AS BIGINT) AS f_score,
        |  CAST(1 + (cd_m > 0.25)::INT + (cd_m > 0.5)::INT + (cd_m > 0.75)::INT AS BIGINT) AS m_score,
        |  CAST(1 + (cd_r > 0.25)::INT + (cd_r > 0.5)::INT + (cd_r > 0.75)::INT AS BIGINT) * 100
        |    + CAST(1 + (cd_f > 0.25)::INT + (cd_f > 0.5)::INT + (cd_f > 0.75)::INT AS BIGINT) * 10
        |    + CAST(1 + (cd_m > 0.25)::INT + (cd_m > 0.5)::INT + (cd_m > 0.75)::INT AS BIGINT) AS segment
        |FROM sc""".stripMargin),

    "q_cube_spend" -> (P +
      """SELECT currency, txn_type,
        |  CAST(GROUPING(currency, txn_type) AS BIGINT) AS gid,
        |  CAST(sum(CAST(round(amount * 100) AS BIGINT)) AS BIGINT) AS spend_kobo,
        |  CAST(count(*) AS BIGINT) AS n_txns
        |FROM completed
        |GROUP BY CUBE (currency, txn_type)""".stripMargin),

    "q_churn_accounts" -> (P +
      """SELECT DISTINCT account_id FROM completed
        |WHERE event_time_ms < 1706486400000
        |EXCEPT
        |SELECT DISTINCT account_id FROM completed
        |WHERE event_time_ms >= 1706486400000""".stripMargin),

    "q_zorder_curve" ->
      """WITH b AS (SELECT min(l_partkey) AS xmin, max(l_partkey) AS xmax,
        |                  min(l_suppkey) AS ymin, max(l_suppkey) AS ymax
        |           FROM lineitem),
        |q AS (SELECT l_orderkey, l_linenumber, l_partkey, l_suppkey,
        |        ((l_partkey - xmin) * 65536) // (xmax - xmin + 1) AS qx,
        |        ((l_suppkey - ymin) * 65536) // (ymax - ymin + 1) AS qy
        |      FROM lineitem, b)
        |SELECT l_orderkey, l_linenumber, l_partkey, l_suppkey,
        |  CAST(list_sum(list_transform(range(0, 16), i ->
        |    (((qx >> i) & 1) << (2*i)) + (((qy >> i) & 1) << (2*i+1)))) AS BIGINT) AS zval
        |FROM q""".stripMargin,

    "q_top_supplier" ->
      """WITH rev AS (
        |  SELECT l_suppkey,
        |    CAST(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(4,2)) - CAST(l_discount AS DECIMAL(4,2)))) * 1000000 AS DECIMAL(38,0)) AS BIGINT) AS total_rev_micros
        |  FROM lineitem
        |  WHERE l_shipdate >= TIMESTAMP '1996-01-01'
        |    AND l_shipdate < TIMESTAMP '1996-04-01'
        |  GROUP BY 1
        |)
        |SELECT l_suppkey AS suppkey, s_name, total_rev_micros
        |FROM rev JOIN supplier ON l_suppkey = s_suppkey
        |WHERE total_rev_micros = (SELECT max(total_rev_micros) FROM rev)""".stripMargin,

    "q_text_langid" ->
      s"""WITH d AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
         |s AS (SELECT doc_id,
         |  $sqlLangScores
         |FROM d)
         |SELECT doc_id,
         |  ${TextAnalysis.langOrder.map(l => s"${TextAnalysis.floor6Sql(s"raw_$l")} AS score_$l").mkString(", ")},
         |  $sqlLangPred AS pred_lang
         |FROM s""".stripMargin,

    "q_text_quality" ->
      s"""WITH d AS (
        |  SELECT doc_id, string_split(text, ' ') AS w,
        |         CAST(length(text) AS BIGINT) AS n_chars_actual,
        |         CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
        |  FROM documents
        |), f AS (
        |  SELECT doc_id, n_chars_actual, n_tokens,
        |    ${TextAnalysis.floor6Sql("(n_chars_actual - (n_tokens - 1)) * 1.0 / n_tokens")} AS avg_token_len,
        |    ${TextAnalysis.floor6Sql("len(list_filter(w, x -> list_contains(['the','a','of','and','to','in','is'], x))) * 1.0 / n_tokens")} AS stopword_ratio
        |  FROM d
        |)
        |SELECT doc_id, n_chars_actual, n_tokens, avg_token_len, stopword_ratio,
        |  ${TextAnalysis.floor6Sql("least(n_tokens / 100.0, 1.0) * 0.5 + least(avg_token_len / 8.0, 1.0) * 0.3 + stopword_ratio * 0.2")} AS quality_score
        |FROM f""".stripMargin,

    "q_token_count" ->
      """SELECT doc_id,
        |  CAST(len(string_split(text, ' ')) AS BIGINT) AS ws_tokens,
        |  CAST(len(regexp_extract_all(text, '[a-z]+|[0-9]+|[^a-z0-9 ]+')) AS BIGINT) AS subword_tokens,
        |  CAST(ceil(length(text) / 4.0) AS BIGINT) AS est_bpe_tokens
        |FROM documents""".stripMargin,

    // the custom Fnv1a64 Catalyst expression replayed in SQL: HUGEINT
    // mod-2^64 fold over the bytes (ord == UTF-8 byte on the ASCII corpus)
    "q_doc_fingerprint" ->
      s"""SELECT doc_id,
         |  ${SqlHash.toSigned(SqlHash.fnv1a64("text", "__a", "__b"))} AS doc_fp,
         |  list_min(list_transform(string_split(text, ' '),
         |    __w -> ${SqlHash.toSigned(SqlHash.fnv1a64("__w", "__a2", "__b2"))})) AS min_token_fp
         |FROM documents""".stripMargin,

    // the Winnow expression replayed in SQL. The k-gram hash is the plain
    // base-257 polynomial mod 2^64 (the Scala kernel's rolling update is
    // an optimization of the same value), and the winnowed VALUE set is
    // exactly the distinct sliding-window minima — the rightmost-tie rule
    // picks positions, never changes the selected value — compared as
    // SIGNED longs on both sides
    "q_doc_winnow" ->
      (sqlWinnowCtes(k = 8, w = 16) + """
        |SELECT doc_id, CAST(len(fps) AS BIGINT) AS n_fps, list_min(fps) AS fp_min,
        |  CASE WHEN len(fps) = 0 THEN 0
        |       ELSE list_reduce(list_prepend(0::BIGINT, fps), (__a, __b) -> xor(__a, __b)) END AS fp_xor
        |FROM sel""".stripMargin),

    // winnow containment candidates, same fingerprint replay at the
    // containment operator's (k=16, w=16): explode the per-doc fingerprint
    // sets, self-join, count shared values
    "q_dedup_containment" ->
      (sqlWinnowCtes(k = 16, w = 16) + """,
        |fp AS (SELECT doc_id, unnest(fps) AS fp FROM sel)
        |SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, CAST(count(*) AS BIGINT) AS n_shared_fps
        |FROM fp a JOIN fp b ON a.fp = b.fp AND a.doc_id < b.doc_id
        |GROUP BY 1, 2 HAVING count(*) >= 5""".stripMargin),

    // capped variant: hot fingerprints (posting count > cap) pruned
    // BEFORE pairing — mirrors winnowContainmentPairs(maxDf); df counts
    // POSTING ROWS (not distinct docs), exactly like the Spark side's
    // groupBy("fp").count
    "q_dedup_containment_capped" ->
      (sqlWinnowCtes(k = 16, w = 16) + s""",
        |fp AS (SELECT doc_id, unnest(fps) AS fp FROM sel),
        |hot AS (SELECT fp FROM fp GROUP BY fp HAVING count(*) > $ContainmentMaxDf),
        |fpk AS (SELECT * FROM fp WHERE fp NOT IN (SELECT fp FROM hot))
        |SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, CAST(count(*) AS BIGINT) AS n_shared_fps
        |FROM fpk a JOIN fpk b ON a.fp = b.fp AND a.doc_id < b.doc_id
        |GROUP BY 1, 2 HAVING count(*) >= 5""".stripMargin),

    "q_dedup_exact" ->
      """SELECT min(doc_id) AS keep_doc_id, CAST(count(*) AS BIGINT) AS n_copies
        |FROM documents GROUP BY lower(trim(text))""".stripMargin,

    "q_dedup_ngram_jaccard" ->
      (sqlJaccardCtes + s"""
         |SELECT doc_a, doc_b, n_inter, jaccard FROM jpairs""".stripMargin),

    // the full MinHash+LSH banding path replayed in SQL: Spark's murmur3
    // (32-bit lane arithmetic) per shingle, the 64 linear perms mod
    // 2^31-1, per-band bucket ids through four chained XXH64.hashLong
    // rounds, the banding self-join, and the signature-agreement
    // estimate — bit-identical end to end
    "q_dedup_minhash" -> {
      import MinHashLSH.{Bands, NumPerms, MersennePrime}
      val mmInner = SqlHash.applySteps(
        s"SELECT doc_id, shingle, length(shingle)::HUGEINT AS __n, ${SqlHash.murmur3Fold("shingle")} AS __m0 FROM sh",
        SqlHash.murmur3FmixSteps)
      val (x1, c1) = SqlHash.xxh64LongSteps("s1", "42", "__x")
      val (x2, c2) = SqlHash.xxh64LongSteps("s2", c1, "__y")
      val (x3, c3) = SqlHash.xxh64LongSteps("s3", c2, "__z")
      val (x4, c4) = SqlHash.xxh64LongSteps("s4", c3, "__w")
      val bandInner = SqlHash.applySteps(
        "SELECT doc_id, sig, b, sig[4*b + 1]::HUGEINT AS s1, sig[4*b + 2]::HUGEINT AS s2, " +
          s"sig[4*b + 3]::HUGEINT AS s3, sig[4*b + 4]::HUGEINT AS s4 FROM sigl CROSS JOIN range(0, $Bands) t(b)",
        x1 ++ x2 ++ x3 ++ x4)
      s"""WITH d0 AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
         |sh AS (SELECT DISTINCT doc_id, w[i] || ' ' || w[i+1] || ' ' || w[i+2] AS shingle
         |       FROM (SELECT doc_id, w, unnest(generate_series(1, greatest(len(w) - 2, 0))) AS i FROM d0)),
         |mm AS ($mmInner),
         |h31 AS (SELECT doc_id, (__mm % 2147483648::HUGEINT)::BIGINT AS h FROM mm),
         |perms AS (SELECT i, (2*i + 1)::BIGINT AS a, ((i * 2654435769)::BIGINT % 2147483648) AS bb
         |          FROM range(0, $NumPerms) t(i)),
         |sigs AS (SELECT doc_id, i, min((h * a + bb) % $MersennePrime) AS s FROM h31 CROSS JOIN perms GROUP BY doc_id, i),
         |sigl AS (SELECT doc_id, list(s ORDER BY i) AS sig FROM sigs GROUP BY doc_id),
         |bands AS (SELECT doc_id, b, ${SqlHash.toSigned(c4)} AS bucket FROM ($bandInner)),
         |cands AS (SELECT DISTINCT x.doc_id AS doc_a, y.doc_id AS doc_b
         |          FROM bands x JOIN bands y ON x.b = y.b AND x.bucket = y.bucket AND x.doc_id < y.doc_id),
         |est AS (SELECT doc_a, doc_b,
         |          round(list_sum(list_transform(range(1, ${NumPerms + 1}),
         |            __i -> CASE WHEN sa.sig[__i] = sb.sig[__i] THEN 1.0 ELSE 0.0 END)) / $NumPerms, 6) AS est_jaccard
         |        FROM cands JOIN sigl sa ON doc_a = sa.doc_id JOIN sigl sb ON doc_b = sb.doc_id)
         |SELECT doc_a, doc_b, est_jaccard FROM est WHERE est_jaccard >= $MinhashEstThreshold""".stripMargin
    },

    // the SimHash fingerprint + chunk-bucketed pairs replayed in SQL:
    // per-word XXH64 (short-string path — corpus tokens are <= 8 bytes),
    // the 64 bit-vote counters, sign-packing, 16-bit chunk bucketing and
    // the hamming verify. Chunks come off the unsigned representation
    // (arithmetic-shift + mask == logical shift + mask for masked bits)
    "q_dedup_simhash" -> {
      val hInner = SqlHash.applySteps(
        "SELECT doc_id, w FROM wd", SqlHash.xxh64ShortStringSteps)
      s"""WITH wd AS (SELECT doc_id, unnest(string_split(text, ' ')) AS w FROM documents),
         |hx AS ($hInner),
         |votes AS (SELECT doc_id, j, sum(CASE WHEN (__hu // (2::HUGEINT ^ j)::HUGEINT) % 2 = 1 THEN 1 ELSE -1 END) AS v
         |          FROM hx CROSS JOIN range(0, 64) t(j) GROUP BY doc_id, j),
         |shh AS (SELECT doc_id, sum(CASE WHEN v > 0 THEN (2::HUGEINT ^ j)::HUGEINT ELSE 0::HUGEINT END) AS hu FROM votes GROUP BY doc_id),
         |sh AS (SELECT doc_id, hu, ${SqlHash.toSigned("hu")} AS simhash FROM shh),
         |chunked AS (SELECT doc_id, simhash, k,
         |              (hu // (CASE k WHEN 0 THEN 1 WHEN 1 THEN 65536 WHEN 2 THEN 4294967296 ELSE 281474976710656 END)::HUGEINT) % 65536::HUGEINT AS chunk
         |            FROM sh CROSS JOIN range(0, 4) t(k)),
         |pairs AS (SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b,
         |            CAST(bit_count(xor(a.simhash, b.simhash)) AS INTEGER) AS hamming
         |          FROM chunked a JOIN chunked b ON a.k = b.k AND a.chunk = b.chunk AND a.doc_id < b.doc_id)
         |SELECT doc_a, doc_b, hamming FROM pairs WHERE hamming <= 3""".stripMargin
    },

    // the 0.8 cut sits above the banding S-curve, so candidate recall is
    // ~1 and candidates ∩ exact-verify == the exhaustive exact answer
    "q_dedup_minhash_verified" ->
      (sqlJaccardCtesAt(MinhashVerifyThreshold) + s"""
         |SELECT doc_a, doc_b, n_inter, jaccard FROM jpairs""".stripMargin),

    // same exhaustive ground truth as minhash_verified: the candidate
    // stages differ (simhash hamming vs banding) but both compositions
    // retain every >= 0.8 pair on this corpus, so both equal the
    // exhaustive exact-Jaccard answer
    "q_dedup_simhash_verified" ->
      (sqlJaccardCtesAt(MinhashVerifyThreshold) + s"""
         |SELECT doc_a, doc_b, n_inter, jaccard FROM jpairs""".stripMargin),

    // exhaustive exact Jaccard restricted to pairs TOUCHING the batch
    // split (doc_id % 10 == 7) — the incremental composition's contract
    "q_dedup_incremental" ->
      (sqlJaccardCtesAt(MinhashVerifyThreshold) + s"""
         |SELECT doc_a, doc_b, n_inter, jaccard FROM jpairs
         |WHERE doc_a % 10 = 7 OR doc_b % 10 = 7""".stripMargin),

    "q_dedup_containment_verified" ->
      s"""WITH d AS (SELECT doc_id, text FROM documents
         |           WHERE doc_id < $JaccardMaxDocId AND length(text) >= $ContainMinTextLen)
         |SELECT a.doc_id AS doc_a, b.doc_id AS doc_b
         |FROM d a JOIN d b ON a.doc_id < b.doc_id
         |WHERE position(a.text IN b.text) > 0 OR position(b.text IN a.text) > 0""".stripMargin,

    "q_dedup_clusters" ->
      (sqlJaccardCtes.replace("WITH ", "WITH RECURSIVE ") + s""",
         |edges AS (SELECT doc_a AS s, doc_b AS d FROM jpairs
         |          UNION ALL SELECT doc_b, doc_a FROM jpairs),
         |reach(node, r) AS (
         |  SELECT s, s FROM (SELECT DISTINCT s FROM edges) t
         |  UNION
         |  SELECT re.node, e.d FROM reach re JOIN edges e ON e.s = re.r
         |)
         |SELECT node AS doc_id, min(r) AS cluster_id FROM reach GROUP BY node""".stripMargin),

    "q_dedup_clusters_star" ->
      (sqlJaccardCtes.replace("WITH ", "WITH RECURSIVE ") + s""",
         |edges AS (SELECT doc_a AS s, doc_b AS d FROM jpairs
         |          UNION ALL SELECT doc_b, doc_a FROM jpairs),
         |reach(node, r) AS (
         |  SELECT s, s FROM (SELECT DISTINCT s FROM edges) t
         |  UNION
         |  SELECT re.node, e.d FROM reach re JOIN edges e ON e.s = re.r
         |)
         |SELECT node AS doc_id, min(r) AS cluster_id FROM reach GROUP BY node""".stripMargin),

    // the incremental fold's union contract: identical ground truth to
    // q_dedup_clusters — full transitive closure over ALL pairs
    "q_dedup_clusters_incremental" ->
      (sqlJaccardCtes.replace("WITH ", "WITH RECURSIVE ") + s""",
         |edges AS (SELECT doc_a AS s, doc_b AS d FROM jpairs
         |          UNION ALL SELECT doc_b, doc_a FROM jpairs),
         |reach(node, r) AS (
         |  SELECT s, s FROM (SELECT DISTINCT s FROM edges) t
         |  UNION
         |  SELECT re.node, e.d FROM reach re JOIN edges e ON e.s = re.r
         |)
         |SELECT node AS doc_id, min(r) AS cluster_id FROM reach GROUP BY node""".stripMargin),

    "q_dedup_embedding" ->
      s"""WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
         |           FROM embeddings WHERE vec_id < $EmbDupMaxVecId),
         |n AS (SELECT vec_id, v, sqrt(list_dot_product(v, v)) AS norm FROM e),
         |p AS (SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
         |        round(list_dot_product(a.v, b.v) / (a.norm * b.norm), 6) AS cos_sim
         |      FROM n a JOIN n b ON a.vec_id < b.vec_id)
         |SELECT vec_a, vec_b, cos_sim FROM p WHERE cos_sim >= $EmbDupThreshold""".stripMargin,

    "q_semantic_dedup" ->
      s"""WITH ${sqlLshBucketCtes(SemDedupBits)}
         |SELECT vec_id, bucket,
         |  min(vec_id) OVER (PARTITION BY bucket) AS keeper_id,
         |  CAST(count(*) OVER (PARTITION BY bucket) AS BIGINT) AS n_members,
         |  vec_id = min(vec_id) OVER (PARTITION BY bucket) AS is_kept
         |FROM buck""".stripMargin,

    "q_dup_spans" ->
      s"""WITH ${sqlDupSpanCtes(DupSpanGram)}
         |SELECT doc_id, span_start, span_end, span_tokens FROM spans""".stripMargin,

    "q_dup_doc_report" ->
      s"""WITH ${sqlDupSpanCtes(DupSpanGram)},
         |__dpd AS (SELECT doc_id, CAST(sum(span_tokens) AS BIGINT) AS dup_tokens
         |          FROM spans GROUP BY 1)
         |SELECT d.doc_id,
         |  CAST(len(string_split(d.text, ' ')) AS BIGINT) AS n_tokens,
         |  COALESCE(p.dup_tokens, 0) AS dup_tokens,
         |  COALESCE(p.dup_tokens, 0)::DOUBLE
         |    / CAST(len(string_split(d.text, ' ')) AS BIGINT)::DOUBLE AS dup_fraction,
         |  CASE WHEN COALESCE(p.dup_tokens, 0)::DOUBLE
         |         / CAST(len(string_split(d.text, ' ')) AS BIGINT)::DOUBLE > $DupSpanMaxFraction
         |       THEN 'flag' ELSE 'keep' END AS verdict
         |FROM documents d LEFT JOIN __dpd p USING (doc_id)""".stripMargin,

    "q_dup_span_strip" ->
      s"""WITH ${sqlDupSpanCtes(DupSpanGram)},
         |__sph AS (SELECT DISTINCT doc_id FROM spans),
         |__spcov AS (SELECT doc_id, unnest(generate_series(span_start, span_end)) AS pos
         |            FROM spans),
         |__sptok AS (SELECT t.doc_id, CAST(t.i AS BIGINT) AS pos, t.w[t.i] AS tok
         |            FROM (SELECT doc_id, w, unnest(generate_series(1, len(w))) AS i
         |                  FROM __ds0 JOIN __sph USING (doc_id)) t),
         |__spkept AS (SELECT t.doc_id, t.pos, t.tok
         |             FROM __sptok t LEFT JOIN __spcov c
         |               ON t.doc_id = c.doc_id AND t.pos = c.pos
         |             WHERE c.pos IS NULL),
         |__spagg AS (SELECT doc_id,
         |              string_agg(tok, ' ' ORDER BY pos) AS rebuilt,
         |              CAST(count(*) AS BIGINT) AS kept_tokens
         |            FROM __spkept GROUP BY 1)
         |SELECT d.doc_id,
         |  CAST(len(string_split(d.text, ' ')) AS BIGINT) AS n_tokens,
         |  CASE WHEN h.doc_id IS NULL
         |       THEN CAST(len(string_split(d.text, ' ')) AS BIGINT)
         |       ELSE COALESCE(a.kept_tokens, 0) END AS kept_tokens,
         |  CASE WHEN h.doc_id IS NULL THEN d.text
         |       ELSE COALESCE(a.rebuilt, '') END AS clean_text
         |FROM documents d
         |LEFT JOIN __sph h USING (doc_id)
         |LEFT JOIN __spagg a ON d.doc_id = a.doc_id""".stripMargin,

    "q_dup_spans_incremental" ->
      s"""WITH __di0 AS (SELECT doc_id, (doc_id % 10 = 7) AS is_batch,
         |                 string_split(text, ' ') AS w FROM documents),
         |__dig AS (SELECT doc_id, is_batch, CAST(i AS BIGINT) AS pos,
         |            array_to_string(w[i:i+${DupSpanGram - 1}], ' ') AS gram
         |          FROM (SELECT doc_id, is_batch, w,
         |                  unnest(generate_series(1,
         |                    greatest(len(w) - ${DupSpanGram - 1}, 0))) AS i
         |                FROM __di0)),
         |__dih AS (SELECT doc_id, is_batch, pos,
         |            ${SqlHash.toSigned(SqlHash.fnv1a64("gram", "__dia", "__dib"))} AS h
         |          FROM __dig),
         |__didf AS (SELECT h,
         |             count(DISTINCT CASE WHEN NOT is_batch THEN doc_id END) AS cdf,
         |             count(DISTINCT CASE WHEN is_batch THEN doc_id END) AS bdf
         |           FROM __dih GROUP BY 1)
         |SELECT g.doc_id, g.pos, 'batch' AS src
         |FROM __dih g JOIN __didf f USING (h)
         |WHERE g.is_batch AND f.cdf + f.bdf >= 2
         |UNION ALL
         |SELECT g.doc_id, g.pos, 'retro' AS src
         |FROM __dih g JOIN __didf f USING (h)
         |WHERE NOT g.is_batch AND f.cdf = 1 AND f.bdf >= 1""".stripMargin,

    "q_sim_bruteforce_topk" ->
      s"""WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
         |n AS (SELECT vec_id, v, sqrt(list_dot_product(v, v)) AS norm FROM e),
         |q AS (SELECT vec_id AS q_id, v AS qv, norm AS qnorm FROM n WHERE vec_id < $SimNumQueries),
         |sims AS (SELECT q_id, vec_id AS neighbor_id,
         |           round(list_dot_product(qv, v) / (qnorm * norm), 6) AS cos_sim
         |         FROM n CROSS JOIN q WHERE vec_id <> q_id),
         |r AS (SELECT *, CAST(row_number() OVER (PARTITION BY q_id ORDER BY cos_sim DESC, neighbor_id) AS BIGINT) AS rank
         |      FROM sims)
         |SELECT q_id, neighbor_id, cos_sim, rank FROM r WHERE rank <= $SimTopK""".stripMargin,

    "q_hard_negatives" ->
      s"""WITH e AS (SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
         |n AS (SELECT vec_id, label, v, sqrt(list_dot_product(v, v)) AS norm FROM e),
         |q AS (SELECT vec_id AS q_id, label AS q_label, v AS qv, norm AS qnorm
         |      FROM n WHERE vec_id < $SimNumQueries),
         |sims AS (SELECT q_id, q_label, vec_id AS neighbor_id, label AS neg_label,
         |           round(list_dot_product(qv, v) / (qnorm * norm), 6) AS cos_sim
         |         FROM n CROSS JOIN q WHERE vec_id <> q_id AND label <> q_label),
         |r AS (SELECT *, CAST(row_number() OVER (PARTITION BY q_id ORDER BY cos_sim DESC, neighbor_id) AS BIGINT) AS rank
         |      FROM sims)
         |SELECT q_id, q_label, neighbor_id, neg_label, cos_sim, rank
         |FROM r WHERE rank <= $SimTopK""".stripMargin,

    // the full IVF ANN path replayed in SQL — the k-means training
    // included. The quantizer trains on the driver over a vec_id-SORTED
    // sample with sequential float accumulation, so every centroid mean
    // is reproducible by an ORDER-FORCED fold: per (cell, dim),
    // list_reduce(list_prepend(0, list(v[d] ORDER BY vec_id)), +) / n is
    // the exact IEEE addition sequence the driver executes. Seeds replay
    // pmod(xxhash64(vec_id), stride) == 0 via the XXH64.hashLong steps;
    // assignment/probe argmax tiebreaks (sim DESC, c_id ASC) match
    // max_by(struct(sim, -c_id)); two Lloyd passes are unrolled as CTEs
    "q_sim_ivf_topk" ->
      s"""WITH $sqlAnnBaseCtes,
         |$sqlIvfCellCtes,
         |cand AS (
         |  SELECT p.q_id, a.vec_id AS neighbor_id,
         |    round(list_dot_product(p.qv, a.v) / (p.qnorm * a.norm), 6) AS cos_sim
         |  FROM asg a JOIN probes p USING (cell) WHERE a.vec_id <> p.q_id),
         |r AS (SELECT *, CAST(row_number() OVER (PARTITION BY q_id ORDER BY cos_sim DESC, neighbor_id) AS BIGINT) AS rank
         |      FROM cand)
         |SELECT q_id, neighbor_id, cos_sim, rank FROM r WHERE rank <= $SimTopK""".stripMargin,

    // the full LSH ANN path replayed in SQL: the pseudo-random hyperplane
    // components come from Spark's xxhash64 (XXH64 over ints, seed 42),
    // reimplemented step-for-step in HUGEINT mod-2^64 arithmetic (see
    // SqlHash.xxh64IntSteps), then sign-bucketing, multi-probe expansion,
    // and exact rerank exactly as Similarity.lshTopK computes them —
    // bit-identical including the IEEE fold order of every dot product
    "q_sim_lsh_topk" -> {
      val nBits = 4
      s"""WITH ${sqlLshBucketCtes(nBits)},
         |alls AS (SELECT n.vec_id, v, norm, bucket FROM n JOIN buck USING(vec_id)),
         |q AS (SELECT vec_id AS q_id, v AS qv, norm AS qnorm,
         |        unnest(list_distinct(list_prepend(bucket,
         |          list_transform(range(0, $nBits), bb -> xor(bucket, 1::BIGINT << bb))))) AS bucket
         |      FROM alls WHERE vec_id < $SimNumQueries),
         |cand AS (SELECT q.q_id, a.vec_id AS neighbor_id,
         |           round(list_dot_product(q.qv, a.v) / (q.qnorm * a.norm), 6) AS cos_sim
         |         FROM q JOIN alls a USING(bucket) WHERE a.vec_id <> q.q_id),
         |r AS (SELECT *, CAST(row_number() OVER (PARTITION BY q_id ORDER BY cos_sim DESC, neighbor_id) AS BIGINT) AS rank
         |      FROM cand)
         |SELECT q_id, neighbor_id, cos_sim, rank FROM r WHERE rank <= $SimTopK""".stripMargin
    },

    // the two-stage quantized search reproduces brute force EXACTLY at the
    // shipped rerank factor (recall 1.0, same deterministic tiebreak), so
    // the brute-force SQL is its oracle too
    "q_sim_quantized_topk" ->
      s"""WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
         |n AS (SELECT vec_id, v, sqrt(list_dot_product(v, v)) AS norm FROM e),
         |q AS (SELECT vec_id AS q_id, v AS qv, norm AS qnorm FROM n WHERE vec_id < $SimNumQueries),
         |sims AS (SELECT q_id, vec_id AS neighbor_id,
         |           round(list_dot_product(qv, v) / (qnorm * norm), 6) AS cos_sim
         |         FROM n CROSS JOIN q WHERE vec_id <> q_id),
         |r AS (SELECT *, CAST(row_number() OVER (PARTITION BY q_id ORDER BY cos_sim DESC, neighbor_id) AS BIGINT) AS rank
         |      FROM sims)
         |SELECT q_id, neighbor_id, cos_sim, rank FROM r WHERE rank <= $SimTopK""".stripMargin,

    // product quantization, training included: the all-integer pipeline
    // (unit grid -> integer Lloyd -> argmin codes) replays value-exact —
    // see sqlPqCodesCtes. The encode output pivots codes(vec_id, s, code)
    // into the m per-subspace columns the Spark query emits
    "q_pq_encode" ->
      s"""WITH $sqlPqCodesCtes
         |SELECT vec_id, ${(0 until PqM).map(s =>
            s"CAST(max(CASE WHEN s = $s THEN code END) AS BIGINT) AS code_$s")
            .mkString(", ")}
         |FROM codes GROUP BY vec_id""".stripMargin,

    // PQ ADC search: qd IS the per-query LUT (distance from the query's
    // grid codes to every surviving centroid); joining it through each
    // candidate's codes and summing replays Spark's m element_at lookups
    // integer-exactly. Float arithmetic only at the rerank, in the same
    // rounded-cosine form as every other search oracle
    "q_sim_pq_topk" ->
      s"""WITH $sqlPqCodesCtes,
         |qd AS (SELECT t.vec_id AS q_id, c.s, c.c_id,
         |    sum((t.g - c.cg) * (t.g - c.cg)) AS dist
         |  FROM sub t JOIN cen2 c ON t.s = c.s AND t.dl = c.dl
         |  WHERE t.vec_id < $SimNumQueries
         |  GROUP BY t.vec_id, c.s, c.c_id),
         |adc AS (SELECT qd.q_id, co.vec_id, sum(qd.dist) AS adc
         |  FROM qd JOIN codes co ON qd.s = co.s AND qd.c_id = co.code
         |  WHERE co.vec_id <> qd.q_id GROUP BY qd.q_id, co.vec_id),
         |cand AS (SELECT q_id, vec_id FROM (
         |  SELECT q_id, vec_id, row_number() OVER (PARTITION BY q_id
         |    ORDER BY adc, vec_id) AS rn FROM adc)
         |  WHERE rn <= ${SimTopK * PqRerank}),
         |rr AS (SELECT c.q_id, c.vec_id AS neighbor_id,
         |    round(list_dot_product(q.v, a.v) / (q.norm * a.norm), 6) AS cos_sim
         |  FROM cand c JOIN n a ON a.vec_id = c.vec_id
         |  JOIN n q ON q.vec_id = c.q_id),
         |r AS (SELECT *, CAST(row_number() OVER (PARTITION BY q_id
         |    ORDER BY cos_sim DESC, neighbor_id) AS BIGINT) AS rank FROM rr)
         |SELECT q_id, neighbor_id, cos_sim, rank FROM r WHERE rank <= $SimTopK""".stripMargin,

    // IVF-PQ composition: the IVF fragment supplies asg (vector -> cell)
    // and probes (query -> nprobe cells); the PQ fragment supplies codes;
    // candidates are their cell equi-join, scored by the qd LUT join (the
    // same integer ADC as q_sim_pq_topk), reranked on floats
    "q_sim_ivfpq_topk" ->
      s"""WITH $sqlAnnBaseCtes,
         |$sqlIvfCellCtes,
         |$sqlPqCodesInner,
         |qd AS (SELECT t.vec_id AS q_id, c.s, c.c_id,
         |    sum((t.g - c.cg) * (t.g - c.cg)) AS dist
         |  FROM sub t JOIN cen2 c ON t.s = c.s AND t.dl = c.dl
         |  WHERE t.vec_id < $SimNumQueries
         |  GROUP BY t.vec_id, c.s, c.c_id),
         |cand0 AS (SELECT p.q_id, a.vec_id
         |  FROM asg a JOIN probes p USING (cell) WHERE a.vec_id <> p.q_id),
         |adc AS (SELECT c0.q_id, c0.vec_id, sum(qd.dist) AS adc
         |  FROM cand0 c0 JOIN codes co ON co.vec_id = c0.vec_id
         |  JOIN qd ON qd.q_id = c0.q_id AND qd.s = co.s AND qd.c_id = co.code
         |  GROUP BY c0.q_id, c0.vec_id),
         |cand AS (SELECT q_id, vec_id FROM (
         |  SELECT q_id, vec_id, row_number() OVER (PARTITION BY q_id
         |    ORDER BY adc, vec_id) AS rn FROM adc)
         |  WHERE rn <= ${SimTopK * PqRerank}),
         |rr AS (SELECT c.q_id, c.vec_id AS neighbor_id,
         |    round(list_dot_product(q.v, a.v) / (q.norm * a.norm), 6) AS cos_sim
         |  FROM cand c JOIN n a ON a.vec_id = c.vec_id
         |  JOIN n q ON q.vec_id = c.q_id),
         |r AS (SELECT *, CAST(row_number() OVER (PARTITION BY q_id
         |    ORDER BY cos_sim DESC, neighbor_id) AS BIGINT) AS rank FROM rr)
         |SELECT q_id, neighbor_id, cos_sim, rank FROM r WHERE rank <= $SimTopK""".stripMargin,

    // OPQ: the transform replays exactly — hash-derived sign flips, the
    // Walsh-Hadamard rotation as bit_count arithmetic over INTEGER grid
    // codes (order-free sums), HUGEINT variance ranking, snake-allocation
    // arithmetic — then the SAME PQ fragment instantiated on the
    // transformed pair (te/tn) and the q_sim_pq_topk search CTEs, with
    // the rerank joining the ORIGINAL n
    "q_sim_opq_topk" -> {
      val (sSteps, sCol) = SqlHash.xxh64LongSteps("idx", "42", "__os")
      val sgnInner = SqlHash.applySteps(
        "SELECT ri.i, CAST(ri.i AS HUGEINT) AS idx FROM range(0, 64) ri(i)",
        sSteps)
      s"""WITH $sqlAnnBaseCtes,
         |opq_u AS (SELECT vec_id, list_transform(v, x -> x / greatest(norm, 1e-12)) AS u FROM n),
         |opq_b AS (SELECT CAST(min(list_min(u)) AS DOUBLE) AS mn,
         |                 CAST(max(list_max(u)) AS DOUBLE) AS mx FROM opq_u),
         |opq_g AS MATERIALIZED (SELECT vec_id, list_transform(u, x ->
         |    least(CAST(floor((x - mn) / ((mx - mn) / ${PqOpqGrid}.0)) AS BIGINT), ${PqOpqGrid - 1})) AS g
         |  FROM opq_u CROSS JOIN opq_b),
         |opq_s AS MATERIALIZED (SELECT i, 1 - 2 * (((${SqlHash.toSigned(sCol)} % 2) + 2) % 2) AS sgn
         |  FROM ($sgnInner)),
         |opq_r AS MATERIALIZED (SELECT rj.j, s.i,
         |    s.sgn * (1 - 2 * (bit_count(CAST(rj.j AS BIGINT) & CAST(s.i AS BIGINT)) % 2)) AS c
         |  FROM range(0, 64) rj(j) CROSS JOIN opq_s s),
         |opq_f AS (SELECT vec_id, unnest(g) AS gv, generate_subscripts(g, 1) - 1 AS i FROM opq_g),
         |opq_rot AS MATERIALIZED (SELECT f.vec_id, r.j, CAST(sum(r.c * f.gv) AS BIGINT) AS t
         |  FROM opq_f f JOIN opq_r r USING (i) GROUP BY 1, 2),
         |opq_var AS (SELECT j,
         |    CAST(count(*) AS HUGEINT) * sum(CAST(t AS HUGEINT) * t) -
         |    sum(CAST(t AS HUGEINT)) * sum(CAST(t AS HUGEINT)) AS vr
         |  FROM opq_rot GROUP BY j),
         |opq_alloc AS (SELECT j, rk - 1 AS rr0,
         |    CASE WHEN ((rk - 1) // $PqM) % 2 = 0 THEN (rk - 1) % $PqM
         |         ELSE $PqM - 1 - (rk - 1) % $PqM END AS sub0
         |  FROM (SELECT j, row_number() OVER (ORDER BY vr DESC, j) AS rk FROM opq_var)),
         |opq_perm AS (SELECT j, sub0 * (64 // $PqM) +
         |    row_number() OVER (PARTITION BY sub0 ORDER BY rr0) - 1 AS p
         |  FROM opq_alloc),
         |te AS MATERIALIZED (SELECT o.vec_id, list(CAST(o.t AS DOUBLE) ORDER BY pm.p) AS v
         |  FROM opq_rot o JOIN opq_perm pm USING (j) GROUP BY o.vec_id),
         |tn AS (SELECT vec_id, v, sqrt(list_dot_product(v, v)) AS norm FROM te),
         |${sqlPqCodesInnerOn("te", "tn")},
         |qd AS (SELECT t.vec_id AS q_id, c.s, c.c_id,
         |    sum((t.g - c.cg) * (t.g - c.cg)) AS dist
         |  FROM sub t JOIN cen2 c ON t.s = c.s AND t.dl = c.dl
         |  WHERE t.vec_id < $SimNumQueries
         |  GROUP BY t.vec_id, c.s, c.c_id),
         |adc AS (SELECT qd.q_id, co.vec_id, sum(qd.dist) AS adc
         |  FROM qd JOIN codes co ON qd.s = co.s AND qd.c_id = co.code
         |  WHERE co.vec_id <> qd.q_id GROUP BY qd.q_id, co.vec_id),
         |cand AS (SELECT q_id, vec_id FROM (
         |  SELECT q_id, vec_id, row_number() OVER (PARTITION BY q_id
         |    ORDER BY adc, vec_id) AS rn FROM adc)
         |  WHERE rn <= ${SimTopK * PqRerank}),
         |rr AS (SELECT c.q_id, c.vec_id AS neighbor_id,
         |    round(list_dot_product(q.v, a.v) / (q.norm * a.norm), 6) AS cos_sim
         |  FROM cand c JOIN n a ON a.vec_id = c.vec_id
         |  JOIN n q ON q.vec_id = c.q_id),
         |r2 AS (SELECT *, CAST(row_number() OVER (PARTITION BY q_id
         |    ORDER BY cos_sim DESC, neighbor_id) AS BIGINT) AS rank FROM rr)
         |SELECT q_id, neighbor_id, cos_sim, rank FROM r2 WHERE rank <= $SimTopK""".stripMargin
    },

    "q_bpe_pairs" ->
      """WITH wl AS (SELECT unnest(string_split(text, ' ')) AS word FROM documents),
        |f AS (SELECT word, CAST(count(*) AS BIGINT) AS freq
        |      FROM wl WHERE length(word) >= 2 GROUP BY 1),
        |p AS (SELECT freq,
        |        unnest([substr(word, i, 2) for i in generate_series(1, length(word) - 1)]) AS pair
        |      FROM f)
        |SELECT pair, CAST(sum(freq) AS BIGINT) AS pair_count
        |FROM p GROUP BY 1
        |ORDER BY pair_count DESC, pair LIMIT 100""".stripMargin,

    "q_bpe_train" -> (sqlBpeCtes(6) + "\n" +
      (0 until 6).map(r =>
        s"SELECT CAST(${r + 1} AS BIGINT) AS merge_rank, lhs, rhs, mrg AS merged, n AS pair_n FROM b$r")
        .mkString("SELECT * FROM (", " UNION ALL ", ") ORDER BY merge_rank")),

    "q_bpe_tokenize" -> (sqlBpeCtes(6) +
      """,
        |tw AS (SELECT word, CAST(len(string_split(cur, ' ')) AS BIGINT) AS n_toks FROM w6),
        |dw AS (SELECT doc_id, word
        |       FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS word FROM documents)
        |       WHERE regexp_full_match(word, '[a-z]+'))
        |SELECT dw.doc_id, CAST(count(*) AS BIGINT) AS n_words,
        |       CAST(sum(tw.n_toks) AS BIGINT) AS n_tokens
        |FROM dw JOIN tw USING (word)
        |GROUP BY 1""".stripMargin),

    "q_repetition_filter" ->
      s"""WITH d AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
         |sh AS (SELECT doc_id,
         |         CASE WHEN len(w) >= 3
         |              THEN [w[i] || ' ' || w[i+1] || ' ' || w[i+2] for i in generate_series(1, len(w) - 2)]
         |              ELSE [] END AS shs
         |       FROM d)
         |SELECT doc_id,
         |  CAST(len(shs) AS BIGINT) AS n_shingles,
         |  CAST(len(list_distinct(shs)) AS BIGINT) AS n_distinct,
         |  ${TextAnalysis.floor6Sql("CASE WHEN len(shs) > 0 THEN (len(shs) - len(list_distinct(shs))) * 1.0 / len(shs) ELSE 0.0 END")} AS rep_ratio
         |FROM sh""".stripMargin,

    "q_decontaminate" ->
      """WITH d AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
        |g AS (SELECT doc_id, unnest(list_distinct(
        |        CASE WHEN len(w) >= 8
        |             THEN [w[i] || ' ' || w[i+1] || ' ' || w[i+2] || ' ' || w[i+3] || ' ' || w[i+4] || ' ' || w[i+5] || ' ' || w[i+6] || ' ' || w[i+7]
        |                   for i in generate_series(1, len(w) - 7)]
        |             ELSE [] END)) AS gram
        |      FROM d),
        |tr AS (SELECT * FROM g WHERE doc_id % 50 <> 0),
        |ev AS (SELECT DISTINCT gram FROM g WHERE doc_id % 50 = 0)
        |SELECT doc_id, CAST(count(*) AS BIGINT) AS n_shared_ngrams
        |FROM tr JOIN ev USING (gram) GROUP BY 1""".stripMargin,

    // the bloom composition has no false negatives and exact-verifies
    // candidates, so the plain inverted-index SQL is its oracle too
    "q_decontaminate_bloom" ->
      """WITH d AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
        |g AS (SELECT doc_id, unnest(list_distinct(
        |        CASE WHEN len(w) >= 8
        |             THEN [w[i] || ' ' || w[i+1] || ' ' || w[i+2] || ' ' || w[i+3] || ' ' || w[i+4] || ' ' || w[i+5] || ' ' || w[i+6] || ' ' || w[i+7]
        |                   for i in generate_series(1, len(w) - 7)]
        |             ELSE [] END)) AS gram
        |      FROM d),
        |tr AS (SELECT * FROM g WHERE doc_id % 50 <> 0),
        |ev AS (SELECT DISTINCT gram FROM g WHERE doc_id % 50 = 0)
        |SELECT doc_id, CAST(count(*) AS BIGINT) AS n_shared_ngrams
        |FROM tr JOIN ev USING (gram) GROUP BY 1""".stripMargin,

    // the keep/drop decision is xxhash64(doc_id) — replayed through the
    // same XXH64.hashLong SQL steps as the banding buckets; pmod of the
    // signed value computed two's-complement-exactly. The hash steps run
    // over bare doc_id and JOIN to the language CTE afterwards — wrapping
    // the wide pred_lang expression in the step pipeline makes the
    // optimizer inline it per layer and blow up planning
    "q_mixture_sample" -> {
      val (steps, hCol) = SqlHash.xxh64LongSteps("doc_id::HUGEINT", "42", "__mx")
      val inner = SqlHash.applySteps("SELECT doc_id FROM documents", steps)
      s"""WITH d AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
         |lang AS (
         |  SELECT doc_id, $sqlLangPred AS pred_lang
         |  FROM (SELECT doc_id, $sqlLangScores FROM d)
         |), h AS MATERIALIZED (SELECT doc_id, ${SqlHash.toSigned(hCol)} AS hv FROM ($inner))
         |SELECT l.doc_id, l.pred_lang FROM lang l JOIN h USING (doc_id)
         |WHERE CASE WHEN l.pred_lang = 'en' THEN ((hv % 2) + 2) % 2 < 1
         |           ELSE ((hv % 1) + 1) % 1 < 1 END""".stripMargin
    },

    // per-token log-probs truncate to INTEGER micro-nats before summing:
    // integer aggregation is order-independent, where a float sum drifts
    // in the last ulp between engines
    "q_unigram_logprob" ->
      """WITH t AS (SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents),
        |v AS (SELECT term, CAST(count(*) AS BIGINT) AS term_n FROM t GROUP BY 1),
        |tot AS (SELECT CAST(count(*) AS BIGINT) AS total_n FROM t),
        |lp AS (SELECT doc_id, CAST(floor(ln(term_n / CAST(total_n AS DOUBLE)) * 1e6) AS BIGINT) AS lp_micro
        |       FROM t JOIN v USING (term) CROSS JOIN tot)
        |SELECT doc_id, CAST(count(*) AS BIGINT) AS n_tokens,
        |  CAST(sum(lp_micro) AS BIGINT) AS sum_lp_micro,
        |  sum(lp_micro) / (count(*) * 1e6) AS mean_logprob
        |FROM lp GROUP BY 1""".stripMargin,

    // zipped double-unnest pairs adjacent words; a one-token doc slices
    // both lists empty, so it falls to the zero-bigram LEFT JOIN branch
    "q_bigram_logprob" ->
      """WITH d AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
        |b AS (SELECT doc_id, unnest(w[1:len(w)-1]) AS w1, unnest(w[2:len(w)]) AS w2 FROM d),
        |bc AS (SELECT w1, w2, CAST(count(*) AS BIGINT) AS bg_n FROM b GROUP BY 1, 2),
        |cc AS (SELECT w1, CAST(count(*) AS BIGINT) AS ctx_n FROM b GROUP BY 1),
        |v AS (SELECT CAST(count(DISTINCT t) AS BIGINT) AS vn
        |      FROM (SELECT unnest(w) AS t FROM d)),
        |lp AS (SELECT doc_id,
        |         CAST(floor(ln((bg_n + 1) / CAST(ctx_n + vn AS DOUBLE)) * 1e6) AS BIGINT) AS lp_micro
        |       FROM b JOIN bc USING (w1, w2) JOIN cc USING (w1) CROSS JOIN v),
        |pd AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_bigrams,
        |         CAST(sum(lp_micro) AS BIGINT) AS logprob_micro
        |       FROM lp GROUP BY 1)
        |SELECT d.doc_id,
        |  CAST(coalesce(pd.n_bigrams, 0) AS BIGINT) AS n_bigrams,
        |  CAST(coalesce(pd.logprob_micro, 0) AS BIGINT) AS logprob_micro
        |FROM (SELECT DISTINCT doc_id FROM d) d LEFT JOIN pd USING (doc_id)""".stripMargin,

    // same LM replay with the count-cutoff prune: types below minCount
    // leave bc, and the LEFT JOIN's NULL coalesces to the unseen score
    "q_bigram_logprob_capped" ->
      s"""WITH d AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
         |b AS (SELECT doc_id, unnest(w[1:len(w)-1]) AS w1, unnest(w[2:len(w)]) AS w2 FROM d),
         |bc AS (SELECT w1, w2, CAST(count(*) AS BIGINT) AS bg_n FROM b GROUP BY 1, 2
         |       HAVING count(*) >= $BigramMinCount),
         |cc AS (SELECT w1, CAST(count(*) AS BIGINT) AS ctx_n FROM b GROUP BY 1),
         |v AS (SELECT CAST(count(DISTINCT t) AS BIGINT) AS vn
         |      FROM (SELECT unnest(w) AS t FROM d)),
         |lp AS (SELECT doc_id,
         |         CAST(floor(ln((coalesce(bg_n, 0) + 1) / CAST(ctx_n + vn AS DOUBLE)) * 1e6) AS BIGINT) AS lp_micro
         |       FROM b LEFT JOIN bc USING (w1, w2) JOIN cc USING (w1) CROSS JOIN v),
         |pd AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_bigrams,
         |         CAST(sum(lp_micro) AS BIGINT) AS logprob_micro
         |       FROM lp GROUP BY 1)
         |SELECT d.doc_id,
         |  CAST(coalesce(pd.n_bigrams, 0) AS BIGINT) AS n_bigrams,
         |  CAST(coalesce(pd.logprob_micro, 0) AS BIGINT) AS logprob_micro
         |FROM (SELECT DISTINCT doc_id FROM d) d LEFT JOIN pd USING (doc_id)""".stripMargin,

    "q_nb_model" ->
      s"""$nbCtes
         |SELECT label, term, term_n, lp_micro FROM grid""".stripMargin,

    "q_nb_predict" ->
      s"""$nbScoreCtes
         |SELECT doc_id, pred_label, score_micro, n_tokens FROM pred""".stripMargin,

    "q_nb_eval" ->
      s"""$nbScoreCtes
         |SELECT d.lang AS true_label, p.pred_label, CAST(count(*) AS BIGINT) AS n
         |FROM pred p JOIN documents d USING (doc_id) GROUP BY 1, 2""".stripMargin,

    "q_doc_chunks" ->
      """WITH c AS (
        |  SELECT doc_id, text,
        |         unnest(generate_series(0, CAST(ceil(greatest(length(text) - 64, 0) / 48.0) AS INT))) AS i
        |  FROM documents
        |)
        |SELECT doc_id,
        |  CAST(i AS BIGINT) AS chunk_idx,
        |  CAST(i * 48 AS BIGINT) AS chunk_start,
        |  substring(text, i * 48 + 1, 64) AS chunk,
        |  CAST(length(substring(text, i * 48 + 1, 64)) AS BIGINT) AS chunk_len
        |FROM c""".stripMargin,

    "q_lang_cap" ->
      s"""WITH d AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
         |lang AS (
         |  SELECT doc_id, $sqlLangPred AS pred_lang
         |  FROM (SELECT doc_id, $sqlLangScores FROM d)
         |), ranked AS (
         |  SELECT doc_id, pred_lang,
         |    CAST(row_number() OVER (PARTITION BY pred_lang ORDER BY doc_id) AS BIGINT) AS lang_rank
         |  FROM lang
         |)
         |SELECT doc_id, pred_lang, lang_rank FROM ranked WHERE lang_rank <= 50""".stripMargin,

    "q_token_gate_adaptive" ->
      """WITH t AS (SELECT doc_id, CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens FROM documents),
        |m AS (SELECT median(n_tokens) AS med_tokens FROM t)
        |SELECT doc_id, n_tokens, med_tokens FROM t CROSS JOIN m
        |WHERE n_tokens >= med_tokens""".stripMargin,

    "q_dataset_card" ->
      s"""WITH base AS (
         |  SELECT CAST(count(*) AS BIGINT) AS n_docs,
         |         CAST(sum(len(string_split(text, ' '))) AS BIGINT) AS total_ws_tokens,
         |         CAST(sum(length(text)) AS BIGINT) AS total_chars
         |  FROM documents
         |), dup AS (
         |  SELECT CAST(sum(n_copies - 1) AS BIGINT) AS n_dup_docs
         |  FROM (SELECT count(*) AS n_copies FROM documents GROUP BY lower(trim(text)))
         |), lang AS (
         |  SELECT CAST(count(*) FILTER (WHERE pred_lang = 'en') AS BIGINT) AS n_en_docs
         |  FROM (SELECT $sqlLangPred AS pred_lang
         |        FROM (SELECT doc_id, $sqlLangScores FROM (SELECT doc_id, string_split(text, ' ') AS w FROM documents)))
         |), splits AS (
         |  SELECT CAST(count(*) FILTER (WHERE doc_id % 100 < 90) AS BIGINT) AS n_train,
         |         CAST(count(*) FILTER (WHERE doc_id % 100 >= 90 AND doc_id % 100 < 95) AS BIGINT) AS n_val,
         |         CAST(count(*) FILTER (WHERE doc_id % 100 >= 95) AS BIGINT) AS n_test
         |  FROM documents
         |)
         |SELECT * FROM base CROSS JOIN dup CROSS JOIN lang CROSS JOIN splits""".stripMargin,

    "q_seq_pack" ->
      """WITH d AS (
        |  SELECT doc_id, doc_id % 8 AS shard,
        |         greatest(CAST(ceil(length(text) / 4.0) AS BIGINT), 1) AS n_tokens
        |  FROM documents
        |), o AS (
        |  SELECT *, CAST(sum(n_tokens) OVER (PARTITION BY shard ORDER BY doc_id
        |                                     ROWS UNBOUNDED PRECEDING) AS BIGINT) AS end_offset
        |  FROM d
        |)
        |SELECT doc_id, shard, n_tokens,
        |  end_offset - n_tokens AS start_offset, end_offset,
        |  (end_offset - n_tokens) // 256 AS first_seq,
        |  (end_offset - 1) // 256 AS last_seq,
        |  (end_offset - n_tokens) // 256 <> (end_offset - 1) // 256 AS straddles
        |FROM o""".stripMargin,

    "q_train_val_split" ->
      """SELECT doc_id, doc_id % 100 AS split_key,
        |  CASE WHEN doc_id % 100 < 90 THEN 'train'
        |       WHEN doc_id % 100 < 95 THEN 'val' ELSE 'test' END AS split,
        |  greatest(CAST(ceil(length(text) / 4.0) AS BIGINT), 1) AS n_tokens
        |FROM documents""".stripMargin,

    // BM25: idf micro-nats (one ln per distinct term) + exact rational tf
    // normalization — 22·T·tf / (10·T·tf + 3·T + 9·dl·N) with HUGEINT
    // floor division ≡ Spark's DECIMAL(38,0) `div` on positive operands
    "q_bm25_topk" ->
      s"""WITH $sqlRetrievalCtes
         |SELECT query_id, doc_id, n_terms, score_micro, doc_rank
         |FROM bmr WHERE doc_rank <= 10""".stripMargin,

    // query likelihood: matched-postings micro-nats + qlen × the per-doc
    // Dirichlet constant floored BEFORE the integer multiply
    "q_ql_topk" ->
      s"""WITH $sqlRetrievalCtes
         |SELECT query_id, doc_id, n_terms, score_micro, doc_rank
         |FROM qlr WHERE doc_rank <= 10""".stripMargin,

    // RRF: integer 1000000 // (60 + rank) over the two top-10 lists,
    // full-join-merged; absent list membership contributes 0
    "q_hybrid_rrf" ->
      s"""WITH $sqlRetrievalCtes,
         |fa AS (SELECT query_id, doc_id, doc_rank AS ra FROM bmr WHERE doc_rank <= 10),
         |fb AS (SELECT query_id, doc_id, doc_rank AS rb FROM qlr WHERE doc_rank <= 10),
         |fu AS (SELECT query_id, doc_id,
         |         coalesce(1000000 // (60 + ra), 0) + coalesce(1000000 // (60 + rb), 0) AS rrf_micro
         |       FROM fa FULL JOIN fb USING (query_id, doc_id)),
         |fr AS (SELECT *, CAST(row_number() OVER (PARTITION BY query_id
         |          ORDER BY rrf_micro DESC, doc_id ASC) AS BIGINT) AS fused_rank
         |       FROM fu)
         |SELECT query_id, doc_id, CAST(rrf_micro AS BIGINT) AS rrf_micro, fused_rank
         |FROM fr WHERE fused_rank <= 10""".stripMargin,

    // postings-index build digest: the index is a pure function of the
    // corpus, so the oracle re-derives tf/dl/voc/tot from documents and
    // digests them — any drift in the written index's content (a lost
    // posting, a wrong df/ctf/tf/dl, a truncated shard in ANY of the
    // four relations) breaks the hash. The incremental build shares the
    // digest: delta + merge + compaction must equal the from-scratch
    // derivation exactly.
    "q_postings_build" -> sqlIndexDigest,
    "q_postings_build_incremental" -> sqlIndexDigest,

    // A-ES weighted sample: xxh64(doc_id) replayed step-for-step, then
    // the key is elementwise IEEE (cast, power-of-two scale, one ln, one
    // divide) truncated to micro before the global bounded top-k
    "q_weighted_sample" -> {
      val (steps, hCol) = SqlHash.xxh64LongSteps("doc_id::HUGEINT", "42", "__ws")
      val inner = SqlHash.applySteps(
        "SELECT doc_id, CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens FROM documents",
        steps)
      s"""WITH h AS (SELECT doc_id, n_tokens, ${SqlHash.toSigned(hCol)} AS hv FROM ($inner)),
         |k AS (SELECT doc_id, n_tokens,
         |        CAST(floor(ln(CAST(hv AS DOUBLE) / CAST(18446744073709551616 AS DOUBLE) + 0.5 + 1e-12)
         |             / n_tokens * 1e6) AS BIGINT) AS key_micro
         |      FROM h),
         |r AS (SELECT *, CAST(row_number() OVER (ORDER BY key_micro DESC, doc_id ASC) AS BIGINT) AS sample_rank
         |      FROM k)
         |SELECT doc_id, n_tokens, key_micro, sample_rank
         |FROM r WHERE sample_rank <= 500""".stripMargin
    },

    // nDCG: floored natural-log-discounted micro gains, integer sums,
    // one HUGEINT floor division for the ratio; grades are the
    // RANKING-INDEPENDENT token-overlap qrels (distinct shared tokens
    // with the query doc over the ±150 judging pool, floor 13), replayed
    // expression for expression
    "q_retrieval_ndcg" ->
      s"""WITH $sqlRetrievalCtes,
         |fa AS (SELECT query_id, doc_id, doc_rank AS ra FROM bmr WHERE doc_rank <= 10),
         |fb AS (SELECT query_id, doc_id, doc_rank AS rb FROM qlr WHERE doc_rank <= 10),
         |fu AS (SELECT query_id, doc_id,
         |         coalesce(1000000 // (60 + ra), 0) + coalesce(1000000 // (60 + rb), 0) AS rrf_micro
         |       FROM fa FULL JOIN fb USING (query_id, doc_id)),
         |fr AS (SELECT *, CAST(row_number() OVER (PARTITION BY query_id
         |          ORDER BY rrf_micro DESC, doc_id ASC) AS BIGINT) AS fused_rank
         |       FROM fu),
         |hk AS (SELECT query_id, doc_id, fused_rank AS doc_rank FROM fr WHERE fused_rank <= 10),
         |dtok AS (SELECT DISTINCT doc_id, term FROM t),
         |qrd AS (SELECT doc_id AS query_id, term FROM dtok WHERE doc_id % 997 = 0),
         |qrpool AS (SELECT q.query_id, d.doc_id
         |           FROM (SELECT DISTINCT query_id FROM qrd) q
         |           JOIN (SELECT doc_id FROM documents) d
         |             ON d.doc_id BETWEEN q.query_id - 150 AND q.query_id + 150),
         |rel AS (SELECT p.query_id, p.doc_id,
         |          greatest(CAST(count(*) AS BIGINT) - 13, 0) AS rel
         |        FROM qrpool p
         |        JOIN dtok b ON b.doc_id = p.doc_id
         |        JOIN qrd a ON a.query_id = p.query_id AND a.term = b.term
         |        GROUP BY 1, 2
         |        HAVING greatest(CAST(count(*) AS BIGINT) - 13, 0) > 0),
         |g AS (SELECT hk.query_id,
         |        CAST(floor(coalesce(rel, 0) * 1e6 / ln(doc_rank + 1)) AS BIGINT) AS gmic
         |      FROM hk LEFT JOIN rel USING (query_id, doc_id)),
         |dcg AS (SELECT query_id, CAST(sum(gmic) AS BIGINT) AS dcg_micro FROM g GROUP BY 1),
         |ig AS (SELECT query_id, rel, doc_id,
         |        row_number() OVER (PARTITION BY query_id ORDER BY rel DESC, doc_id ASC) AS ir
         |      FROM rel),
         |idcg AS (SELECT query_id,
         |          CAST(sum(CAST(floor(rel * 1e6 / ln(ir + 1)) AS BIGINT)) AS BIGINT) AS idcg_micro
         |        FROM ig WHERE ir <= 10 GROUP BY 1)
         |SELECT query_id, dcg_micro, idcg_micro,
         |  CAST((CAST(dcg_micro AS HUGEINT) * 1000000) // idcg_micro AS BIGINT) AS ndcg_micro
         |FROM dcg JOIN idcg USING (query_id)
         |WHERE idcg_micro > 0""".stripMargin,

    // leakage-safe split: the recursive-CTE transitive closure (the
    // q_dedup_clusters oracle) feeds a LEFT JOIN + coalesce group key,
    // then xxh64(group_key) is replayed step-for-step into the 90/5/5 gate
    "q_leakage_safe_split" -> {
      val clusterSql = sqlJaccardCtes.replace("WITH ", "WITH RECURSIVE ") + s""",
         |edges AS (SELECT doc_a AS s, doc_b AS d FROM jpairs
         |          UNION ALL SELECT doc_b, doc_a FROM jpairs),
         |reach(node, r) AS (
         |  SELECT s, s FROM (SELECT DISTINCT s FROM edges) t
         |  UNION
         |  SELECT re.node, e.d FROM reach re JOIN edges e ON e.s = re.r
         |)
         |SELECT node AS doc_id, min(r) AS cluster_id FROM reach GROUP BY node""".stripMargin
      val (steps, hCol) = SqlHash.xxh64LongSteps("group_key::HUGEINT", "42", "__ls")
      val inner = SqlHash.applySteps(
        s"""SELECT d.doc_id, coalesce(c.cluster_id, d.doc_id) AS group_key
           |FROM documents d LEFT JOIN ($clusterSql) c ON d.doc_id = c.doc_id""".stripMargin,
        steps)
      s"""SELECT doc_id, group_key,
         |  CAST(((hv % 100) + 100) % 100 AS BIGINT) AS split_key,
         |  CASE WHEN ((hv % 100) + 100) % 100 < 90 THEN 'train'
         |       WHEN ((hv % 100) + 100) % 100 < 95 THEN 'val'
         |       ELSE 'test' END AS split
         |FROM (SELECT doc_id, group_key, ${SqlHash.toSigned(hCol)} AS hv FROM ($inner))""".stripMargin
    },

    "q_k_anonymity" ->
      """SELECT CAST(c_nationkey AS BIGINT) AS nationkey,
        |  c_mktsegment AS mktsegment,
        |  CAST(floor(c_acctbal / 1000.0) AS BIGINT) AS acctbal_band,
        |  CAST(count(*) AS BIGINT) AS group_n,
        |  count(*) < 5 AS at_risk
        |FROM customer GROUP BY 1, 2, 3""".stripMargin,

    "q_l_diversity" ->
      """SELECT CAST(c_nationkey AS BIGINT) AS nationkey,
        |  c_mktsegment AS mktsegment,
        |  CAST(floor(c_acctbal / 1000.0) AS BIGINT) AS acctbal_band,
        |  CAST(count(*) AS BIGINT) AS group_n,
        |  CAST(count(DISTINCT c_acctbal) AS BIGINT) AS n_sensitive,
        |  count(DISTINCT c_acctbal) < 3 AS at_risk
        |FROM customer GROUP BY 1, 2, 3""".stripMargin,

    "q_tfidf_terms" ->
      s"""WITH t AS (SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents),
         |tf AS (SELECT doc_id, term, CAST(count(*) AS BIGINT) AS tf FROM t GROUP BY 1, 2),
         |dfr AS (SELECT term, CAST(count(DISTINCT doc_id) AS BIGINT) AS df FROM t GROUP BY 1),
         |n AS (SELECT CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs FROM documents),
         |s AS (SELECT doc_id, tf.term, tf, df,
         |        ${TextAnalysis.floor6Sql("tf * ln((n_docs + 1) / (df + 1.0))")} AS tfidf
         |      FROM tf JOIN dfr USING (term) CROSS JOIN n),
         |r AS (SELECT *, CAST(row_number() OVER (PARTITION BY doc_id ORDER BY tfidf DESC, term) AS BIGINT) AS term_rank
         |      FROM s)
         |SELECT doc_id, term, tf, df, tfidf, term_rank FROM r WHERE term_rank <= 3""".stripMargin,

    "q_salt_skew_agg" -> (P +
      """SELECT account_id, round(sum(amount), 2) AS sum_amount,
        |  CAST(count(*) AS BIGINT) AS n_rows
        |FROM upserts GROUP BY 1""".stripMargin),

    "q_envelope_json_serde" -> (P +
      "SELECT txn_id, account_id, txn_ref, txn_type, amount, currency, status, event_time_ms, event_time_us, op FROM txns"),

    // the Avro binary wire round-trip must land on the same flat rows —
    // byte format differs, typed output is the contract
    "q_envelope_avro_serde" -> (P +
      "SELECT txn_id, account_id, txn_ref, txn_type, amount, currency, status, event_time_ms, event_time_us, op FROM txns"),

    "q_asof_enrich" -> (P +
      """, facts AS (
        |  SELECT txn_id, account_id, amount, event_time_us, event_time_ms FROM completed
        |  WHERE txn_type IN ('DEBIT','TRANSFER_OUT','FEE','LOAN_REPAYMENT')
        |), vers AS (
        |  SELECT account_id, event_time_us AS ver_ts_us, amount AS profile_score,
        |         row_number() OVER (PARTITION BY account_id, event_time_us ORDER BY txn_id DESC) AS rn
        |  FROM upserts WHERE txn_type = 'CREDIT'
        |), dimd AS (SELECT account_id, ver_ts_us, profile_score FROM vers WHERE rn = 1)
        |SELECT f.txn_id, f.account_id, f.amount,
        |       d.ver_ts_us // 1000 AS ver_ts_ms, d.profile_score
        |FROM facts f ASOF LEFT JOIN dimd d
        |  ON f.account_id = d.account_id AND f.event_time_us >= d.ver_ts_us""".stripMargin),

    "q_topk_spenders" -> (P +
      """, totals AS (
        |  SELECT account_id, round(sum(amount), 2) AS total_spend FROM completed
        |  WHERE txn_type IN ('DEBIT','TRANSFER_OUT','FEE','LOAN_REPAYMENT')
        |  GROUP BY 1
        |), ranked AS (
        |  SELECT account_id, total_spend,
        |    CAST(row_number() OVER (ORDER BY total_spend DESC, account_id) AS BIGINT) AS rank
        |  FROM totals
        |)
        |SELECT account_id, total_spend, rank FROM ranked WHERE rank <= 10""".stripMargin),

    "q_rollup_spend" -> (P +
      """SELECT coalesce(currency, 'ALL') AS currency,
        |       coalesce(txn_type, 'ALL') AS txn_type,
        |       round(sum(amount), 2) AS total_amount,
        |       CAST(count(*) AS BIGINT) AS n_txns
        |FROM completed GROUP BY ROLLUP (currency, txn_type)""".stripMargin),

    "q_distinct_users" -> (P +
      """SELECT txn_type,
        |       CAST(count(DISTINCT account_id) AS BIGINT) AS n_accounts,
        |       CAST(count(*) AS BIGINT) AS n_txns
        |FROM upserts GROUP BY 1""".stripMargin),

    "q_text_scrub" -> {
      val e = TextAnalysis.EmailPattern
      val p = TextAnalysis.PhonePattern
      s"""WITH t AS (
         |  SELECT doc_id,
         |    text || ' contact u' || doc_id || '@mail.com or +234-80' || doc_id || '-55' AS text2
         |  FROM documents
         |)
         |SELECT doc_id,
         |  CAST(len(regexp_extract_all(text2, '$e')) AS BIGINT) AS n_emails,
         |  CAST(len(regexp_extract_all(text2, '$p')) AS BIGINT) AS n_phones,
         |  regexp_replace(regexp_replace(text2, '$e', '<EMAIL>', 'g'), '$p', '<PHONE>', 'g') AS scrubbed
         |FROM t""".stripMargin
    },

    "q_heavy_hitters" -> (P +
      """, hh AS (
        |  SELECT txn_type, account_id, CAST(count(*) AS BIGINT) AS n
        |  FROM upserts GROUP BY 1, 2
        |)
        |SELECT txn_type, account_id, n,
        |  CAST(row_number() OVER (PARTITION BY txn_type ORDER BY n DESC, account_id) AS BIGINT) AS rank
        |FROM hh QUALIFY rank <= 5""".stripMargin),

    // the KMV sketch itself: k smallest distinct content hashes per
    // source — fnv64(text) then xxhash64, both replayed step-for-step
    "q_kmv_doc_sketch" -> {
      val (steps, hCol) = SqlHash.xxh64LongSteps("__f", "42", "__kd")
      val inner = SqlHash.applySteps(
        s"SELECT source, (${SqlHash.fnv1a64("text", "__ka", "__kb")}) AS __f FROM documents",
        steps)
      s"""WITH hh AS (SELECT source, ${SqlHash.toSigned(hCol)} AS h FROM ($inner)),
         |nn AS (SELECT source, CAST(count(*) AS BIGINT) AS n_rows FROM documents GROUP BY 1),
         |dd AS (SELECT DISTINCT source, h FROM hh),
         |rr AS (SELECT source, h, CAST(row_number() OVER (PARTITION BY source ORDER BY h) AS BIGINT) AS rank FROM dd)
         |SELECT rr.source, nn.n_rows, rr.rank, rr.h
         |FROM rr JOIN nn USING (source) WHERE rank <= 64""".stripMargin
    },

    "q_kmv_doc_overlap" -> ("WITH " + sqlKmvOverlap(
      s"SELECT source, (${SqlHash.fnv1a64("text", "__oa", "__ob")}) AS __f FROM documents",
      k = 64, p = "__ko")),

    // 3-gram vocabulary overlap: the same estimator over word-shingle
    // fingerprints (saturated path — every source holds >> 256 grams)
    "q_kmv_gram_overlap" -> {
      val gramCtes =
        """d0 AS (SELECT source, string_split(text, ' ') AS w FROM documents),
          |gg AS (SELECT DISTINCT source, w[i] || ' ' || w[i+1] || ' ' || w[i+2] AS gram
          |       FROM (SELECT source, w, unnest(generate_series(1, greatest(len(w) - 2, 0))) AS i FROM d0)),
          |""".stripMargin
      "WITH " + gramCtes + sqlKmvOverlap(
        s"SELECT source, (${SqlHash.fnv1a64("gram", "__ga", "__gb")}) AS __f FROM gg",
        k = 256, p = "__kg")
    },

    // exact-n stratified sample: xxhash64(doc_id) priority replayed, rank
    // within language
    "q_stratified_sample" -> {
      val (steps, hCol) = SqlHash.xxh64LongSteps("doc_id::HUGEINT", "42", "__sp")
      val inner = SqlHash.applySteps("SELECT lang, doc_id FROM documents", steps)
      s"""WITH hh AS (SELECT lang, doc_id, ${SqlHash.toSigned(hCol)} AS priority FROM ($inner)),
         |rr AS (SELECT lang, doc_id, priority,
         |         CAST(row_number() OVER (PARTITION BY lang ORDER BY priority, doc_id) AS BIGINT) AS sample_rank
         |       FROM hh)
         |SELECT lang, doc_id, priority, sample_rank FROM rr WHERE sample_rank <= 5""".stripMargin
    },

    // deterministic training shuffle: pmod shard + in-shard hash rank
    "q_corpus_shuffle" -> {
      val (steps, hCol) = SqlHash.xxh64LongSteps("doc_id::HUGEINT", "42", "__cs")
      val inner = SqlHash.applySteps("SELECT doc_id FROM documents", steps)
      s"""WITH hh AS (SELECT doc_id, ${SqlHash.toSigned(hCol)} AS priority FROM ($inner)),
         |ss AS (SELECT doc_id, priority, ((priority % 32) + 32) % 32 AS shard FROM hh)
         |SELECT doc_id, priority, shard,
         |  CAST(row_number() OVER (PARTITION BY shard ORDER BY priority, doc_id) - 1 AS BIGINT) AS pos
         |FROM ss""".stripMargin
    },

    "q_profile" -> graft.ops.Profile.oracleSql(ProfileSchema, "lineitem"),

    "q_stats_summary" -> (P +
      """SELECT txn_type,
        |  round(median(amount), 4) AS med_amount,
        |  round(avg(amount), 4) AS avg_amount,
        |  round(stddev_samp(amount), 4) AS std_amount,
        |  CAST(count(*) AS BIGINT) AS n_txns
        |FROM completed GROUP BY 1""".stripMargin),

    "q_corpus_curate" ->
      (sqlCurateCtes("TRUE") + """
        |SELECT q.doc_id, l.pred_lang, q.quality_score, q.n_tokens
        |FROM qual q
        |JOIN lang l USING (doc_id)
        |JOIN keep k ON q.doc_id = k.doc_id
        |WHERE l.pred_lang = 'en' AND q.quality_score >= 0.5""".stripMargin),

    // the full composition a pipeline ships: curation gates, minus
    // bloom-decontaminated docs (== exact overlap, see
    // q_decontaminate_bloom), intersect the mixture-sampled keeps
    // (xxh64 replay), with the deterministic split attached.
    // MATERIALIZED pins the step-pipeline and contamination CTEs —
    // inlined into the four-way join tree, DuckDB's optimizer stalls
    // rewriting the giant generated expressions
    "q_training_manifest" -> {
      val (steps, hCol) = SqlHash.xxh64LongSteps("doc_id::HUGEINT", "42", "__mx")
      val hInner = SqlHash.applySteps(
        "SELECT doc_id FROM documents WHERE doc_id % 50 <> 0", steps)
      sqlCurateCtes("doc_id % 50 <> 0") + s""",
        |g AS (SELECT doc_id, unnest(list_distinct(
        |        CASE WHEN len(w) >= 8
        |             THEN [w[i] || ' ' || w[i+1] || ' ' || w[i+2] || ' ' || w[i+3] || ' ' || w[i+4] || ' ' || w[i+5] || ' ' || w[i+6] || ' ' || w[i+7]
        |                   for i in generate_series(1, len(w) - 7)]
        |             ELSE [] END)) AS gram
        |      FROM (SELECT doc_id, string_split(text, ' ') AS w FROM documents)),
        |contaminated AS MATERIALIZED (SELECT DISTINCT tr.doc_id
        |                 FROM (SELECT * FROM g WHERE doc_id % 50 <> 0) tr
        |                 JOIN (SELECT DISTINCT gram FROM g WHERE doc_id % 50 = 0) ev USING (gram)),
        |h AS MATERIALIZED (SELECT doc_id, ${SqlHash.toSigned(hCol)} AS hv FROM ($hInner))
        |SELECT q.doc_id, l.pred_lang, q.quality_score, q.n_tokens,
        |  CASE WHEN q.doc_id % 100 < 90 THEN 'train'
        |       WHEN q.doc_id % 100 < 95 THEN 'val'
        |       ELSE 'test' END AS split
        |FROM qual q
        |JOIN lang l USING (doc_id)
        |JOIN keep k ON q.doc_id = k.doc_id
        |JOIN h USING (doc_id)
        |WHERE l.pred_lang = 'en' AND q.quality_score >= 0.5
        |  AND q.doc_id NOT IN (SELECT doc_id FROM contaminated)
        |  AND ((hv % 2) + 2) % 2 < 1""".stripMargin
    },

    "q_embed_quantize" ->
      """WITH e AS (
        |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
        |), s AS (
        |  SELECT vec_id, v,
        |         list_min(v) AS vmin, list_max(v) AS vmax,
        |         greatest((list_max(v) - list_min(v)) / 256.0, 1e-12) AS scale
        |  FROM e
        |), q AS (
        |  SELECT vec_id, v, vmin, vmax, scale,
        |         list_transform(v, x -> least(CAST(floor((x - vmin) / scale) AS BIGINT), 255)) AS q
        |  FROM s
        |)
        |SELECT vec_id, vmin, vmax,
        |  CAST(list_sum(q) AS BIGINT) AS q_sum,
        |  CAST(list_max(q) AS BIGINT) AS q_max,
        |  list_max(list_transform(list_zip(v, q),
        |    p -> abs(p[1] - (vmin + (p[2] + 0.5) * scale)))) AS max_abs_err
        |FROM q""".stripMargin,

    // global-grid quantize + exact integer outer-product sums: the
    // min/max scalar, the floor-grid, and every gram_sum replayed
    "q_embed_gram" ->
      """WITH e AS (SELECT CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
        |s AS (SELECT CAST(min(list_min(v)) AS DOUBLE) AS mn,
        |             CAST(max(list_max(v)) AS DOUBLE) AS mx FROM e),
        |q AS MATERIALIZED (
        |  SELECT list_transform(e.v, x ->
        |           least(CAST(floor((x - s.mn) / ((s.mx - s.mn) / 1024.0)) AS BIGINT), 1023)) AS g
        |  FROM e CROSS JOIN s),
        |n AS (SELECT CAST(count(*) AS BIGINT) AS n_rows FROM e),
        |ij AS (SELECT i.i, j.j FROM range(0, 64) i(i), range(0, 64) j(j)
        |       WHERE j.j >= i.i)
        |SELECT ij.i, ij.j,
        |       CAST(sum(g[ij.i + 1] * g[ij.j + 1]) AS BIGINT) AS gram_sum,
        |       n.n_rows
        |FROM q CROSS JOIN ij CROSS JOIN n
        |GROUP BY 1, 2, 4""".stripMargin,

    // the hash-derived sign matrix replayed entry-for-entry, then the
    // exact integer projection sums
    "q_embed_project" -> {
      val (steps, hCol) = SqlHash.xxh64LongSteps("idx", "42", "__jp")
      val inner = SqlHash.applySteps(
        "SELECT rj.j, ri.i, CAST(rj.j * 64 + ri.i AS HUGEINT) AS idx" +
          " FROM range(0, 16) rj(j), range(0, 64) ri(i)", steps)
      s"""WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
         |s AS (SELECT CAST(min(list_min(v)) AS DOUBLE) AS mn,
         |             CAST(max(list_max(v)) AS DOUBLE) AS mx FROM e),
         |q AS MATERIALIZED (
         |  SELECT vec_id, list_transform(e.v, x ->
         |           least(CAST(floor((x - s.mn) / ((s.mx - s.mn) / 1024.0)) AS BIGINT), 1023)) AS g
         |  FROM e CROSS JOIN s),
         |r AS MATERIALIZED (
         |  SELECT j, i, 1 - 2 * (((${SqlHash.toSigned(hCol)} % 2) + 2) % 2) AS sgn
         |  FROM ($inner)),
         |u AS (SELECT vec_id, unnest(g) AS gv, generate_subscripts(g, 1) - 1 AS i FROM q)
         |SELECT u.vec_id, r.j, CAST(sum(r.sgn * u.gv) AS BIGINT) AS v
         |FROM u JOIN r USING (i)
         |GROUP BY 1, 2""".stripMargin
    },

    // byte-level over the BINARY fixture: DuckDB cannot slice BLOBs, but
    // hex() is byte-exact — one payload byte = two hex chars, so a
    // 64-byte frame is a 128-char hex substring and the 0x2E pad is a
    // '2E' string rpad. Verifies non-ASCII bytes exactly.
    "q_multimodal_frames" ->
      s"""WITH m AS (
         |  SELECT doc_id, hex(payload) AS hx, octet_length(payload) AS n
         |  FROM read_parquet('$MediaFixturePath')
         |), f AS (
         |  SELECT doc_id, hx,
         |         unnest(generate_series(1, CAST(ceil(n / 64.0) AS INT))) AS i
         |  FROM m
         |)
         |SELECT doc_id,
         |  CAST(i - 1 AS BIGINT) AS frame_idx,
         |  substring(hx, (i - 1) * 128 + 1, 128) AS frame_hex,
         |  CAST(length(substring(hx, (i - 1) * 128 + 1, 128)) / 2 AS BIGINT) AS frame_len,
         |  rpad(substring(hx, (i - 1) * 128 + 1, 128), 128, '2E') AS frame_resized_hex
         |FROM f""".stripMargin,

    // exhaustive ground truth for the candidates-then-verify composition:
    // all-pairs frame-set Jaccard over the same bounded window — equality
    // holds because MultimodalSpec asserts every exact pair sits within
    // the signature hamming radius (candidates ⊇ truth; verify is exact)
    "q_multimodal_near_dup" ->
      s"""WITH f AS (
         |  SELECT doc_id, text,
         |         unnest(generate_series(1, CAST(ceil(length(text) / 64.0) AS INT))) AS i
         |  FROM documents WHERE doc_id < $JaccardMaxDocId
         |), fr AS (
         |  SELECT DISTINCT doc_id, substring(text, (i - 1) * 64 + 1, 64) AS frame FROM f
         |), sz AS (
         |  SELECT doc_id, count(*) AS n_sh FROM fr GROUP BY 1
         |), inter AS (
         |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, CAST(count(*) AS BIGINT) AS n_inter
         |  FROM fr a JOIN fr b ON a.frame = b.frame AND a.doc_id < b.doc_id GROUP BY 1, 2
         |), j AS (
         |  SELECT doc_a, doc_b, n_inter,
         |    floor((n_inter * 1.0 / (x.n_sh + y.n_sh - n_inter)) * 1000000.0) / 1000000.0 AS jaccard
         |  FROM inter JOIN sz x ON doc_a = x.doc_id JOIN sz y ON doc_b = y.doc_id
         |)
         |SELECT doc_a, doc_b, n_inter, jaccard FROM j
         |WHERE jaccard >= $MultimodalDupThreshold""".stripMargin,

    // near-dup pairs -> recursive transitive closure -> most-frames keeper
    // election -> full-corpus labeling (the q_dedup_keep_best pattern over
    // frame-set jaccard instead of n-gram jaccard)
    "q_multimodal_manifest" ->
      s"""WITH RECURSIVE f AS (
         |  SELECT doc_id, text,
         |         unnest(generate_series(1, CAST(ceil(length(text) / 64.0) AS INT))) AS i
         |  FROM documents WHERE doc_id < $JaccardMaxDocId
         |), fr AS (
         |  SELECT DISTINCT doc_id, substring(text, (i - 1) * 64 + 1, 64) AS frame FROM f
         |), sz AS (
         |  SELECT doc_id, count(*) AS n_sh FROM fr GROUP BY 1
         |), inter AS (
         |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, CAST(count(*) AS BIGINT) AS n_inter
         |  FROM fr a JOIN fr b ON a.frame = b.frame AND a.doc_id < b.doc_id GROUP BY 1, 2
         |), j AS (
         |  SELECT doc_a, doc_b, n_inter,
         |    floor((n_inter * 1.0 / (x.n_sh + y.n_sh - n_inter)) * 1000000.0) / 1000000.0 AS jaccard
         |  FROM inter JOIN sz x ON doc_a = x.doc_id JOIN sz y ON doc_b = y.doc_id
         |), jp AS (
         |  SELECT doc_a, doc_b FROM j WHERE jaccard >= $MultimodalDupThreshold
         |), edges AS (
         |  SELECT doc_a AS s, doc_b AS d FROM jp
         |  UNION ALL SELECT doc_b, doc_a FROM jp
         |), reach(node, r) AS (
         |  SELECT s, s FROM (SELECT DISTINCT s FROM edges) t
         |  UNION
         |  SELECT re.node, e.d FROM reach re JOIN edges e ON e.s = re.r
         |), clus AS (
         |  SELECT node AS doc_id, min(r) AS cluster_id FROM reach GROUP BY node
         |), keep AS (
         |  SELECT c.doc_id, c.cluster_id,
         |    first_value(c.doc_id) OVER (PARTITION BY c.cluster_id
         |      ORDER BY s.n_sh DESC, c.doc_id) AS keep_doc_id
         |  FROM clus c JOIN sz s USING (doc_id)
         |)
         |SELECT di.doc_id,
         |  coalesce(k.cluster_id, di.doc_id) AS cluster_id,
         |  coalesce(k.keep_doc_id, di.doc_id) AS keep_doc_id,
         |  di.doc_id = coalesce(k.keep_doc_id, di.doc_id) AS is_kept
         |FROM (SELECT doc_id FROM documents WHERE doc_id < $JaccardMaxDocId) di
         |LEFT JOIN keep k USING (doc_id)""".stripMargin,

    "q_interval_join" -> (P +
      """SELECT f.txn_id, f.account_id, CAST(count(e.ctxn) AS BIGINT) AS n_nearby_credits
        |FROM (SELECT txn_id, account_id, event_time_us FROM completed
        |      WHERE txn_type IN ('DEBIT','TRANSFER_OUT','FEE','LOAN_REPAYMENT')) f
        |LEFT JOIN (SELECT txn_id AS ctxn, account_id AS cacct, event_time_us AS cts
        |           FROM upserts WHERE txn_type IN ('CREDIT','TRANSFER_IN','INTEREST')) e
        |  ON f.account_id = e.cacct
        |  AND e.cts >= f.event_time_us - 3600000000
        |  AND e.cts <= f.event_time_us + 3600000000
        |GROUP BY 1, 2""".stripMargin),

    "q_pivot_currency" -> (P +
      """SELECT txn_type,
        |  coalesce(round(sum(CASE WHEN currency = 'USD' THEN amount END), 2), 0.0) AS usd_total,
        |  coalesce(round(sum(CASE WHEN currency = 'NGN' THEN amount END), 2), 0.0) AS ngn_total,
        |  coalesce(round(sum(CASE WHEN currency = 'EUR' THEN amount END), 2), 0.0) AS eur_total
        |FROM completed GROUP BY 1""".stripMargin),

    // byte-level over the BINARY fixture (non-ASCII verified exactly):
    // per-byte values decoded from the hex string — byte i is the hex
    // digit pair at 2i-1, so the oracle never trusts any text decoding
    "q_multimodal_meta" ->
      s"""WITH h AS (
         |  SELECT doc_id, width, height, format, hex(payload) AS hx,
         |         octet_length(payload) AS n
         |  FROM read_parquet('$MediaFixturePath')
         |), b AS (
         |  SELECT doc_id, width, height, format, n,
         |    coalesce(list_sum([
         |      (strpos('0123456789ABCDEF', substring(hx, 2 * i - 1, 1)) - 1) * 16
         |      + strpos('0123456789ABCDEF', substring(hx, 2 * i, 1)) - 1
         |      for i in generate_series(1, n)]), 0) AS byte_sum
         |  FROM h
         |)
         |SELECT doc_id, CAST(n AS BIGINT) AS byte_len, width, height, format,
         |  floor(byte_sum * 1.0 / greatest(n, 1) * 10000.0) / 10000.0 AS avg_byte,
         |  CAST(byte_sum % 256 AS BIGINT) AS checksum
         |FROM b""".stripMargin,

    "q_dedup_manifest" ->
      (sqlJaccardCtes.replace("WITH ", "WITH RECURSIVE ") + s""",
         |edges AS (SELECT doc_a AS s, doc_b AS d FROM jpairs
         |          UNION ALL SELECT doc_b, doc_a FROM jpairs),
         |reach(node, r) AS (
         |  SELECT s, s FROM (SELECT DISTINCT s FROM edges) t
         |  UNION
         |  SELECT re.node, e.d FROM reach re JOIN edges e ON e.s = re.r
         |),
         |clus AS (SELECT node AS doc_id, min(r) AS cluster_id FROM reach GROUP BY node)
         |SELECT di.doc_id, coalesce(c.cluster_id, di.doc_id) AS cluster_id,
         |       di.doc_id = coalesce(c.cluster_id, di.doc_id) AS is_kept
         |FROM (SELECT doc_id FROM documents WHERE doc_id < $JaccardMaxDocId) di
         |LEFT JOIN clus c USING (doc_id)""".stripMargin),

    "q_dedup_keep_best" ->
      (sqlJaccardCtes.replace("WITH ", "WITH RECURSIVE ") + s""",
         |edges AS (SELECT doc_a AS s, doc_b AS d FROM jpairs
         |          UNION ALL SELECT doc_b, doc_a FROM jpairs),
         |reach(node, r) AS (
         |  SELECT s, s FROM (SELECT DISTINCT s FROM edges) t
         |  UNION
         |  SELECT re.node, e.d FROM reach re JOIN edges e ON e.s = re.r
         |),
         |clus AS (SELECT node AS doc_id, min(r) AS cluster_id FROM reach GROUP BY node),
         |mem AS (SELECT di.doc_id, CAST(length(di.text) AS BIGINT) AS len,
         |          coalesce(c.cluster_id, di.doc_id) AS cluster_id
         |        FROM (SELECT doc_id, text FROM documents WHERE doc_id < $JaccardMaxDocId) di
         |        LEFT JOIN clus c USING (doc_id)),
         |k AS (SELECT cluster_id, doc_id AS keep_doc_id FROM (
         |        SELECT *, row_number() OVER (PARTITION BY cluster_id
         |                    ORDER BY len DESC, doc_id) AS rn FROM mem)
         |      WHERE rn = 1)
         |SELECT m.doc_id, m.cluster_id, k.keep_doc_id,
         |       m.doc_id = k.keep_doc_id AS is_kept
         |FROM mem m JOIN k USING (cluster_id)""".stripMargin),

    "q_boilerplate_strip" ->
      s"""WITH d0 AS (
         |  SELECT doc_id, CASE WHEN doc_id % 5 < 4
         |    THEN '© graft corp all rights reserved footer v' || (doc_id % 2) || ' ' || text
         |    ELSE text END AS text
         |  FROM documents
         |), d AS (SELECT doc_id, string_split(text, ' ') AS w FROM d0),
         |segs AS (
         |  SELECT doc_id, i AS seg_idx,
         |         array_to_string(list_slice(w, (i - 1) * 8 + 1, i * 8), ' ') AS segment
         |  FROM (SELECT doc_id, w,
         |          unnest(generate_series(1, CAST(ceil(len(w) / 8.0) AS BIGINT))) AS i
         |        FROM d)
         |), freq AS (
         |  SELECT segment FROM (
         |    SELECT segment, count(DISTINCT doc_id) AS nd FROM segs GROUP BY 1)
         |  WHERE nd >= $BoilerplateMinDocs
         |), kept AS (
         |  SELECT s.doc_id, s.seg_idx, s.segment, f.segment IS NULL AS keep
         |  FROM segs s LEFT JOIN freq f USING (segment)
         |)
         |SELECT doc_id, CAST(count(*) AS BIGINT) AS n_segs,
         |  CAST(sum(CASE WHEN keep THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
         |  coalesce(string_agg(CASE WHEN keep THEN segment END, ' ' ORDER BY seg_idx), '') AS clean_text
         |FROM kept GROUP BY doc_id""".stripMargin,

    "q_importance_resample" ->
      """WITH tgt AS (SELECT unnest(string_split(text, ' ')) AS term
        |             FROM documents WHERE doc_id % 50 = 0),
        |raw AS (SELECT doc_id, unnest(string_split(text, ' ')) AS term
        |        FROM documents WHERE doc_id % 50 <> 0),
        |tv AS (SELECT term, count(*) AS t_n FROM tgt GROUP BY 1),
        |rv AS (SELECT term, count(*) AS r_n FROM raw GROUP BY 1),
        |v AS (SELECT coalesce(tv.term, rv.term) AS term,
        |             coalesce(t_n, 0) AS t_n, coalesce(r_n, 0) AS r_n
        |      FROM tv FULL JOIN rv ON tv.term = rv.term),
        |tot AS (SELECT sum(t_n) AS tt, sum(r_n) AS rt, count(*) AS vn FROM v),
        |sc AS (
        |  SELECT doc_id, CAST(count(*) AS BIGINT) AS n_tokens,
        |    CAST(sum(CAST(floor(ln((v.t_n + 1) / CAST(tot.tt + tot.vn AS DOUBLE)) * 1000000.0) AS BIGINT)
        |           - CAST(floor(ln((v.r_n + 1) / CAST(tot.rt + tot.vn AS DOUBLE)) * 1000000.0) AS BIGINT)) AS BIGINT)
        |      AS importance_micro
        |  FROM raw JOIN v USING (term), tot
        |  GROUP BY doc_id
        |)
        |SELECT * FROM sc WHERE importance_micro > 0""".stripMargin,

    "q_curriculum_bins" ->
      (sqlCurateCtes("TRUE") +
        """
          |SELECT q.doc_id, l.pred_lang, q.quality_score,
          |  CAST(ntile(10) OVER (PARTITION BY l.pred_lang
          |         ORDER BY q.quality_score DESC, q.doc_id) AS BIGINT) AS curriculum_bin
          |FROM qual q JOIN lang l USING (doc_id)""".stripMargin),

    "q_token_budget" ->
      (sqlCurateCtes("TRUE") +
        """
          |SELECT * FROM (
          |  SELECT q.doc_id, l.pred_lang, q.quality_score, q.n_tokens,
          |    CAST(sum(q.n_tokens) OVER (PARTITION BY l.pred_lang
          |           ORDER BY q.quality_score DESC, q.doc_id
          |           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum_tokens
          |  FROM qual q JOIN lang l USING (doc_id))
          |WHERE cum_tokens <= 5000""".stripMargin),

    "q_source_mix" ->
      """SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
        |  CAST(sum(len(string_split(text, ' '))) AS BIGINT) AS total_ws_tokens,
        |  CAST(sum(length(text)) AS BIGINT) AS total_chars,
        |  CAST(count(DISTINCT lower(trim(text))) AS BIGINT) AS n_unique_texts
        |FROM documents GROUP BY 1""".stripMargin,

    "q_label_centroids" ->
      """WITH e AS (SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
        |s AS (SELECT vec_id, label, v, list_min(v) AS vmin,
        |        greatest((list_max(v) - list_min(v)) / 256.0, 1e-12) AS scale FROM e),
        |c AS (SELECT label, i - 1 AS dim,
        |        least(CAST(floor((v[i] - vmin) / scale) AS BIGINT), 255) AS code
        |      FROM (SELECT label, vmin, scale, v,
        |              unnest(generate_series(1, len(v))) AS i FROM s))
        |SELECT CAST(label AS BIGINT) AS label, CAST(dim AS BIGINT) AS dim,
        |  CAST(sum(code) AS BIGINT) AS sum_q, CAST(count(*) AS BIGINT) AS n_vecs
        |FROM c GROUP BY 1, 2""".stripMargin,

    "q_large_orders" ->
      s"""WITH big AS (
         |  SELECT l_orderkey, CAST(sum(l_quantity) AS BIGINT) AS total_qty
         |  FROM lineitem GROUP BY 1 HAVING sum(l_quantity) > $LargeOrderQty
         |)
         |SELECT c_name, o_custkey AS custkey, o_orderkey AS orderkey,
         |       epoch_ms(o_orderdate) AS orderdate_ms,
         |       o_totalprice AS totalprice, total_qty
         |FROM orders JOIN big ON o_orderkey = l_orderkey
         |JOIN customer ON o_custkey = c_custkey
         |ORDER BY totalprice DESC, orderkey LIMIT 100""".stripMargin,
  )
}
