package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

import graft.cdc.EnvelopeOps
import graft.ops.{Enrich, Notify, Predicates, Windows}

/** The reference's five stream pipelines recomposed as Structured Streaming
  * (reference `topology/ABBankTopology.java:149-153` fans one shared parsed
  * stream into five subgraphs; here one parsed streaming DataFrame feeds
  * five `writeStream` sinks, or `foreachBatch` shares a single scan).
  *
  * Semantics choices (SURVEY §2.5): event time = envelope record time
  * (`event_ts`); NO grace -> `withWatermark(_, "0 seconds")`; emission on
  * window close (append mode) — the documented intent, matching the batch
  * operators exactly, rather than the DSL's literal eager update-mode
  * emission. Each transform returns an unbound DataFrame so callers pick
  * sink + output mode (tests use memory/complete, production uses
  * kafka/append with checkpointing).
  *
  * Scale posture: state lives in the Structured Streaming state store
  * (RocksDB provider at scale via
  * `spark.sql.streaming.stateStore.providerClass`); all stateful stages key
  * by account_id, so state partitions with the shuffle and no executor sees
  * more than its key range. The reconciliation state is ONE double per
  * account — O(#accounts) total, trivially partitionable.
  */
object Pipelines {

  /** Streaming analog of the shared pre-pipeline: file-source stream of raw
    * events -> synthesized envelope -> parsed typed txns + `event_ts`.
    * (In production the source would be `format("kafka")` + `from_avro`;
    * the envelope synthesis/parse and everything downstream is identical.) */
  def parsedStream(spark: SparkSession, sfDir: String): DataFrame =
    parsedStreamFromPath(spark, sfDir, glob = "events.parquet")

  /** Same, over a monitored directory (the file source requires a directory
    * base path; `glob` selects files within it). `maxFilesPerTrigger` splits
    * the input into multiple micro-batches (used by tests to advance the
    * watermark across batches). */
  def parsedStreamFromPath(spark: SparkSession, dir: String, glob: String = "*",
      maxFilesPerTrigger: Option[Int] = None): DataFrame = {
    val raw = rawEventStream(spark, dir, glob, maxFilesPerTrigger)
    val parsed = EnvelopeOps.parsedTransactions(graft.Tables.deriveEventTime(raw))
    EnvelopeOps.upsertsOnly(parsed)
      .withColumn("event_ts", timestamp_micros(col("event_time_us")))
  }

  /** The ONE events file-stream reader both parsed/event streams share.
    *
    * The streaming file source demands a declared schema, and the events
    * corpus has shipped with two physical encodings for `ts` (parquet
    * TIMESTAMP micros → TIMESTAMP[_NTZ]; parquet TIMESTAMP(NANOS) →
    * LongType under `nanosAsLong`). Hard-coding either declaration
    * mislabels the other — declaring `ts BIGINT` over a micros corpus
    * reads the int64 micros as "nanos" and every derived event time lands
    * 1000× too small (VERDICT r7: six streaming-equivalence failures, one
    * root cause). So: probe the on-disk footer with a metadata-only batch
    * read and declare exactly what the files carry; NO rename —
    * [[graft.Tables.deriveEventTime]] branches on the probed type, and its
    * magnitude guard would reject a mislabeled long anyway. */
  private[streaming] def rawEventStream(spark: SparkSession, dir: String,
      glob: String, maxFilesPerTrigger: Option[Int]): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val onDisk = spark.read.option("pathGlobFilter", glob).parquet(dir).schema
    val reader = spark.readStream
      .schema(onDisk)
      .option("pathGlobFilter", glob)
    maxFilesPerTrigger
      .fold(reader)(n => reader.option("maxFilesPerTrigger", n.toString))
      .parquet(dir)
  }

  /** The parsed stream over the REAL wire shape: a monitored directory of
    * parquet files carrying the (key BINARY, value BINARY) column pair a
    * Kafka source yields, value = Confluent-framed Avro envelope frames —
    * decoded scan-stage by [[graft.cdc.AvroWire.decodeAvroEnvelope]] and
    * parsed identically to [[parsedStream]]. The production swap is ONE
    * line: `format("kafka")` (+ registry `from_avro`) replaces the file
    * reader; everything downstream of the value column is this code.
    * Malformed frames become null envelopes and are dropped by the
    * upserts filter — the reference's LogAndContinue contract. */
  def parsedWireStreamAvro(spark: SparkSession, dir: String, glob: String = "*",
      maxFilesPerTrigger: Option[Int] = None): DataFrame = {
    val reader = spark.readStream.schema("key BINARY, value BINARY")
      .option("pathGlobFilter", glob)
    val withOpt = maxFilesPerTrigger
      .fold(reader)(n => reader.option("maxFilesPerTrigger", n.toString))
    // decode is the transport-blind shared chain — byte-identical to what
    // the kafka branch of [[Sources.cdcSource]] runs
    Sources.parsedFromWire(withOpt.parquet(dir))
  }

  /** Raw-event stream (same derived columns as the [[graft.Tables.events]]
    * batch loader) — for consumers of the event stream itself
    * (funnel/retention analytics) rather than the synthesized CDC
    * envelopes. */
  def eventStreamFromPath(spark: SparkSession, dir: String, glob: String = "*",
      maxFilesPerTrigger: Option[Int] = None): DataFrame =
    graft.Tables.deriveEventTime(
      rawEventStream(spark, dir, glob, maxFilesPerTrigger))

  private def completed(parsed: DataFrame): DataFrame =
    parsed.filter(Predicates.isCompleted(col("status")))

  /** Pipeline 1 — high-value alerts: stateless filter + stream-static
    * broadcast join + notification JSON (reference `:215-245`). */
  def highValueAlerts(parsed: DataFrame, customerDim: DataFrame,
      threshold: Double): DataFrame = {
    val hv = completed(parsed)
      .filter(Predicates.isHighValue(col("amount"), threshold))
    val fmt = Notify.formatAmount(col("amount"), col("currency"))
    Enrich.withDim(hv, customerDim.withColumnRenamed("c_custkey", "account_id"),
        "account_id")
      .select(col("txn_id"), col("account_id"),
        Notify.notificationJson(
          idPrefix = "HV", notificationType = "HIGH_VALUE_ALERT",
          severity = "HIGH", channel = "BOTH",
          entityId = col("txn_id"), accountId = col("account_id"),
          subject = lit("High value transaction alert"),
          body = concat(lit("Account "), col("account_id"), lit(" spent "), fmt),
          metadata = map(lit("amount"), fmt, lit("currency"), col("currency"),
            lit("accountName"), coalesce(col("c_name"), lit("N/A")))
        ).as("notification"))
  }

  /** Pipeline 1 against the CDC-BUILT accounts KTable — the reference's
    * actual enrichment data flow (`topology/ABBankTopology.java:233-240`
    * joins the high-value stream to the KTable built from the ACCOUNTS CDC
    * topic at `:107-125`). The dimension side is
    * [[graft.cdc.DimensionCdc.accountsDim]]: envelope versions through the
    * wire serde, latest-by-key, tombstones applied. In a micro-batch
    * engine the KTable is re-read per batch (stream-static join semantics);
    * a continuously-maintained variant upserts via [[latestTable]]-style
    * update mode. Deleted accounts fall back to "N/A" like missing
    * KV-store rows (`:252-253`). */
  def highValueCdcEnriched(parsed: DataFrame, customerTable: DataFrame,
      threshold: Double): DataFrame = {
    val hv = completed(parsed)
      .filter(Predicates.isHighValue(col("amount"), threshold))
    Enrich.withDim(hv, graft.cdc.DimensionCdc.accountsDim(customerTable),
        "account_id")
      .select(col("txn_id"), col("account_id"), col("amount"),
        coalesce(col("account_number"), lit("N/A")).as("account_number"),
        coalesce(col("customer_id"), lit(-1L)).as("customer_id"),
        coalesce(col("balance"), lit(-1.0)).as("account_balance"),
        coalesce(col("account_status"), lit("N/A")).as("account_status"))
  }

  /** Pipeline 2 — velocity fraud: tumbling count per account
    * (reference `:160-207`).
    *
    * `grace` is the Kafka Streams `TimeWindows.ofSizeAndGrace` knob as a
    * Spark watermark delay: a late row is still folded into its window
    * while `max(event time) - grace` has not passed the window end, and
    * dropped after — exactly the reference's grace contract. The
    * reference topology runs `ofSizeWithNoGrace` (`:175`), the default
    * here; GraceSpec pins both sides of the matrix for all three window
    * shapes. */
  def velocityAlerts(parsed: DataFrame, windowSec: Int, minTxns: Long,
      grace: String = "0 seconds"): DataFrame =
    Windows.velocityCount(
      parsed.withWatermark("event_ts", grace),
      windowSec, minTxns, tsCol = col("event_ts"))

  /** Hopping-window velocity (the reference's dead VelocityState intent —
    * see [[graft.ops.Windows.velocityHopping]]): identical streaming
    * semantics to [[velocityAlerts]], each event just lands in
    * window/advance overlapping windows, all closed by the same
    * watermark. */
  def velocityHoppingAlerts(parsed: DataFrame, windowSec: Int,
      advanceSec: Int, minTxns: Long,
      grace: String = "0 seconds"): DataFrame =
    Windows.velocityHopping(
      parsed.withWatermark("event_ts", grace),
      windowSec, advanceSec, minTxns, tsCol = col("event_ts"))

  /** Pipeline 4 — daily spend: 24 h tumbling debit sum (reference
    * `:373-426`). `grace` as in [[velocityAlerts]]. */
  def dailySpendAlerts(parsed: DataFrame, threshold: Double,
      grace: String = "0 seconds"): DataFrame =
    Windows.dailySpend(
      completed(parsed).filter(Predicates.isDebit(col("txn_type")))
        .withWatermark("event_ts", grace),
      threshold, tsCol = col("event_ts"))

  /** Pipeline 5 — dormancy: session windows per account (reference
    * `:327-369`). `grace` is `SessionWindows.ofInactivityGapAndGrace`'s
    * second argument: a late row within grace still merges into (or
    * extends) its session; outside grace it is dropped. */
  def dormancyAlerts(parsed: DataFrame, gap: String,
      grace: String = "0 seconds"): DataFrame =
    Windows.dormancySessions(
      parsed.withWatermark("event_ts", grace),
      gap, tsCol = col("event_ts"))

  /** Streaming KTable maintenance: the continuously-updated latest row per
    * account (reference `topology/ABBankTopology.java:119-123` — the KTable
    * the enrichment join reads). An update-mode aggregation with `max_by`:
    * each micro-batch re-emits only the keys whose latest version changed;
    * state = one narrow struct per key. Run with `outputMode("update")`
    * into an upsert-capable sink (or complete mode for a full snapshot). */
  def latestTable(parsed: DataFrame): DataFrame =
    graft.ops.LatestByKey.latestByMaxBy(
        parsed.select("account_id", "txn_id", "amount",
          "event_time_ms", "event_time_us"),
        Seq("account_id"), struct(col("event_time_us"), col("txn_id")))
      .select(col("account_id"), col("txn_id").as("last_txn_id"),
        col("amount").as("last_amount"),
        col("event_time_ms").as("last_event_time_ms"))

  /** Streaming ACCOUNTS KTable maintenance — the reference's accounts
    * KTable is CONTINUOUSLY maintained from its CDC topic
    * (`ABBankTopology.java:107-125` `.toTable(...)`); here the changelog
    * arrives as a stream (file source standing in for Kafka), travels the
    * same wire serde, and the latest version per account is maintained as
    * an update-mode `max_by` aggregation — state is one narrow struct per
    * account, re-emitting only keys whose latest version changed each
    * micro-batch. Tombstones surface with `op = 'd'` so an upsert sink
    * can delete the key (filtering them BEFORE the aggregation would
    * resurrect the previous version instead — Kafka Streams' actual
    * tombstone semantics need the delete to win the argmax). */
  def accountsDimStream(spark: SparkSession, customerDir: String,
      glob: String = "customer.parquet"): DataFrame = {
    val raw = spark.readStream
      .schema("c_custkey BIGINT, c_name STRING, c_nationkey INT, c_acctbal DOUBLE, c_mktsegment STRING")
      .option("pathGlobFilter", glob)
      .parquet(customerDir)
    // the ONE wire path (synthesize -> encode -> decode -> parse) shared
    // with the batch KTable — all lazy transforms, so it lifts to the
    // streaming frame unchanged
    val changelog = graft.cdc.DimensionCdc.accountChangelog(raw)
      .filter(col("account_id").isNotNull)
    graft.ops.LatestByKey.latestByMaxBy(changelog,
      Seq("account_id"), struct(col("cdc_ts_us")))
  }

  /** Streaming CUSTOMERS KTable maintenance — the second continuously-
    * maintained KTable of the reference topology
    * (`ABBankTopology.java:128-144`), same wire path and update-mode
    * argmax as [[accountsDimStream]]. */
  def customersDimStream(spark: SparkSession, customerDir: String,
      glob: String = "customer.parquet"): DataFrame = {
    val raw = spark.readStream
      .schema("c_custkey BIGINT, c_name STRING, c_nationkey INT, c_acctbal DOUBLE, c_mktsegment STRING")
      .option("pathGlobFilter", glob)
      .parquet(customerDir)
    val changelog = graft.cdc.DimensionCdc.customerChangelog(raw)
      .filter(col("customer_id").isNotNull)
    graft.ops.LatestByKey.latestByMaxBy(changelog,
      Seq("customer_id"), struct(col("cdc_ts_us")))
  }

  /** Pipeline 1's declared TWO-HOP form with BOTH dimensions continuously
    * maintained — the reference declares the customers hop
    * (`README.md:44`, comment `ABBankTopology.java:212-213`) but never
    * wires it; here it runs: each high-value micro-batch looks up the
    * CURRENT accounts snapshot, then the CURRENT customers snapshot, both
    * [[DimStore]]s fed by their own changelog-stream queries
    * ([[accountsDimStream]] / [[customersDimStream]] → [[DimStore.maintain]]).
    * Re-opening the snapshot inside `foreachBatch` is exactly a Kafka
    * Streams store lookup at batch granularity — a plain stream-static
    * join would pin the file listing at query start and never see dim
    * updates. Missing keys (including tombstoned dims) take the
    * KV-store-miss fallbacks (`:252-253`); a not-yet-committed store
    * behaves as empty. Both dims broadcast — the transaction stream never
    * shuffles. Output columns match the batch `q_enrich_cdc_two_hop`.
    *
    * Delivery is at-least-once, so each micro-batch lands in its own
    * `batch=<id>` subdirectory with overwrite semantics: a replayed batch
    * rewrites its directory instead of appending duplicates — the same
    * batch-id-named idempotence discipline as [[DimStore.upsert]]. Readers
    * open `outDir` with partition discovery (the `batch` column is
    * droppable metadata). */
  def highValueTwoHopCdcStream(parsed: DataFrame, accountsStore: String,
      customersStore: String, threshold: Double, outDir: String,
      checkpoint: String): org.apache.spark.sql.streaming.StreamingQuery = {
    val hv = completed(parsed)
      .filter(Predicates.isHighValue(col("amount"), threshold))
    hv.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val s = batch.sparkSession
        val acct = DimStore.read(s, accountsStore)
          .map(_.select("account_id", "customer_id", "account_number"))
          .getOrElse(s.sql(
            """SELECT CAST(NULL AS BIGINT) account_id,
              |  CAST(NULL AS BIGINT) customer_id,
              |  CAST(NULL AS STRING) account_number WHERE false""".stripMargin))
        val cust = DimStore.read(s, customersStore)
          .map(_.select("customer_id", "first_name", "last_name", "email",
            "segment"))
          .getOrElse(s.sql(
            """SELECT CAST(NULL AS BIGINT) customer_id,
              |  CAST(NULL AS STRING) first_name,
              |  CAST(NULL AS STRING) last_name, CAST(NULL AS STRING) email,
              |  CAST(NULL AS STRING) segment WHERE false""".stripMargin))
        batch.join(broadcast(acct), Seq("account_id"), "left")
          .join(broadcast(cust), Seq("customer_id"), "left")
          .select(col("txn_id"), col("account_id"), col("amount"),
            coalesce(col("account_number"), lit("N/A")).as("account_number"),
            when(col("first_name").isNull, lit("N/A"))
              .otherwise(graft.ops.Notify.fullName(col("first_name"),
                col("last_name"))).as("customer_name"),
            coalesce(col("email"), lit("N/A")).as("email"),
            coalesce(col("segment"), lit("N/A")).as("segment"))
          .write.mode("overwrite").parquet(s"$outDir/batch=$batchId")
      }
      .start()
  }

  /** CDC delivery is at-least-once (reference
    * `config/ABBankStreamsConfig.java:85-86`): replays duplicate the same
    * transaction id. This stage makes downstream processing
    * effectively-once: duplicates within the watermark horizon are dropped,
    * and the per-id state is expired BY the watermark
    * (`dropDuplicatesWithinWatermark`) — bounded state, unlike a plain
    * streaming dropDuplicates which retains every id forever. */
  def dedupedStream(parsed: DataFrame, watermarkDelay: String = "1 hour"): DataFrame =
    parsed
      .withWatermark("event_ts", watermarkDelay)
      .dropDuplicatesWithinWatermark("txn_id")

  /** Topological fan-out (reference `topology/ABBankTopology.java:149-153`:
    * one shared parsed stream feeds five subgraphs). For stateless sinks
    * the Spark analog is ONE streaming query whose `foreachBatch` persists
    * each micro-batch and writes every output from that single scan —
    * the source is read once per batch, not once per sink. Stateful
    * pipelines (windows/reconcile) keep their own queries so each owns its
    * state store. */
  def fanOutStateless(parsed: DataFrame, customerDim: DataFrame,
      threshold: Double, outBase: String,
      checkpoint: Option[String] = None)
      : org.apache.spark.sql.streaming.StreamingQuery = {
    // Idempotent on retry/restart: each sink writes the micro-batch into
    // its batch_id=<id> partition with dynamic overwrite, so replaying a
    // batch replaces rather than duplicates (the batchId is the retry key)
    def writeIdempotent(df: DataFrame, id: Long, path: String): Unit =
      df.withColumn("batch_id", lit(id))
        .write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy("batch_id")
        .parquet(path)
    val writer = parsed.writeStream
      .outputMode("append")
      .foreachBatch { (batch: DataFrame, id: Long) =>
        batch.persist()
        try {
          writeIdempotent(batch, id, s"$outBase/parsed")
          // F9: uuid + generatedAt stamped only here at the sink — the
          // transform output stays deterministic (reference
          // `model/NotificationEvent.java:70-71`)
          writeIdempotent(
            Notify.dispatchStamp(highValueAlerts(batch, customerDim, threshold)),
            id, s"$outBase/hv_alerts")
          writeIdempotent(batch.filter(Predicates.isDebit(col("txn_type"))),
            id, s"$outBase/debits")
        } finally batch.unpersist()
        ()
      }
    checkpoint.fold(writer)(c => writer.option("checkpointLocation", c)).start()
  }

  /** Stream–stream windowed join (absent from the reference — Kafka
    * Streams would need a windowed KStream join; SURVEY §2.3): debit and
    * credit streams of the same account matched within ±`toleranceSec`.
    * Watermarks on both sides + the time-bound join condition let Spark
    * expire join state; inner matches emit as they arrive. */
  def creditDebitPairs(debits: DataFrame, credits: DataFrame,
      toleranceSec: Long): DataFrame = {
    val d = debits
      .select(col("txn_id"), col("account_id"), col("event_ts"))
      .withWatermark("event_ts", "0 seconds")
    val c = credits
      .select(col("txn_id").as("credit_txn_id"),
        col("account_id").as("credit_account_id"),
        col("event_ts").as("credit_ts"))
      .withWatermark("credit_ts", "0 seconds")
    d.join(c,
      col("account_id") === col("credit_account_id") &&
        col("credit_ts") >= col("event_ts") - expr(s"INTERVAL $toleranceSec SECONDS") &&
        col("credit_ts") <= col("event_ts") + expr(s"INTERVAL $toleranceSec SECONDS"))
      .select("txn_id", "credit_txn_id", "account_id")
  }

  /** Stream–stream LEFT OUTER windowed join: every debit emits — matched
    * debits as they pair, unmatched debits with null credit columns once
    * the watermark passes their join window and Spark can prove no credit
    * will arrive (state for the expired window is freed at the same
    * moment). The completeness-checking variant of [[creditDebitPairs]]:
    * "which debits had NO nearby credit" is itself the alert condition.
    *
    * Watermark caveat: the global watermark is the MIN across both sides'
    * watermark operators, each fed by its own filtered branch — if one
    * branch's filter starves (e.g. no credits arrive), the unmatched
    * results stall with it. Keep both filters broad enough that each side
    * keeps observing event time, or set a nonzero delay policy. */
  def creditDebitPairsOuter(debits: DataFrame, credits: DataFrame,
      toleranceSec: Long): DataFrame = {
    val d = debits
      .select(col("txn_id"), col("account_id"), col("event_ts"))
      .withWatermark("event_ts", "0 seconds")
    val c = credits
      .select(col("txn_id").as("credit_txn_id"),
        col("account_id").as("credit_account_id"),
        col("event_ts").as("credit_ts"))
      .withWatermark("credit_ts", "0 seconds")
    d.join(c,
      col("account_id") === col("credit_account_id") &&
        col("credit_ts") >= col("event_ts") - expr(s"INTERVAL $toleranceSec SECONDS") &&
        col("credit_ts") <= col("event_ts") + expr(s"INTERVAL $toleranceSec SECONDS"),
      "left_outer")
      .select("txn_id", "credit_txn_id", "account_id")
  }

  /** Pipeline 5 alternative — dormancy with state + event-time timers
    * (see [[DormancyDetector]]): alerts fire exactly when the watermark
    * closes a single-event session. */
  def dormancyTimeoutAlerts(spark: SparkSession, parsed: DataFrame,
      gapUs: Long): Dataset[DormancyAlert] = {
    import spark.implicits._
    parsed
      .withWatermark("event_ts", "0 seconds")
      .selectExpr("txn_id", "account_id", "event_time_us", "event_ts")
      .as[DormTxn]
      .groupByKey(_.account_id)
      .flatMapGroupsWithState(OutputMode.Append,
        GroupStateTimeout.EventTimeTimeout)(DormancyDetector.process(gapUs))
  }

  /** Rolling trailing-window spend as true incremental state — the
    * streaming twin of [[graft.ops.Windows.rollingSpend]]. Each account's
    * GroupState holds only its IN-WINDOW (event_time_us, kobo) pairs, so
    * per-key state is bounded by the window's transaction count, not by
    * history; every arriving transaction emits with its own trailing
    * frame. Same-timestamp transactions arriving in one batch share their
    * frame — the batch RANGE window's peer semantics. The equivalence
    * contract is the same in-order feed as [[reconcileAlerts]]
    * (time-ordered files; a frame can't retroactively absorb a peer that
    * arrives after its row was emitted). */
  def rollingSpendAlerts(spark: SparkSession, parsed: DataFrame,
      windowUs: Long = 86400L * 1000000L): Dataset[RollRow] = {
    import spark.implicits._
    completed(parsed)
      .filter(Predicates.isDebit(col("txn_type")))
      .withWatermark("event_ts", "0 seconds")
      .select(col("txn_id"), col("account_id"), col("event_time_us"),
        round(col("amount") * 100).cast("long").as("kobo"), col("event_ts"))
      .as[RollTxn]
      .groupByKey(_.account_id)
      .flatMapGroupsWithState(OutputMode.Append,
        GroupStateTimeout.EventTimeTimeout)(
        RollingSpendTracker.process(windowUs))
  }

  /** Time-weighted average balance as incremental per-account state — the
    * streaming twin of [[graft.ops.EventAnalytics.timeWeightedBalance]]:
    * every arriving transaction extends the account's holding-interval
    * numerator Σ balance·Δt and emits the account's LIVE TWAB (the
    * continuous-accrual view a billing engine consumes; the final
    * emission per account equals the batch operator). State is O(1) per
    * account — five scalars — and lives for the account's lifetime by
    * definition (the span is first..last transaction), so there is no
    * timeout; the numerator is carried as an exact decimal STRING
    * (kobo·micros exceeds a long and a default BigDecimal encoder's
    * 20 integer digits). Same sign-separated truncating division as the
    * batch form — integer-exact, no float anywhere. */
  def twabUpdates(spark: SparkSession, parsed: DataFrame): Dataset[TwabRow] = {
    import spark.implicits._
    val signed = when(Predicates.isDebit(col("txn_type")),
        -expr("CAST(round(amount * 100) AS BIGINT)"))
      .otherwise(expr("CAST(round(amount * 100) AS BIGINT)"))
    completed(parsed)
      .withWatermark("event_ts", "0 seconds")
      .select(col("txn_id"), col("account_id"), col("event_time_us"),
        signed.as("kobo"), col("event_ts"))
      .as[TwabTxn]
      .groupByKey(_.account_id)
      .flatMapGroupsWithState(OutputMode.Append,
        GroupStateTimeout.NoTimeout)(TwabTracker.process)
  }

  /** Session concurrency as DAY-SHARDED incremental state + merge-on-read
    * — the streaming twin of
    * [[graft.ops.EventAnalytics.sessionConcurrencyDaily]], shaped like the
    * batch two-pass prefix scan rather than a single global counter: a
    * cumulative-GLOBAL output cannot be keyed by any data column, and one
    * all-events key would serialize the whole stream through one state
    * partition (the streaming mirror of the one-task window the batch
    * operator exists to avoid). So:
    *
    *   1. this stage keys by DAY: each day's tracker scans its own ±1
    *      boundaries in order, maintaining (local running, local max,
    *      net delta) RELATIVE to the day's start — O(1) state per day,
    *      parallel across days, emitting a refined [[ConcurrencyPartial]]
    *      per day per batch (last emission per day = the sealed partial);
    *   2. [[mergeConcurrency]] completes the global curve AT READ TIME:
    *      day d's offset is the net-delta sum of all prior days — a
    *      day-cardinality table (thousands of rows at any corpus size),
    *      so the merge is model-sized, exactly like the batch scan's
    *      driver offset table.
    *
    * Feed contract (fail-loud in the tracker): boundaries arrive in
    * (ts_ms, delta) order per day — ends before starts at equal ts, the
    * batch operator's tie rule — with equal-ts pairs never split across
    * batches out of order. */
  def concurrencyPartials(spark: SparkSession,
      boundaries: DataFrame): Dataset[ConcurrencyPartial] = {
    import spark.implicits._
    boundaries
      .select(col("ts_ms").cast("long").as("ts_ms"),
        col("delta").cast("long").as("delta"),
        timestamp_millis(col("ts_ms")).as("event_ts"))
      .withWatermark("event_ts", "0 seconds")
      .as[BoundaryEvent]
      .groupByKey(e => Math.floorDiv(e.ts_ms, 86400000L))
      .flatMapGroupsWithState(OutputMode.Append,
        GroupStateTimeout.NoTimeout)(ConcurrencyTracker.process)
  }

  /** Merge-on-read completion of [[concurrencyPartials]]: lift each day's
    * local max by the cumulative net delta of all PRIOR days. Input is
    * one sealed partial per day — day-cardinality, model-sized — so the
    * single ordered window here is over thousands of rows by
    * construction, not the event stream (the same "driver-offset"
    * footprint as the batch scan's per-partition totals). */
  def mergeConcurrency(partials: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.orderBy(col("day"))
      .rowsBetween(Window.unboundedPreceding, -1)
    partials
      .withColumn("__offset", coalesce(sum(col("net_delta")).over(w), lit(0L)))
      .select(col("day"),
        (col("__offset") + col("local_max")).as("max_concurrent"),
        col("n_boundaries"))
  }

  /** Funnel conversion as incremental state + event-time timers — the
    * streaming twin of [[graft.ops.EventAnalytics.clickToPurchase]].
    * Pending clicks wait in GroupState; a purchase resolves every pending
    * click it strictly follows within the horizon (emitted immediately);
    * under the in-order feed contract, ANY later event of the same user
    * seals clicks whose horizon it has passed (no purchase can now
    * arrive for them), and an event-time timer at (earliest pending
    * click + horizon) expires the rest when the watermark passes — the
    * same state+timers pattern as [[DormancyDetector]]. Per-key state is
    * bounded by the horizon's click count. */
  def funnelAlerts(spark: SparkSession, events: DataFrame,
      horizonUs: Long = 3600L * 1000000L): Dataset[FunnelRow] = {
    import spark.implicits._
    events
      .withWatermark("event_ts", "0 seconds")
      .selectExpr("event_id", "user_id", "ts_us", "event_type", "event_ts")
      .as[FunnelEvent]
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append,
        GroupStateTimeout.EventTimeTimeout)(FunnelTracker.process(horizonUs))
  }

  /** 3-step sequence pattern as incremental state + event-time timers —
    * the streaming twin of [[graft.ops.EventAnalytics.threeStepPattern]]
    * (CEP: click → view → purchase, each hop strictly later within the
    * horizon of the previous step). Stage-1 state holds clicks awaiting
    * their view; a matching view promotes them to stage-2 (awaiting
    * purchase); a purchase resolves stage-2 entries immediately; under
    * the in-order feed contract any later same-user event seals entries
    * whose hop horizon it has passed, and an event-time timer at the
    * earliest pending horizon expires the rest when the watermark
    * passes. Per-key state is bounded by the horizon's event count. */
  def pattern3Alerts(spark: SparkSession, events: DataFrame,
      horizonUs: Long = 3600L * 1000000L): Dataset[Pattern3Row] = {
    import spark.implicits._
    patternKAlerts(spark, events, Seq("click", "view", "purchase"), horizonUs)
      .map(r => Pattern3Row(r.event_id, r.user_id, r.ts_us,
        r.matched_us.lift(1), r.matched_us.lift(2), r.completed))
  }

  /** k-step sequence pattern as incremental state + event-time timers —
    * the streaming twin of [[graft.ops.EventAnalytics.kStepPattern]] (the
    * 3-step machine generalized: stage index IS the matched-prefix
    * length). A pending chain at prefix length i awaits the first
    * `steps(i)` event strictly later than and within the horizon of its
    * LAST matched event; a matching arrival claims every such chain
    * (in-order processing makes "first after" local, mirroring the batch
    * frame-min); any later same-user event — or the event-time timer at
    * the earliest pending horizon — seals chains whose hop window has
    * passed, emitting the partial prefix. Per-key state is bounded by
    * the horizon's event count × (k−1) stages. */
  def patternKAlerts(spark: SparkSession, events: DataFrame,
      steps: Seq[String],
      horizonUs: Long = 3600L * 1000000L): Dataset[PatternKRow] = {
    import spark.implicits._
    require(steps.size >= 2 && steps.distinct.size == steps.size,
      "pattern needs >= 2 distinct step types")
    events
      .withWatermark("event_ts", "0 seconds")
      .selectExpr("event_id", "user_id", "ts_us", "event_type", "event_ts")
      .as[FunnelEvent]
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append,
        GroupStateTimeout.EventTimeTimeout)(
        PatternKTracker.process(steps, horizonUs))
  }

  /** Pipeline 3 — balance reconciliation: true incremental per-key state via
    * `flatMapGroupsWithState` (the streaming twin of
    * [[graft.ops.Reconcile]]; reference
    * `topology/BalanceReconciliationProcessor.java:42-152`). */
  /** Live per-key EWMA recency scores — the streaming twin of
    * [[graft.ops.EventAnalytics.ewmaRecency]] via [[EwmaTracker]].
    * Input: (key, ts_us, seq, amount_cents). State: k entries per key. */
  def ewmaUpdates(spark: SparkSession, rows: DataFrame, k: Int = 8)
      : Dataset[EwmaRow] = {
    import spark.implicits._
    rows.select(col("key").cast("long"), col("ts_us").cast("long"),
        col("seq").cast("long"), col("amount_cents").cast("long"),
        timestamp_micros(col("ts_us")).as("event_ts"))
      .withWatermark("event_ts", "0 seconds")
      .as[EwmaTxn]
      .groupByKey(_.key)
      .flatMapGroupsWithState(OutputMode.Append,
        GroupStateTimeout.NoTimeout)(EwmaTracker.process(k))
  }

  def reconcileAlerts(spark: SparkSession, parsed: DataFrame): Dataset[ReconRow] = {
    import spark.implicits._
    completed(parsed)
      .selectExpr("txn_id", "account_id", "amount", "txn_type",
        "event_time_us", "event_time_ms")
      .as[ReconTxn]
      .groupByKey(_.account_id)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout)(
        Reconciler.process)
  }
}

/** Dormancy alert emitted when a session CLOSES having had exactly one
  * event — the reference's documented intent (README:73-80), which its
  * eager DSL emission only approximates (SURVEY §2.5). */
case class DormancyAlert(account_id: Long, session_start_ms: Long,
    n_events: Long)

/** Per-account session state for the timeout-based dormancy detector. */
case class SessionState(startUs: Long, lastUs: Long, n: Long)

/** Input row for the dormancy detector — carries the watermarked
  * `event_ts` column through the typed projection (dropping it would
  * detach the watermark from the stateful operator). */
case class DormTxn(txn_id: Long, account_id: Long, event_time_us: Long,
    event_ts: java.sql.Timestamp)

/** Timeout-driven dormancy: sessions are tracked in `GroupState` and the
  * alert fires from the EVENT-TIME TIMEOUT callback when the watermark
  * passes (last event + gap) — i.e., exactly at session close, with state
  * freed on firing. The third stateful-processing pattern after the
  * running-balance scan and watermarked windows: state + timers.
  */
object DormancyDetector {
  import org.apache.spark.sql.streaming.GroupState

  def process(gapUs: Long)(accountId: Long, events: Iterator[DormTxn],
      state: GroupState[SessionState]): Iterator[DormancyAlert] = {
    if (events.isEmpty && state.hasTimedOut) {
      // session closed: alert iff it contained exactly one event
      val s = state.get
      state.remove()
      if (s.n == 1) Iterator.single(DormancyAlert(accountId, s.startUs / 1000, s.n))
      else Iterator.empty
    } else {
      val sorted = events.toSeq.sortBy(e => (e.event_time_us, e.txn_id))
      var closed = List.empty[DormancyAlert]
      var cur = state.getOption
      sorted.foreach { e =>
        cur match {
          case Some(s) if e.event_time_us - s.lastUs < gapUs =>
            cur = Some(SessionState(s.startUs, e.event_time_us, s.n + 1))
          case Some(s) =>
            // gap exceeded within the batch: the old session closed
            if (s.n == 1) closed ::= DormancyAlert(accountId, s.startUs / 1000, s.n)
            cur = Some(SessionState(e.event_time_us, e.event_time_us, 1))
          case None =>
            cur = Some(SessionState(e.event_time_us, e.event_time_us, 1))
        }
      }
      cur.foreach { s =>
        state.update(s)
        // ceil to millis: floor would fire up to 1ms early (and below
        // the watermark for sub-ms gaps, crashing the query)
        state.setTimeoutTimestamp((s.lastUs + gapUs + 999) / 1000)
      }
      closed.reverseIterator
    }
  }
}

/** Input row for the stateful reconciler. */
case class ReconTxn(txn_id: Long, account_id: Long, amount: Double,
    txn_type: String, event_time_us: Long, event_time_ms: Long)

/** Output row — same shape as the batch [[graft.ops.Reconcile]] operator. */
case class ReconRow(txn_id: Long, account_id: Long, event_time_ms: Long,
    balance_before: Double, balance_after: Double,
    stored_balance: Option[Double], discrepancy: Double,
    recon_status: String, severity: String)

/** Per-account sequential reconciliation with one Double of state — the
  * streaming analog of the reference's RocksDB `account-balance-store`.
  * Events are ordered (event_time_us, txn_id) within each micro-batch;
  * cross-batch order follows stream arrival, as in the reference. */
/** Input row for the funnel tracker — `event_ts` carries the watermark
  * through the typed projection (same note as [[DormTxn]]). */
case class FunnelEvent(event_id: Long, user_id: Long, ts_us: Long,
    event_type: String, event_ts: java.sql.Timestamp)

/** Output row — same shape as the batch funnel operator. */
case class FunnelRow(event_id: Long, user_id: Long, ts_us: Long,
    next_purchase_us: Option[Long], converted: Boolean)

/** Stateful funnel tracker: pending (click_id, click_ts) pairs per user.
  * Resolution order inside a batch is event-time order; a purchase at
  * exactly a click's timestamp never converts it (strictly-after, the
  * batch RANGE frame's 1-µs-following bound). */
object FunnelTracker {
  def process(horizonUs: Long)(userId: Long, events: Iterator[FunnelEvent],
      state: GroupState[Seq[(Long, Long)]]): Iterator[FunnelRow] = {
    var pending = state.getOption.getOrElse(Seq.empty)
    val out = scala.collection.mutable.ArrayBuffer.empty[FunnelRow]
    def seal(beforeUs: Long): Unit = {
      val (expired, live) = pending.partition(_._2 + horizonUs < beforeUs)
      expired.foreach { case (id, ts) =>
        out += FunnelRow(id, userId, ts, None, converted = false)
      }
      pending = live
    }
    if (events.isEmpty && state.hasTimedOut) {
      // the watermark passed the earliest pending horizon
      seal(state.getCurrentWatermarkMs() * 1000)
    } else {
      events.toSeq.sortBy(e => (e.ts_us, e.event_id)).foreach { e =>
        // in-order contract: this event's timestamp proves no purchase
        // can still arrive for clicks whose horizon lies strictly before
        seal(e.ts_us)
        if (e.event_type == "purchase") {
          val (hit, rest) = pending.partition(c =>
            c._2 < e.ts_us && e.ts_us <= c._2 + horizonUs)
          hit.foreach { case (id, ts) =>
            out += FunnelRow(id, userId, ts, Some(e.ts_us), converted = true)
          }
          pending = rest
        } else if (e.event_type == "click") {
          pending :+= ((e.event_id, e.ts_us))
        }
      }
    }
    if (pending.isEmpty) state.remove()
    else {
      state.update(pending)
      // ceil to millis (see DormancyDetector note)
      state.setTimeoutTimestamp(
        (pending.map(_._2).min + horizonUs + 999) / 1000)
    }
    out.iterator
  }
}

/** Output row — same shape as the batch 3-step pattern operator. */
case class Pattern3Row(event_id: Long, user_id: Long, ts_us: Long,
    next_view_us: Option[Long], purchase_us: Option[Long], completed: Boolean)

/** One pending partial chain: the `steps(0)` event id plus every matched
  * timestamp so far (head = the step-0 event's own ts). The chain's stage
  * is `matched_us.length` — it awaits `steps(matched_us.length)`. */
case class PendingChain(event_id: Long, matched_us: Seq[Long])

/** k-step output row: `matched_us` is the matched step-timestamp PREFIX
  * (head = the step-0 event itself); a stalled chain's prefix stops at
  * the last matched hop. `completed` ⟺ `matched_us.length == k`. */
case class PatternKRow(event_id: Long, user_id: Long, ts_us: Long,
    matched_us: Seq[Long], completed: Boolean)

/** Stateful k-step pattern tracker — the 3-step machine with the stage
  * number generalized into the matched-prefix length. In-order processing
  * makes "first `steps(i)` after" local: a pending chain's matching event
  * is the first in-window arrival of its awaited type (any earlier one
  * would already have claimed it), mirroring the batch operator's
  * frame-min. Strictly-after at every hop — an event at exactly the
  * previous step's timestamp never matches (the batch RANGE frame's
  * 1-µs-following bound). */
object PatternKTracker {
  def process(steps: Seq[String], horizonUs: Long)(userId: Long,
      events: Iterator[FunnelEvent],
      state: GroupState[Seq[PendingChain]]): Iterator[PatternKRow] = {
    val k = steps.size
    var pending = state.getOption.getOrElse(Seq.empty)
    val out = scala.collection.mutable.ArrayBuffer.empty[PatternKRow]
    def seal(beforeUs: Long): Unit = {
      val (expired, live) = pending.partition(
        _.matched_us.last + horizonUs < beforeUs)
      expired.foreach { c =>
        out += PatternKRow(c.event_id, userId, c.matched_us.head,
          c.matched_us, completed = false)
      }
      pending = live
    }
    if (events.isEmpty && state.hasTimedOut) {
      seal(state.getCurrentWatermarkMs() * 1000)
    } else {
      events.toSeq.sortBy(e => (e.ts_us, e.event_id)).foreach { e =>
        seal(e.ts_us)
        val stage = steps.indexOf(e.event_type)
        if (stage == 0) {
          pending :+= PendingChain(e.event_id, Seq(e.ts_us))
        } else if (stage > 0) {
          val (hit, rest) = pending.partition(c =>
            c.matched_us.length == stage &&
              c.matched_us.last < e.ts_us &&
              e.ts_us <= c.matched_us.last + horizonUs)
          val advanced = hit.map(c =>
            c.copy(matched_us = c.matched_us :+ e.ts_us))
          if (stage == k - 1) {
            advanced.foreach { c =>
              out += PatternKRow(c.event_id, userId, c.matched_us.head,
                c.matched_us, completed = true)
            }
            pending = rest
          } else {
            pending = rest ++ advanced
          }
        }
      }
    }
    if (pending.isEmpty) state.remove()
    else {
      state.update(pending)
      val earliest = pending.map(_.matched_us.last).min
      // ceil to millis (see DormancyDetector note); floored at watermark+1
      // so an already-overdue key times out next batch instead of throwing
      state.setTimeoutTimestamp(math.max(
        (earliest + horizonUs + 999) / 1000,
        state.getCurrentWatermarkMs() + 1))
    }
    out.iterator
  }
}

/** Input/output rows for the rolling-spend tracker — `event_ts` carries
  * the watermark through the typed projection (same note as [[DormTxn]]). */
case class RollTxn(txn_id: Long, account_id: Long, event_time_us: Long,
    kobo: Long, event_ts: java.sql.Timestamp)
case class RollRow(txn_id: Long, account_id: Long, event_time_us: Long,
    rolling_spend_kobo: Long, rolling_n_txns: Long)

/** Stateful trailing-window tracker: the buffer is pruned to the window
  * width on every batch (entries older than `max ts − window` can never
  * appear in a future frame under the in-order contract), so state size
  * is O(window txn count) per account. Integer-kobo money keeps every
  * emitted sum exact. */
object RollingSpendTracker {
  def process(windowUs: Long)(accountId: Long, events: Iterator[RollTxn],
      state: GroupState[Seq[(Long, Long)]]): Iterator[RollRow] = {
    if (events.isEmpty && state.hasTimedOut) {
      // the watermark passed (newest buffered ts + window): no in-order
      // arrival can ever include a buffered entry in its frame again, and
      // an idle account's empty frame is reconstructible — free the state
      // (without this, total state grows monotonically with the number of
      // accounts ever seen, even though each key's buffer is bounded)
      state.remove()
      return Iterator.empty
    }
    var buf = state.getOption.getOrElse(Seq.empty)
    val out = scala.collection.mutable.ArrayBuffer.empty[RollRow]
    events.toSeq.sortBy(e => (e.event_time_us, e.txn_id))
      .groupBy(_.event_time_us).toSeq.sortBy(_._1)
      .foreach { case (ts, peers) =>
        // peers enter the buffer BEFORE any of them emits, so equal-ts
        // rows see each other — the RANGE frame's peer semantics
        buf = buf.filter(_._1 > ts - windowUs - 1) ++
          peers.map(e => (e.event_time_us, e.kobo))
        val frame = buf.filter(p => p._1 >= ts - windowUs && p._1 <= ts)
        val total = frame.map(_._2).sum
        val n = frame.size.toLong
        peers.foreach(e => out += RollRow(e.txn_id, accountId, ts, total, n))
      }
    val maxTs = buf.foldLeft(Long.MinValue)((m, p) => math.max(m, p._1))
    state.update(buf.filter(_._1 >= maxTs - windowUs))
    // ceil to millis (see DormancyDetector note); floored at watermark+1
    // because a key whose newest event is already > window behind the
    // global watermark must still time out in the NEXT batch, not throw
    state.setTimeoutTimestamp(math.max(
      (maxTs + windowUs + 999) / 1000,
      state.getCurrentWatermarkMs() + 1))
    out.iterator
  }
}

/** Input row for the TWAB tracker (`kobo` arrives pre-signed). */
case class TwabTxn(txn_id: Long, account_id: Long, event_time_us: Long,
    kobo: Long, event_ts: java.sql.Timestamp)

/** Live TWAB emission — same shape as the batch operator's output row. */
case class TwabRow(account_id: Long, n_intervals: Long, span_us: Long,
    twab_micro_kobo: Long)

/** Per-account TWAB state: span endpoints, the current balance, the
  * interval count, and the exact Σ balance·Δt numerator as a decimal
  * string (exceeds a long; a stringly-typed exact integer survives any
  * magnitude and any encoder). */
case class TwabState(first_us: Long, last_us: Long, bal_kobo: Long,
    n_intervals: Long, num: String)

/** Stateful TWAB tracker: each event closes the holding interval the
  * previous balance occupied (equal-timestamp consecutive events close a
  * zero-length interval — counted, worth 0, exactly the batch lead()
  * semantics under the unique-txn_id ordering) and emits the account's
  * live TWAB once a positive span exists. */
object TwabTracker {
  private def twabMicro(num: BigInt, spanUs: Long): Long = {
    // truncation toward zero on the separated magnitude == floor on the
    // non-negative operand — matches the batch `div` and DuckDB `//`
    val q = (num.abs * 1000000) / spanUs
    (if (num.signum < 0) -q else q).toLong
  }
  def process(accountId: Long, events: Iterator[TwabTxn],
      state: GroupState[TwabState]): Iterator[TwabRow] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[TwabRow]
    var st = state.getOption.orNull
    events.toSeq.sortBy(e => (e.event_time_us, e.txn_id)).foreach { e =>
      if (st == null) {
        st = TwabState(e.event_time_us, e.event_time_us, e.kobo, 0L, "0")
      } else {
        val dt = e.event_time_us - st.last_us
        // fail-loud in-order contract: per-batch sort only orders WITHIN
        // a micro-batch, so an event landing in a later batch with an
        // earlier event time would make dt negative and silently corrupt
        // the exact numerator. The source contract (file source replays
        // in path order; the harness feeds time-ordered batches) makes
        // this unreachable — seal it the way the pattern trackers do.
        require(dt >= 0, s"TWAB account $accountId: out-of-order event " +
          s"${e.txn_id} at ${e.event_time_us}us behind sealed ${st.last_us}us")
        val num = BigInt(st.num) + BigInt(st.bal_kobo) * dt
        st = TwabState(st.first_us, e.event_time_us, st.bal_kobo + e.kobo,
          st.n_intervals + 1, num.toString)
        val span = st.last_us - st.first_us
        if (span > 0)
          out += TwabRow(accountId, st.n_intervals, span,
            twabMicro(num, span))
      }
    }
    if (st != null) state.update(st)
    out.iterator
  }
}

/** One ±1 session boundary (start = +1, end = −1) with its event time. */
case class BoundaryEvent(ts_ms: Long, delta: Long,
    event_ts: java.sql.Timestamp)

/** One day's sealed (or in-progress) concurrency shard: the day's local
  * running max and net delta RELATIVE to day start, plus the boundary
  * count (monotone — the last emission per day is the final partial). */
case class ConcurrencyPartial(day: Long, local_max: Long, net_delta: Long,
    n_boundaries: Long)

/** Per-day tracker state: local running level, local max, boundary count,
  * and the last (ts, delta) seen — the in-order seal. */
case class ConcurrencyState(running: Long, local_max: Long,
    n_boundaries: Long, last_ts: Long, last_delta: Long)

/** Stateful per-day concurrency tracker: scans the day's boundaries in
  * (ts_ms, delta) order (ends before starts at equal ts — the batch tie
  * rule) and keeps the day-local running level and max. Fail-loud on
  * out-of-order arrivals across batches, the TwabTracker discipline. */
object ConcurrencyTracker {
  def process(day: Long, events: Iterator[BoundaryEvent],
      state: GroupState[ConcurrencyState]): Iterator[ConcurrencyPartial] = {
    var st = state.getOption.getOrElse(
      ConcurrencyState(0L, Long.MinValue, 0L, Long.MinValue, Long.MinValue))
    events.toSeq.sortBy(e => (e.ts_ms, e.delta)).foreach { e =>
      require(e.ts_ms > st.last_ts ||
          (e.ts_ms == st.last_ts && e.delta >= st.last_delta),
        s"concurrency day $day: boundary (${e.ts_ms}, ${e.delta}) behind " +
          s"sealed (${st.last_ts}, ${st.last_delta}) — out-of-order feed")
      val r = st.running + e.delta
      st = ConcurrencyState(r, math.max(st.local_max, r),
        st.n_boundaries + 1, e.ts_ms, e.delta)
    }
    state.update(st)
    if (st.n_boundaries > 0)
      Iterator.single(ConcurrencyPartial(day, st.local_max, st.running,
        st.n_boundaries))
    else Iterator.empty
  }
}

object Reconciler {

  private def round2(x: Double): Double =
    BigDecimal(x).setScale(2, BigDecimal.RoundingMode.HALF_UP).toDouble + 0.0

  def process(accountId: Long, events: Iterator[ReconTxn],
      state: GroupState[Double]): Iterator[ReconRow] = {
    val sorted = events.toSeq.sortBy(e => (e.event_time_us, e.txn_id))
    var stored: Option[Double] = state.getOption
    val out = sorted.map { e =>
      val signed = if (graft.ops.Predicates.debitTypes.contains(e.txn_type)) -e.amount else e.amount
      val after = round2(stored.getOrElse(0.0) + signed)
      val before = round2(after - signed + (if (e.txn_id % 97 == 0) graft.ops.Reconcile.InjectedError else 0.0))
      val disc = stored match {
        case None => 0.0
        case Some(s) => round2(math.abs(before - s))
      }
      val status =
        if (stored.isEmpty) "BOOTSTRAP"
        else if (disc > graft.ops.Reconcile.ToleranceNgn) "DISCREPANCY"
        else "BALANCE_UPDATE"
      val row = ReconRow(e.txn_id, e.account_id, e.event_time_ms,
        before, after, stored, disc, status,
        if (status == "DISCREPANCY") "HIGH" else "LOW")
      stored = Some(after)
      row
    }
    stored.foreach(state.update)
    out.iterator
  }
}

/** Input row for the EWMA tracker. */
case class EwmaTxn(key: Long, ts_us: Long, seq: Long, amount_cents: Long,
    event_ts: java.sql.Timestamp)

/** Live EWMA emission — the batch operator's output row plus the
  * triggering event's `seq` (identifies WHICH prefix the score is for;
  * the max-seq emission per key is the full-history score). */
case class EwmaRow(key: Long, seq: Long, n_recent: Long, weight_sum: Long,
    ewma_num: Long, ewma_cents: Long)

/** Stateful last-k EWMA tracker — the streaming twin of
  * [[graft.ops.EventAnalytics.ewmaRecency]]: per-key state is a ring of
  * the k most recent (ts, seq, amount) entries (O(k) scalars, lifetime
  * state like [[TwabTracker]] — the score is defined over the key's
  * whole history, so there is nothing to time out), and every arriving
  * event emits the key's LIVE recency score; the final emission per key
  * equals the batch operator. Power-of-two weights and one truncating
  * division per emission — exact integers end to end.
  *
  * Feed contract (fail-loud, the [[TwabTracker]] discipline): events
  * arrive in strictly increasing (ts_us, seq) order per key — the
  * per-batch sort orders within a batch; cross-batch regressions
  * require() out. */
object EwmaTracker {
  def process(k: Int)(key: Long, events: Iterator[EwmaTxn],
      state: GroupState[Seq[(Long, Long, Long)]]): Iterator[EwmaRow] = {
    var ring = state.getOption.getOrElse(Seq.empty) // oldest..newest
    val out = scala.collection.mutable.ArrayBuffer.empty[EwmaRow]
    events.toSeq.sortBy(e => (e.ts_us, e.seq)).foreach { e =>
      ring.lastOption.foreach { case (ts, seq, _) =>
        require(e.ts_us > ts || (e.ts_us == ts && e.seq > seq),
          s"out-of-order event for key $key: (${e.ts_us},${e.seq}) " +
            s"after ($ts,$seq) — the in-order feed contract is broken")
      }
      ring = (ring :+ ((e.ts_us, e.seq, e.amount_cents))).takeRight(k)
      val recent = ring.reverse
      val ws = recent.indices.map(j => 1L << (k - 1 - j))
      val num = recent.zip(ws).map { case ((_, _, a), w) => a * w }.sum
      out += EwmaRow(key, e.seq, recent.size.toLong, ws.sum, num,
        num / ws.sum)
    }
    state.update(ring)
    out.iterator
  }
}
