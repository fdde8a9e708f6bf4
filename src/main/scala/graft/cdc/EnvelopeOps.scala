package graft.cdc

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** CDC envelope synthesis + parsing over the `events` test table.
  *
  * The test corpus has no real Kafka/Avro feed, so the batch queries
  * synthesize the reference's Debezium-style envelope from `events` columns
  * deterministically, then parse it back with the exact conversion rules of
  * the reference (`model/TransactionEvent.java:39-64`, `util/CdcParser.java`).
  * The DuckDB oracle reproduces only the *flat output* — the nested
  * construction/parse round-trip is the Spark-side operator under test.
  *
  * Analog mapping (events -> banking):
  *   event_id -> TRANSACTION_ID, user_id -> ACCOUNT_ID, value -> AMOUNT,
  *   event_type -> TRANSACTION_TYPE {purchase->DEBIT, click->TRANSFER_OUT,
  *   error->FEE, signup->CREDIT, view->TRANSFER_IN},
  *   status = FAILED iff event_type='error' else COMPLETED,
  *   currency = {USD,NGN,EUR} by user_id % 3,
  *   op = by event_id % 10: 0->'d', 1->'u', 2->'r', else 'c'.
  */
object EnvelopeOps {

  /** TRANSACTION_TYPE from event_type (see object doc). */
  def txnType(eventType: Column): Column =
    when(eventType === "purchase", "DEBIT")
      .when(eventType === "click", "TRANSFER_OUT")
      .when(eventType === "error", "FEE")
      .when(eventType === "signup", "CREDIT")
      .otherwise("TRANSFER_IN")

  def status(eventType: Column): Column =
    when(eventType === "error", "FAILED").otherwise("COMPLETED")

  def currency(userId: Column): Column =
    when(userId % 3 === 0, "USD")
      .when(userId % 3 === 1, "NGN")
      .otherwise("EUR")

  /** CDC op code c/u/d/r derived deterministically from the id. */
  def opCode(eventId: Column): Column =
    when(eventId % 10 === 0, "d")
      .when(eventId % 10 === 1, "u")
      .when(eventId % 10 === 2, "r")
      .otherwise("c")

  /** events (from [[graft.Tables.events]]) -> one nested `envelope` column
    * shaped like [[Schemas.transactionEnvelope]]. Ids are carried as doubles
    * (the Avro wire type for Oracle NUMBER) so the parse step exercises the
    * reference's double->long conversion (`util/CdcParser.java:67-70`). */
  def synthesizeTxnEnvelope(events: DataFrame): DataFrame = {
    val after = struct(
      col("event_id").cast("double").as("TRANSACTION_ID"),
      col("user_id").cast("double").as("ACCOUNT_ID"),
      concat(lit("TXN-"), col("event_id")).as("TRANSACTION_REF"),
      txnType(col("event_type")).as("TRANSACTION_TYPE"),
      col("value").as("AMOUNT"),
      currency(col("user_id")).as("CURRENCY"),
      status(col("event_type")).as("STATUS"),
      col("ts_us").as("INITIATED_AT"),                       // MicroTimestamp
      expr("ts_us + 1000000").as("COMPLETED_AT")
    )
    events.select(
      struct(
        // typed null of the same struct shape (insert events carry no before-image)
        when(lit(false), after).as("before"),
        after.as("after"),
        struct(
          lit("3.2.0").as("version"),
          lit("oracle").as("connector"),
          lit("abbank").as("name"),
          expr("ts_us div 1000").as("ts_ms"),
          lit("ORCLCDB").as("db"),
          lit("ABBANK").as("schema"),
          lit("TRANSACTIONS").as("table"),
          col("event_id").cast("string").as("scn")
        ).as("source"),
        opCode(col("event_id")).as("op"),
        expr("ts_us div 1000").as("ts_ms"),
        col("ts_us").as("ts_us"),
        col("ts_ns").as("ts_ns")
      ).as("envelope"))
  }

  /** Envelope -> flat typed transaction row, applying the reference's
    * conversions: double id -> long, MicroTimestamp micros -> millis
    * (`model/TransactionEvent.java:87-104`). Null-safe like the reference:
    * malformed rows become nulls, never failures. */
  def parseTxnEnvelope(env: DataFrame): DataFrame =
    env.select(
      col("envelope.after.TRANSACTION_ID").cast("long").as("txn_id"),
      col("envelope.after.ACCOUNT_ID").cast("long").as("account_id"),
      col("envelope.after.TRANSACTION_REF").as("txn_ref"),
      col("envelope.after.TRANSACTION_TYPE").as("txn_type"),
      col("envelope.after.AMOUNT").as("amount"),
      coalesce(col("envelope.after.CURRENCY"), lit("NGN")).as("currency"),
      col("envelope.after.STATUS").as("status"),
      expr("envelope.after.INITIATED_AT div 1000").as("event_time_ms"),
      col("envelope.after.INITIATED_AT").as("event_time_us"),
      col("envelope.op").as("op"))

  /** P1+P2+P4 of the reference pre-pipeline: drop null envelopes, drop
    * deletes (tombstones), drop invalid account ids
    * (`topology/ABBankTopology.java:87-99`). Keeps c/u/r — snapshot reads
    * are processed like inserts (reference test `ABBankTopologyTest.java:243-250`). */
  def upsertsOnly(parsed: DataFrame): DataFrame =
    parsed
      .filter(col("txn_id").isNotNull)
      .filter(col("op") =!= "d")
      .filter(col("account_id").isNotNull && col("account_id") =!= 0)

  /** Full pre-pipeline from raw events: synthesize -> parse. Deletes kept;
    * callers needing upserts apply [[upsertsOnly]]. */
  def parsedTransactions(events: DataFrame): DataFrame =
    parseTxnEnvelope(synthesizeTxnEnvelope(events))

  /** S1 deserialization seam: a string `payload` column carrying a
    * JSON-encoded CDC envelope -> typed nested envelope struct. This is the
    * exact code shape of the production Kafka source (`format("kafka")` +
    * `from_avro(value, registrySchema)` — reference
    * `serde/AvroSerdes.java:35-59`); the container ships no spark-avro /
    * kafka connector jars, so the wire format here is JSON. Parse is
    * permissive: malformed payloads become null envelopes and are dropped by
    * [[upsertsOnly]], never failed (reference
    * `config/ABBankStreamsConfig.java:93-94` LogAndContinueExceptionHandler). */
  def decodeJsonEnvelope(payloads: DataFrame, payloadCol: String = "payload",
      schema: org.apache.spark.sql.types.StructType = Schemas.transactionEnvelope): DataFrame =
    parseFence(payloads.select(
      from_json(col(payloadCol), schema).as("envelope")), "envelope")

  /** Parse-once fence: re-projects `colName` through
    * `graft_fence` ([[graft.functions.ParseFence]] — a nondeterministic
    * identity). Catalyst substitutes deterministic projections into
    * predicates when pushing them down, so without the fence a downstream
    * key-null/tombstone filter is rewritten into a SECOND
    * (schema-pruned but still full-payload) `from_json`/wire decode per
    * row — the accounts-KTable plan carried the parse in both the Filter
    * and the Project. A nondeterministic projection is one
    * PushPredicateThroughNonJoin refuses to cross and CollapseProject
    * refuses to inline, and unlike a dummy fence COLUMN it cannot be
    * column-pruned away. Run-time cost: nothing — the expression
    * passes the child's generated code through untouched. */
  private[graft] def parseFence(df: DataFrame, colName: String): DataFrame = {
    graft.functions.GraftFunctions.register(df.sparkSession)
    df.select(df.columns.map {
      case c if c == colName => expr(s"graft_fence($c)").as(c)
      case c => col(c)
    }.toSeq: _*)
  }

  /** S2 serialization seam: envelope struct -> JSON string payload (the
    * shape of a Kafka value sink). */
  def encodeJsonEnvelope(env: DataFrame): DataFrame =
    env.select(to_json(col("envelope")).as("payload"))

  /** S2 wire shape: project any frame to the exact (key BINARY, value
    * BINARY) schema the Kafka sink requires — when the spark-sql-kafka
    * jar is present, `df.writeStream.format("kafka")` consumes this
    * unchanged (`.option("topic", ...)`); until then the same frame is a
    * byte-faithful Kafka archive under any other sink. Key = the record
    * key rendered as UTF-8 (the reference keys by account id string —
    * `ABBankTopology.java:101-103`); value = the JSON (prod: Avro)
    * payload bytes. */
  def kafkaWireFormat(df: DataFrame, keyCol: Column, valueCol: Column): DataFrame =
    df.select(
      keyCol.cast("string").cast("binary").as("key"),
      valueCol.cast("string").cast("binary").as("value"))

  /** S3 robustness: decode a payload stream AND capture the undecodable
    * payloads as a dead-letter frame. The reference only logs-and-continues
    * (`config/ABBankStreamsConfig.java:93-94`
    * LogAndContinueExceptionHandler); at scale you also KEEP the bad
    * payloads — schema-drift forensics and replay-after-fix need the
    * original bytes. One projection, two filters over it (Spark runs the
    * shared `from_json` once per sink via plan reuse; in a `foreachBatch`
    * fan-out persist the decoded batch and write both splits from it). */
  def decodeWithDeadLetter(payloads: DataFrame, payloadCol: String = "payload",
      schema: org.apache.spark.sql.types.StructType = Schemas.transactionEnvelope)
      : (DataFrame, DataFrame) = {
    // PERMISSIVE from_json yields an all-null struct for malformed input
    // (never a null struct), so malformed-ness is detected the idiomatic
    // way: a corrupt-record column inside the parse schema
    val withCorrupt = schema.add("_corrupt_record",
      org.apache.spark.sql.types.StringType)
    val decoded = parseFence(payloads.withColumn("__dec",
      from_json(col(payloadCol), withCorrupt,
        Map("mode" -> "PERMISSIVE",
          "columnNameOfCorruptRecord" -> "_corrupt_record"))), "__dec")
    (decoded.filter(col("__dec._corrupt_record").isNull)
      .select(col("__dec").dropFields("_corrupt_record").as("envelope")),
      decoded.filter(col("__dec._corrupt_record").isNotNull)
        .select(col(payloadCol)))
  }
}
