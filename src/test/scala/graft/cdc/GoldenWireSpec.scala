package graft.cdc

import org.apache.spark.sql.functions._

import graft.SparkSpecBase
import graft.ops.Predicates

/** Jar-swap readiness: golden Debezium-envelope byte fixtures.
  *
  * These payloads are HAND-AUTHORED against the reference's wire contract
  * (envelope layout `model/CdcEnvelope.java:8-20`, canonical records from
  * `ABBankTopologyTest.java:214-348,386-417` — transcribed in FIXTURES.md),
  * NOT produced by this library's own encoder — so they prove the decode
  * seam against the external contract, not against itself. A real Kafka
  * source delivers exactly this (key BINARY, value BINARY) shape; swapping
  * `from_json` for `from_avro` + the connector jar changes only the
  * deserializer expression, which is the reference's own Schema Registry
  * seam (`serde/AvroSerdes.java:35-59`).
  */
class GoldenWireSpec extends SparkSpecBase {

  private def txnJson(txnId: Long, acctId: Long, typ: String, amount: Double,
      status: String = "COMPLETED", op: String = "c",
      initiatedUs: Long = 1700000000000000L): String = {
    val image =
      s"""{"TRANSACTION_ID": $txnId.0, "ACCOUNT_ID": $acctId.0,
         |"TRANSACTION_REF": "REF-$txnId", "TRANSACTION_TYPE": "$typ",
         |"AMOUNT": $amount, "CURRENCY": "NGN", "STATUS": "$status",
         |"BALANCE_BEFORE": 1000000.0, "BALANCE_AFTER": ${1000000.0 - amount},
         |"INITIATED_AT": $initiatedUs, "COMPLETED_AT": ${initiatedUs + 1000000}}"""
        .stripMargin.replace("\n", " ")
    val (before, after) =
      if (op == "d") (image, "null") else ("null", image)
    s"""{"before": $before, "after": $after,
       |"source": {"version": "3.2.0", "connector": "oracle", "name": "abbank",
       |"ts_ms": ${initiatedUs / 1000}, "db": "XE", "schema": "BANKDB",
       |"table": "TRANSACTIONS", "scn": "$txnId"},
       |"op": "$op", "ts_ms": ${initiatedUs / 1000},
       |"ts_us": $initiatedUs, "ts_ns": ${initiatedUs * 1000}}"""
      .stripMargin.replace("\n", " ")
  }

  /** Golden (key, value) BINARY rows — the exact frame a Kafka source
    * hands over (key = account id string bytes, reference
    * `ABBankTopology.java:101-103`). */
  private def wireFrame(records: Seq[(Long, String)]) = {
    import spark.implicits._
    records.toDF("k", "payload")
      .select(col("k").cast("string").cast("binary").as("key"),
        col("payload").cast("binary").as("value"))
  }

  private def decodeWire(wire: org.apache.spark.sql.DataFrame) =
    EnvelopeOps.parseTxnEnvelope(
      EnvelopeOps.decodeJsonEnvelope(
        wire.select(col("value").cast("string").as("payload"))))

  test("golden fixtures decode to the reference's canonical typed rows") {
    val wire = wireFrame(Seq(
      (100L, txnJson(1, 100, "DEBIT", 600000.0)),            // must alert
      (100L, txnJson(2, 100, "DEBIT", 500000.0)),            // boundary: alerts (inclusive >=)
      (100L, txnJson(3, 100, "DEBIT", 499999.99)),           // just below: no alert
      (200L, txnJson(4, 200, "CREDIT", 750000.0)),           // credit type
      (300L, txnJson(5, 300, "TRANSFER_OUT", 50000.0, op = "r")), // snapshot = insert
      (400L, txnJson(6, 400, "DEBIT", 10000.0, op = "d")),   // tombstone: dropped
      (0L, """{"garbage": true"""),                          // malformed: null, dropped
      (500L, txnJson(7, 500, "FEE", 1234.56,
        initiatedUs = 1700000000000000L))))                  // MicroTimestamp case

    val parsed = decodeWire(wire)
    assert(parsed.count() === 8) // permissive: every payload yields a row

    val live = EnvelopeOps.upsertsOnly(parsed)
    val byId = live.collect().map(r => r.getAs[Long]("txn_id") -> r).toMap
    // delete (6) and malformed dropped; snapshot op=r kept like an insert
    assert(byId.keySet === Set(1L, 2L, 3L, 4L, 5L, 7L))

    // typed conversions: double id -> long, micros kept + exact /1000 millis
    val t7 = byId(7L)
    assert(t7.getAs[Long]("account_id") === 500L)
    assert(t7.getAs[Long]("event_time_us") === 1700000000000000L)
    assert(t7.getAs[Long]("event_time_ms") === 1700000000000L) // reference :318-348
    assert(t7.getAs[String]("currency") === "NGN")
    assert(t7.getAs[Double]("amount") === 1234.56)

    // the reference's inclusive >= threshold over the decoded rows
    val alerts = live
      .filter(Predicates.isDebit(col("txn_type")) &&
        Predicates.isHighValue(col("amount"), 500000.0))
      .select("txn_id").collect().map(_.getLong(0)).toSet
    assert(alerts === Set(1L, 2L)) // 600000 and the 500000 boundary, not 499999.99

    // the wire key is the account id string, byte-for-byte
    val keys = wire.select(col("key").cast("string")).collect().map(_.getString(0))
    assert(keys.contains("100") && keys.contains("500"))
  }

  test("golden delete keeps its key in the before-image (tombstone contract)") {
    // Debezium deletes carry before=row, after=null; the KTable path keys
    // deletes from the before-image (DimensionCdc.parseAccountEnvelope)
    val wire = wireFrame(Seq((400L, txnJson(6, 400, "DEBIT", 10000.0, op = "d"))))
    val env = EnvelopeOps.decodeJsonEnvelope(
      wire.select(col("value").cast("string").as("payload")))
    val row = env.select(
      col("envelope.op").as("op"),
      col("envelope.after").isNull.as("after_null"),
      col("envelope.before.TRANSACTION_ID").cast("long").as("before_id")).head()
    assert(row.getAs[String]("op") === "d")
    assert(row.getAs[Boolean]("after_null"))
    assert(row.getAs[Long]("before_id") === 6L)
  }
}
