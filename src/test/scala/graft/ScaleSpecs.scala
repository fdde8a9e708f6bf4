package graft

import org.apache.spark.sql.functions._

import graft.cdc.EnvelopeOps
import graft.ops.Salt
import graft.sources.Bucketing

/** Scale-mechanism specs: salting equivalence, bucketed shuffle-free joins,
  * JSON envelope serde round-trip. */
class SaltSpec extends SparkSpecBase {
  import spark.implicits._

  test("salted two-phase sum/count == plain groupBy (skew-immune shape)") {
    // integer-valued doubles -> summation order cannot change the result
    val df = (1 to 1000).map(i => (i % 3L, (i % 7).toDouble, i.toLong))
      .toDF("k", "v", "id")
    val plain = df.groupBy("k")
      .agg(sum($"v").as("sum_v"), count(lit(1)).as("n_rows"))
      .as[(Long, Double, Long)].collect().toSet
    val salted = Salt.saltedSumCount(df, Seq("k"), "v", $"id", buckets = 8)
      .as[(Long, Double, Long)].collect().toSet
    assert(salted === plain)
  }

  test("salted join == plain inner join (hot fact key spread over buckets)") {
    // 80%-hot key 0; dim misses key 2 so the inner-join drop is exercised
    val fact = (1 to 500).map(i =>
        (if (i % 5 != 0) 0L else (i % 3).toLong, i.toLong))
      .toDF("k", "id")
    val dim = Seq((0L, "a"), (1L, "b"), (3L, "unused"))
      .toDF("k", "attr")
    val plain = fact.join(dim, "k")
      .as[(Long, Long, String)].collect().toSet
    val salted = Salt.saltedJoin(fact, dim, "k", $"id", buckets = 8)
      .select("k", "id", "attr")
      .as[(Long, Long, String)].collect().toSet
    assert(salted === plain)
    assert(plain.nonEmpty)
  }
}

class BucketingSpec extends SparkSpecBase {

  test("join of co-bucketed tables plans without a shuffle Exchange") {
    val facts = txns(Seq(
      (1L, 1700000000000000000L, 7L, "purchase", 10.0),
      (2L, 1700000001000000000L, 8L, "view", 20.0),
      (3L, 1700000002000000000L, 7L, "signup", 30.0)))
    val dim = {
      import spark.implicits._
      Seq((7L, "gold"), (8L, "basic")).toDF("account_id", "tier")
    }
    Bucketing.writeBucketed(facts, "b_txns", "account_id", 4)
    Bucketing.writeBucketed(dim, "b_dim", "account_id", 4)

    // disable broadcast so the test exercises the bucketed path, not BHJ
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val joined = Bucketing.read(spark, "b_txns")
        .join(Bucketing.read(spark, "b_dim"), "account_id")
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"), s"expected shuffle-free bucketed join:\n$plan")
      assert(joined.count() === 3)
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
  }

  test("groupBy on the bucket key plans without a shuffle Exchange") {
    val agg = Bucketing.read(spark, "b_txns")
      .groupBy("account_id").agg(sum("amount").as("s"))
    val plan = agg.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange hashpartitioning"),
      s"expected shuffle-free bucketed agg:\n$plan")
    assert(agg.count() === 2)
  }
}

class SqlSurfaceSpec extends SparkSpecBase {

  test("ad-hoc SQL over registered corpus views, incl. custom functions") {
    Tables.registerViews(spark, sf0001)
    val joined = spark.sql(
      """SELECT t.txn_type, count(*) AS n, count(DISTINCT c.c_mktsegment) AS segs
        |FROM transactions t JOIN customer c ON t.account_id = c.c_custkey
        |WHERE t.op <> 'd' GROUP BY 1 ORDER BY 1""".stripMargin)
    assert(joined.count() === 5) // one row per txn type
    val fp = spark.sql("SELECT graft_fnv64(text) AS h FROM documents LIMIT 3")
    assert(fp.count() === 3)
  }
}

class JsonEnvelopeSpec extends SparkSpecBase {

  test("JSON envelope encode/decode round-trips the parsed transaction") {
    val events = eventsDf(Seq(
      (3L, 1700000000000000000L, 7L, "purchase", 100.5),
      (11L, 1700000001000000000L, 8L, "signup", 20.0)))
    val wire = EnvelopeOps.encodeJsonEnvelope(
      EnvelopeOps.synthesizeTxnEnvelope(events))
    val decoded = EnvelopeOps.parseTxnEnvelope(
      EnvelopeOps.decodeJsonEnvelope(wire))
    val direct = EnvelopeOps.parsedTransactions(events)
    assert(decoded.collect().toSet === direct.collect().toSet)
  }

  test("malformed payloads decode to null envelopes and are dropped, not failed") {
    import spark.implicits._
    val wire = Seq("""not json at all""", """{"op": 7}""").toDF("payload")
    val parsed = EnvelopeOps.parseTxnEnvelope(EnvelopeOps.decodeJsonEnvelope(wire))
    assert(parsed.count() === 2) // permissive: rows survive as nulls
    assert(EnvelopeOps.upsertsOnly(parsed).count() === 0) // then filtered
  }

  test("kafka wire format: (key,value) binary schema round-trips the payload") {
    import spark.implicits._
    val env = EnvelopeOps.synthesizeTxnEnvelope(eventsDf(Seq(
      (3L, 1700000000000000000L, 7L, "purchase", 100.50))))
    val wire = EnvelopeOps.kafkaWireFormat(
      EnvelopeOps.encodeJsonEnvelope(env)
        .withColumn("account_id", lit(7L)),
      keyCol = col("account_id"), valueCol = col("payload"))
    assert(wire.schema.map(f => (f.name, f.dataType.typeName)) ===
      Seq(("key", "binary"), ("value", "binary"))) // the kafka sink contract
    val row = wire.head()
    assert(new String(row.getAs[Array[Byte]]("key"), "UTF-8") === "7")
    val back = EnvelopeOps.parseTxnEnvelope(
      EnvelopeOps.decodeJsonEnvelope(
        wire.select(col("value").cast("string").as("payload"))))
    assert(back.head().getAs[Long]("txn_id") === 3L)
  }

  test("dead-letter split: good payloads decode, bad payloads kept verbatim") {
    import spark.implicits._
    val good = EnvelopeOps.encodeJsonEnvelope(
      EnvelopeOps.synthesizeTxnEnvelope(eventsDf(Seq(
        (3L, 1700000000000000000L, 7L, "purchase", 100.50)))))
      .as[String].head()
    val wire = Seq(good, "garbage{{{", """[1,2,3]""").toDF("payload")
    val (decoded, dlq) = EnvelopeOps.decodeWithDeadLetter(wire)
    assert(decoded.count() === 1)
    assert(EnvelopeOps.parseTxnEnvelope(decoded)
      .head().getAs[Long]("txn_id") === 3L)
    val dead = dlq.as[String].collect().toSet
    assert(dead === Set("garbage{{{", "[1,2,3]")) // originals, byte-for-byte
  }
}
