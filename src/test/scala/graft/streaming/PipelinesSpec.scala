package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.{SparkSpecBase, Tables}
import graft.cdc.EnvelopeOps
import graft.ops.{Predicates, Reconcile, Windows}

/** Streaming pipelines must agree with their batch twins — the batch
  * operators are the oracle-verified semantics, so each streaming pipeline
  * is tested for equivalence on the same input (sf0.001 events). */
class PipelinesSpec extends SparkSpecBase {

  private def runToTable(df: DataFrame, name: String, mode: String): DataFrame = {
    val q = df.writeStream.format("memory").queryName(name).outputMode(mode).start()
    q.processAllAvailable()
    q.stop()
    spark.table(name)
  }

  private lazy val batchParsed =
    EnvelopeOps.upsertsOnly(
      EnvelopeOps.parsedTransactions(Tables.events(spark, sf0001)))

  test("streaming high-value alerts == batch notification query") {
    val stream = Pipelines.highValueAlerts(
      Pipelines.parsedStream(spark, sf0001),
      Tables.customer(spark, sf0001), threshold = 200.0)
    val got = runToTable(stream, "hv_stream", "append")
      .select("txn_id", "notification").collect().toSet
    val want = graft.SparkEntry.queries("q_notification_json")(spark, sf0001)
      .collect().toSet
    assert(got === want)
    assert(got.nonEmpty)
  }

  test("Avro-wire streaming ingestion == batch parse (the Kafka-source swap seam)") {
    import graft.cdc.AvroWire
    val dir = Files.createTempDirectory("graft_avro_wire_stream").toString + "/frames"
    // publish the corpus as (key, value) binary frames — the Kafka shape
    val events = Tables.events(spark, sf0001)
    AvroWire.encodeAvroEnvelope(EnvelopeOps.synthesizeTxnEnvelope(events))
      .select(lit(null).cast("binary").as("key"), col("value"))
      .write.parquet(dir)
    val got = runToTable(
      Pipelines.parsedWireStreamAvro(spark, dir), "avro_wire_stream", "append")
      .drop("event_ts").collect().toSet
    val want = batchParsed.collect().toSet
    assert(got === want)
    assert(got.nonEmpty)
  }

  test("streaming CDC-dim enrichment == batch q_enrich_cdc_dim (stream-KTable join)") {
    val stream = Pipelines.highValueCdcEnriched(
      Pipelines.parsedStream(spark, sf0001),
      Tables.customer(spark, sf0001), threshold = 200.0)
    val got = runToTable(stream, "hv_cdc_stream", "append").collect().toSet
    val want = graft.SparkEntry.queries("q_enrich_cdc_dim")(spark, sf0001)
      .collect().toSet
    assert(got === want)
    assert(got.nonEmpty)
    // tombstoned accounts surface with the KV-store-miss fallback
    assert(got.exists(_.getAs[String]("account_number") == "N/A"))
  }

  test("streaming two-hop CDC enrichment (both KTables maintained) == batch q_enrich_cdc_two_hop") {
    val base = Files.createTempDirectory("graft_twohop").toString
    // both KTables continuously maintained from their changelog streams
    val acctQ = DimStore.maintain(
      Pipelines.accountsDimStream(spark, sf0001),
      s"$base/acct_store", Seq("account_id"), s"$base/ckpt_acct")
    val custQ = DimStore.maintain(
      Pipelines.customersDimStream(spark, sf0001),
      s"$base/cust_store", Seq("customer_id"), s"$base/ckpt_cust")
    acctQ.processAllAvailable(); custQ.processAllAvailable()
    acctQ.stop(); custQ.stop()

    val q = Pipelines.highValueTwoHopCdcStream(
      Pipelines.parsedStream(spark, sf0001),
      s"$base/acct_store", s"$base/cust_store", threshold = 200.0,
      outDir = s"$base/out", checkpoint = s"$base/ckpt_join")
    q.processAllAvailable(); q.stop()

    val got = spark.read.parquet(s"$base/out").drop("batch").collect().toSet
    val want = graft.SparkEntry.queries("q_enrich_cdc_two_hop")(spark, sf0001)
      .collect().toSet
    assert(got === want)
    assert(got.nonEmpty)
    // the second hop actually resolved names (not all fallbacks)
    assert(got.exists(_.getAs[String]("customer_name") != "N/A"))
    // and tombstoned dims fall back like KV-store misses
    assert(got.exists(_.getAs[String]("customer_name") == "N/A"))
  }

  test("streaming velocity (complete mode) == batch velocity operator") {
    val stream = Pipelines.velocityAlerts(
      Pipelines.parsedStream(spark, sf0001), windowSec = 3600, minTxns = 2L)
    val got = runToTable(stream, "vel_stream", "complete").collect().toSet
    val want = Windows.velocityCount(batchParsed, 3600, 2L).collect().toSet
    assert(got === want)
    assert(got.nonEmpty)
  }

  test("streaming hopping velocity == batch; every event in exactly window/advance windows") {
    val stream = Pipelines.velocityHoppingAlerts(
      Pipelines.parsedStream(spark, sf0001), windowSec = 3600,
      advanceSec = 1800, minTxns = 2L)
    val got = runToTable(stream, "vel_hop_stream", "complete").collect().toSet
    val want = Windows.velocityHopping(batchParsed, 3600, 1800, 2L)
      .collect().toSet
    assert(got === want)
    assert(got.nonEmpty)
    // overlap arithmetic: with minTxns=1 the per-event fan-out is exactly
    // window/advance = 2 rows summed across windows
    val perEvent = Windows.velocityHopping(batchParsed, 3600, 1800, 1L)
      .agg(sum(col("n_txns"))).head().getLong(0)
    assert(perEvent === 2L * batchParsed.count())
  }

  test("streaming daily spend (complete mode) == batch daily operator") {
    val stream = Pipelines.dailySpendAlerts(
      Pipelines.parsedStream(spark, sf0001), threshold = 150.0)
    val got = runToTable(stream, "daily_stream", "complete").collect().toSet
    val want = Windows.dailySpend(
      batchParsed.filter(Predicates.isCompleted(col("status")) &&
        Predicates.isDebit(col("txn_type"))), 150.0).collect().toSet
    assert(got === want)
    assert(got.nonEmpty)
  }

  test("streaming reconciliation (flatMapGroupsWithState) == batch lag() operator") {
    val stream = Pipelines.reconcileAlerts(spark,
      Pipelines.parsedStream(spark, sf0001))
    val got = runToTable(stream.toDF(), "recon_stream", "append")
      .select("txn_id", "balance_after", "recon_status").collect().toSet
    val want = Reconcile.reconcile(
        batchParsed.filter(Predicates.isCompleted(col("status"))))
      .select("txn_id", "balance_after", "recon_status").collect().toSet
    assert(got === want)
    assert(got.nonEmpty)
  }

  test("streaming rolling spend (flatMapGroupsWithState) == batch RANGE window") {
    val stream = Pipelines.rollingSpendAlerts(spark,
      Pipelines.parsedStream(spark, sf0001))
    val got = runToTable(stream.toDF(), "rolling_stream", "append")
      .select("txn_id", "rolling_spend_kobo", "rolling_n_txns")
      .collect().toSet
    val want = Windows.rollingSpend(
        batchParsed.filter(Predicates.isCompleted(col("status")) &&
          Predicates.isDebit(col("txn_type"))), windowSec = 86400L)
      .select("txn_id", "rolling_spend_kobo", "rolling_n_txns")
      .collect().toSet
    assert(got === want)
    assert(got.nonEmpty)
  }

  test("streaming TWAB (O(1) state) final emission per account == batch operator") {
    import spark.implicits._
    val stream = Pipelines.twabUpdates(spark,
      Pipelines.parsedStream(spark, sf0001))
    val emissions = runToTable(stream.toDF(), "twab_stream", "append")
      .as[(Long, Long, Long, Long)].collect()
    // the LAST emission (max interval count) per account is the full-span
    // TWAB; earlier emissions are the live prefix view
    val got = emissions.groupBy(_._1).map(_._2.maxBy(_._2)).toSet
    val want = graft.ops.EventAnalytics.timeWeightedBalance(
        batchParsed.filter(Predicates.isCompleted(col("status"))))
      .as[(Long, Long, Long, Long)].collect().toSet
    assert(got === want)
    assert(got.nonEmpty)
  }

  test("streaming EWMA (k-ring state) final emission per key == batch " +
      "operator, fed across micro-batches") {
    import spark.implicits._
    val rnd = new scala.util.Random(13)
    val rows = for {
      key <- 1L to 20L; i <- 1L to (3 + rnd.nextInt(12)).toLong
    } yield (key, i * 1000000L, i, rnd.nextLong(10000))
    val dir = java.nio.file.Files
      .createTempDirectory("graft_ewma").toString + "/in"
    // per-key in-order feed: chunk by ascending seq so no key regresses
    rows.groupBy(_._2).toSeq.sortBy(_._1).map(_._2)
      .grouped(5).zipWithIndex.foreach { case (chunk, _) =>
        chunk.flatten.toDF("key", "ts_us", "seq", "amount_cents")
          .coalesce(1).write.mode("append").parquet(dir)
        Thread.sleep(20)
      }
    val stream = Pipelines.ewmaUpdates(spark,
      spark.readStream
        .schema("key LONG, ts_us LONG, seq LONG, amount_cents LONG")
        .option("maxFilesPerTrigger", "1").parquet(dir))
    val emissions = runToTable(stream.toDF(), "ewma_stream", "append")
      .as[(Long, Long, Long, Long, Long, Long)].collect()
    // one emission per event; the max-seq emission per key is the
    // full-history score
    val perKey = emissions.groupBy(_._1)
    val got = rows.groupBy(_._1).map { case (key, g) =>
      assert(perKey(key).size == g.size) // every event emitted once
      val last = perKey(key).maxBy(_._2)
      (last._1, last._3, last._4, last._5, last._6)
    }.toSet
    val want = graft.ops.EventAnalytics.ewmaRecency(
        rows.toDF("key", "ts", "seq", "amount_cents"))
      .as[(Long, Long, Long, Long, Long)].collect().toSet
    assert(got === want)
    assert(got.nonEmpty)
  }

  test("EWMA tracker fails loudly on a cross-batch out-of-order event") {
    import org.apache.spark.api.java.Optional
    import org.apache.spark.sql.streaming.{GroupStateTimeout, TestGroupState}
    def txn(tsUs: Long, seq: Long) = EwmaTxn(7L, tsUs, seq, 100L,
      new java.sql.Timestamp(tsUs / 1000))
    val state = TestGroupState.create[Seq[(Long, Long, Long)]](
      Optional.empty(), GroupStateTimeout.NoTimeout,
      batchProcessingTimeMs = 0L, eventTimeWatermarkMs = Optional.of(1L),
      hasTimedOut = false)
    EwmaTracker.process(8)(7L,
      Iterator(txn(1000000L, 1), txn(2000000L, 2)), state).toList
    val e = intercept[IllegalArgumentException] {
      EwmaTracker.process(8)(7L, Iterator(txn(1500000L, 3)), state).toList
    }
    assert(e.getMessage.contains("out-of-order"))
  }

  test("TWAB tracker fails loudly on a cross-batch out-of-order event") {
    import org.apache.spark.api.java.Optional
    import org.apache.spark.sql.streaming.{GroupStateTimeout, TestGroupState}
    def txn(id: Long, tsUs: Long) = TwabTxn(id, 7L, tsUs, 100L,
      new java.sql.Timestamp(tsUs / 1000))
    val state = TestGroupState.create[TwabState](
      Optional.empty(), GroupStateTimeout.NoTimeout,
      batchProcessingTimeMs = 0L, eventTimeWatermarkMs = Optional.of(1L),
      hasTimedOut = false)
    // batch 1 seals up to ts 2_000_000; a later batch delivering ts
    // 1_500_000 would make dt negative and silently corrupt the exact
    // numerator — the tracker must throw, not absorb
    TwabTracker.process(7L, Iterator(txn(1, 1000000L), txn(2, 2000000L)),
      state).toList
    val e = intercept[IllegalArgumentException] {
      TwabTracker.process(7L, Iterator(txn(3, 1500000L)), state).toList
    }
    assert(e.getMessage.contains("out-of-order"))
  }

  test("streaming session concurrency (day-sharded state + merge-on-read) == batch prefix scan") {
    import spark.implicits._
    val sessions = Windows.dormancySessions(batchParsed, graft.SparkEntry.DormancyGap)
    val bounds = sessions
      .select(col("session_start_ms").as("ts_ms"), lit(1L).as("delta"))
      .unionAll(sessions
        .select(col("session_end_ms").as("ts_ms"), lit(-1L).as("delta")))
    // replay in (ts, delta) order — ends before starts at equal ts, the
    // batch tie rule — split into three mtime-ordered files at arbitrary
    // row cuts, so mid-day state continuation across micro-batches is
    // exercised (the contract allows any split that preserves order)
    val rows = bounds.as[(Long, Long)].collect().sorted
    assert(rows.length > 10)
    val dir = Files.createTempDirectory("graft_conc").toString + "/in"
    rows.grouped((rows.length + 2) / 3).foreach { part =>
      part.toSeq.toDF("ts_ms", "delta")
        .coalesce(1).write.mode("append").parquet(dir)
      Thread.sleep(20) // distinct mtimes -> deterministic file order
    }
    val stream = spark.readStream.schema("ts_ms LONG, delta LONG")
      .option("maxFilesPerTrigger", "1").parquet(dir)
    val emissions = runToTable(
      Pipelines.concurrencyPartials(spark, stream).toDF(),
      "conc_stream", "append")
      .as[(Long, Long, Long, Long)].collect()
    // last emission per day (max boundary count) = the sealed partial
    val sealedParts = emissions.groupBy(_._1).map(_._2.maxBy(_._4)).toSeq
      .toDF("day", "local_max", "net_delta", "n_boundaries")
    val got = Pipelines.mergeConcurrency(sealedParts)
      .as[(Long, Long, Long)].collect().toSet
    val want = graft.ops.EventAnalytics.sessionConcurrencyDaily(sessions)
      .as[(Long, Long, Long)].collect().toSet
    assert(got === want)
    assert(got.nonEmpty)
    // the shard really is day-bounded state: multiple days, each tiny
    assert(sealedParts.count() > 1)
  }

  test("streaming funnel (state + timers) == batch conditional RANGE frame") {
    import spark.implicits._
    val base = 1700000000000000000L
    val secNs = 1000000000L
    // each user's stream ends with a far view, so every click is sealed
    // in-batch by a later same-user event (the in-order contract's
    // purchase-impossibility proof) — full equality with the batch twin
    val rows = Seq(
      (1L, base, 7L, "click", 1.0),
      (2L, base + 10 * secNs, 7L, "purchase", 1.0),        // converts 1
      (3L, base + 20 * secNs, 7L, "click", 1.0),           // never converts
      (4L, base + 7200 * secNs, 7L, "view", 1.0),          // seals 3
      (5L, base, 9L, "click", 1.0),
      (6L, base, 9L, "purchase", 1.0),                     // same-ts: no convert
      (7L, base + 30 * secNs, 9L, "purchase", 1.0),        // converts 5
      (8L, base + 9000 * secNs, 9L, "view", 1.0))
    val dir = Files.createTempDirectory("graft_funnel").toString + "/in"
    rows.toDF("event_id", "ts", "user_id", "event_type", "value")
      .withColumn("props", lit("{}"))
      .coalesce(1).write.parquet(dir)
    val stream = Pipelines.funnelAlerts(spark,
      Pipelines.eventStreamFromPath(spark, dir))
    val got = runToTable(stream.toDF(), "funnel_stream", "append")
      .select("event_id", "next_purchase_us", "converted").collect().toSet
    val want = graft.ops.EventAnalytics.clickToPurchase(
        eventsDf(rows), withinSec = 3600L)
      .select("event_id", "next_purchase_us", "converted").collect().toSet
    assert(got === want)
    assert(got.size === 3)
  }

  test("streaming 3-step pattern (two-stage state) == batch window+join form") {
    import spark.implicits._
    val base = 1700000000000000000L
    val secNs = 1000000000L
    // every user's stream ends with a far 'error' event so all pending
    // entries seal in-batch (same in-order contract as the funnel test)
    val rows = Seq(
      (1L, base, 7L, "click", 1.0),                       // full chain
      (2L, base + 10 * secNs, 7L, "view", 1.0),
      (3L, base + 20 * secNs, 7L, "purchase", 1.0),
      (4L, base + 100 * secNs, 7L, "click", 1.0),         // view, no purchase
      (5L, base + 110 * secNs, 7L, "view", 1.0),
      (6L, base + 90000 * secNs, 7L, "error", 1.0),
      (7L, base, 9L, "click", 1.0),                       // view out of horizon
      (8L, base + 4000 * secNs, 9L, "view", 1.0),
      (9L, base, 11L, "click", 1.0),                      // same-ts view: no match
      (10L, base, 11L, "view", 1.0),
      (11L, base + 5 * secNs, 11L, "view", 1.0),          // real hop 1
      (12L, base + 3600 * secNs + 5 * secNs, 11L, "purchase", 1.0), // == v+h edge
      (13L, base + 90000 * secNs, 9L, "error", 1.0),
      (14L, base + 90000 * secNs, 11L, "error", 1.0))
    val dir = Files.createTempDirectory("graft_p3").toString + "/in"
    rows.toDF("event_id", "ts", "user_id", "event_type", "value")
      .withColumn("props", lit("{}"))
      .coalesce(1).write.parquet(dir)
    val stream = Pipelines.pattern3Alerts(spark,
      Pipelines.eventStreamFromPath(spark, dir))
    val got = runToTable(stream.toDF(), "p3_stream", "append")
      .select("event_id", "next_view_us", "purchase_us", "completed")
      .collect().toSet
    val want = graft.ops.EventAnalytics.threeStepPattern(
        eventsDf(rows), withinSec = 3600L)
      .select("event_id", "next_view_us", "purchase_us", "completed")
      .collect().toSet
    assert(got === want)
    assert(got.size === 4)
    assert(got.count(_.getBoolean(3)) === 2) // chains 1 and 9 complete
  }

  test("streaming k-step pattern (k=4) == batch kStepPattern") {
    import spark.implicits._
    val base = 1700000000000000000L
    val secNs = 1000000000L
    // every user's stream ends with a far 'error' event so all pending
    // chains seal in-batch (same in-order contract as the 3-step test)
    val rows = Seq(
      (1L, base, 7L, "signup", 1.0),                      // full 4-chain
      (2L, base + 10 * secNs, 7L, "click", 1.0),
      (3L, base + 20 * secNs, 7L, "view", 1.0),
      (4L, base + 30 * secNs, 7L, "purchase", 1.0),
      (5L, base + 90000 * secNs, 7L, "error", 1.0),
      (6L, base, 9L, "signup", 1.0),                      // stalls at hop 3
      (7L, base + 10 * secNs, 9L, "click", 1.0),
      (8L, base + 20 * secNs, 9L, "view", 1.0),
      (9L, base + 90000 * secNs, 9L, "error", 1.0),
      (10L, base, 11L, "signup", 1.0),                    // click out of horizon
      (11L, base + 4000 * secNs, 11L, "click", 1.0),
      (12L, base + 90000 * secNs, 11L, "error", 1.0))
    val dir = Files.createTempDirectory("graft_pk").toString + "/in"
    rows.toDF("event_id", "ts", "user_id", "event_type", "value")
      .withColumn("props", lit("{}"))
      .coalesce(1).write.parquet(dir)
    val steps = Seq("signup", "click", "view", "purchase")
    val stream = Pipelines.patternKAlerts(spark,
      Pipelines.eventStreamFromPath(spark, dir), steps)
    val got = runToTable(stream.toDF(), "pk_stream", "append")
      .as[(Long, Long, Long, Seq[Long], Boolean)].collect()
      .map(r => (r._1, r._4, r._5)).toSet
    // batch rows -> matched prefix (step-0 ts plus hops until first stall)
    val want = graft.ops.EventAnalytics.kStepPattern(
        eventsDf(rows), steps, withinSec = 3600L)
      .select("event_id", "ts_us", "step1_us", "step2_us", "step3_us", "completed")
      .collect().map { r =>
        val hops = (2 to 4).map(i => Option(r.get(i)).map(_.asInstanceOf[Long]))
          .takeWhile(_.isDefined).flatten
        (r.getLong(0), r.getLong(1) +: hops, r.getBoolean(5))
      }.toSet
    assert(got === want)
    assert(got.size === 3)
    assert(got.count(_._3) === 1)
  }

  test("streaming 3-step pattern: stalled second hop expires via timer") {
    import spark.implicits._
    val base = 1700000000000000000L
    val hourNs = 3600L * 1000000000L
    val dir = Files.createTempDirectory("graft_p3_t").toString
    // user 7 reaches stage 2 (click+view) but no purchase ever comes;
    // the sentinel batch advances the watermark past view+horizon
    val chunk1 = Seq(
      (1L, base, 7L, "click", 1.0),
      (2L, base + hourNs / 2, 7L, "view", 1.0))
    val sentinel = Seq((3L, base + 10 * hourNs, 9L, "view", 1.0))
    def write(rows: Seq[(Long, Long, Long, String, Double)], f: String): Unit = {
      val staging = Files.createTempDirectory("graft_stage_p3").toString
      rows.toDF("event_id", "ts", "user_id", "event_type", "value")
        .withColumn("props", lit("{}"))
        .coalesce(1).write.mode("overwrite").parquet(staging)
      val part = new java.io.File(staging).listFiles()
        .filter(_.getName.endsWith(".parquet")).head
      Files.copy(part.toPath, java.nio.file.Paths.get(s"$dir/$f.parquet"))
    }
    write(chunk1, "c1"); Thread.sleep(20); write(sentinel, "c2")
    val stream = Pipelines.pattern3Alerts(spark,
      Pipelines.eventStreamFromPath(spark, dir, maxFilesPerTrigger = Some(1)))
    val got = runToTable(stream.toDF(), "p3_timer_stream", "append")
      .select("event_id", "next_view_us", "purchase_us", "completed")
      .collect().toSet
    assert(got === Set(org.apache.spark.sql.Row(1L,
      (base + hourNs / 2) / 1000, null, false)))
  }

  test("streaming funnel: unresolved click expires via event-time timer") {
    import spark.implicits._
    val base = 1700000000000000000L
    val hourNs = 3600L * 1000000000L
    val dir = Files.createTempDirectory("graft_funnel_t").toString
    // chunk1: user 7's lone click + another user's far event advancing the
    // watermark past the click's horizon; chunk2 triggers the timer fire
    val chunk1 = Seq(
      (1L, base, 7L, "click", 1.0),
      (2L, base + 3 * hourNs, 8L, "view", 1.0))
    val sentinel = Seq((3L, base + 10 * hourNs, 9L, "view", 1.0))
    def write(rows: Seq[(Long, Long, Long, String, Double)], f: String): Unit = {
      val staging = Files.createTempDirectory("graft_stage_f").toString
      rows.toDF("event_id", "ts", "user_id", "event_type", "value")
        .withColumn("props", lit("{}"))
        .coalesce(1).write.mode("overwrite").parquet(staging)
      val part = new java.io.File(staging).listFiles()
        .find(_.getName.endsWith(".parquet")).get
      Files.copy(part.toPath, java.nio.file.Paths.get(s"$dir/$f.parquet"))
    }
    write(chunk1, "c1"); Thread.sleep(20); write(sentinel, "c2")
    val stream = Pipelines.funnelAlerts(spark,
      Pipelines.eventStreamFromPath(spark, dir, maxFilesPerTrigger = Some(1)))
    val got = runToTable(stream.toDF(), "funnel_timer_stream", "append")
      .select("event_id", "converted").collect().toSet
    assert(got === Set(org.apache.spark.sql.Row(1L, false)))
  }

  test("streaming dormancy sessions close on watermark advance (append mode)") {
    import spark.implicits._
    // two files -> two micro-batches; the sentinel advances the watermark so
    // chunk-1 sessions whose (last event + gap) <= max(chunk-1 ts) emit.
    val dir = Files.createTempDirectory("graft_sess").toString
    val base = 1700000000000000000L
    val hourNs = 3600L * 1000000000L
    val chunk1 = Seq(
      (1L, base, 7L, "purchase", 1.0),
      (2L, base + hourNs, 7L, "purchase", 1.0),          // same session as 1
      (3L, base + 200 * hourNs, 7L, "purchase", 1.0),    // new session (gap 48h)
      (4L, base + 400 * hourNs, 8L, "view", 1.0))        // advances max ts
    val sentinel = Seq((5L, base + 2000 * hourNs, 9L, "view", 1.0))
    // flat dir of single .parquet FILES (the source monitors a directory)
    def write(rows: Seq[(Long, Long, Long, String, Double)], f: String): Unit = {
      val staging = Files.createTempDirectory("graft_stage").toString
      rows.toDF("event_id", "ts", "user_id", "event_type", "value")
        .withColumn("props", lit("{}"))
        .coalesce(1).write.mode("overwrite").parquet(staging)
      val part = new java.io.File(staging).listFiles()
        .find(_.getName.endsWith(".parquet")).get
      Files.copy(part.toPath, java.nio.file.Paths.get(s"$dir/$f.parquet"))
    }
    write(chunk1, "c1"); Thread.sleep(20); write(sentinel, "c2")

    val stream = Pipelines.dormancyAlerts(
      Pipelines.parsedStreamFromPath(spark, dir, maxFilesPerTrigger = Some(1)),
      gap = "48 hours")
    val got = runToTable(stream, "sess_stream", "append")
      .select("account_id", "session_start_ms", "n_events", "is_dormant")
      .collect().toSet

    // batch twin on chunk1, restricted to sessions closed by the final
    // watermark (= the sentinel's event time; its own session stays open)
    val sentinelTsMs = (base + 2000 * hourNs) / 1000000
    val want = Windows.dormancySessions(txns(chunk1), "48 hours")
      .filter(col("session_end_ms") <= sentinelTsMs)
      .select("account_id", "session_start_ms", "n_events", "is_dormant")
      .collect().toSet
    assert(got === want)
    assert(got.nonEmpty) // user 7's two sessions closed well before max ts
  }
}
