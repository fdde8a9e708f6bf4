package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.SparkSpecBase

/** Late-data/grace matrix (SURVEY §2.5 pins the reference's no-grace
  * behavior; this pins the grace>0 half of Kafka Streams'
  * `ofSizeAndGrace` / `ofInactivityGapAndGrace` semantics):
  * for each of the three window shapes, a late row arriving while
  * `max(event time) - grace` has not passed its window/session end is
  * INCLUDED, and one arriving after is DROPPED — driven through real
  * micro-batches with the watermark advancing between them (Spark
  * computes batch N's watermark from data through batch N-1, so each
  * `addData` + `processAllAvailable` is one watermark step). */
class GraceSpec extends SparkSpecBase {

  import spark.implicits._

  /** (account_id, ts_sec) -> the parsed-stream column surface the
    * pipelines consume. */
  private def parsedFrom(input: MemoryStream[(Long, Long)]): DataFrame =
    input.toDF().toDF("account_id", "ts_sec")
      .withColumn("event_ts", timestamp_seconds(col("ts_sec")))
      .withColumn("event_time_us", col("ts_sec") * 1000000L)
      .withColumn("txn_id", col("ts_sec"))
      .withColumn("amount", lit(100.0))
      .withColumn("txn_type", lit("DEBIT"))
      .withColumn("status", lit("COMPLETED"))

  private def run(df: DataFrame, name: String)(
      steps: (() => Unit)*): DataFrame = {
    val q = df.writeStream.format("memory").queryName(name)
      .outputMode("append").start()
    try steps.foreach { s => s(); q.processAllAvailable() }
    finally q.stop()
    spark.table(name)
  }

  test("tumbling window, grace > 0: late row inside grace is included") {
    implicit val ctx = spark.sqlContext
    val input = MemoryStream[(Long, Long)]
    // 60s windows, 30s grace. Window [0,60) for account 7.
    val out = run(Pipelines.velocityAlerts(parsedFrom(input),
      windowSec = 60, minTxns = 1L, grace = "30 seconds"), "grace_tumble_in")(
      () => input.addData((7L, 10L), (7L, 20L), (7L, 80L)), // wm -> 50
      () => input.addData((7L, 30L)),  // late, but 60 > wm 50 -> included
      () => input.addData((7L, 200L)), // wm -> 170: window closes
      () => input.addData())
    val w0 = out.filter(col("window_start_ms") === 0).collect()
    assert(w0.length === 1)
    assert(w0.head.getAs[Long]("n_txns") === 3L) // 10, 20, and the late 30
  }

  test("tumbling window, no grace: the same late row is dropped") {
    implicit val ctx = spark.sqlContext
    val input = MemoryStream[(Long, Long)]
    val out = run(Pipelines.velocityAlerts(parsedFrom(input),
      windowSec = 60, minTxns = 1L), "grace_tumble_out")(
      () => input.addData((7L, 10L), (7L, 20L), (7L, 80L)), // wm -> 80
      () => input.addData((7L, 30L)),  // late: 60 <= wm 80 -> dropped
      () => input.addData((7L, 200L)),
      () => input.addData())
    val w0 = out.filter(col("window_start_ms") === 0).collect()
    assert(w0.length === 1)
    assert(w0.head.getAs[Long]("n_txns") === 2L) // late row excluded
  }

  test("24h tumbling spend, grace > 0: late debit lands in its day; outside grace it does not") {
    implicit val ctx = spark.sqlContext
    val day = 86400L
    // 12h grace: late row at 05:00 arrives after day+1 data -> included
    val in1 = MemoryStream[(Long, Long)]
    val got1 = run(Pipelines.dailySpendAlerts(parsedFrom(in1),
      threshold = 100.0, grace = "12 hours"), "grace_daily_in")(
      () => in1.addData((7L, 3600L), (7L, day + 3600L)), // wm -> day-8h
      () => in1.addData((7L, 5L * 3600L)),               // late, inside grace
      () => in1.addData((7L, 3L * day)),                 // closes day 0 and 1
      () => in1.addData())
    val d0g = got1.filter(col("day_start_ms") === 0).collect()
    assert(d0g.length === 1 && d0g.head.getAs[Long]("n_txns") === 2L, // both rows
      d0g.mkString(","))

    // no grace: the identical late row is dropped
    val in2 = MemoryStream[(Long, Long)]
    val got2 = run(Pipelines.dailySpendAlerts(parsedFrom(in2),
      threshold = 100.0), "grace_daily_out")(
      () => in2.addData((7L, 3600L), (7L, day + 3600L)), // wm -> day+1h
      () => in2.addData((7L, 5L * 3600L)),               // late: day end <= wm
      () => in2.addData((7L, 3L * day)),
      () => in2.addData())
    val d0 = got2.filter(col("day_start_ms") === 0).collect()
    assert(d0.length === 1 && d0.head.getAs[Long]("n_txns") === 1L,
      d0.mkString(","))
  }

  test("session window, grace > 0: late row merges its session; outside grace it is dropped") {
    implicit val ctx = spark.sqlContext
    // 60s gap, 120s grace: late row at 40 merges [0,60) into [0,100)
    val in1 = MemoryStream[(Long, Long)]
    val got1 = run(Pipelines.dormancyAlerts(parsedFrom(in1),
      gap = "60 seconds", grace = "120 seconds"), "grace_sess_in")(
      () => in1.addData((7L, 0L), (7L, 150L)), // wm -> 30
      () => in1.addData((7L, 40L)),            // late; session end 100 > 30
      () => in1.addData((7L, 500L)),           // wm -> 380: both sessions close
      () => in1.addData())
    val s1 = got1.filter(col("session_start_ms") === 0).collect()
    assert(s1.length === 1 && s1.head.getAs[Long]("n_events") === 2L,
      s1.mkString(",")) // merged: the late row extended the session
    assert(got1.filter(col("session_start_ms") === 150000).count() === 1)

    // no grace: wm is already 150 when the late row arrives -> dropped
    val in2 = MemoryStream[(Long, Long)]
    val got2 = run(Pipelines.dormancyAlerts(parsedFrom(in2),
      gap = "60 seconds"), "grace_sess_out")(
      () => in2.addData((7L, 0L), (7L, 150L)), // wm -> 150
      () => in2.addData((7L, 40L)),            // late: session end 100 <= 150
      () => in2.addData((7L, 500L)),
      () => in2.addData())
    val s2 = got2.filter(col("session_start_ms") === 0).collect()
    assert(s2.length === 1 && s2.head.getAs[Long]("n_events") === 1L,
      s2.mkString(","))
  }
}
