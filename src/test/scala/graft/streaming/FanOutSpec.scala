package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.{SparkSpecBase, Tables}

class FanOutSpec extends SparkSpecBase {
  import spark.implicits._

  private def writeEventsFile(dir: String,
      rows: Seq[(Long, Long, Long, String, Double)], f: String): Unit = {
    val staging = Files.createTempDirectory("graft_fo_st").toString
    rows.toDF("event_id", "ts", "user_id", "event_type", "value")
      .withColumn("props", lit("{}"))
      .coalesce(1).write.mode("overwrite").parquet(staging)
    val part = new java.io.File(staging).listFiles()
      .find(_.getName.endsWith(".parquet")).get
    Files.copy(part.toPath, java.nio.file.Paths.get(s"$dir/$f.parquet"))
  }

  test("at-least-once replays are deduped within the watermark (effectively-once)") {
    val dir = Files.createTempDirectory("graft_dd").toString
    val base = 1700000000000000000L
    val rows = Seq(
      (1L, base, 7L, "purchase", 10.0),
      (2L, base + 1000000000L, 7L, "view", 20.0))
    writeEventsFile(dir, rows, "original")
    writeEventsFile(dir, rows, "replay") // duplicate delivery of the same batch

    val deduped = Pipelines.dedupedStream(
      Pipelines.parsedStreamFromPath(spark, dir))
    val q = deduped.writeStream.format("memory").queryName("dedup_stream")
      .outputMode("append").start()
    q.processAllAvailable(); q.stop()

    val got = spark.table("dedup_stream").select("txn_id").as[Long].collect().sorted
    assert(got.toSeq === Seq(1L, 2L)) // 4 input rows -> 2 unique txns
  }

  test("foreachBatch fan-out writes all sinks from one shared scan") {
    val outBase = Files.createTempDirectory("graft_fanout").toString
    val parsed = Pipelines.parsedStream(spark, sf0001)
    val q = Pipelines.fanOutStateless(parsed,
      Tables.customer(spark, sf0001), threshold = 200.0, outBase)
    q.processAllAvailable(); q.stop()

    val parsedN = spark.read.parquet(s"$outBase/parsed").count()
    val hv = spark.read.parquet(s"$outBase/hv_alerts")
    val hvN = hv.count()
    val debitsN = spark.read.parquet(s"$outBase/debits").count()
    assert(parsedN > 0 && debitsN > 0 && debitsN < parsedN)
    assert(hvN === 12) // matches the batch notification query at sf0.001

    // F9: the sink stamps a fresh uuid + generatedAt per notification
    // (reference NotificationEvent.java:70-71); both excluded from any
    // equivalence compare — the deterministic payload columns are what
    // the count above verifies
    assert(hv.filter(col("notification_uuid").isNull ||
      col("generated_at_ms").isNull).count() === 0)
    assert(hv.select("notification_uuid").distinct().count() === hvN)
    assert(hv.filter(col("generated_at_ms") <= 0L).count() === 0)

    // idempotency: a full reprocess (fresh checkpoint, same batch ids)
    // OVERWRITES the batch partitions instead of appending duplicates
    val q2 = Pipelines.fanOutStateless(Pipelines.parsedStream(spark, sf0001),
      Tables.customer(spark, sf0001), threshold = 200.0, outBase)
    q2.processAllAvailable(); q2.stop()
    assert(spark.read.parquet(s"$outBase/parsed").count() === parsedN)
    assert(spark.read.parquet(s"$outBase/hv_alerts").count() === hvN)
  }
}
