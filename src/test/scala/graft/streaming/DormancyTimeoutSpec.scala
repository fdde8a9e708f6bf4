package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSpecBase

/** Timeout-based dormancy must fire exactly on session close (documented
  * reference intent): an alert for a single-event session appears only
  * after the watermark passes last_event + gap. */
class DormancyTimeoutSpec extends SparkSpecBase {
  import spark.implicits._

  test("single-event session alerts on watermark-driven timeout") {
    val dir = Files.createTempDirectory("graft_dt").toString
    val base = 1700000000000000000L
    val hourNs = 3600L * 1000000000L
    val gapUs = 48L * 3600 * 1000000

    def writeFile(rows: Seq[(Long, Long, Long, String, Double)], f: String): Unit = {
      val staging = Files.createTempDirectory("graft_dt_st").toString
      rows.toDF("event_id", "ts", "user_id", "event_type", "value")
        .withColumn("props", lit("{}"))
        .coalesce(1).write.mode("overwrite").parquet(staging)
      val part = new java.io.File(staging).listFiles()
        .find(_.getName.endsWith(".parquet")).get
      Files.copy(part.toPath, java.nio.file.Paths.get(s"$dir/$f.parquet"))
    }

    // account 7: lone event (dormant). account 8: two events inside one
    // session (not dormant). sentinel on account 9 advances the watermark
    // past everyone's last_event + gap.
    writeFile(Seq(
      (1L, base, 7L, "purchase", 10.0),
      (2L, base + hourNs, 8L, "view", 5.0),
      (3L, base + 2 * hourNs, 8L, "view", 5.0)), "c1")
    writeFile(Seq((4L, base + 3000 * hourNs, 9L, "view", 1.0)), "c2")

    val alerts = Pipelines.dormancyTimeoutAlerts(spark,
      Pipelines.parsedStreamFromPath(spark, dir, maxFilesPerTrigger = Some(1)),
      gapUs)
    val q = alerts.toDF().writeStream.format("memory").queryName("dorm_timeout")
      .outputMode("append").start()
    q.processAllAvailable(); q.stop()

    val got = spark.table("dorm_timeout")
      .select("account_id", "n_events").as[(Long, Long)].collect().toSet
    // only account 7's lone session alerts; 8 had 2 events; 9 still open
    assert(got === Set((7L, 1L)))
  }
}
