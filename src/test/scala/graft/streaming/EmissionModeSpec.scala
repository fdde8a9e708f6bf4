package graft.streaming

import graft.SparkSpecBase

/** SURVEY §2.5 documents two defensible emission semantics for windowed
  * alerts: the Kafka Streams DSL's literal eager per-record changelog
  * (Spark: update mode) vs the documented on-window-close intent (append/
  * complete — what the batch oracle verifies). This spec pins the
  * relationship between the two so the fidelity choice stays a choice,
  * not an accident. */
class EmissionModeSpec extends SparkSpecBase {

  test("update mode reproduces the DSL's eager emission: intermediate counts appear") {
    val base = 1700000000000000000L
    val dir = java.nio.file.Files.createTempDirectory("graft_em").toString
    import org.apache.spark.sql.functions._
    import spark.implicits._
    // two events in the same window, delivered in two micro-batches
    def write(rows: Seq[(Long, Long, Long, String, Double)], f: String): Unit = {
      val staging = java.nio.file.Files.createTempDirectory("graft_em_st").toString
      rows.toDF("event_id", "ts", "user_id", "event_type", "value")
        .withColumn("props", lit("{}"))
        .coalesce(1).write.mode("overwrite").parquet(staging)
      val part = new java.io.File(staging).listFiles()
        .find(_.getName.endsWith(".parquet")).get
      java.nio.file.Files.copy(part.toPath,
        java.nio.file.Paths.get(s"$dir/$f.parquet"))
    }
    write(Seq((1L, base, 7L, "purchase", 1.0)), "c1")
    Thread.sleep(20)
    write(Seq((2L, base + 1000000000L, 7L, "purchase", 1.0)), "c2")

    val stream = Pipelines.velocityAlerts(
      Pipelines.parsedStreamFromPath(spark, dir, maxFilesPerTrigger = Some(1)),
      windowSec = 3600, minTxns = 1L)
    val q = stream.writeStream.format("memory").queryName("vel_update")
      .outputMode("update").start()
    q.processAllAvailable(); q.stop()

    val counts = spark.table("vel_update").select("n_txns").as[Long].collect().sorted
    // eager changelog: the SAME window emitted at count=1 then again at 2 —
    // exactly the duplicate-alert behavior the reference's DSL produces
    assert(counts.toSeq === Seq(1L, 2L))
  }
}
