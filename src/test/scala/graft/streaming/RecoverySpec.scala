package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSpecBase

/** Fault-tolerance: the reconciliation pipeline's per-account state must
  * survive a stop/restart from checkpoint (the analog of the reference's
  * RocksDB store + changelog restore —
  * `config/ABBankStreamsConfig.java:31-35`, SURVEY §4). */
class RecoverySpec extends SparkSpecBase {
  import spark.implicits._

  test("flatMapGroupsWithState balance survives query restart from checkpoint") {
    val dir = Files.createTempDirectory("graft_rec_in").toString
    val ckpt = Files.createTempDirectory("graft_rec_ck").toString
    val base = 1700000000000000000L

    def writeFile(rows: Seq[(Long, Long, Long, String, Double)], f: String): Unit = {
      val staging = Files.createTempDirectory("graft_rec_st").toString
      rows.toDF("event_id", "ts", "user_id", "event_type", "value")
        .withColumn("props", lit("{}"))
        .coalesce(1).write.mode("overwrite").parquet(staging)
      val part = new java.io.File(staging).listFiles()
        .find(_.getName.endsWith(".parquet")).get
      Files.copy(part.toPath, java.nio.file.Paths.get(s"$dir/$f.parquet"))
    }

    // memory sink can't recover from checkpoint; use the parquet file sink
    val outDir = Files.createTempDirectory("graft_rec_out").toString
    def runBatch(): Unit = {
      val out = Pipelines.reconcileAlerts(spark,
        Pipelines.parsedStreamFromPath(spark, dir)).toDF()
      val q = out.writeStream.format("parquet").option("path", outDir)
        .outputMode("append").option("checkpointLocation", ckpt).start()
      q.processAllAvailable(); q.stop()
    }
    def results() = spark.read.parquet(outDir)

    // batch 1: one purchase for account 7 -> balance -100, BOOTSTRAP
    writeFile(Seq((1L, base, 7L, "purchase", 100.0)), "f1")
    runBatch()
    val r1 = results().filter($"txn_id" === 1).head()
    assert(r1.getAs[String]("recon_status") === "BOOTSTRAP")
    assert(r1.getAs[Double]("balance_after") === -100.0)

    // stop + restart from the same checkpoint with a new file appended
    writeFile(Seq((2L, base + 1000000000L, 7L, "signup", 30.0)), "f2")
    runBatch()
    val r2 = results().filter($"txn_id" === 2).head()
    // state restored: stored_balance = -100 (not BOOTSTRAP), new bal -70
    assert(r2.getAs[String]("recon_status") === "BALANCE_UPDATE")
    assert(r2.getAs[Double]("stored_balance") === -100.0)
    assert(r2.getAs[Double]("balance_after") === -70.0)
  }

  test("funnel pending-click state and timers survive restart from checkpoint") {
    val dir = Files.createTempDirectory("graft_recf_in").toString
    val ckpt = Files.createTempDirectory("graft_recf_ck").toString
    val base = 1700000000000000000L
    val hourNs = 3600L * 1000000000L

    def writeFile(rows: Seq[(Long, Long, Long, String, Double)], f: String): Unit = {
      val staging = Files.createTempDirectory("graft_recf_st").toString
      rows.toDF("event_id", "ts", "user_id", "event_type", "value")
        .withColumn("props", lit("{}"))
        .coalesce(1).write.mode("overwrite").parquet(staging)
      val part = new java.io.File(staging).listFiles()
        .find(_.getName.endsWith(".parquet")).get
      Files.copy(part.toPath, java.nio.file.Paths.get(s"$dir/$f.parquet"))
    }

    val outDir = Files.createTempDirectory("graft_recf_out").toString
    def runBatch(): Unit = {
      val out = Pipelines.funnelAlerts(spark,
        Pipelines.eventStreamFromPath(spark, dir)).toDF()
      val q = out.writeStream.format("parquet").option("path", outDir)
        .outputMode("append").option("checkpointLocation", ckpt).start()
      q.processAllAvailable(); q.stop()
    }
    def results() = spark.read.parquet(outDir)

    // run 1: two clicks land in state, nothing resolves yet
    writeFile(Seq(
      (1L, base, 7L, "click", 1.0),
      (2L, base + hourNs / 2, 7L, "click", 1.0)), "f1")
    runBatch()
    assert(results().count() === 0)

    // restart 1: a purchase 40 min after click 2 — converts ONLY click 2
    // (click 1's horizon passed), and the same event's arrival seals
    // click 1 unconverted. Both clicks came from restored state.
    writeFile(Seq(
      (3L, base + hourNs / 2 + 2400L * 1000000000L, 7L, "purchase", 1.0)), "f2")
    runBatch()
    val rows = results().collect()
      .map(r => r.getAs[Long]("event_id") ->
        ((Option(r.getAs[Any]("next_purchase_us")).map(_.asInstanceOf[Long]),
          r.getAs[Boolean]("converted")))).toMap
    assert(rows.keySet === Set(1L, 2L))
    assert(rows(1L) === ((None, false)))
    assert(rows(2L) ===
      ((Some((base + hourNs / 2 + 2400L * 1000000000L) / 1000), true)))
  }

  test("3-step pattern two-stage state survives restart from checkpoint") {
    val dir = Files.createTempDirectory("graft_recp_in").toString
    val ckpt = Files.createTempDirectory("graft_recp_ck").toString
    val base = 1700000000000000000L
    val minNs = 60L * 1000000000L

    def writeFile(rows: Seq[(Long, Long, Long, String, Double)], f: String): Unit = {
      val staging = Files.createTempDirectory("graft_recp_st").toString
      rows.toDF("event_id", "ts", "user_id", "event_type", "value")
        .withColumn("props", lit("{}"))
        .coalesce(1).write.mode("overwrite").parquet(staging)
      val part = new java.io.File(staging).listFiles()
        .find(_.getName.endsWith(".parquet")).get
      Files.copy(part.toPath, java.nio.file.Paths.get(s"$dir/$f.parquet"))
    }

    val outDir = Files.createTempDirectory("graft_recp_out").toString
    def runBatch(): Unit = {
      val out = Pipelines.pattern3Alerts(spark,
        Pipelines.eventStreamFromPath(spark, dir)).toDF()
      val q = out.writeStream.format("parquet").option("path", outDir)
        .outputMode("append").option("checkpointLocation", ckpt).start()
      q.processAllAvailable(); q.stop()
    }
    def results() = spark.read.parquet(outDir)

    // run 1: click + its view — the pair is promoted to STAGE-2 state,
    // nothing emits yet
    writeFile(Seq(
      (1L, base, 7L, "click", 1.0),
      (2L, base + 10 * minNs, 7L, "view", 1.0)), "f1")
    runBatch()
    assert(results().count() === 0)

    // restart: the purchase arrives 30 min after the view — it must
    // resolve the RESTORED stage-2 pair into a completed chain
    writeFile(Seq(
      (3L, base + 40 * minNs, 7L, "purchase", 1.0)), "f2")
    runBatch()
    val rows = results().collect().map(r =>
      (r.getAs[Long]("event_id"),
        Option(r.getAs[Any]("next_view_us")).map(_.asInstanceOf[Long]),
        Option(r.getAs[Any]("purchase_us")).map(_.asInstanceOf[Long]),
        r.getAs[Boolean]("completed")))
    assert(rows.toSeq === Seq((1L,
      Some((base + 10 * minNs) / 1000),
      Some((base + 40 * minNs) / 1000), true)))
  }
}
