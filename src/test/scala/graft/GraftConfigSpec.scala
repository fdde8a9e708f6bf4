package graft

class GraftConfigSpec extends SparkSpecBase {

  test("defaults reproduce the oracle-verified constants") {
    val c = GraftConfig.load(spark)
    assert(c.highValueThreshold === SparkEntry.HighValueThreshold)
    assert(c.velocityWindowSec === SparkEntry.VelocityWindowSec)
    assert(c.velocityMinTxns === SparkEntry.VelocityMinTxns)
    assert(c.dailySpendAlert === SparkEntry.DailySpendAlert)
    assert(c.dormancyGap === SparkEntry.DormancyGap)
  }

  test("spark conf overrides a threshold without recompiling") {
    spark.conf.set("spark.graft.highValueThresholdNgn", "500000")
    try {
      assert(GraftConfig.load(spark).highValueThreshold === 500000.0)
    } finally spark.conf.unset("spark.graft.highValueThresholdNgn")
  }

  test("ingest config: batch-curator defaults, spark-conf override") {
    val d = graft.streaming.DocIngestApp.IngestConfig.load(spark)
    assert(d.lang === "en" && d.minQuality === 0.5 &&
      d.watermarkDelay === "1 hour")
    spark.conf.set("spark.graft.ingestMinQuality", "0.7")
    try {
      assert(graft.streaming.DocIngestApp.IngestConfig.load(spark)
        .minQuality === 0.7)
    } finally spark.conf.unset("spark.graft.ingestMinQuality")
  }

  test("a configured pipeline uses the loaded threshold end to end") {
    spark.conf.set("spark.graft.highValueThresholdNgn", "300.0")
    try {
      val c = GraftConfig.load(spark)
      val parsed = graft.cdc.EnvelopeOps.upsertsOnly(
        graft.cdc.EnvelopeOps.parsedTransactions(Tables.events(spark, sf0001)))
      val hv = parsed.filter(
        graft.ops.Predicates.isHighValue(
          org.apache.spark.sql.functions.col("amount"), c.highValueThreshold))
      import org.apache.spark.sql.functions.col
      assert(hv.filter(col("amount") < 300.0).count() === 0)
      assert(hv.count() <
        parsed.filter(col("amount") >= SparkEntry.HighValueThreshold).count())
    } finally spark.conf.unset("spark.graft.highValueThresholdNgn")
  }
}
