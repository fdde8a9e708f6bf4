package graft.streaming

import graft.{SparkSpecBase, SparkEntry, Tables}

/** The streaming KTable (update-mode latest-per-key aggregation) must
  * converge to the batch latest-by-key view after all input is processed. */
class LatestTableSpec extends SparkSpecBase {

  test("streaming latest table (complete snapshot) == batch q_latest_by_key") {
    val stream = Pipelines.latestTable(Pipelines.parsedStream(spark, sf0001))
    val q = stream.writeStream.format("memory").queryName("ktable")
      .outputMode("complete").start()
    q.processAllAvailable(); q.stop()
    val got = spark.table("ktable").collect().toSet
    val want = SparkEntry.queries("q_latest_by_key")(spark, sf0001).collect().toSet
    assert(got === want)
    assert(got.nonEmpty)
  }

  test("streaming accounts KTable (complete snapshot) == batch accountsDim") {
    import org.apache.spark.sql.functions.col
    val stream = Pipelines.accountsDimStream(spark, sf0001)
    val q = stream.writeStream.format("memory").queryName("acct_ktable")
      .outputMode("complete").start()
    q.processAllAvailable(); q.stop()
    // apply tombstones to the snapshot the way an upsert sink would
    val got = spark.table("acct_ktable")
      .filter(col("op") =!= "d").drop("op").collect().toSet
    val want = graft.cdc.DimensionCdc.accountsDim(
      Tables.customer(spark, sf0001)).collect().toSet
    assert(got === want)
    assert(got.nonEmpty)
  }
}
