package graft.streaming

import org.apache.spark.sql.functions._

import graft.SparkSpecBase
import graft.ops.Windows

/** State-store provider swap: the same stateful pipeline running on the
  * RocksDB provider (the 100 TB configuration — state spills to local
  * disk instead of living on the JVM heap) must produce results identical
  * to the default HDFS-backed in-memory provider. This is the config the
  * README promises for large key cardinalities; the provider is set per
  * query via `spark.sql.streaming.stateStore.providerClass`. */
class RocksDbStateSpec extends SparkSpecBase {

  test("velocity windows on RocksDB state store == default provider") {
    val prev = spark.conf.getOption("spark.sql.streaming.stateStore.providerClass")
    def run(name: String): Set[org.apache.spark.sql.Row] = {
      val stream = Pipelines.velocityAlerts(
        Pipelines.parsedStream(spark, sf0001), windowSec = 3600, minTxns = 2L)
      val q = stream.writeStream.format("memory").queryName(name)
        .outputMode("complete").start()
      q.processAllAvailable(); q.stop()
      spark.table(name).collect().toSet
    }
    val default = run("vel_default")
    try {
      spark.conf.set("spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
      val rocks = run("vel_rocksdb")
      assert(rocks === default)
      assert(rocks.nonEmpty)
    } finally {
      prev match {
        case Some(v) => spark.conf.set("spark.sql.streaming.stateStore.providerClass", v)
        case None => spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
      }
    }
  }
}
