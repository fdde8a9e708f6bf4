package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Loaders for the driver-generated test corpus (see /root/repo/TESTDATA.md).
  *
  * Scale posture: every loader returns a plain parquet scan so Catalyst can
  * push filters / prune columns into the file source. Nothing here collects,
  * caches, or repartitions — partitioning decisions belong to the operators.
  */
object Tables {

  def table(spark: SparkSession, sfDir: String, name: String): DataFrame =
    spark.read.parquet(s"$sfDir/$name.parquet")

  /** `events` is written with parquet TIMESTAMP(NANOS) which Spark's vectorized
    * reader cannot map to TimestampType (micros). We read nanos as a plain
    * LongType (`spark.sql.legacy.parquet.nanosAsLong`) and derive:
    *   - `event_ts`   TimestampType, truncated nanos -> micros (matches what
    *                  DuckDB's CAST(ts AS TIMESTAMP) produces for the oracle)
    *   - `ts_us`      LongType epoch-micros (exact integer event time; all
    *                  window arithmetic uses this to stay engine-agnostic)
    * The raw ns column is kept as `ts_ns`.
    */
  def events(spark: SparkSession, sfDir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    deriveEventTime(table(spark, sfDir, "events").withColumnRenamed("ts", "ts_ns"))
  }

  /** Derive micros + timestamp event-time columns from a raw `ts_ns` long. */
  def deriveEventTime(df: DataFrame): DataFrame =
    df.withColumn("ts_us", expr("ts_ns div 1000"))
      .withColumn("event_ts", timestamp_micros(col("ts_us")))

  def customer(spark: SparkSession, sfDir: String): DataFrame =
    table(spark, sfDir, "customer")

  def nation(spark: SparkSession, sfDir: String): DataFrame =
    table(spark, sfDir, "nation")

  def documents(spark: SparkSession, sfDir: String): DataFrame =
    table(spark, sfDir, "documents")

  def embeddings(spark: SparkSession, sfDir: String): DataFrame =
    table(spark, sfDir, "embeddings")

  /** Register every corpus table as a temp view + the parsed-transaction
    * view, giving users an ad-hoc `spark.sql` surface over the engine
    * (the reference has no SQL at all — with Catalyst it comes free). */
  def registerViews(spark: SparkSession, sfDir: String): Unit = {
    Seq("region", "nation", "customer", "supplier", "part",
        "orders", "lineitem", "documents", "embeddings")
      .foreach(n => table(spark, sfDir, n).createOrReplaceTempView(n))
    events(spark, sfDir).createOrReplaceTempView("events")
    graft.cdc.EnvelopeOps.parsedTransactions(events(spark, sfDir))
      .createOrReplaceTempView("transactions")
    graft.functions.GraftFunctions.register(spark)
  }
}
