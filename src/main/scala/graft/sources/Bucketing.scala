package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Bucketed-table helpers: pre-partition fact tables on their join/agg key
  * so repeated joins and aggregations on that key run shuffle-free.
  *
  * At 100 TB the dominant cost of `txns JOIN accounts` or repeated
  * `groupBy(account_id)` is re-shuffling the fact table every query.
  * Bucketing amortizes that: write once hash-partitioned into N buckets on
  * the key; every subsequent equi-join between tables bucketed on the same
  * key with the same N — and every aggregation on the key — reads
  * co-located buckets and skips the Exchange entirely (verified by the
  * plan-shape test in BucketingSpec).
  *
  * Bucket metadata lives in the session catalog (`saveAsTable`); at
  * production scale the same calls target the shared metastore.
  */
object Bucketing {

  /** Write `df` as a bucketed catalog table (sorted within buckets so
    * merge-style reads are sequential). */
  def writeBucketed(df: DataFrame, table: String, key: String, buckets: Int): Unit =
    df.write
      .mode("overwrite")
      .bucketBy(buckets, key)
      .sortBy(key)
      .format("parquet")
      .saveAsTable(table)

  def read(spark: SparkSession, table: String): DataFrame = spark.table(table)
}
