package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Date-partitioned parquet output — the standard layout for training-data
  * pipelines (one directory per day/source, so downstream jobs prune whole
  * partitions instead of scanning 100 TB).
  *
  * Writes repartition by the partition columns first: without it every
  * task writes a file into every partition directory (tasks × partitions
  * small files — the classic small-file explosion); with it each partition
  * directory gets ~one file per shuffle partition holding that key.
  */
object PartitionedSink {

  /** Write `df` partitioned by `partCols` (e.g. an event date column). */
  def writePartitioned(df: DataFrame, path: String, partCols: Seq[String]): Unit =
    df.repartition(partCols.map(col): _*)
      .write
      .mode("overwrite")
      .partitionBy(partCols: _*)
      .parquet(path)

  /** Read back with partition pruning available to Catalyst. */
  def read(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(path)
}
