package graft.streaming

import java.nio.file.{Files, Paths, StandardCopyOption}

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Materialized KTable store — the Spark analog of the reference's
  * RocksDB KV stores with changelog restore (state registration
  * `topology/ABBankTopology.java:67-71`, store names
  * `config/ABBankStreamsConfig.java:31-35`).
  *
  * An update-mode latest-by-key aggregation (e.g.
  * [[Pipelines.accountsDimStream]]) emits each micro-batch's CHANGED keys
  * only; [[upsert]] folds them into a parquet snapshot with copy-on-write
  * versioning: every batch writes a NEW `v<batchId>` directory, then swaps
  * the `LATEST` pointer file atomically — a reader that opened the
  * previous snapshot keeps a consistent view, and a crash mid-write leaves
  * the pointer untouched (the half-written version is simply re-written on
  * replay, since the directory name is the batch id: idempotent under
  * at-least-once delivery). Tombstones (`op = 'd'` rows — the latest
  * version of a deleted key) REMOVE the key, Kafka Streams' actual
  * KV-store delete semantics.
  *
  * Scale posture: the merge is one broadcast anti join (the changed-key
  * set is micro-batch-sized) plus a union — the store never shuffles. At
  * warehouse scale the same contract is served by a table format's MERGE;
  * this file-pointer form keeps the engine dependency-free.
  */
object DimStore {

  private def pointerPath(storeDir: String) = Paths.get(storeDir, "LATEST")

  /** The committed snapshot's directory name, if any batch committed. */
  def currentVersion(storeDir: String): Option[String] = {
    val p = pointerPath(storeDir)
    if (Files.exists(p)) Some(new String(Files.readAllBytes(p), "UTF-8").trim)
    else None
  }

  /** Open the current snapshot (None before the first commit). */
  def read(spark: SparkSession, storeDir: String): Option[DataFrame] =
    currentVersion(storeDir).map(v => spark.read.parquet(s"$storeDir/$v"))

  /** `foreachBatch` sink maintaining the store from an update-mode
    * latest-by-key changelog aggregation. `batch` must carry the key
    * columns, the dimension payload, and the `op` column (so deletes can
    * win — filtering them upstream would resurrect the prior version). */
  def upsert(storeDir: String, keyCols: Seq[String])(
      batch: DataFrame, batchId: Long): Unit = {
    val spark = batch.sparkSession
    val changed = batch.persist()
    try {
      val live = changed.filter(col("op") =!= "d").drop("op")
      val merged = read(spark, storeDir) match {
        case Some(existing) =>
          existing.join(
              broadcast(changed.select(keyCols.map(col): _*).distinct()),
              keyCols, "left_anti")
            .unionByName(live)
        case None => live
      }
      val version = s"v$batchId"
      merged.write.mode("overwrite").parquet(s"$storeDir/$version")
      val tmp = Paths.get(storeDir, "LATEST.tmp")
      Files.write(tmp, version.getBytes("UTF-8"))
      Files.move(tmp, pointerPath(storeDir),
        StandardCopyOption.ATOMIC_MOVE, StandardCopyOption.REPLACE_EXISTING)
    } finally changed.unpersist()
  }

  /** Start a store-maintenance query over a changelog aggregation. */
  def maintain(dim: DataFrame, storeDir: String, keyCols: Seq[String],
      checkpoint: String): org.apache.spark.sql.streaming.StreamingQuery =
    dim.writeStream
      .outputMode("update")
      .option("checkpointLocation", checkpoint)
      .foreachBatch(upsert(storeDir, keyCols) _)
      .start()
}
