package graft.streaming

import java.nio.file.{Files, Path, Paths, StandardCopyOption}
import java.util.Comparator

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Materialized KTable store — the Spark analog of the reference's
  * RocksDB KV stores with changelog restore (state registration
  * `topology/ABBankTopology.java:67-71`, store names
  * `config/ABBankStreamsConfig.java:31-35`).
  *
  * An update-mode latest-by-key aggregation (e.g.
  * [[Pipelines.accountsDimStream]]) emits each micro-batch's CHANGED keys
  * only; [[upsert]] folds them into a HASH-BUCKETED parquet snapshot so
  * the per-batch write cost is bounded by the buckets that actually
  * contain changed keys — the analog of RocksDB writing only changed keys,
  * not rewriting the whole store. Layout:
  *
  * {{{
  *   storeDir/LATEST            -> "v<batchId>"   (atomic pointer)
  *   storeDir/NBUCKETS          -> bucket count, fixed at first commit
  *   storeDir/manifests/v<id>   -> lines "<bucket>\t<relative data path>"
  *   storeDir/v<id>/__bucket=<b>/   parquet files (only CHANGED buckets)
  * }}}
  *
  * A version's manifest maps every live bucket to the version directory
  * that last rewrote it, so unchanged buckets are carried forward by
  * reference, never copied. The `LATEST` pointer file is swapped
  * atomically — a reader that opened the previous snapshot keeps a
  * consistent view. Crash/replay matrix (at-least-once `foreachBatch`):
  *
  *  - crash BEFORE the pointer swap: the half-written `v<batchId>`
  *    directory is unreferenced by any manifest; the replayed batch
  *    overwrites it (it only READS paths named by the committed manifest,
  *    which can never include the uncommitted version, so the
  *    read-while-overwriting hazard cannot arise);
  *  - crash AFTER the swap but before the streaming checkpoint commit:
  *    the replayed batch observes `currentVersion == v<batchId>` and
  *    short-circuits — without the guard it would read the snapshot it is
  *    about to overwrite and crash-loop.
  *
  * Tombstones (`op = 'd'` rows — the latest version of a deleted key)
  * REMOVE the key, Kafka Streams' actual KV-store delete semantics; a
  * bucket whose last key is deleted drops out of the manifest. After each
  * commit, version directories no longer referenced by the current OR the
  * immediately previous manifest (kept for in-flight readers) are
  * garbage-collected, so disk use is bounded by ~2 snapshots instead of
  * one per micro-batch.
  *
  * Scale posture: the merge reads only the changed buckets, anti-joins the
  * broadcast changed-key set, and writes one `partitionBy` job — the store
  * never shuffles and the write amplification per batch is
  * O(|changed buckets| × bucket size), not O(|store|). At warehouse scale
  * the same contract is served by a table format's MERGE; this
  * manifest-pointer form keeps the engine dependency-free.
  */
object DimStore {

  val DefaultBuckets = 256

  private def pointerPath(storeDir: String) = Paths.get(storeDir, "LATEST")
  private def manifestDir(storeDir: String) = Paths.get(storeDir, "manifests")
  private def nbucketsPath(storeDir: String) = Paths.get(storeDir, "NBUCKETS")

  /** The committed snapshot's version name (`v<batchId>`), if any batch
    * committed. */
  def currentVersion(storeDir: String): Option[String] = {
    val p = pointerPath(storeDir)
    if (Files.exists(p)) Some(new String(Files.readAllBytes(p), "UTF-8").trim)
    else None
  }

  /** bucket -> data path relative to storeDir, for a committed version. */
  private def readManifest(storeDir: String, version: String): Map[Int, String] = {
    val p = manifestDir(storeDir).resolve(version)
    if (!Files.exists(p)) Map.empty
    else new String(Files.readAllBytes(p), "UTF-8").split('\n')
      .iterator.map(_.trim).filter(_.nonEmpty)
      .map { line =>
        val Array(b, rel) = line.split('\t')
        b.toInt -> rel
      }.toMap
  }

  /** Open the current snapshot (None before the first commit or when every
    * key has been tombstoned away). */
  def read(spark: SparkSession, storeDir: String): Option[DataFrame] =
    currentVersion(storeDir).flatMap { v =>
      val paths = readManifest(storeDir, v).values.map(rel => s"$storeDir/$rel")
      if (paths.isEmpty) None
      // Leaf `__bucket=<b>` dirs are each their own discovery base path, so
      // the partition column is not re-inferred; drop defensively anyway.
      else Some(spark.read.parquet(paths.toSeq: _*).drop("__bucket"))
    }

  private def deleteRecursively(p: Path): Unit =
    if (Files.exists(p))
      Files.walk(p).sorted(Comparator.reverseOrder[Path]())
        .iterator().asScala.foreach(Files.delete)

  /** `foreachBatch` sink maintaining the store from an update-mode
    * latest-by-key changelog aggregation. `batch` must carry the key
    * columns, the dimension payload, and the `op` column (so deletes can
    * win — filtering them upstream would resurrect the prior version). */
  def upsert(storeDir: String, keyCols: Seq[String],
      numBuckets: Int = DefaultBuckets)(
      batch: DataFrame, batchId: Long): Unit = {
    val version = s"v$batchId"
    // Replay after a crash in the swap-to-checkpoint window: the batch is
    // already applied; re-running would read and overwrite the same paths.
    if (currentVersion(storeDir).contains(version)) return

    val spark = batch.sparkSession
    Files.createDirectories(Paths.get(storeDir))
    val nb =
      if (Files.exists(nbucketsPath(storeDir)))
        new String(Files.readAllBytes(nbucketsPath(storeDir)), "UTF-8").trim.toInt
      else {
        Files.write(nbucketsPath(storeDir), numBuckets.toString.getBytes("UTF-8"))
        numBuckets
      }
    def bucketCol = pmod(hash(keyCols.map(col): _*), lit(nb))

    val changed = batch.persist()
    try {
      val changedBuckets = changed.select(bucketCol.as("__bucket"))
        .distinct().collect().map(_.getInt(0)).toSet
      val prevVersionOpt = currentVersion(storeDir)
      val prevManifest =
        prevVersionOpt.map(readManifest(storeDir, _)).getOrElse(Map.empty)

      val live = changed.filter(col("op") =!= "d").drop("op")
      val touchedExisting = prevManifest.view
        .filterKeys(changedBuckets).values.map(rel => s"$storeDir/$rel").toSeq
      val merged =
        if (touchedExisting.isEmpty) live
        else spark.read.parquet(touchedExisting: _*).drop("__bucket")
          .join(broadcast(changed.select(keyCols.map(col): _*).distinct()),
            keyCols, "left_anti")
          .unionByName(live)

      val versionDir = Paths.get(storeDir, version)
      merged.withColumn("__bucket", bucketCol)
        .write.mode("overwrite").partitionBy("__bucket")
        .parquet(versionDir.toString)

      // Buckets left empty by tombstones write no directory — they leave
      // the manifest entirely.
      val written: Set[Int] =
        if (!Files.exists(versionDir)) Set.empty
        else Files.list(versionDir).iterator().asScala
          .map(_.getFileName.toString)
          .collect { case s if s.startsWith("__bucket=") =>
            s.stripPrefix("__bucket=").toInt }
          .toSet
      val newManifest = (prevManifest -- changedBuckets) ++
        written.iterator.map(b => b -> s"$version/__bucket=$b")

      Files.createDirectories(manifestDir(storeDir))
      val body = newManifest.toSeq.sorted
        .map { case (b, rel) => s"$b\t$rel" }.mkString("\n")
      Files.write(manifestDir(storeDir).resolve(version), body.getBytes("UTF-8"))
      val tmp = Paths.get(storeDir, "LATEST.tmp")
      Files.write(tmp, version.getBytes("UTF-8"))
      Files.move(tmp, pointerPath(storeDir),
        StandardCopyOption.ATOMIC_MOVE, StandardCopyOption.REPLACE_EXISTING)

      // GC: keep data referenced by the current and the immediately
      // previous manifest (in-flight readers of the prior snapshot), drop
      // the rest.
      val keepManifests = Set(version) ++ prevVersionOpt
      val referenced = (newManifest.values ++
          prevVersionOpt.map(readManifest(storeDir, _)).getOrElse(Map.empty).values)
        .map(_.split('/').head).toSet ++ keepManifests
      Files.list(Paths.get(storeDir)).iterator().asScala
        .filter(p => p.getFileName.toString.matches("v\\d+") &&
          !referenced(p.getFileName.toString))
        .foreach(deleteRecursively)
      if (Files.exists(manifestDir(storeDir)))
        Files.list(manifestDir(storeDir)).iterator().asScala
          .filter(p => !keepManifests(p.getFileName.toString))
          .foreach(Files.delete)
    } finally changed.unpersist()
  }

  /** Start a store-maintenance query over a changelog aggregation. */
  def maintain(dim: DataFrame, storeDir: String, keyCols: Seq[String],
      checkpoint: String, numBuckets: Int = DefaultBuckets)
      : org.apache.spark.sql.streaming.StreamingQuery =
    dim.writeStream
      .outputMode("update")
      .option("checkpointLocation", checkpoint)
      .foreachBatch(upsert(storeDir, keyCols, numBuckets) _)
      .start()
}
