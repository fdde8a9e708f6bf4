package graft.streaming

import java.nio.file.{Files, Paths}

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.SparkSpecBase

/** The hash-bucketed KTable store: incremental maintenance (only buckets
  * containing changed keys are rewritten per batch), replay idempotence
  * across the pointer-swap/checkpoint-commit window, and snapshot GC. */
class DimStoreSpec extends SparkSpecBase {

  import spark.implicits._

  private def dim(rows: Seq[(Long, String, String)]): DataFrame =
    rows.toDF("account_id", "account_number", "op")

  private def storeRows(dir: String): Set[(Long, String)] =
    DimStore.read(spark, dir).map(
      _.select("account_id", "account_number").as[(Long, String)]
        .collect().toSet).getOrElse(Set.empty)

  private def versionDirs(dir: String): Set[String] =
    Files.list(Paths.get(dir)).iterator().asScala
      .map(_.getFileName.toString).filter(_.matches("v\\d+")).toSet

  private def bucketsIn(dir: String, version: String): Set[String] = {
    val p = Paths.get(dir, version)
    if (!Files.exists(p)) Set.empty
    else Files.list(p).iterator().asScala.map(_.getFileName.toString)
      .filter(_.startsWith("__bucket=")).toSet
  }

  test("upsert merges, deletes tombstoned keys, and survives replay of an uncommitted version") {
    val dir = Files.createTempDirectory("graft_dimstore").toString
    DimStore.upsert(dir, Seq("account_id"), numBuckets = 8)(
      dim(Seq((1L, "a1", "u"), (2L, "a2", "u"), (3L, "a3", "u"))), 0L)
    assert(storeRows(dir) === Set((1L, "a1"), (2L, "a2"), (3L, "a3")))

    // batch 1: update key 2, tombstone key 3
    DimStore.upsert(dir, Seq("account_id"), numBuckets = 8)(
      dim(Seq((2L, "a2x", "u"), (3L, "a3", "d"))), 1L)
    assert(storeRows(dir) === Set((1L, "a1"), (2L, "a2x")))

    // crash-AFTER-swap replay: same batch id again must short-circuit (the
    // naive re-run would read v1 while overwriting v1 and crash-loop)
    DimStore.upsert(dir, Seq("account_id"), numBuckets = 8)(
      dim(Seq((2L, "a2x", "u"), (3L, "a3", "d"))), 1L)
    assert(DimStore.currentVersion(dir) === Some("v1"))
    assert(storeRows(dir) === Set((1L, "a1"), (2L, "a2x")))

    // crash-BEFORE-swap replay: a half-written v2 exists but is
    // unreferenced; the replayed batch overwrites it cleanly
    Files.createDirectories(Paths.get(dir, "v2", "junk"))
    DimStore.upsert(dir, Seq("account_id"), numBuckets = 8)(
      dim(Seq((4L, "a4", "u"))), 2L)
    assert(storeRows(dir) === Set((1L, "a1"), (2L, "a2x"), (4L, "a4")))
  }

  test("per-batch write cost is the batch (delta append), not the store") {
    val dir = Files.createTempDirectory("graft_dimstore_inc").toString
    val nb = 64
    // 5k-key initial load compacts into the bucketed base
    val init = (1L to 5000L).map(k => (k, s"acct$k", "u"))
    DimStore.upsert(dir, Seq("account_id"), numBuckets = nb)(dim(init), 0L)
    val initialBuckets = bucketsIn(dir, "v0")
    assert(initialBuckets.size > nb / 2)

    // a 3-key batch appends ONE delta file — no bucket of the 1M-row-scale
    // base is touched (hash-bucketing alone cannot give this: 3 uniform
    // keys land in ~3 buckets, but a 1k-key batch lands in ~all of them)
    DimStore.upsert(dir, Seq("account_id"), numBuckets = nb)(
      dim(Seq((10L, "x", "u"), (20L, "y", "u"), (30L, "z", "u"))), 1L)
    assert(bucketsIn(dir, "v1").isEmpty)
    assert(Files.exists(Paths.get(dir, "v1", "delta")))
    // base buckets are carried forward by reference from v0
    val manifest = new String(
      Files.readAllBytes(Paths.get(dir, "manifests", "v1")), "UTF-8")
    assert(manifest.contains("v0/__bucket="))
    assert(manifest.contains("D\tv1/delta"))
    // the merged read view resolves deltas over base
    val rows = storeRows(dir)
    assert(rows.size === 5000)
    assert(rows((10L, "x")) && rows((20L, "y")) && rows((5000L, "acct5000")))
  }

  test("compaction folds the delta window into changed buckets only; deltas then GC") {
    val dir = Files.createTempDirectory("graft_dimstore_cmp").toString
    val nb = 64
    DimStore.upsert(dir, Seq("account_id"), numBuckets = nb, maxDeltas = 2)(
      dim((1L to 5000L).map(k => (k, s"acct$k", "u"))), 0L)
    // two delta appends fill the window (update 10, tombstone 20)
    DimStore.upsert(dir, Seq("account_id"), numBuckets = nb, maxDeltas = 2)(
      dim(Seq((10L, "x", "u"))), 1L)
    DimStore.upsert(dir, Seq("account_id"), numBuckets = nb, maxDeltas = 2)(
      dim(Seq((20L, "gone", "d"))), 2L)
    // third batch triggers compaction: base buckets for keys {10,20,30}
    // rewritten, everything else carried forward; no D lines remain
    DimStore.upsert(dir, Seq("account_id"), numBuckets = nb, maxDeltas = 2)(
      dim(Seq((30L, "z", "u"))), 3L)
    val manifest = new String(
      Files.readAllBytes(Paths.get(dir, "manifests", "v3")), "UTF-8")
    assert(!manifest.contains("D\t"))
    assert(bucketsIn(dir, "v3").size <= 3)
    assert(manifest.contains("v0/__bucket="))
    val rows = storeRows(dir)
    assert(rows.size === 5000 - 1) // 10 and 30 updated in place, 20 deleted
    assert(rows((10L, "x")) && rows((30L, "z")) && !rows.exists(_._1 == 20L))
    // a second compaction cycle still reads correctly
    DimStore.upsert(dir, Seq("account_id"), numBuckets = nb, maxDeltas = 2)(
      dim(Seq((20L, "back", "u"))), 4L)
    assert(storeRows(dir)((20L, "back")))
  }

  test("old snapshots are garbage-collected: disk holds current + one prior") {
    val dir = Files.createTempDirectory("graft_dimstore_gc").toString
    (0L to 4L).foreach { b =>
      DimStore.upsert(dir, Seq("account_id"), numBuckets = 4)(
        dim(Seq((b, s"a$b", "u"))), b)
    }
    // v0..v2's exclusively-owned data would accumulate unboundedly without
    // GC; only versions referenced by the v4 or v3 manifests may remain
    val kept = versionDirs(dir)
    val manifests = Files.list(Paths.get(dir, "manifests")).iterator().asScala
      .map(_.getFileName.toString).toSet
    assert(manifests === Set("v3", "v4"))
    val referenced = manifests.flatMap { m =>
      new String(Files.readAllBytes(Paths.get(dir, "manifests", m)), "UTF-8")
        .split('\n').filter(_.nonEmpty).map(_.split('\t')(1).split('/').head)
    }
    assert(kept === (referenced ++ manifests))
    // every key still readable through the manifest chain
    assert(storeRows(dir) === (0L to 4L).map(k => (k, s"a$k")).toSet)
  }

  test("tombstoning every key in a bucket drops it from the manifest; empty store reads as None") {
    val dir = Files.createTempDirectory("graft_dimstore_ts").toString
    DimStore.upsert(dir, Seq("account_id"), numBuckets = 4)(
      dim(Seq((1L, "a1", "u"))), 0L)
    DimStore.upsert(dir, Seq("account_id"), numBuckets = 4)(
      dim(Seq((1L, "a1", "d"))), 1L)
    assert(DimStore.read(spark, dir).isEmpty)
    assert(DimStore.currentVersion(dir) === Some("v1"))
    // and the store recovers when the key reappears
    DimStore.upsert(dir, Seq("account_id"), numBuckets = 4)(
      dim(Seq((1L, "a1v2", "u"))), 2L)
    assert(storeRows(dir) === Set((1L, "a1v2")))
  }
}
