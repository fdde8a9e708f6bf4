package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.{SparkSpecBase, Tables}
import graft.cdc.{EnvelopeOps, SnapshotDiff}

/** The streaming diff view must agree with the batch operator it twins
  * ([[graft.cdc.SnapshotDiff.changelogDiff]]): last emission per key ==
  * the batch classification over everything ingested, at any batch
  * placement and arrival order. */
class SnapshotDiffStreamSpec extends SparkSpecBase {

  import spark.implicits._

  private def lastPerKey(rows: Seq[SnapshotDiffStream.DiffChange])
      : Map[Long, SnapshotDiffStream.DiffChange] =
    rows.zipWithIndex.groupBy(_._1.key)
      .view.mapValues(_.maxBy(_._2)._1).toMap

  test("corpus equality: streamed view == batch changelogDiff at fixed horizons") {
    implicit val ctx = spark.sqlContext
    val cl = EnvelopeOps.parsedTransactions(Tables.events(spark, sf0001))
      .filter(col("account_id") =!= 0)
    val hz = cl.agg(
      expr("(min(event_time_us) + max(event_time_us)) div 2").cast("long"),
      max("event_time_us")).as[(Long, Long)].head()
    val (t1, t2) = hz

    val digest = SnapshotDiff.valueDigest(Seq(col("txn_id"),
      expr("CAST(round(amount * 100) AS BIGINT)"),
      col("txn_type"), col("status")))
    val want = SnapshotDiff.changelogDiff(cl, Seq("account_id"),
        "event_time_us", "op", digest, lit(t1), lit(t2),
        tieCols = Seq(col("txn_id")))
      .select(col("account_id"), col("change"), col("old_seq"), col("new_seq"))
      .as[(Long, String, Option[Long], Option[Long])].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    assert(want.nonEmpty)

    // the same changelog as wire rows, worst-case arrival order (by
    // digest — decorrelated from event time), three micro-batches
    val versions = cl.select(col("account_id"), col("event_time_us"),
        col("txn_id"), col("op"), digest.as("digest"))
      .as[(Long, Long, String, String, String)].collect()
      .sortBy(_._5)
    val input = MemoryStream[(Long, Long, String, String, String)]
    val stream = SnapshotDiffStream.changelogDiffStream(spark,
      input.toDF().toDF("key", "seq", "tie", "op", "digest"), t1, t2)
    val q = stream.toDF().writeStream.format("memory")
      .queryName("snapdiff_stream").outputMode("append").start()
    try versions.grouped((versions.length + 2) / 3).foreach { chunk =>
      input.addData(chunk.toSeq); q.processAllAvailable()
    } finally q.stop()

    val got = lastPerKey(spark.table("snapdiff_stream")
      .as[SnapshotDiffStream.DiffChange].collect().toSeq)
    val gotChanged = got.collect {
      case (k, d) if d.change != "unchanged" =>
        k -> ((d.change, d.old_seq, d.new_seq))
    }
    assert(gotChanged === want)
    // every ingested key reported some classification
    assert(got.keySet === versions.map(_._1).toSet)
  }

  test("late old-side version flips 'added' to 'changed' (supersede contract)") {
    import org.apache.spark.api.java.Optional
    import org.apache.spark.sql.streaming.{GroupStateTimeout, TestGroupState}
    def st() = TestGroupState.create[(Option[(Long, String, String, String)],
        Option[(Long, String, String, String)])](
      Optional.empty(), GroupStateTimeout.NoTimeout,
      batchProcessingTimeMs = 0L,
      eventTimeWatermarkMs = Optional.empty(), hasTimedOut = false)
    val state = st()
    val f = SnapshotDiffStream.process(t1 = 100L, t2 = 200L) _

    // only a new-side version: added
    val r1 = f(7L, Iterator(
      SnapshotDiffStream.DiffVersion(7L, 150L, "b", "u", "D2")), state).toSeq
    assert(r1.map(d => (d.change, d.old_seq, d.new_seq)) ===
      Seq(("added", None, Some(150L))))

    // late old-side version with a different digest: now changed
    val r2 = f(7L, Iterator(
      SnapshotDiffStream.DiffVersion(7L, 90L, "a", "c", "D1")), state).toSeq
    assert(r2.map(d => (d.change, d.old_seq, d.new_seq)) ===
      Seq(("changed", Some(90L), Some(150L))))

    // tombstone at the head: deleted (old side still present)
    val r3 = f(7L, Iterator(
      SnapshotDiffStream.DiffVersion(7L, 180L, "c", "d", "D2")), state).toSeq
    assert(r3.map(d => (d.change, d.old_seq, d.new_seq)) ===
      Seq(("deleted", Some(90L), None)))

    // same-digest old version arriving even later cannot resurrect:
    // (seq, tie) order keeps the tombstone as the new-side max
    val r4 = f(7L, Iterator(
      SnapshotDiffStream.DiffVersion(7L, 95L, "z", "u", "D2")), state).toSeq
    assert(r4.map(_.change) === Seq("deleted"))
  }

  test("seq-tie ordering matches the batch struct-max on ties") {
    import org.apache.spark.api.java.Optional
    import org.apache.spark.sql.streaming.{GroupStateTimeout, TestGroupState}
    val state = TestGroupState.create[(Option[(Long, String, String, String)],
        Option[(Long, String, String, String)])](
      Optional.empty(), GroupStateTimeout.NoTimeout,
      batchProcessingTimeMs = 0L,
      eventTimeWatermarkMs = Optional.empty(), hasTimedOut = false)
    val f = SnapshotDiffStream.process(t1 = 100L, t2 = 200L) _
    // two versions at the same seq on the new side: higher tie wins
    val out = f(1L, Iterator(
      SnapshotDiffStream.DiffVersion(1L, 150L, "t1", "u", "A"),
      SnapshotDiffStream.DiffVersion(1L, 150L, "t9", "u", "B"),
      SnapshotDiffStream.DiffVersion(1L, 50L, "t0", "c", "A")), state).toSeq
    assert(out.map(d => (d.change, d.new_seq)) === Seq(("changed", Some(150L))))
    assert(state.get._2.get._2 === "t9") // tie-break kept the max tie
  }
}
