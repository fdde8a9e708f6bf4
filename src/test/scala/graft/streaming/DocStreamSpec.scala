package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.{SparkSpecBase, Tables}
import graft.dedup.MinHashLSH

/** Streaming document dedup must agree with its batch twins: the batch
  * operators are the oracle-verified semantics, the stream adds bounded
  * watermark-expired state. */
class DocStreamSpec extends SparkSpecBase {

  import spark.implicits._

  /** (doc_id, ts_sec, text) -> document-stream surface. */
  private def docsFrom(input: MemoryStream[(Long, Long, String)]): DataFrame =
    input.toDF().toDF("doc_id", "ts_sec", "text")
      .withColumn("ingest_ts", timestamp_seconds(col("ts_sec")))

  private def run(df: DataFrame, name: String)(
      steps: (() => Unit)*): DataFrame = {
    val q = df.writeStream.format("memory").queryName(name)
      .outputMode("append").start()
    try steps.foreach { s => s(); q.processAllAvailable() }
    finally q.stop()
    spark.table(name)
  }

  test("exact dedup: first digest arrival passes, later duplicates drop") {
    implicit val ctx = spark.sqlContext
    val input = MemoryStream[(Long, Long, String)]
    val out = run(DocStream.exactDeduped(docsFrom(input), "1 hour"),
      "doc_exact")(
      () => input.addData((1L, 10L, "alpha beta gamma"),
                          (2L, 11L, "delta epsilon")),
      // 3 normalizes to doc 1's digest (case + padding); 4 is new
      () => input.addData((3L, 12L, "  ALPHA beta GAMMA "),
                          (4L, 13L, "zeta eta")))
    assert(out.select("doc_id").as[Long].collect().toSet === Set(1L, 2L, 4L))
  }

  test("exact dedup: digest state expires with the watermark (bounded state)") {
    implicit val ctx = spark.sqlContext
    val input = MemoryStream[(Long, Long, String)]
    val out = run(DocStream.exactDeduped(docsFrom(input), "10 seconds"),
      "doc_exact_ttl")(
      // base well above 0: event time == the initial watermark (epoch 0)
      // is filtered as late
      () => input.addData((1L, 1000L, "alpha beta gamma")),
      // watermark -> 1090s: doc 1's digest state (event time 1000s) expires
      () => input.addData((2L, 1100L, "unrelated text")),
      // same digest as doc 1, arriving after expiry -> re-emitted
      () => input.addData((3L, 1095L, "alpha beta gamma")))
    assert(out.select("doc_id").as[Long].collect().toSet === Set(1L, 2L, 3L))
  }

  test("streaming near-dup candidates == batch banding pairs on the corpus") {
    implicit val ctx = spark.sqlContext
    val docs = Tables.documents(spark, sf0001)
      .select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1))).sortBy(_._1)
    assert(docs.length > 100)

    val want = MinHashLSH.bandingCandidates(
        MinHashLSH.signatures(Tables.documents(spark, sf0001)))
      .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
    assert(want.nonEmpty)

    // feed the same corpus as three micro-batches in ingest order
    val input = MemoryStream[(Long, Long, String)]
    val chunks = docs.grouped((docs.length + 2) / 3).toSeq
    val out = run(
      DocStream.nearDupCandidates(spark, docsFrom(input),
        watermarkDelay = "1 hour").toDF(), "doc_neardup")(
      chunks.map(c => { () =>
        input.addData(c.map { case (id, t) => (id, 1000L + id, t) }.toSeq)
        ()
      }): _*)

    val got = out.select("doc_a", "doc_b").distinct()
      .as[(Long, Long)].collect().toSet
    assert(got === want)
  }

  test("maxResidents boundary: capped bucket still pairs new arrivals, never admits past cap") {
    import org.apache.spark.api.java.Optional
    import org.apache.spark.sql.streaming.{GroupStateTimeout, TestGroupState}
    val key = (0, 7L)
    def rows(ids: Long*) = ids.map(id =>
      DocStream.BandRow(id, new java.sql.Timestamp(1000000L + id), 0, 7L)).iterator
    val state = TestGroupState.create[DocStream.BucketState](
      Optional.empty(), GroupStateTimeout.EventTimeTimeout,
      batchProcessingTimeMs = 0L, eventTimeWatermarkMs = Optional.of(1L),
      hasTimedOut = false)
    val cap = 4

    // 6 docs land in an empty bucket with cap 4: 1-4 admitted, 5 and 6
    // pair against the capped residents but do NOT pair with each other
    val out1 = DocStream.process(stateTtlMs = 60000L, maxResidents = cap)(
      key, rows(1L, 2L, 3L, 4L, 5L, 6L), state).toSet
    val admittedPairs =
      for (a <- 1L to 4L; b <- (a + 1) to 4L) yield (a, b)
    val cappedPairs =
      for (n <- Seq(5L, 6L); a <- 1L to 4L) yield (a, n)
    assert(out1.map(p => (p.doc_a, p.doc_b)) ===
      (admittedPairs ++ cappedPairs).toSet)
    assert(state.get.residents === Vector(1L, 2L, 3L, 4L))

    // next batch: a fresh doc still pairs against all 4 residents; a
    // re-arrival of an ADMITTED doc is suppressed; the non-admitted doc 5
    // re-pairs on re-arrival (cap semantics: membership = admitted only)
    val out2 = DocStream.process(stateTtlMs = 60000L, maxResidents = cap)(
      key, rows(7L, 1L, 5L), state).toSet
    assert(out2.map(p => (p.doc_a, p.doc_b)) ===
      ((1L to 4L).map(a => (a, 7L)) ++ (1L to 4L).map(a => (a, 5L))).toSet)
    assert(state.get.residents === Vector(1L, 2L, 3L, 4L))
  }

  test("near-dup bucket state expires: pairs only within the TTL horizon") {
    implicit val ctx = spark.sqlContext
    val text = "one two three four five six seven eight nine ten"
    val input = MemoryStream[(Long, Long, String)]
    val out = run(
      DocStream.nearDupCandidates(spark, docsFrom(input),
        watermarkDelay = "10 seconds", stateTtlMs = 60L * 1000).toDF(),
      "doc_neardup_ttl")(
      // identical docs 5s apart: every band pairs them (base above the
      // initial epoch-0 watermark, which filters as late)
      () => input.addData((1L, 1000L, text), (2L, 1005L, text)),
      // sentinel advances the watermark far past bucket TTL (65s)
      () => input.addData((9L, 11000L, "unrelated filler words here")),
      // same text again: buckets were expired, so NO pair against 1/2
      () => input.addData((3L, 10995L, text)))
    val got = out.select("doc_a", "doc_b").distinct()
      .as[(Long, Long)].collect().toSet
    assert(got === Set((1L, 2L)))
  }

  test("streaming KMV sketch: last emission per source == batch kmvPerGroup") {
    implicit val ctx = spark.sqlContext
    val rnd = new scala.util.Random(42L)
    val rows = (1 to 300).map(i =>
      ("src" + (i % 3), rnd.nextLong() % 500))  // dupes + negatives
    val batches = rows.grouped(100).toSeq

    val input = MemoryStream[(String, Long)]
    val stream = DocStream.kmvSketches(spark,
      input.toDF().toDF("source", "h"), k = 16)
    val q = stream.writeStream.format("memory").queryName("kmv_live")
      .outputMode("append").start()
    try batches.foreach { b => input.addData(b); q.processAllAvailable() }
    finally q.stop()

    // one emission per source per batch; the LAST (max n_seen) is the
    // live sketch
    val live = spark.table("kmv_live").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getSeq[Long](2)))
      .groupBy(_._1).map { case (s, es) =>
        val m = es.maxBy(_._2); s -> (m._2, m._3)
      }

    val batch = graft.ops.Sketches.kmvPerGroup(
        rows.toDF("source", "h"), "source", col("h"), k = 16)
      .collect()
      .map(r => r.getString(0) -> (r.getSeq[Long](1), r.getLong(2))).toMap

    assert(live.keySet === batch.keySet)
    batch.foreach { case (src, (sketch, nRows)) =>
      val (nSeen, liveSketch) = live(src)
      assert(nSeen === nRows, s"$src n_seen")
      assert(liveSketch === sketch, s"$src sketch")
    }
  }

  test("streaming bottom-k sample: last emission per group == batch qsamplePerGroup") {
    implicit val ctx = spark.sqlContext
    val rnd = new scala.util.Random(815L)
    val rows = (1 to 300).map(i =>
      ("src" + (i % 3), rnd.nextLong() % 100, rnd.nextInt(1000).toLong))
    val batches = rows.grouped(100).toSeq

    val input = MemoryStream[(String, Long, Long)]
    val stream = DocStream.qsampleSketches(spark,
      input.toDF().toDF("source", "h", "v"), k = 16)
    val q = stream.writeStream.format("memory").queryName("qs_live")
      .outputMode("append").start()
    try batches.foreach { b => input.addData(b); q.processAllAvailable() }
    finally q.stop()

    val live = spark.table("qs_live").collect()
      .map(r => (r.getString(0), r.getLong(1),
        r.getSeq[Long](2).zip(r.getSeq[Long](3))))
      .groupBy(_._1).map { case (s, es) =>
        val m = es.maxBy(_._2); s -> (m._2, m._3)
      }

    val batch = graft.ops.Sketches.qsamplePerGroup(
        rows.toDF("source", "h", "v"), "source", col("h"), col("v"), k = 16)
      .collect()
      .map { r =>
        r.getString(0) -> (
          r.getSeq[org.apache.spark.sql.Row](1).map(p => (p.getLong(0), p.getLong(1))),
          r.getLong(2))
      }.toMap

    assert(live.keySet === batch.keySet)
    batch.foreach { case (src, (sample, nRows)) =>
      val (nSeen, liveSample) = live(src)
      assert(nSeen === nRows, s"$src n_seen")
      assert(liveSample.toSeq === sample.toSeq, s"$src sample")
    }
  }

  test("streaming Gram accumulator: last emission per group == batch GramAgg") {
    implicit val ctx = spark.sqlContext
    val rnd = new scala.util.Random(2080L)
    val d = 6
    val rows = (1 to 90).map(i =>
      ("s" + (i % 2), Seq.fill(d)(rnd.nextInt(100).toLong)))
    val batches = rows.grouped(30).toSeq

    val input = MemoryStream[(String, Seq[Long])]
    val stream = DocStream.gramSketches(spark,
      input.toDF().toDF("source", "g"))
    val q = stream.writeStream.format("memory").queryName("gram_live")
      .outputMode("append").start()
    try batches.foreach { b => input.addData(b); q.processAllAvailable() }
    finally q.stop()

    val live = spark.table("gram_live").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getSeq[Long](2)))
      .groupBy(_._1).map { case (s, es) =>
        val m = es.maxBy(_._2); s -> (m._2, m._3)
      }

    rows.groupBy(_._1).foreach { case (src, grp) =>
      val want = grp.map(_._2.toArray)
        .foldLeft(Array.emptyLongArray)(graft.sim.Gram.GramAgg.reduce)
      val (nSeen, gram) = live(src)
      assert(nSeen === grp.size.toLong, s"$src n_seen")
      assert(gram.toSeq === want.toSeq, s"$src gram")
    }
  }

  test("streaming span-dedup positions == batch duplicatedPositions, " +
      "each emitted exactly once") {
    implicit val ctx = spark.sqlContext
    val n = 4 // small gram so the sf0.001 corpus has plenty of dup spans
    val docs = Tables.documents(spark, sf0001)
      .select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1))).sortBy(_._1)
    assert(docs.length > 100)

    val want = graft.dedup.DupSpans.duplicatedPositions(
        Tables.documents(spark, sf0001), n)
      .as[(Long, Long)].collect().toSet
    assert(want.nonEmpty)

    val input = MemoryStream[(Long, Long, String)]
    val out = run(
      DocStream.dupPositions(spark, docsFrom(input), n).toDF(), "doc_spans")(
      docs.grouped((docs.length + 2) / 3).toSeq.map(c => { () =>
        input.addData(c.map { case (id, t) => (id, 1000L + id, t) }.toSeq)
        ()
      }): _*)

    val got = out.select("doc_id", "pos").as[(Long, Long)].collect()
    assert(got.toSet === want, "union of emissions == batch positions")
    // at-most-once: no position is emitted in two micro-batches (or
    // twice in one) — the retro/batch split is a partition, not overlap
    assert(got.length === got.toSet.size, "no double emission")
    // both sources fire on this corpus (retro = an early-batch exemplar
    // flagged by a later batch): the incremental shape is exercised
    val srcs = out.select("src").distinct().as[String].collect().toSet
    assert(srcs === Set("batch", "retro"))
  }

  test("NB columnar scorer runs STATELESS on a stream: union of per-batch " +
      "emissions == batch predictions, no state store involved") {
    implicit val ctx = spark.sqlContext
    val d = Tables.documents(spark, sf0001)
    val model = graft.text.NaiveBayes.fit(d)
    val heldOut = d.filter(col("doc_id") % 5 === 0)
      .select("doc_id", "text").as[(Long, String)].collect().toSeq
    val want = graft.text.NaiveBayes.predict(d)
      .select("doc_id", "pred_label", "score_micro")
      .as[(Long, String, Long)].collect().toSet

    val input = MemoryStream[(Long, String)]
    val out = run(
      graft.text.NaiveBayes.scoreColumnar(
        input.toDF().toDF("doc_id", "text"), model), "nb_stream")(
      heldOut.grouped((heldOut.length + 2) / 3).toSeq.map(c => { () =>
        input.addData(c); ()
      }): _*)
    val got = out.as[(Long, String, Long)].collect()
    assert(got.toSet === want)
    assert(got.length === got.toSet.size, "each doc scored exactly once")
  }

  test("streaming vocab maintenance: last emissions == materialized index vocab") {
    implicit val ctx = spark.sqlContext
    val docs = (1L to 60L).map(i =>
      (i, s"w${i % 7} w${i % 7} w${i % 11} shared tail${i % 3}"))
    val input = MemoryStream[(Long, String)]
    val out = run(
      DocStream.vocabMaintained(spark,
        input.toDF().toDF("doc_id", "text")).toDF(), "vocab_live")(
      docs.grouped(20).toSeq.map(c => { () => input.addData(c); () }): _*)

    // last emission per term = max df (df is strictly increasing per term)
    val live = out.as[(String, Long, Long)].collect()
      .groupBy(_._1).map { case (t, es) =>
        val m = es.maxBy(_._2); (t, m._2, m._3)
      }.toSet
    val batch = graft.text.PostingsIndex
      .derive(docs.toDF("doc_id", "text")).vocab
      .as[(String, Long, Long)].collect().toSet
    assert(live === batch)

    // the stateless postings derivation equals the batch postings too
    val streamTf = DocStream.docTermFreqs(spark, docs.toDF("doc_id", "text"))
      .as[(Long, String, Long)].collect().toSet
    val batchTf = graft.text.PostingsIndex
      .derive(docs.toDF("doc_id", "text")).postings
      .as[(Long, String, Long)].collect().toSet
    assert(streamTf === batchTf)
  }

  test("streaming weighted reservoir: merged last emissions == batch weightedSample") {
    implicit val ctx = spark.sqlContext
    val docs = (1L to 90L).map(i => (i, ("w " * (1 + (i % 7)).toInt).trim))
    val batches = docs.grouped(30).toSeq

    val input = MemoryStream[(Long, String)]
    val stream = DocStream.weightedReservoir(spark,
      input.toDF().toDF("doc_id", "text"), n = 12, nBuckets = 4)
    val q = stream.writeStream.format("memory").queryName("ws_live")
      .outputMode("append").start()
    try batches.foreach { b => input.addData(b); q.processAllAvailable() }
    finally q.stop()

    // the merge takes the RAW append-sink output (all historical
    // emissions) and selects the last emission per bucket itself
    val live = graft.streaming.DocStream.mergeWeightedPartials(
        spark.table("ws_live"), n = 12)
      .as[(Long, Long, Long, Long)].collect().sortBy(_._4)
    val lastPerBucket = spark.table("ws_live").collect()
      .groupBy(_.getLong(0)).values.map(_.maxBy(_.getLong(1))).toSeq

    val batch = graft.text.TrainingPrep.weightedSample(
        docs.toDF("doc_id", "text"), n = 12)
      .as[(Long, Long, Long, Long)].collect().sortBy(_._4)
    assert(live.toSeq === batch.toSeq)
    // every bucket reservoir stayed bounded at n
    assert(lastPerBucket.forall(_.getSeq[Long](2).length <= 12))
  }
}
