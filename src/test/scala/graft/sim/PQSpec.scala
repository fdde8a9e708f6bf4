package graft.sim

import org.apache.spark.sql.functions._

import graft.{SparkSpecBase, Tables}

/** Product quantization: integer grid + integer codebooks + ADC search
  * (see [[PQ]]). Training/encode/ADC are all-integer so determinism is
  * exact; search quality is measured as recall vs brute force. */
class PQSpec extends SparkSpecBase {
  import spark.implicits._

  private lazy val emb = Tables.embeddings(spark, sf0001)
  private lazy val model = PQ.train(emb)

  test("encode: one code per subspace, every code a surviving centroid id") {
    val codes = PQ.encode(emb, model).collect()
    assert(codes.nonEmpty)
    assert(codes.head.schema.fieldNames.toSeq ===
      "vec_id" +: (0 until model.m).map(s => s"code_$s"))
    codes.foreach { r =>
      (0 until model.m).foreach { s =>
        val c = r.getLong(1 + s)
        assert(model.codebooks(s).contains(c.toInt),
          s"vec ${r.getLong(0)} subspace $s code $c not in codebook")
      }
    }
  }

  test("train + encode are deterministic (second run bit-identical)") {
    val again = PQ.train(emb)
    assert(again.dmin.toSeq === model.dmin.toSeq)
    assert((0 until model.m).forall(s =>
      again.codebooks(s).view.mapValues(_.toSeq).toMap ===
        model.codebooks(s).view.mapValues(_.toSeq).toMap))
    val a = PQ.encode(emb, model).collect().map(_.toSeq).toSet
    val b = PQ.encode(emb, again).collect().map(_.toSeq).toSet
    assert(a === b)
  }

  test("ADC search contract: k rows per query, rank 1..k") {
    val got = PQ.topK(emb, model, numQueries = 10, k = 5)
      .select("q_id", "neighbor_id", "rank").collect()
    val byQ = got.groupBy(_.getLong(0))
    assert(byQ.keySet === (0L until 10L).toSet)
    byQ.values.foreach { rows =>
      assert(rows.map(_.getLong(2)).sorted.toSeq === (1L to 5L))
      assert(rows.map(_.getLong(1)).distinct.length === rows.length)
    }
  }

  private def pairs(df: org.apache.spark.sql.DataFrame) =
    df.select("q_id", "neighbor_id").as[(Long, Long)].collect().toSet

  test("ADC recall@5 >= 0.6 vs brute force (8-byte codes, 32x compression)") {
    val bf = pairs(Similarity.bruteForceTopK(emb, 10, 5))
    val pq = pairs(PQ.topK(emb, model, 10, 5, rerankFactor = 8))
    val recall = (bf & pq).size.toDouble / bf.size
    info(s"PQ ADC recall@5 = $recall")
    assert(recall >= 0.6, s"recall $recall")
  }

  test("streaming twin: encode lifts to a readStream frame unchanged (frozen model)") {
    // train batch-side on the warehoused corpus, encode the live stream
    // against the frozen plan-constant model — every transform in encode
    // is stateless scan-stage work, so the SAME code runs both modes
    val stream = spark.readStream
      .schema(spark.read.parquet(s"$sf0001/embeddings.parquet").schema)
      .option("pathGlobFilter", "embeddings.parquet")
      .parquet(sf0001)
    val q = PQ.encode(stream, model)
      .writeStream.format("memory").queryName("pq_stream_enc")
      .outputMode("append").start()
    q.processAllAvailable(); q.stop()
    val got = spark.table("pq_stream_enc").collect().map(_.toSeq).toSet
    val want = PQ.encode(emb, model).collect().map(_.toSeq).toSet
    assert(got === want)
    assert(got.nonEmpty)
  }

  test("IVF-PQ: cell-pruned ADC keeps recall@5 >= 0.6 (the full FAISS layering)") {
    val bf = pairs(Similarity.bruteForceTopK(emb, 10, 5))
    val got = PQ.ivfPqTopK(emb, 10, 5)
    val p = pairs(got)
    val recall = (bf & p).size.toDouble / bf.size
    info(s"IVF-PQ recall@5 = $recall") // measured 0.82 (prunes ~16% scan)
    assert(recall >= 0.6, s"recall $recall")
    // contract: k rows per query, ranks 1..k
    val byQ = got.select("q_id", "rank").collect().groupBy(_.getLong(0))
    assert(byQ.keySet === (0L until 10L).toSet)
    byQ.values.foreach(rows =>
      assert(rows.map(_.getLong(1)).sorted.toSeq === (1L to 5L)))
  }

  test("ADC recall@5 >= 0.6 holds at the 10x corpus (sf0.1) too") {
    val emb1 = Tables.embeddings(spark, "/root/testdata/sf0.1")
    val bf = pairs(Similarity.bruteForceTopK(emb1, 10, 5))
    val pq = pairs(PQ.topK(emb1, PQ.train(emb1), 10, 5, rerankFactor = 8))
    val recall = (bf & pq).size.toDouble / bf.size
    info(s"PQ ADC recall@5 at sf0.1 = $recall") // measured 0.74
    assert(recall >= 0.6, s"recall $recall")
  }
}
