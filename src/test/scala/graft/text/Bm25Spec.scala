package graft.text

import graft.SparkSpecBase

class Bm25Spec extends SparkSpecBase {
  import spark.implicits._

  private def docs(rows: (Long, String)*) = rows.toDF("doc_id", "text")

  /** Independent scalar model of the exact integer BM25 (same contract
    * the DuckDB oracle replays): Lucene-floored idf micro-nats + the
    * rational k1=6/5, b=3/4 normalization 22·T·tf/(10·T·tf+3·T+9·dl·N),
    * BigInt floor division, rarest-first query-term selection. */
  private def model(corpus: Seq[(Long, String)], queryMod: Long,
      queryTerms: Int, k: Int): Set[(Long, Long, Long, Long, Long)] = {
    val toks = corpus.map { case (id, t) => id -> t.split(" ").toSeq }.toMap
    val tf = toks.toSeq.flatMap { case (id, ts) =>
      ts.groupBy(identity).map { case (t, g) => (id, t, g.size.toLong) }
    }
    val dl = toks.map { case (id, ts) => id -> ts.size.toLong }
    val bigT = dl.values.sum
    val n = dl.size.toLong
    val df = tf.groupBy(_._2).map { case (t, g) => t -> g.size.toLong }
    val idf = df.map { case (t, d) =>
      t -> math.floor(math.log(1.0 + (n - d + 0.5) / (d + 0.5)) * 1e6).toLong
    }
    val scores = for {
      qid <- toks.keys.toSeq if qid % queryMod == 0
      qt = tf.filter(_._1 == qid).map(_._2)
        .sortBy(t => (df(t), t)).take(queryTerms).toSet
      (did, t, f) <- tf if qt.contains(t)
    } yield ((qid, did),
      (BigInt(idf(t)) * 22 * bigT * f /
        (BigInt(10) * bigT * f + BigInt(3) * bigT + BigInt(9) * dl(did) * n))
        .toLong)
    scores.groupBy(_._1).toSeq.flatMap { case ((qid, did), ss) =>
      Seq((qid, did, ss.size.toLong, ss.map(_._2).sum))
    }.groupBy(_._1).toSeq.flatMap { case (qid, rows) =>
      rows.sortBy(r => (-r._4, r._2)).zipWithIndex.take(k)
        .map { case ((q, d, nt, sc), i) => (q, d, nt, sc, i + 1L) }
    }.toSet
  }

  private val corpus = Seq(
    0L -> "spark shuffle join rare unicorn",
    1L -> "spark shuffle join join",
    2L -> "spark join scan scan scan",
    3L -> "spark scan rare extra",
    4L -> "spark shuffle unicorn unicorn spark",
    97L -> "rare unicorn scan")

  test("BM25 matches the independent scalar model exactly") {
    val got = Bm25.topK(docs(corpus: _*), queryMod = 97, queryTerms = 2, k = 3)
      .as[(Long, Long, Long, Long, Long)].collect().toSet
    assert(got === model(corpus, 97, 2, 3))
    assert(got.nonEmpty)
  }

  test("a query document retrieves itself first") {
    // doc 97's query terms are its rarest terms; it carries all of them
    val got = Bm25.topK(docs(corpus: _*), queryMod = 97, queryTerms = 2, k = 3)
      .filter("query_id = 97 AND doc_rank = 1")
      .select("doc_id").as[Long].collect()
    assert(got.toSeq === Seq(97L))
  }

  test("top-k bound and rank totality hold per query") {
    val got = Bm25.topK(docs(corpus: _*), queryMod = 1, queryTerms = 16, k = 2)
      .as[(Long, Long, Long, Long, Long)].collect()
    val byQ = got.groupBy(_._1)
    assert(byQ.keySet === corpus.map(_._1).toSet) // every doc is a query
    byQ.values.foreach { rows =>
      assert(rows.length <= 2)
      assert(rows.map(_._5).sorted.toSeq === (1L to rows.length).toSeq)
      // scores are positive (floored idf is strictly positive)
      assert(rows.forall(_._4 > 0))
    }
  }
}
