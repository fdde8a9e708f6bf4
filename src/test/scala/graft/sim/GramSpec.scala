package graft.sim

import graft.{SparkSpecBase, Tables}
import org.apache.spark.sql.functions._

class GramSpec extends SparkSpecBase {
  import spark.implicits._

  private def modelGram(vecs: Seq[Array[Long]], d: Int): Seq[((Long, Long), Long)] = {
    val acc = scala.collection.mutable.LinkedHashMap.empty[(Long, Long), Long]
    for (i <- 0 until d; j <- i until d) acc((i.toLong, j.toLong)) = 0L
    vecs.foreach { v =>
      for (i <- 0 until d; j <- i until d)
        acc((i.toLong, j.toLong)) += v(i) * v(j)
    }
    acc.toSeq
  }

  test("GramAgg == nested-loop model through shuffled partitions") {
    val rnd = new scala.util.Random(64L)
    val d = 7
    val vecs = Seq.fill(300)(Array.fill(d)(rnd.nextInt(1000).toLong))
    val gramUdaf = udaf(Gram.GramAgg)
    val flat = vecs.map(_.toSeq).toDF("g").repartition(11)
      .agg(gramUdaf(col("g"))).head().getSeq[Long](0)
    val want = modelGram(vecs, d).map(_._2)
    assert(flat.toSeq === want)
  }

  test("GramAgg fails loudly on ragged vectors") {
    val gramUdaf = udaf(Gram.GramAgg)
    val bad = Seq(Seq(1L, 2L), Seq(1L, 2L, 3L)).toDF("g").coalesce(1)
    val ex = intercept[Exception] { bad.agg(gramUdaf(col("g"))).head() }
    assert(ex.getMessage.contains("ragged") ||
      ex.getCause != null && ex.getCause.getMessage.contains("ragged"))
  }

  test("gramUpperTriangle: symmetric-consistent, layout-invariant, " +
      "diag dominates off-diag pairs (Cauchy-Schwarz on the grid)") {
    val emb = Tables.embeddings(spark, sf0001)
    val got = Gram.gramUpperTriangle(emb, dims = 64)
    val rows = got.collect().map(r =>
      (r.getLong(0), r.getLong(1)) -> (r.getLong(2), r.getLong(3))).toMap
    assert(rows.size === 64 * 65 / 2)
    val n = rows.values.head._2
    assert(n === emb.count())
    // Cauchy-Schwarz: s_ij^2 <= s_ii * s_jj for second moments
    rows.foreach { case ((i, j), (s, _)) =>
      if (i != j) {
        val sii = BigInt(rows((i, i))._1)
        val sjj = BigInt(rows((j, j))._1)
        assert(BigInt(s) * BigInt(s) <= sii * sjj, s"($i,$j)")
      }
    }
    val again = Gram.gramUpperTriangle(emb.repartition(13), dims = 64)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val first = got.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(again === first, "gram must not depend on partition layout")
  }
}
