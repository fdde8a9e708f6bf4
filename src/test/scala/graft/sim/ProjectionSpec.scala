package graft.sim

import graft.{SparkSpecBase, Tables}
import org.apache.spark.sql.functions._

class ProjectionSpec extends SparkSpecBase {
  import spark.implicits._

  test("sign matrix: derived, +-1 only, roughly balanced, stable") {
    val m = Projection.signMatrix(64, 16)
    assert(m.size === 16 && m.forall(_.size === 64))
    assert(m.flatten.forall(v => v == 1L || v == -1L))
    val plus = m.flatten.count(_ == 1L)
    assert(plus > 400 && plus < 624, s"suspiciously unbalanced: $plus/1024")
    assert(m === Projection.signMatrix(64, 16), "must be a pure derivation")
  }

  test("jlProject == nested-loop model on the quantized grid") {
    val emb = Tables.embeddings(spark, sf0001).limit(50)
    val got = Projection.jlProject(emb, dIn = 64, dOut = 16)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    // model: same global grid, same derived matrix
    val stats = emb.agg(
      min(array_min(col("embedding"))).cast("double"),
      max(array_max(col("embedding"))).cast("double")).head()
    val (mn, mx) = (stats.getDouble(0), stats.getDouble(1))
    val st = (mx - mn) / 1024
    val m = Projection.signMatrix(64, 16)
    val vecs = emb.select("vec_id", "embedding").collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).toArray)
    vecs.foreach { case (id, v) =>
      val g = v.map(x => math.min(math.floor((x.toDouble - mn) / st).toLong, 1023L))
      for (j <- 0 until 16) {
        val want = (0 until 64).map(i => m(j)(i) * g(i)).sum
        assert(got((id, j.toLong)) === want, s"vec $id dim $j")
      }
    }
  }

  test("JL property: median pairwise distance ratio near dIn/dOut scaling") {
    val emb = Tables.embeddings(spark, sf0001)
    val proj = Projection.jlProject(emb, 64, 16)
      .groupBy("vec_id").agg(collect_list(struct(col("j"), col("v"))).as("p"))
      .collect().map { r =>
        r.getLong(0) -> r.getSeq[org.apache.spark.sql.Row](1)
          .map(p => p.getLong(0) -> p.getLong(1)).sortBy(_._1).map(_._2).toArray
      }.toMap
    val stats = emb.agg(
      min(array_min(col("embedding"))).cast("double"),
      max(array_max(col("embedding"))).cast("double")).head()
    val (mn, mx) = (stats.getDouble(0), stats.getDouble(1))
    val st = (mx - mn) / 1024
    val g = emb.select("vec_id", "embedding").collect()
      .map(r => r.getLong(0) ->
        r.getSeq[Float](1).map(x =>
          math.min(math.floor((x.toDouble - mn) / st).toLong, 1023L)).toArray)
      .toMap
    val ids = g.keys.toSeq.sorted.take(40)
    // E[|Rx|^2] = dOut * |x|^2 for +-1 rows: the per-pair ratio
    // |P(a)-P(b)|^2 / (dOut * |a-b|^2) concentrates around 1
    val ratios = for {
      a <- ids; b <- ids if a < b
    } yield {
      val d2 = (0 until 64).map(i => { val d = g(a)(i) - g(b)(i); d * d }).sum.toDouble
      val p2 = (0 until 16).map(j => { val d = proj(a)(j) - proj(b)(j); d * d }).sum.toDouble
      p2 / (16.0 * d2)
    }
    val sorted = ratios.sorted
    val median = sorted(sorted.size / 2)
    assert(median > 0.5 && median < 2.0, s"median JL ratio $median")
    // and the bulk is sane: 90% of pairs within a loose band
    val inBand = ratios.count(r => r > 0.2 && r < 5.0)
    assert(inBand.toDouble / ratios.size > 0.9, s"only $inBand/${ratios.size} in band")
  }
}
