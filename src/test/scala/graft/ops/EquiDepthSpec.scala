package graft.ops

import graft.SparkSpecBase

class EquiDepthSpec extends SparkSpecBase {
  import spark.implicits._

  private def got(rows: Seq[(String, Long)], b: Int) =
    Features.equiDepthHistogram(rows.toDF("grp", "v"), b).collect()
      .map(r => (r.getString(0), r.getLong(1)) -> r.getLong(2)).toMap

  /** Sorted-model replay: edges at ranks ceil(i*n/B), bucket = #edges
    * strictly below the value. */
  private def model(rows: Seq[(String, Long)], b: Int) =
    rows.groupBy(_._1).flatMap { case (g, rs) =>
      val sorted = rs.map(_._2).sorted
      val n = sorted.size.toLong
      val edges = (1 until b).map(i => sorted(
        ((i.toLong * n + b - 1) / b - 1).toInt))
      rs.map(_._2).groupBy(v => edges.count(v > _).toLong)
        .map { case (bk, vs) => (g, bk) -> vs.size.toLong }
    }

  test("uniform values split into equal buckets; counts match the model") {
    val rows = (1L to 80L).map(v => ("g", v))
    val g = got(rows, 8)
    assert(g == model(rows, 8))
    assert(g.values.toSeq == Seq.fill(8)(10L))
    assert(g.keySet.map(_._2) == (0L to 7L).toSet)
  }

  test("skewed data: heavy ties collapse into the lowest admissible " +
      "bucket, deterministically") {
    val rows = Seq.fill(70)(("g", 5L)) ++ (1 to 10).map(i => ("g", 100L + i))
    val g = got(rows, 4)
    assert(g == model(rows, 4))
    // all the 5s share bucket 0 (every edge <= ... is not strictly below)
    assert(g(("g", 0L)) >= 70L)
  }

  test("groups smaller than the bucket count still partition correctly") {
    val rows = Seq(("tiny", 3L), ("tiny", 1L), ("tiny", 2L)) ++
      (1L to 40L).map(v => ("big", v * 7))
    val g = got(rows, 8)
    assert(g == model(rows, 8))
    assert(g.filter(_._1._1 == "tiny").values.sum == 3L)
  }

  test("randomized groups match the sorted model at several B") {
    val rnd = new scala.util.Random(37)
    val rows = for {
      g <- Seq("a", "b", "c"); _ <- 1 to (5 + rnd.nextInt(60))
    } yield (g, rnd.nextLong(1000) - 200)
    for (b <- Seq(2, 4, 8, 16)) assert(got(rows, b) == model(rows, b), s"B=$b")
  }
}
