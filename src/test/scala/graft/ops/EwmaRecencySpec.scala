package graft.ops

import graft.SparkSpecBase

class EwmaRecencySpec extends SparkSpecBase {
  import spark.implicits._

  private def got(rows: Seq[(String, Long, Long, Long)], k: Int = 8) =
    EventAnalytics.ewmaRecency(
        rows.toDF("key", "ts", "seq", "amount_cents"), k)
      .collect()
      .map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
      .toMap

  /** Replay: sort by (ts, seq) desc, take k, weight 2^(k-1-j). */
  private def model(rows: Seq[(String, Long, Long, Long)], k: Int = 8) =
    rows.groupBy(_._1).map { case (key, g) =>
      val recent = g.sortBy(r => (-r._2, -r._3)).take(k).map(_._4)
      val ws = recent.indices.map(j => 1L << (k - 1 - j))
      val num = recent.zip(ws).map { case (a, w) => a * w }.sum
      key -> (recent.size.toLong, ws.sum, num, num / ws.sum)
    }

  test("constant amounts give ewma == the amount, for any history length") {
    for (n <- Seq(1, 3, 8, 12)) {
      val rows = (1 to n).map(i => ("a", i.toLong, i.toLong, 500L))
      val g = got(rows)
      assert(g == model(rows), s"n=$n")
      assert(g("a")._4 == 500L, s"n=$n")
    }
  }

  test("recent amounts dominate: a spike now outweighs an old one") {
    val spikeNow = Seq(("a", 1L, 1L, 0L), ("a", 2L, 2L, 0L), ("a", 3L, 3L, 900L))
    val spikeOld = Seq(("a", 1L, 1L, 900L), ("a", 2L, 2L, 0L), ("a", 3L, 3L, 0L))
    assert(got(spikeNow)("a")._4 > got(spikeOld)("a")._4)
    assert(got(spikeNow) == model(spikeNow))
    assert(got(spikeOld) == model(spikeOld))
  }

  test("only the last k rows count; ts ties break by seq") {
    val rows = (1 to 10).map(i => ("a", 5L, i.toLong, i * 100L))
    val g = got(rows, k = 4)
    assert(g == model(rows, 4))
    // last 4 by seq: 10,9,8,7 with weights 8,4,2,1 -> num = 8000+3600+1600+700
    assert(g("a") == ((4L, 15L, 13900L, 13900L / 15L)))
  }

  test("randomized histories match the replay for several k") {
    val rnd = new scala.util.Random(5)
    val rows = for {
      key <- Seq("a", "b", "c"); i <- 1 to (3 + rnd.nextInt(12))
    } yield (key, rnd.nextLong(50), i.toLong, rnd.nextLong(10000))
    for (k <- Seq(1, 4, 8)) assert(got(rows, k) == model(rows, k), s"k=$k")
  }
}
