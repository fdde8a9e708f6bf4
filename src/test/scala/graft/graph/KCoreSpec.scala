package graft.graph

import graft.SparkSpecBase

class KCoreSpec extends SparkSpecBase {
  import spark.implicits._

  private def canon(es: Seq[(String, String)]) =
    es.map { case (x, y) => if (x < y) (x, y) else (y, x) }.distinct

  private def got(es: Seq[(String, String)], k: Long, rounds: Int,
      requireConverged: Boolean = false) =
    KCore.survivors(canon(es).toDF("a", "b"), k, rounds, requireConverged)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap

  /** Plain-Scala peel replay. */
  private def model(es: Seq[(String, String)], k: Long, rounds: Int) = {
    var e = canon(es).toSet
    for (_ <- 1 to rounds) {
      val deg = e.toSeq.flatMap(p => Seq(p._1, p._2))
        .groupBy(identity).map { case (n, g) => n -> g.size.toLong }
      val alive = deg.filter(_._2 >= k).keySet
      e = e.filter(p => alive(p._1) && alive(p._2))
    }
    e.toSeq.flatMap(p => Seq(p._1, p._2))
      .groupBy(identity).map { case (n, g) => n -> g.size.toLong }
  }

  test("K4 with a pendant chain: the 3-core is exactly the K4") {
    val k4 = Seq("a" -> "b", "a" -> "c", "a" -> "d",
      "b" -> "c", "b" -> "d", "c" -> "d")
    val es = k4 ++ Seq("d" -> "e", "e" -> "f") // chain peels away
    val g = got(es, k = 3, rounds = 3)
    assert(g == model(es, 3, 3))
    assert(g == Map("a" -> 3L, "b" -> 3L, "c" -> 3L, "d" -> 3L))
  }

  test("cascading peel: removing the frontier re-exposes inner nodes " +
      "round by round; a short run truncates, the converged run empties") {
    // path a-b-c-d-e at k=2: ends peel, then the next ends, until empty
    val path = Seq("a" -> "b", "b" -> "c", "c" -> "d", "d" -> "e")
    assert(got(path, 2, 1) == model(path, 2, 1))
    assert(got(path, 2, 1).nonEmpty) // one round only strips the ends
    assert(got(path, 2, 3).isEmpty)  // converged: a path has no 2-core
    // a cycle IS its own 2-core: survives any number of rounds
    val cyc = Seq("a" -> "b", "b" -> "c", "c" -> "d", "d" -> "a")
    assert(got(cyc, 2, 4) == Map("a" -> 2L, "b" -> 2L, "c" -> 2L, "d" -> 2L))
  }

  test("requireConverged fail-louds on a truncated peel, passes on a " +
      "converged one") {
    val path = Seq("a" -> "b", "b" -> "c", "c" -> "d", "d" -> "e")
    val e = intercept[IllegalArgumentException] {
      got(path, 2, 1, requireConverged = true)
    }
    assert(e.getMessage.contains("did not converge"))
    assert(got(path, 2, 3, requireConverged = true).isEmpty)
  }

  test("randomized graphs match the peel replay at several (k, rounds)") {
    val rnd = new scala.util.Random(29)
    val names = (0 until 14).map(i => f"n$i%02d")
    val es = for {
      i <- 0 until 14; j <- (i + 1) until 14 if rnd.nextDouble() < 0.35
    } yield names(i) -> names(j)
    for (k <- Seq(2L, 3L, 4L); r <- Seq(1, 2, 5)) {
      assert(got(es, k, r) == model(es, k, r), s"k=$k rounds=$r")
    }
  }
}
