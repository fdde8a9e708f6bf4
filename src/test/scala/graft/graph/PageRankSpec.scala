package graft.graph

import graft.SparkSpecBase
import org.apache.spark.sql.DataFrame

class PageRankSpec extends SparkSpecBase {
  import spark.implicits._

  private def edges(es: Seq[(String, String)]): DataFrame =
    es.toDF("src", "dst")

  /** Plain-Scala replay of the integer iteration — the same truncating
    * arithmetic, kept in lockstep with [[PageRank.ranks]]. */
  private def modelRanks(es: Seq[(String, String)], iters: Int,
      dMicro: Long = 850000L): Map[String, Long] = {
    val nodes = (es.map(_._1) ++ es.map(_._2)).distinct.sorted
    val outdeg = es.groupBy(_._1).map { case (s, g) => s -> g.size.toLong }
    val n = nodes.size.toLong
    val base = ((PageRank.Scale / n) * (PageRank.MicroOne - dMicro)) /
      PageRank.MicroOne
    var r = nodes.map(_ -> PageRank.Scale / n).toMap
    for (_ <- 1 to iters) {
      val inc = es.groupBy(_._2).map { case (d, g) =>
        d -> g.map { case (s, _) => r(s) / outdeg(s) }.sum
      }
      r = nodes.map(v =>
        v -> (base + dMicro * inc.getOrElse(v, 0L) / PageRank.MicroOne)).toMap
    }
    r
  }

  private def got(es: Seq[(String, String)], iters: Int = 4): Map[String, Long] =
    PageRank.ranks(edges(es), iters).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap

  // undirected star: hub h connected to 4 spokes (both directions)
  private val star = Seq("a", "b", "c", "d").flatMap(s =>
    Seq("h" -> s, s -> "h"))

  test("star graph matches the integer replay bit for bit; hub dominates") {
    val g = got(star)
    assert(g == modelRanks(star, 4))
    val hub = g("h")
    Seq("a", "b", "c", "d").foreach(s => assert(g(s) < hub))
    // spokes are symmetric — identical ranks, exactly
    assert(Seq("a", "b", "c", "d").map(g).distinct.size == 1)
  }

  test("directed chain with a sink: dangling mass leaks by contract, " +
      "every rank still >= base and total <= Scale") {
    val chain = Seq("a" -> "b", "b" -> "c", "c" -> "d") // d is a sink
    val g = got(chain, iters = 6)
    assert(g == modelRanks(chain, 6))
    val n = 4L
    val base = ((PageRank.Scale / n) *
      (PageRank.MicroOne - 850000L)) / PageRank.MicroOne
    g.values.foreach(v => assert(v >= base))
    assert(g.values.sum <= PageRank.Scale)
    // a receives nothing: exactly base
    assert(g("a") == base)
  }

  test("damping 0 collapses every rank to Scale div N after one pass") {
    val g = PageRank.ranks(edges(star), iters = 1, dampingMicro = 0L)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(g.values.toSet == Set(PageRank.Scale / 5))
  }

  /** Scala replay of the seeded iteration. */
  private def modelTrust(es: Seq[(String, String)], seeds: Set[String],
      iters: Int, dMicro: Long = 850000L): Map[String, Long] = {
    val nodes = (es.map(_._1) ++ es.map(_._2)).distinct.sorted
    val outdeg = es.groupBy(_._1).map { case (s, g) => s -> g.size.toLong }
    val sd = nodes.filter(seeds).toSet
    val ns = sd.size.toLong
    val base = ((PageRank.Scale / ns) * (PageRank.MicroOne - dMicro)) /
      PageRank.MicroOne
    var r = nodes.map(v => v -> (if (sd(v)) PageRank.Scale / ns else 0L)).toMap
    for (_ <- 1 to iters) {
      val inc = es.groupBy(_._2).map { case (d, g) =>
        d -> g.map { case (s, _) => r(s) / outdeg(s) }.sum
      }
      r = nodes.map(v => v -> ((if (sd(v)) base else 0L) +
        dMicro * inc.getOrElse(v, 0L) / PageRank.MicroOne)).toMap
    }
    r
  }

  test("trustRanks matches the seeded replay; unreachable nodes score 0, " +
      "absent seeds are ignored, no seeds in graph fails loud") {
    // two components: seeds reach only their own
    val es = Seq("a" -> "b", "b" -> "a", "x" -> "y", "y" -> "x")
    val g = PageRank.trustRanks(edges(es),
        Seq("a", "ghost").toDF("node"), iters = 3) // "ghost" not a node
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(g == modelTrust(es, Set("a"), 3))
    assert(g("x") == 0L && g("y") == 0L) // untrusted component: zero
    assert(g("a") > 0L && g("b") > 0L)   // trust flowed a -> b
    intercept[IllegalArgumentException] {
      PageRank.trustRanks(edges(es), Seq("ghost").toDF("node"))
    }
  }

  test("uniform seeds == plain PageRank (same formula, same bits)") {
    val all = Seq("h", "a", "b", "c", "d").toDF("node")
    val viaTrust = PageRank.trustRanks(edges(star), all)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(viaTrust == got(star))
  }

  test("iteration count is respected (ranks differ between pass 1 and 4)") {
    val es = Seq("a" -> "b", "b" -> "a", "b" -> "c", "c" -> "b")
    assert(got(es, 1) != got(es, 4))
    assert(got(es, 4) == modelRanks(es, 4))
  }
}
