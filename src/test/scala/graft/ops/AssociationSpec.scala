package graft.ops

import graft.SparkSpecBase

class AssociationSpec extends SparkSpecBase {
  import spark.implicits._

  private def got(bs: Seq[(String, String)], minSupport: Long = 2) =
    Association.frequentPairs(bs.toDF("basket", "item"), minSupport)
      .collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5),
          r.getLong(6), r.getLong(7)))
      .toMap

  /** Plain-Scala replay of the integer formulas. */
  private def model(bs: Seq[(String, String)], minSupport: Long = 2) = {
    val d = bs.distinct
    val n = d.map(_._1).distinct.size.toLong
    val ic = d.groupBy(_._2).map { case (i, g) => i -> g.size.toLong }
    val byBasket = d.groupBy(_._1).map { case (_, g) => g.map(_._2).sorted }
    byBasket.toSeq.flatMap(items =>
        items.combinations(2).map(p => (p(0), p(1))))
      .groupBy(identity).map { case (p, g) => p -> g.size.toLong }
      .filter(_._2 >= minSupport)
      .map { case ((a, b), c) =>
        (a, b) -> (c, ic(a), ic(b),
          c * n * 1000000L / (ic(a) * ic(b)),
          c * 1000000L / ic(a), c * 1000000L / ic(b))
      }
  }

  test("hand basket set: counts, lift and confidence match the replay") {
    // b1:{x,y,z} b2:{x,y} b3:{x,z} b4:{y} -> xy:2 xz:2 yz:1(pruned)
    val bs = Seq("b1" -> "x", "b1" -> "y", "b1" -> "z",
      "b2" -> "x", "b2" -> "y", "b3" -> "x", "b3" -> "z", "b4" -> "y")
    val g = got(bs)
    assert(g == model(bs))
    assert(g.keySet == Set(("x", "y"), ("x", "z")))
    // lift(x,y) = 2*4*1e6/(3*3) = 888888 (truncated)
    assert(g(("x", "y"))._4 == 888888L)
    // conf(x->y) = 2/3 -> 666666
    assert(g(("x", "y"))._5 == 666666L)
  }

  test("duplicate (basket, item) rows collapse before counting") {
    val bs = Seq("b1" -> "x", "b1" -> "x", "b1" -> "y",
      "b2" -> "x", "b2" -> "y")
    assert(got(bs) == model(bs))
    assert(got(bs)(("x", "y"))._1 == 2L)
  }

  test("minSupport prunes; minSupport=1 keeps every co-occurring pair") {
    val bs = Seq("b1" -> "x", "b1" -> "y", "b2" -> "y", "b2" -> "z")
    assert(got(bs).isEmpty) // nothing reaches support 2
    val g1 = got(bs, minSupport = 1)
    assert(g1 == model(bs, 1))
    assert(g1.keySet == Set(("x", "y"), ("y", "z")))
  }

  test("randomized baskets match the replay exactly") {
    val rnd = new scala.util.Random(7)
    val items = ('a' to 'j').map(_.toString)
    val bs = for {
      b <- 1 to 40; i <- items if rnd.nextDouble() < 0.3
    } yield s"b$b" -> i
    assert(got(bs) == model(bs))
  }
}
