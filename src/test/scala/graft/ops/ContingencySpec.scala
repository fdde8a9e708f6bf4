package graft.ops

import graft.SparkSpecBase

class ContingencySpec extends SparkSpecBase {
  import spark.implicits._

  private def got(rows: Seq[(String, String)]) =
    Contingency.chiSquare(rows.toDF("row_key", "col_key")).collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(4)))
      .toMap

  /** BigInt replay of the cross-multiplied integer formulas, over the
    * full marginal grid (zero cells included). */
  private def model(rows: Seq[(String, String)]) = {
    val nz = rows.groupBy(identity).map { case (c, g) => c -> g.size.toLong }
    val rt = nz.groupBy(_._1._1).map { case (k, g) => k -> g.values.sum }
    val ct = nz.groupBy(_._1._2).map { case (k, g) => k -> g.values.sum }
    val n = nz.values.sum
    val obs = (for (r <- rt.keys; c <- ct.keys)
      yield (r, c) -> nz.getOrElse((r, c), 0L)).toMap
    obs.map { case ((r, c), o) =>
      val (trt, tct) = (BigInt(rt(r)), BigInt(ct(c)))
      val d = BigInt(o) * n - trt * tct
      (r, c) -> (o, (trt * tct * 1000000 / n).toLong,
        (d * d * 1000000 / (trt * tct * n)).toLong)
    }
  }

  test("perfectly independent table: every dev_micro is zero") {
    val rows = for {
      r <- Seq("a", "b"); c <- Seq("x", "y", "z"); _ <- 1 to 4
    } yield (r, c)
    val g = got(rows)
    assert(g == model(rows))
    g.values.foreach { case (o, e, d) =>
      assert(o == 4L && e == 4000000L && d == 0L)
    }
  }

  test("perfectly dependent 2x2 table: chi2 == N (the chi-square maximum)") {
    val rows = Seq.fill(6)(("a", "x")) ++ Seq.fill(6)(("b", "y"))
    val g = got(rows)
    assert(g == model(rows))
    // chi2 = N for a perfect association: 12e6 micro, split across cells
    assert(g.values.map(_._3).sum == 12000000L)
  }

  test("randomized tables match the BigInt replay exactly") {
    val rnd = new scala.util.Random(23)
    val rows = (1 to 200).map(_ =>
      (s"r${rnd.nextInt(4)}", s"c${rnd.nextInt(5)}"))
    assert(got(rows) == model(rows))
  }
}
