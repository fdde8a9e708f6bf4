package graft.ops

import graft.SparkSpecBase
import org.apache.spark.sql.functions._

class BenfordSpec extends SparkSpecBase {
  import spark.implicits._

  private def got(vs: Seq[Long]) =
    Benford.firstDigit(vs.toDF("v"), col("v")).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3)))
      .toMap

  /** BigInt replay over the frozen expectation constants. */
  private def model(vs: Seq[Long]) = {
    val pos = vs.filter(_ > 0)
    val obs = pos.map(_.toString.head.asDigit.toLong)
      .groupBy(identity).map { case (d, g) => d -> g.size.toLong }
    val n = pos.size.toLong
    (1L to 9L).map { d =>
      val o = obs.getOrElse(d, 0L)
      val e = Benford.ExpectedMicro(d.toInt - 1)
      val dev = BigInt(o) * 1000000 - BigInt(e) * n
      d -> (o, e, (dev * dev / (BigInt(e) * n * 1000000)).toLong)
    }.toMap
  }

  test("the frozen constants are floor(log10(1 + 1/d) * 1e6) and sum to " +
      "just under one") {
    for (d <- 1 to 9) {
      assert(Benford.ExpectedMicro(d - 1) ==
        math.floor(math.log10(1.0 + 1.0 / d) * 1e6).toLong)
    }
    val s = Benford.ExpectedMicro.sum
    assert(s <= 1000000L && s >= 999991L)
  }

  test("a Benford-ish sample (powers of 2) conforms far better than a " +
      "uniform-first-digit sample; all nine digits always emitted") {
    val powers = (0 until 64).map(i => BigInt(2).pow(i).toString.take(9).toLong)
    val uniform = (1L to 9L).flatMap(d => Seq.fill(7)(d * 100))
    val gp = got(powers); val gu = got(uniform)
    assert(gp == model(powers) && gu == model(uniform))
    assert(gp.keySet == (1L to 9L).toSet && gu.keySet == (1L to 9L).toSet)
    assert(gp.values.map(_._3).sum < gu.values.map(_._3).sum)
  }

  test("zero and negative values are excluded; a missing digit carries " +
      "its full expected mass as deviation") {
    // only digit 1 observed; 100 rows so every missing digit's
    // truncated deviation e*n/1e6 is still nonzero
    val vs = Seq(-5L, 0L) ++ (100L to 199L)
    val g = got(vs)
    assert(g == model(vs))
    assert(g(1L)._1 == 100L && (2L to 9L).forall(g(_)._1 == 0L))
    assert((2L to 9L).forall(g(_)._3 > 0L))
  }

  test("randomized values match the BigInt replay exactly") {
    val rnd = new scala.util.Random(31)
    val vs = (1 to 500).map(_ => rnd.nextLong(1000000L) - 10)
    assert(got(vs) == model(vs))
  }
}
