package graft.ops

import graft.SparkSpecBase

class PsiDriftSpec extends SparkSpecBase {
  import spark.implicits._

  private def got(ref: Seq[(String, Long)], cur: Seq[(String, Long)],
      b: Int) =
    Features.psiDrift(ref.toDF("grp", "v"), cur.toDF("grp", "v"), b)
      .collect()
      .map(r => (r.getString(0), r.getLong(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(4)))
      .toMap

  /** Scala replay: sorted-model edges from ref, bucket both, smoothed
    * micro-nat terms. */
  private def model(ref: Seq[(String, Long)], cur: Seq[(String, Long)],
      b: Int) = {
    val groups = ref.map(_._1).distinct
    groups.flatMap { g =>
      val rs = ref.filter(_._1 == g).map(_._2)
      val cs = cur.filter(_._1 == g).map(_._2)
      val sorted = rs.sorted
      val n = sorted.size.toLong
      val edges = (1 until b).map(i =>
        sorted(((i.toLong * n + b - 1) / b - 1).toInt))
      def bk(v: Long) = edges.count(v > _).toLong
      val ca = rs.groupBy(bk).map { case (k, vs) => k -> vs.size.toLong }
      val cb = cs.groupBy(bk).map { case (k, vs) => k -> vs.size.toLong }
      val (na, nb) = (rs.size.toLong + b, cs.size.toLong + b)
      (0L until b.toLong).map { k =>
        val (a, c) = (ca.getOrElse(k, 0L), cb.getOrElse(k, 0L))
        val term = math.floor(
          ((a + 1) / na.toDouble - (c + 1) / nb.toDouble) *
            math.log((a + 1.0) * nb / ((c + 1.0) * na)) * 1e6).toLong
        (g, k) -> (a, c, term)
      }
    }.toMap
  }

  test("identical snapshots: every term is zero (or -1 from floor), " +
      "values match the replay") {
    val snap = (1L to 80L).map(v => ("g", v))
    val g = got(snap, snap, 8)
    assert(g == model(snap, snap, 8))
    // identical distributions: (p-q)=0 exactly -> term 0 (floor of 0)
    g.values.foreach { case (_, _, t) => assert(t == 0L) }
  }

  test("a shifted current distribution scores high; terms are " +
      "non-negative-ish and concentrated in the moved mass") {
    val ref = (1L to 80L).map(v => ("g", v))
    val cur = (1L to 80L).map(v => ("g", v + 60)) // mass moves up
    val g = got(ref, cur, 8)
    assert(g == model(ref, cur, 8))
    val psi = g.values.map(_._3).sum
    assert(psi > 100000L) // way past the 0.1-nat drift gate
  }

  test("groups absent from the current snapshot still score (smoothed); " +
      "current-only groups don't appear") {
    val ref = (1L to 40L).map(v => ("a", v)) ++ (1L to 40L).map(v => ("b", v))
    val cur = (1L to 40L).map(v => ("a", v)) ++ (1L to 9L).map(v => ("z", v))
    val g = got(ref, cur, 4)
    assert(g == model(ref, cur, 4))
    assert(g.keySet.map(_._1) == Set("a", "b"))
  }

  test("randomized snapshots match the replay at several B") {
    val rnd = new scala.util.Random(41)
    def snap() = for {
      g <- Seq("a", "b"); _ <- 1 to (20 + rnd.nextInt(60))
    } yield (g, rnd.nextLong(500))
    val (r, c) = (snap(), snap())
    for (b <- Seq(2, 4, 8)) assert(got(r, c, b) == model(r, c, b), s"B=$b")
  }
}
