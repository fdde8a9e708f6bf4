package graft.ops

import graft.SparkSpecBase
import org.apache.spark.sql.DataFrame

class RankFusionSpec extends SparkSpecBase {
  import spark.implicits._

  private def list(scores: Seq[(String, Long)]): DataFrame =
    scores.toDF("key", "score")

  private def got(lists: Seq[Seq[(String, Long)]], k: Long = 60) =
    RankFusion.fuse(lists.map(list), k).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap

  /** Replay: rank by (score desc, key asc), fuse with truncating div. */
  private def model(lists: Seq[Seq[(String, Long)]], k: Long = 60) =
    lists.flatMap { l =>
      l.sortBy { case (key, s) => (-s, key) }.zipWithIndex
        .map { case ((key, _), i) => key -> (i + 1L) }
    }.groupBy(_._1).map { case (key, rs) =>
      key -> (rs.size.toLong, rs.map(r => 1000000L / (k + r._2)).sum)
    }

  test("two agreeing lists double the score; disagreement averages out") {
    val l1 = Seq("a" -> 30L, "b" -> 20L, "c" -> 10L)
    val l2 = Seq("a" -> 9L, "b" -> 5L, "c" -> 7L)
    val g = got(Seq(l1, l2))
    assert(g == model(Seq(l1, l2)))
    // a is rank 1 in both: 2 * (1e6 div 61)
    assert(g("a") == ((2L, 2 * (1000000L / 61))))
    assert(g("a")._2 > g("b")._2 && g("a")._2 > g("c")._2)
  }

  test("score ties break by key, ranks stay distinct") {
    val l = Seq("x" -> 5L, "y" -> 5L, "z" -> 5L)
    val g = got(Seq(l))
    assert(g == model(Seq(l)))
    assert(g("x")._2 > g("y")._2 && g("y")._2 > g("z")._2)
  }

  test("keys missing from a list earn nothing from it; n_lists records " +
      "participation") {
    val l1 = Seq("a" -> 2L, "b" -> 1L)
    val l2 = Seq("b" -> 9L, "c" -> 3L)
    val g = got(Seq(l1, l2))
    assert(g == model(Seq(l1, l2)))
    assert(g("a")._1 == 1L && g("b")._1 == 2L && g("c")._1 == 1L)
  }

  test("randomized lists match the replay for several k") {
    val rnd = new scala.util.Random(3)
    val keys = ('a' to 'h').map(_.toString)
    for (k <- Seq(1L, 10L, 60L)) {
      val lists = (1 to 3).map(_ =>
        keys.filter(_ => rnd.nextBoolean())
          .map(key => key -> rnd.nextLong(100)))
      assert(got(lists, k) == model(lists, k), s"k=$k")
    }
  }
}
