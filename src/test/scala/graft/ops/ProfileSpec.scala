package graft.ops

import graft.SparkSpecBase
import org.apache.spark.sql.functions._

class ProfileSpec extends SparkSpecBase {
  import spark.implicits._

  test("profile counts, distincts, and min/max reprs across types — " +
      "numeric min stays numeric (99 < 100 despite '100' < '99')") {
    val df = Seq(
      (1L, Some(100.0), Some("b"), Some(2)),
      (2L, Some(99.0), None, Some(1)),
      (2L, None, Some("a"), None))
      .toDF("k", "d", "s", "i")
    val p = Profile.profile(df).collect()
      .map(r => r.getString(0) -> ((r.getLong(2), r.getLong(3), r.getLong(4),
        r.getString(5), r.getString(6)))).toMap
    assert(p("k") == ((3L, 0L, 2L, "1", "2")))
    // the lexicographic trap: string min of renders would be "100000000"
    assert(p("d") == ((3L, 1L, 2L, (99.0 * 1e6).toLong.toString,
      (100.0 * 1e6).toLong.toString)))
    assert(p("s") == ((3L, 1L, 2L, "a", "b")))
    assert(p("i") == ((3L, 1L, 2L, "1", "2")))
  }

  test("unsupported types profile counts-only with null reprs") {
    val df = Seq((1L, Seq(1, 2)), (2L, Seq(3))).toDF("k", "arr")
    val p = Profile.profile(df).collect()
      .map(r => r.getString(0) -> r).toMap
    assert(p("arr").getLong(4) == 2L) // distinct still exact
    assert(p("arr").isNullAt(5) && p("arr").isNullAt(6))
  }

  test("output row order follows the schema, one row per column") {
    val df = Seq((1L, "x")).toDF("b_second", "a_first")
    assert(Profile.profile(df).select("column").as[String].collect()
      .toSeq == Seq("b_second", "a_first"))
  }
}
