package graft.ops

import graft.SparkSpecBase

class PrivacySpec extends SparkSpecBase {
  import spark.implicits._

  private def customers(rows: (Long, Int, Double, String)*) =
    rows.toDF("c_custkey", "c_nationkey", "c_acctbal", "c_mktsegment")

  test("k-anonymity flags exactly the under-k quasi-identifier groups") {
    // group (1, AUTO, band 2): 3 members -> at risk at k=5
    // group (2, BLDG, band 0): 5 members -> safe
    val c = customers(
      (1L, 1, 2100.0, "AUTO"), (2L, 1, 2500.0, "AUTO"), (3L, 1, 2999.0, "AUTO"),
      (4L, 2, 10.0, "BLDG"), (5L, 2, 20.0, "BLDG"), (6L, 2, 30.0, "BLDG"),
      (7L, 2, 40.0, "BLDG"), (8L, 2, 50.0, "BLDG"))
    val got = Privacy.kAnonymity(c, k = 5)
      .as[(Long, String, Long, Long, Boolean)].collect().toSet
    assert(got === Set(
      (1L, "AUTO", 2L, 3L, true),
      (2L, "BLDG", 0L, 5L, false)))
  }

  test("l-diversity flags large-but-uniform groups k-anonymity misses") {
    // group (2, BLDG, band 0): 5 members (k-anonymous at k=5) but only
    // ONE distinct balance -> at risk at l=3; group (1, AUTO, band 2):
    // 3 members, 3 distinct balances -> diverse
    val c = customers(
      (1L, 1, 2100.0, "AUTO"), (2L, 1, 2500.0, "AUTO"), (3L, 1, 2999.0, "AUTO"),
      (4L, 2, 10.0, "BLDG"), (5L, 2, 10.0, "BLDG"), (6L, 2, 10.0, "BLDG"),
      (7L, 2, 10.0, "BLDG"), (8L, 2, 10.0, "BLDG"))
    val got = Privacy.lDiversity(c, l = 3)
      .as[(Long, String, Long, Long, Long, Boolean)].collect().toSet
    assert(got === Set(
      (1L, "AUTO", 2L, 3L, 3L, false),
      (2L, "BLDG", 0L, 5L, 1L, true)))
    // ...and k-anonymity alone calls the uniform group safe
    val ka = Privacy.kAnonymity(c, k = 5)
      .as[(Long, String, Long, Long, Boolean)].collect().toSet
    assert(ka.contains((2L, "BLDG", 0L, 5L, false)))
  }

  test("negative balances band with floor semantics and counts partition the table") {
    val c = customers(
      (1L, 1, -999.99, "AUTO"), // floor(-0.99999) = -1
      (2L, 1, -0.01, "AUTO"),   // floor(-0.00001) = -1
      (3L, 1, 0.0, "AUTO"),     // band 0
      (4L, 1, 999.99, "AUTO"))  // band 0
    val got = Privacy.kAnonymity(c, k = 2)
      .as[(Long, String, Long, Long, Boolean)].collect()
    assert(got.map(_._3).sorted.toSeq === Seq(-1L, 0L))
    assert(got.map(_._4).sum === 4L) // group sizes partition the table
    assert(got.forall(!_._5))        // both bands have 2 members at k=2
  }
}
