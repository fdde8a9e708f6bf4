package graft.ops

import graft.SparkSpecBase

class FkAuditSpec extends SparkSpecBase {
  import spark.implicits._

  test("planted orphans and null FKs are counted exactly") {
    val child = Seq(
      (1L, Option(10L)), (2L, Option(10L)), (3L, Option(20L)),
      (4L, Option(99L)), (5L, Option(99L)), (6L, Option(77L)),
      (7L, None), (8L, None)).toDF("id", "fk")
    val parent = Seq(10L, 20L, 30L).toDF("pk")
    val r = Profile.fkAudit(Seq(("c->p", child, "fk", parent, "pk")))
      .collect()
    assert(r.length == 1)
    val row = r.head
    assert(row.getString(0) == "c->p")
    assert(row.getLong(1) == 8L) // child_rows
    assert(row.getLong(2) == 2L) // null_fks
    assert(row.getLong(3) == 4L) // distinct_fks (10, 20, 99, 77)
    assert(row.getLong(4) == 2L) // orphan_keys (99, 77)
    assert(row.getLong(5) == 3L) // orphan_rows (4, 5, 6)
  }

  test("clean relation reports zero orphans; duplicate parents collapse") {
    val child = Seq(1L -> 10L, 2L -> 20L).toDF("id", "fk")
    val parent = Seq(10L, 10L, 20L, 30L).toDF("pk")
    val row = Profile.fkAudit(Seq(("c->p", child, "fk", parent, "pk")))
      .collect().head
    assert((row.getLong(1), row.getLong(2), row.getLong(3),
      row.getLong(4), row.getLong(5)) == ((2L, 0L, 2L, 0L, 0L)))
  }

  test("multiple relations union in declaration order") {
    val c = Seq(1L -> 1L).toDF("id", "fk")
    val p = Seq(1L).toDF("pk")
    val rels = Profile.fkAudit(Seq(
      ("r1", c, "fk", p, "pk"), ("r2", c, "fk", p, "pk")))
      .collect().map(_.getString(0)).toSeq
    assert(rels == Seq("r1", "r2"))
  }
}
