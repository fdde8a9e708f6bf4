package graft.ops

import graft.SparkSpecBase

class AsOfJoinSpec extends SparkSpecBase {
  import spark.implicits._

  private val facts = Seq(
    (1L, 7L, 100L), // before any version -> null dim
    (2L, 7L, 200L), // at exactly v200 -> inclusive match
    (3L, 7L, 250L), // between v200 and v300 -> v200
    (4L, 7L, 301L), // after v300 -> v300
    (5L, 8L, 999L)  // key with no versions at all -> null
  ).toDF("fact_id", "k", "fts")

  private val dims = Seq(
    (7L, 200L, "v200"),
    (7L, 300L, "v300")
  ).toDF("k", "dts", "ver")

  test("as-of left join: inclusive <=, carry-forward, null before first version") {
    val got = AsOfJoin.asOfLeft(facts, dims, "k", "fts", "dts")
      .select("fact_id", "ver").as[(Long, Option[String])]
      .collect().toMap
    assert(got === Map(
      1L -> None, 2L -> Some("v200"), 3L -> Some("v200"),
      4L -> Some("v300"), 5L -> None))
  }

  test("as-of join preserves every fact row exactly once (left semantics)") {
    val got = AsOfJoin.asOfLeft(facts, dims, "k", "fts", "dts")
    assert(got.count() === facts.count())
    assert(got.select("fact_id").distinct().count() === facts.count())
  }

  test("randomized: union+carry-forward == naive filter+argmax on 3 seeds") {
    import org.apache.spark.sql.functions._
    for (seed <- Seq(1, 7, 42)) {
      val rnd = new scala.util.Random(seed)
      val rf = (1 to 200).map(i =>
        (i.toLong, (rnd.nextInt(5) + 1).toLong, rnd.nextInt(1000).toLong))
      val rd = (1 to 60).map(i =>
        ((rnd.nextInt(5) + 1).toLong, rnd.nextInt(1000).toLong, s"v$i"))
        .distinct.groupBy(t => (t._1, t._2)).map(_._2.head).toSeq // unique (k, dts)
      val f = rf.toDF("fact_id", "k", "fts")
      val d = rd.toDF("k", "dts", "ver")

      val got = AsOfJoin.asOfLeft(f, d, "k", "fts", "dts")
        .select("fact_id", "ver").as[(Long, Option[String])].collect().toMap

      // naive oracle: per fact, max-dts dim with dts <= fts
      val naive = f.as("f").join(d.as("d"),
          $"f.k" === $"d.k" && $"dts" <= $"fts", "left")
        .groupBy($"fact_id")
        .agg(max_by($"ver", $"dts").as("ver"))
        .as[(Long, Option[String])].collect().toMap
      assert(got === naive, s"seed $seed")
    }
  }
}

class GraftExtensionsSpec extends SparkSpecBase {

  test("SparkSessionExtensions wiring installs without error; SQL resolves after register") {
    // extension hook applies cleanly (cluster installs use
    // --conf spark.sql.extensions=graft.functions.GraftExtensions)
    new graft.functions.GraftExtensions()
      .apply(new org.apache.spark.sql.SparkSessionExtensions)
    // SQL surface through the registry path on the live session
    graft.functions.GraftFunctions.register(spark)
    val got = spark.sql("SELECT graft_fnv64('foobar') AS h").head().getLong(0)
    assert(got === 0x85944171f73967e8L)
  }
}
