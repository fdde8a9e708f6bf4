package graft.plans

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.SparkSpecBase

/** The rank-filter rewrite must be invisible except in the plan: every
  * shape it claims to match produces exactly WindowExec's rows, and
  * non-matching shapes fall through untouched. */
class BoundedTopKSpec extends SparkSpecBase {
  import spark.implicits._

  private def withStrategy[T](on: Boolean)(f: => T): T = {
    val prev = spark.experimental.extraStrategies
    spark.experimental.extraStrategies =
      if (on) Seq(BoundedTopKStrategy) else Nil
    try f finally spark.experimental.extraStrategies = prev
  }

  private def df: DataFrame = Seq(
    ("a", 5L, 1L), ("a", 3L, 2L), ("a", 5L, 3L), ("a", 7L, 4L),
    ("b", 9L, 5L), ("b", 1L, 6L), ("c", 2L, 7L)).toDF("g", "n", "id")

  private def assertRewrites(q: => DataFrame): Unit = {
    val expected = withStrategy(on = false)(q.collect().toSet)
    val (got, plan) = withStrategy(on = true) {
      val d = q
      (d.collect().toSet, d.queryExecution.executedPlan.toString)
    }
    assert(plan.contains("BoundedTopK"), plan.take(1500))
    // two-phase: a partial map-side prune below the exchange and the
    // rank-emitting final above it (AQE prints the plan twice, so >= 2)
    assert("BoundedTopK".r.findAllIn(plan).size >= 2, plan.take(1500))
    // the heap subsumes both the window sort AND the builtin
    // WindowGroupLimit's sorted prune — NO sort anywhere in the plan
    assert(!plan.contains("Sort "), plan.take(2000))
    assert(!plan.contains("WindowGroupLimit"), plan.take(2000))
    assert(got === expected)
    assert(got.nonEmpty)
  }

  test("withColumn + cast + filter shape: rewritten, rows identical") {
    val w = Window.partitionBy("g").orderBy(col("n").desc, col("id"))
    assertRewrites(df
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= 2))
  }

  test("bare filter-over-window shape (rank dropped later): rewritten") {
    val w = Window.partitionBy("g").orderBy(col("n"), col("id"))
    assertRewrites(df
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") <= 2)
      .select("g", "n", "id"))
  }

  test("rank === 1 latest-by-key shape: rewritten; k larger than any group works") {
    val w = Window.partitionBy("g").orderBy(col("n").desc, col("id"))
    assertRewrites(df
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1))
    assertRewrites(df
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= 100)) // groups smaller than k keep all rows
  }

  test("rank < k and projected-derived-column shapes: rewritten") {
    val w = Window.partitionBy("g").orderBy(col("n").desc, col("id"))
    assertRewrites(df
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") < 3))
  }

  test("global row_number (no partitionBy) falls through and still computes") {
    val w = Window.orderBy(col("n").desc, col("id"))
    def q = df.withColumn("rn", row_number().over(w)).filter(col("rn") <= 3)
    val expected = withStrategy(false)(q.collect().toSet)
    withStrategy(true) {
      assert(!q.queryExecution.executedPlan.toString.contains("BoundedTopK"))
      assert(q.collect().toSet === expected)
    }
  }

  test("non-matching shapes fall through: rank(), conjunctions, range frame") {
    val w = Window.partitionBy("g").orderBy(col("n").desc, col("id"))
    // rank() (not row_number) must NOT rewrite
    val q1 = df.withColumn("r", rank().over(w)).filter(col("r") <= 2)
    // conjunction must NOT rewrite (filter has more than the bound)
    val q2 = df.withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 2 && col("n") > 1)
    withStrategy(on = true) {
      assert(!q1.queryExecution.executedPlan.toString.contains("BoundedTopK"))
      assert(!q2.queryExecution.executedPlan.toString.contains("BoundedTopK"))
    }
    // and both still compute correctly under the installed strategy
    val e1 = withStrategy(false)(q1.collect().toSet)
    val e2 = withStrategy(false)(q2.collect().toSet)
    withStrategy(true) {
      assert(q1.collect().toSet === e1)
      assert(q2.collect().toSet === e2)
    }
  }

  test("partial-phase group cap: overflow groups pass through unpruned (superset)") {
    import org.apache.spark.sql.catalyst.expressions.{AttributeReference, Ascending, SortOrder => CSortOrder}
    import org.apache.spark.sql.types.IntegerType
    val one = df.repartition(1)
    val childPlan = one.queryExecution.executedPlan
    val attrs = childPlan.output // g, n, id
    val rankAttr = AttributeReference("rn", IntegerType, nullable = false)()
    val partialNode = BoundedTopKExec(Seq(attrs(0)),
      Seq(CSortOrder(attrs(1), Ascending)), rankAttr, k = 1,
      partial = true, child = childPlan, maxPartialGroups = 1)
    val got = partialNode.execute().map(_.copy()).collect()
      .map(r => (r.getUTF8String(0).toString, r.getLong(1), r.getLong(2)))
    val byGroup = got.groupBy(_._1)
    // exactly ONE group was tracked and pruned to k=1...
    val inputByGroup = df.collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
      .groupBy(_._1)
    val prunedGroups = byGroup.filter { case (g, rows) => rows.length < inputByGroup(g).length }
    assert(prunedGroups.size <= 1)
    assert(byGroup.keySet === inputByGroup.keySet)
    // ...and every group still contains its true minimum (superset safety)
    inputByGroup.foreach { case (g, rows) =>
      assert(byGroup(g).map(_._2).min === rows.map(_._2).min, s"group $g")
    }
  }

  test("registered window queries rewrite and stay oracle-identical") {
    for (name <- Seq("q_heavy_hitters", "q_lang_cap")) {
      val q = graft.SparkEntry.queries(name)
      val expected = withStrategy(false)(q(spark, sf0001).collect().toSet)
      val (got, plan) = withStrategy(true) {
        val d = q(spark, sf0001)
        (d.collect().toSet, d.queryExecution.executedPlan.toString)
      }
      assert(plan.contains("BoundedTopK"), s"$name: ${plan.take(1200)}")
      assert(got === expected, name)
    }
  }
}
