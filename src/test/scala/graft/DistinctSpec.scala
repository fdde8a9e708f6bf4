package graft

import org.apache.spark.sql.functions._

/** Approx-distinct sanity: HLL++ estimate within 5% of exact on the corpus
  * (the approx value is engine-specific so it cannot be oracle-hashed;
  * `q_distinct_users` carries the exact counts). */
class DistinctSpec extends SparkSpecBase {

  test("approx_count_distinct within 5% of exact countDistinct") {
    val ev = Tables.events(spark, sf0001)
    val row = ev.agg(
      countDistinct(col("user_id")).as("exact"),
      approx_count_distinct(col("user_id")).as("approx")).head()
    val exact = row.getAs[Long]("exact").toDouble
    val approx = row.getAs[Long]("approx").toDouble
    assert(math.abs(approx - exact) / exact <= 0.05,
      s"approx $approx vs exact $exact")
  }

  test("percentile_approx brackets the exact median within the value spread") {
    val ev = Tables.events(spark, sf0001)
    val row = ev.agg(
      median(col("value")).as("exact"),
      percentile_approx(col("value"), lit(0.5), lit(1000)).as("approx"),
      expr("percentile(value, 0.25)").as("q1"),
      expr("percentile(value, 0.75)").as("q3")).head()
    val exact = row.getAs[Double]("exact")
    val approx = row.getAs[Double]("approx")
    val iqr = row.getAs[Double]("q3") - row.getAs[Double]("q1")
    // the sketch (KLL-style) returns a real sample value near the median:
    // at accuracy 1000 on 1k rows it must land well inside the IQR
    assert(math.abs(approx - exact) <= iqr * 0.1,
      s"approx median $approx vs exact $exact (iqr $iqr)")
  }

  test("rollup emits leaf, per-currency subtotal, and grand total levels") {
    val df = SparkEntry.queries("q_rollup_spend")(spark, sf0001)
    val rows = df.collect()
    assert(rows.exists(r => r.getAs[String]("currency") == "ALL" &&
      r.getAs[String]("txn_type") == "ALL"))      // grand total
    assert(rows.exists(r => r.getAs[String]("currency") != "ALL" &&
      r.getAs[String]("txn_type") == "ALL"))      // currency subtotal
    assert(rows.exists(r => r.getAs[String]("currency") != "ALL" &&
      r.getAs[String]("txn_type") != "ALL"))      // leaf
    // grand total equals the sum of leaves
    val grand = rows.find(r => r.getAs[String]("currency") == "ALL" &&
      r.getAs[String]("txn_type") == "ALL").get.getAs[Double]("total_amount")
    val leaves = rows.filter(r => r.getAs[String]("currency") != "ALL" &&
      r.getAs[String]("txn_type") != "ALL").map(_.getAs[Double]("total_amount")).sum
    assert(math.abs(grand - leaves) < 0.05)
  }
}
