package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Interval (range) join: pair left rows with right rows of the same key
  * whose timestamp falls in [leftTs + lower, leftTs + upper].
  *
  * Naively this is a key-equi join followed by a range filter — per hot
  * key that is an O(n_l × n_r) cross product before the filter prunes. The
  * scale-correct shape used here buckets time into spans of width
  * W = upper − lower: each left row replicates into the (≤ 2–3) buckets
  * its window overlaps, the right side lands in exactly one bucket, and
  * the join runs equi on (key, bucket) — co-partitioned shuffle, bounded
  * fan-out, exact range predicate applied after. Cost is linear in rows ×
  * overlap, never quadratic in key cardinality.
  *
  * (Spark's own planner turns a range-predicate join into a sort-merge or
  * nested-loop over the whole key group; the explicit bucketing keeps the
  * candidate set tight at 100 TB.)
  */
object IntervalJoin {

  /** Inner interval join. Column names of `left` and `right` must be
    * disjoint apart from `key` (pre-alias the right side) — avoids Spark's
    * self-join reference ambiguity when both sides derive from one plan.
    * Timestamps are assumed non-negative (epoch units): bucket ids use
    * truncating `div`, which only agrees with floor-division at >= 0
    * (`leftTs + lowerUs` may dip below zero harmlessly — negative buckets
    * can only match right rows that don't exist). */
  def inner(left: DataFrame, right: DataFrame, key: String,
      leftTs: String, rightTs: String, lowerUs: Long, upperUs: Long): DataFrame = {
    require(upperUs > lowerUs, "empty interval")
    val overlap = left.columns.toSet.intersect(right.columns.toSet) - key
    require(overlap.isEmpty, s"alias right-side columns first: $overlap")
    val w = upperUs - lowerUs

    val l = left.withColumn("__lb",
      explode(sequence(
        expr(s"($leftTs + $lowerUs) div $w"),
        expr(s"($leftTs + $upperUs) div $w"))))
    val r = right.withColumnRenamed(key, "__rk")
      .withColumn("__rb", expr(s"$rightTs div $w"))

    l.join(r,
        col("__lb") === col("__rb") && col(key) === col("__rk") &&
          col(rightTs) >= col(leftTs) + lowerUs &&
          col(rightTs) <= col(leftTs) + upperUs)
      .drop("__lb", "__rb", "__rk")
  }
}
