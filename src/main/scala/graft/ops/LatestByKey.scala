package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** KTable analog: "latest row per key" over a CDC upsert stream
  * (reference `topology/ABBankTopology.java:119-123,140-144` — a KTable
  * materialization into a KV store).
  *
  * Scale posture: ONE hash shuffle on the key, then a per-partition sort +
  * running `row_number` — no `collect_list`, no second shuffle, no driver
  * work. At 100 TB this is the minimal-cost shape: Exchange(key) feeds a
  * WindowExec whose state is a single row per key. Ordering carries an
  * explicit tiebreak so Spark and the DuckDB oracle agree deterministically
  * (SURVEY §7.5).
  */
object LatestByKey {

  /** Keep the newest row per `keys`, newest defined by `orderDesc` columns
    * compared descending with later columns as tiebreaks. */
  def latest(df: DataFrame, keys: Seq[String], orderDesc: Seq[Column]): DataFrame = {
    val w = Window.partitionBy(keys.map(col): _*).orderBy(orderDesc.map(_.desc): _*)
    df.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .drop("__rn")
  }

  /** KTable semantics with tombstones applied: the latest version per key
    * wins, and if that version is a delete (`op = 'd'`) the key is REMOVED
    * from the materialized table — Kafka Streams' actual tombstone
    * behavior, which the reference sidesteps by filtering deletes upstream
    * (`topology/ABBankTopology.java:89-92`). Same single-shuffle shape as
    * [[latest]]; the op filter runs after the argmax. */
  def latestWithTombstones(df: DataFrame, keys: Seq[String],
      orderDesc: Seq[Column], opCol: String = "op"): DataFrame =
    latest(df, keys, orderDesc).filter(col(opCol) =!= "d")

  /** SCD type-2 history: every change-event becomes a dimension version
    * with a validity interval — valid_from = its event time, valid_to =
    * the NEXT version's event time (null while current). The standard
    * CDC-to-warehouse materialization, complementing the latest-only view.
    * One shuffle + one windowed `lead()` pass. */
  def scd2(df: DataFrame, keys: Seq[String], orderBy: Seq[Column],
      validFromCol: String): DataFrame = {
    val w = Window.partitionBy(keys.map(col): _*).orderBy(orderBy: _*)
    df.withColumn("valid_from_ms", col(validFromCol))
      .withColumn("valid_to_ms", lead(col(validFromCol), 1).over(w))
      .withColumn("is_current", col("valid_to_ms").isNull)
  }

  /** Same via `max_by(struct(*), ord)` — a partial-aggregating alternative
    * (map-side combine shrinks the shuffle to ~keys×partitions rows).
    * `ord` must be totally ordered per key (use a struct of ts + id).
    *
    * Measured tradeoff (10M rows × 10k keys, local[32]): the max_by agg
    * buffer copies the whole carried struct on every better-ordered row,
    * so PRE-PROJECT to the columns you need — narrow max_by 0.8s,
    * window-row_number 0.9s, max_by over the full wide row 6.8s. Prefer
    * this variant for narrow payloads / high key-repeat ratios; prefer
    * [[latest]] when many wide columns must survive. */
  def latestByMaxBy(df: DataFrame, keys: Seq[String], ord: Column): DataFrame = {
    val valueCols = df.columns.filterNot(keys.contains).toIndexedSeq
    df.groupBy(keys.map(col): _*)
      .agg(max_by(struct(valueCols.map(col): _*), ord).as("__latest"))
      .select(keys.map(col) ++ valueCols.map(c => col(s"__latest.$c").as(c)): _*)
  }
}
