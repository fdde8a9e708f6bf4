package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Temporal as-of join: enrich each fact row with the newest dimension
  * version whose timestamp is <= the fact's timestamp (per key).
  *
  * This is the full-fidelity form of the reference's KTable lookup — a
  * KTable join answers "latest dimension NOW" (reference
  * `topology/ABBankTopology.java:233-240`), which for reprocessing/backfill
  * is wrong: a transaction from Monday must see Monday's account row, not
  * Friday's. Spark has no built-in as-of join; the standard compositions
  * are (a) key-join + filter + argmax — O(facts × versions) blowup — or
  * (b) the union + sort + last(ignoreNulls) carry-forward used here:
  *
  *   ONE hash shuffle on the key, ONE sort per partition, linear scan.
  *   Dimension rows sort before fact rows at equal timestamps (inclusive
  *   <= semantics, matching DuckDB's ASOF JOIN which verifies this
  *   operator), and a running `last(dim, ignoreNulls)` carries the current
  *   version onto every subsequent fact row.
  *
  * At 100 TB this is the only shape that survives: no cross product, no
  * range-join explosion, state = one dimension struct per key per
  * partition during the scan.
  */
object AsOfJoin {

  /** Left as-of join. Output = all `facts` columns + each non-key `dims`
    * column (null when no version precedes the fact).
    *
    * `dims` must be unique per (key, dimTs) — pre-dedupe with
    * [[LatestByKey]] if needed; ties would otherwise be nondeterministic. */
  def asOfLeft(facts: DataFrame, dims: DataFrame, key: String,
      factTs: String, dimTs: String): DataFrame = {
    val dimPayload = dims.columns.filterNot(_ == key).toSeq
    val factCols = facts.columns.toSeq
    val overlap = factCols.toSet.intersect(dimPayload.toSet)
    require(overlap.isEmpty, s"alias dim-side columns first: $overlap")

    val factSide = facts
      .withColumn("__ts", col(factTs))
      .withColumn("__isFact", lit(1))
      .withColumn("__dim", lit(null).cast(
        dims.select(dimPayload.map(col): _*).schema))
    val dimSide = dims
      .withColumn("__ts", col(dimTs))
      .withColumn("__isFact", lit(0))
      .withColumn("__dim", struct(dimPayload.map(col): _*))
      .select((Seq(col(key), col("__ts"), col("__isFact"), col("__dim")) ++
        factCols.filterNot(c => c == key).map(c => lit(null).cast(
          facts.schema(c).dataType).as(c))): _*)

    val unioned = factSide.select(
      (Seq(col(key), col("__ts"), col("__isFact"), col("__dim")) ++
        factCols.filterNot(_ == key).map(col)): _*)
      .unionByName(dimSide)

    val w = Window.partitionBy(col(key))
      .orderBy(col("__ts"), col("__isFact"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    unioned
      .withColumn("__carried", last(col("__dim"), ignoreNulls = true).over(w))
      .filter(col("__isFact") === 1)
      .select(factCols.map(col) ++
        dimPayload.map(c => col(s"__carried.$c").as(c)): _*)
  }
}
