package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Privacy audits run before a customer-derived table feeds a training
  * corpus or leaves the warehouse — the table-level complement of the
  * row-level PII scrub ([[graft.text.TrainingPrep]]'s regex redaction).
  *
  * k-anonymity (Sweeney 2002): a release is k-anonymous when every
  * combination of quasi-identifier values is shared by at least k rows;
  * any smaller group is a re-identification risk. The audit here groups
  * the customer table by the classic quasi-identifier tuple — geography
  * (nation), segment, and a coarsened account-balance band — and flags
  * the under-k groups.
  *
  * Scale shape: ONE map-side-combined hash aggregation over the
  * quasi-identifier tuple — linear in rows, output bounded by the QI
  * domain (|nations| × |segments| × |bands|), no joins, no windows. At
  * 100 TB this is the cheapest full-table statement there is.
  */
object Privacy {

  /** Per-QI-group sizes with the at-risk flag (group_n < k). Banding:
    * `floor(c_acctbal / 1000)` — one elementwise IEEE division + floor,
    * replayed exactly by the oracle. */
  def kAnonymity(customer: DataFrame, k: Long = 5L): DataFrame =
    customer.groupBy(
        col("c_nationkey").cast("long").as("nationkey"),
        col("c_mktsegment").as("mktsegment"),
        floor(col("c_acctbal") / 1000.0).cast("long").as("acctbal_band"))
      .agg(count(lit(1)).as("group_n"))
      .withColumn("at_risk", col("group_n") < k)

  /** Distinct l-diversity (Machanavajjhala et al. 2007): k-anonymity's
    * complement — a group can be large (k-anonymous) yet still leak if
    * everyone in it shares the SAME sensitive value, so each QI group
    * must also contain at least `l` DISTINCT sensitive values. QI tuple
    * as [[kAnonymity]]; the sensitive attribute is the EXACT account
    * balance (the banding that coarsens it into the QI is precisely
    * what makes the residual exact value the sensitive remainder).
    *
    * Scale shape: count(DISTINCT) over one grouping = Spark's two-level
    * expand-then-agg, both levels map-side combined — linear in rows,
    * output bounded by the QI domain. Same cheapest-full-table-statement
    * posture as [[kAnonymity]]. */
  def lDiversity(customer: DataFrame, l: Long = 3L): DataFrame =
    customer.groupBy(
        col("c_nationkey").cast("long").as("nationkey"),
        col("c_mktsegment").as("mktsegment"),
        floor(col("c_acctbal") / 1000.0).cast("long").as("acctbal_band"))
      .agg(count(lit(1)).as("group_n"),
        countDistinct(col("c_acctbal")).as("n_sensitive"))
      .withColumn("at_risk", col("n_sensitive") < l)
}
