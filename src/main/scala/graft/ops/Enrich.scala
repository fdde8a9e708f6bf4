package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Stream-table enrichment joins (reference J1/J3).
  *
  * The reference enriches each high-value transaction with the latest
  * account row via a KV-store lookup (`topology/ABBankTopology.java:233-240`)
  * and *declares* (but never wires) a second hop to customers
  * (`README.md:44`, comment at `:212-213`) — the rebuild implements both.
  *
  * Scale posture: dimension tables (accounts/customers/nations) are orders
  * of magnitude smaller than the fact stream, so both hops are explicit
  * `broadcast()` hash joins — zero shuffle of the 100 TB fact side. If a
  * dimension ever outgrows broadcast range, drop the hint and let AQE pick
  * a shuffled hash join on the pre-partitioned key.
  */
object Enrich {

  /** J1: left-join facts to a dimension on `key`, broadcasting the dim.
    * Left join tolerates missing dimension rows (reference falls back to
    * "N/A" — `topology/ABBankTopology.java:252-253`). */
  def withDim(facts: DataFrame, dim: DataFrame, key: String): DataFrame =
    facts.join(broadcast(dim), Seq(key), "left")

  /** J3: two-hop enrichment — facts -> customer dim -> nation dim. */
  def twoHop(
      facts: DataFrame, factKey: String,
      dim1: DataFrame, dim1Key: String,
      dim2: DataFrame, dim2FromCol: String, dim2Key: String): DataFrame =
    facts
      .join(broadcast(dim1), col(factKey) === col(dim1Key), "left")
      .join(broadcast(dim2), col(dim2FromCol) === col(dim2Key), "left")
}
