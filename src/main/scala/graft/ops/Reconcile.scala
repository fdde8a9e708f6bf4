package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** O1 balance reconciliation — batch form.
  *
  * The reference's `BalanceReconciliationProcessor` keeps, per account, the
  * last seen `balance_after` in a RocksDB store and compares each incoming
  * transaction's `balance_before` against it: first event bootstraps the
  * store (`:72-74`), |diff| > 0.01 flags a HIGH discrepancy (`:76-86`),
  * otherwise a LOW balance update; the new `balance_after` is written back
  * (`:89`). (reference `topology/BalanceReconciliationProcessor.java:42-152`)
  *
  * Batch semantics are exactly a `lag()` over (account, event order): the
  * "stored balance" for row N is row N-1's `balance_after`. That is what
  * the DuckDB oracle verifies. The streaming twin with real incremental
  * state lives in [[graft.streaming.Pipelines]] via
  * `flatMapGroupsWithState`.
  *
  * The test corpus has no balance columns, so they are synthesized
  * deterministically from the running signed-amount sum, with a discrepancy
  * injected on txn_id % 97 == 0 — giving the discrepancy path real coverage
  * (the reference's own tests only cover the happy path; SURVEY §5).
  *
  * Scale posture: one hash shuffle on account_id feeding a single
  * WindowExec evaluating all three window functions (running sum + two
  * lags) over one sort — no self-joins, no second shuffle.
  */
object Reconcile {

  val ToleranceNgn = 0.01   // reference `BalanceReconciliationProcessor.java:47`
  val InjectedError = 5.0   // synthetic discrepancy magnitude

  /** Input: parsed completed transactions. Output: one reconciliation row
    * per transaction with BOOTSTRAP / BALANCE_UPDATE / DISCREPANCY status. */
  def reconcile(txns: DataFrame): DataFrame = {
    val order = Window.partitionBy(col("account_id"))
      .orderBy(col("event_time_us"), col("txn_id"))
    val running = order.rowsBetween(Window.unboundedPreceding, Window.currentRow)

    val signed = Predicates.signedAmount(col("amount"), col("txn_type"))
    // `+ 0.0` collapses IEEE negative zero so both engines emit +0.0
    val withBalances = txns
      .withColumn("balance_after", round(sum(signed).over(running), 2) + lit(0.0))
      .withColumn("balance_before",
        round(col("balance_after") - signed +
          when(col("txn_id") % 97 === 0, lit(InjectedError)).otherwise(lit(0.0)), 2) + lit(0.0))

    withBalances
      .withColumn("stored_balance", lag(col("balance_after"), 1).over(order))
      .withColumn("discrepancy",
        when(col("stored_balance").isNull, lit(0.0))
          .otherwise(round(abs(col("balance_before") - col("stored_balance")), 2)))
      .withColumn("recon_status",
        when(col("stored_balance").isNull, "BOOTSTRAP")
          .when(col("discrepancy") > ToleranceNgn, "DISCREPANCY")
          .otherwise("BALANCE_UPDATE"))
      .withColumn("severity",
        when(col("recon_status") === "DISCREPANCY", "HIGH").otherwise("LOW"))
      .select("txn_id", "account_id", "event_time_ms", "balance_before",
        "balance_after", "stored_balance", "discrepancy", "recon_status", "severity")
  }
}
