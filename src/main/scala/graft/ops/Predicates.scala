package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Domain predicates of the reference as reusable `Column`s
  * (reference `model/TransactionEvent.java:66-81`). Plain Catalyst
  * predicates — they fuse into scans and stay inside whole-stage codegen;
  * Parquet gets them as pushed filters when applied directly on a scan.
  */
object Predicates {

  /** Debit-side transaction types (reference `model/TransactionEvent.java:66-71`). */
  val debitTypes: Seq[String] = Seq("DEBIT", "TRANSFER_OUT", "FEE", "LOAN_REPAYMENT")

  /** Credit-side transaction types (reference `model/TransactionEvent.java:73-77`). */
  val creditTypes: Seq[String] = Seq("CREDIT", "TRANSFER_IN", "INTEREST")

  def isDebit(txnType: Column): Column = txnType.isin(debitTypes: _*)

  def isCredit(txnType: Column): Column = txnType.isin(creditTypes: _*)

  def isCompleted(status: Column): Column = status === "COMPLETED"

  /** Inclusive >= threshold — boundary semantics verified by the reference's
    * tests (`ABBankTopologyTest.java:296-316`). */
  def isHighValue(amount: Column, threshold: Double): Column = amount >= lit(threshold)

  /** Signed amount for balance arithmetic: debits subtract, credits add. */
  def signedAmount(amount: Column, txnType: Column): Column =
    when(isDebit(txnType), -amount).otherwise(amount)
}
