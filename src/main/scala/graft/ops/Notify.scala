package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Scalar display/formatting functions + notification assembly.
  *
  * Re-expresses the reference's formatting helpers (`util/CdcParser.java:30-52`)
  * and `NotificationEvent` JSON construction (`model/NotificationEvent.java:52-86`)
  * as pure Catalyst column expressions — everything stays codegen'd; no UDFs.
  */
object Notify {

  /** F1 `formatAmount` (reference `util/CdcParser.java:40-44`):
    * NGN -> "₦" prefix, otherwise "<ISO> " prefix; thousands-grouped, 2 dp;
    * null amount -> "<prefix>0.00". */
  def formatAmount(amount: Column, currency: Column): Column = {
    val prefix = when(currency === "NGN", lit("₦"))
      .otherwise(concat(currency, lit(" ")))
    concat(prefix, format_number(coalesce(amount, lit(0.0)), 2))
  }

  /** F2 `formatTimestampMs` (reference `util/CdcParser.java:30-32,49-52`):
    * epoch-millis -> "yyyy-MM-dd HH:mm:ss z" rendered in Africa/Lagos (WAT,
    * fixed UTC+1, no DST); null -> "N/A". Display-only — computation stays UTC. */
  def formatTimestampMs(epochMs: Column): Column =
    when(epochMs.isNull, lit("N/A")).otherwise(
      concat(
        date_format(
          from_utc_timestamp(timestamp_millis(epochMs), "Africa/Lagos"),
          "yyyy-MM-dd HH:mm:ss"),
        lit(" WAT")))

  /** F6 Lagos-local date label for daily buckets
    * (reference `topology/ABBankTopology.java:58,403-404`). */
  def lagosDate(epochMs: Column): Column =
    date_format(
      from_utc_timestamp(timestamp_millis(epochMs), "Africa/Lagos"),
      "yyyy-MM-dd")

  /** F10 `getFullName` (reference `model/CustomerEvent.java:46-48`). */
  def fullName(first: Column, last: Column): Column = concat_ws(" ", first, last)

  /** O2 notification assembly (reference `model/NotificationEvent.java:52-86`):
    * a struct serialized to compact JSON. `notificationId` is deterministic
    * (type prefix + entity id) instead of the reference's `UUID.randomUUID`
    * and `generatedAt=now()` is omitted, so output is hash-comparable; the
    * streaming sinks re-add both via [[dispatchStamp]] (nondeterministic
    * fields excluded from verification per SURVEY §7.5).
    *
    * `metadata` is an ordered string->string map, matching the reference's
    * LinkedHashMap semantics (`model/NotificationEvent.java:54,67`). */
  def notificationJson(
      idPrefix: String,
      notificationType: String,
      severity: String,
      channel: String,
      entityId: Column,
      accountId: Column,
      subject: Column,
      body: Column,
      metadata: Column): Column =
    to_json(struct(
      concat(lit(idPrefix + "-"), entityId).as("notificationId"),
      lit(notificationType).as("notificationType"),
      lit(severity).as("severity"),
      lit(channel).as("channel"),
      accountId.as("accountId"),
      subject.as("subject"),
      body.as("body"),
      metadata.as("metadata")))

  /** F9 dispatch stamping (reference `model/NotificationEvent.java:70-71`:
    * `UUID.randomUUID` + `generatedAt = Instant.now()` per notification).
    * Applied AT THE STREAMING SINK, never in the transforms, so every
    * transform stays deterministic and hash-comparable — the stamp columns
    * are the only nondeterministic fields and are excluded from any
    * equivalence compare. */
  def dispatchStamp(df: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame =
    df.withColumn("notification_uuid", expr("uuid()"))
      .withColumn("generated_at_ms", unix_millis(current_timestamp()))
}
