package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Windowed aggregations (reference W1-W3, all tumbling/session with NO
  * grace — late data outside the window is dropped, so the batch form is
  * exact: every window is closed).
  *
  * All window arithmetic is done on integer epoch units (`ts_us`/`ms`), and
  * window identity is emitted as epoch-millis longs — engine-agnostic, so
  * the DuckDB oracle reproduces boundaries bit-for-bit (no timestamp-type
  * coercion hazards). Spark's `window()` aligns tumbling windows to the
  * epoch, i.e. start = floor(ts_ms / size_ms) * size_ms — same formula the
  * oracle uses.
  *
  * Scale posture: each query is ONE hash shuffle on (key, window) with
  * map-side partial aggregation; session windows shuffle on key only and
  * merge per-partition. No collect, no driver loops; AQE coalesces the
  * post-shuffle partitions at small SF and splits skewed keys at large SF.
  */
object Windows {

  /** W1 velocity: tumbling `windowSec` count per account; alert when
    * count >= `minTxns` (reference `topology/ABBankTopology.java:173-180`,
    * 60 s / >=5 at production config). Emitted on window close (append
    * semantics — the documented intent; SURVEY §2.5). */
  def velocityCount(txns: DataFrame, windowSec: Int, minTxns: Long,
      tsCol: Column = timestamp_micros(col("event_time_us"))): DataFrame =
    txns
      .groupBy(
        col("account_id"),
        window(tsCol, s"$windowSec seconds").as("w"))
      .agg(count(lit(1)).as("n_txns"))
      .filter(col("n_txns") >= minTxns)
      .select(
        col("account_id"),
        unix_millis(col("w.start")).as("window_start_ms"),
        unix_millis(col("w.end")).as("window_end_ms"),
        col("n_txns"))

  /** Hopping (sliding) windowed count — Kafka Streams
    * `TimeWindows.ofSizeAndAdvance` as Spark's two-argument `window()`.
    * The reference DECLARES this shape in dead model code: its
    * `model/VelocityState.java:15-63` hand-rolls a sliding-window event
    * deque that the topology never wires (SURVEY §1.3) — this is that
    * declared intent, running. Each event lands in `windowSec/advanceSec`
    * overlapping epoch-aligned windows (Spark explodes the window list in
    * the scan stage; the shuffle still moves one row per (event, window)
    * — the fan-out factor is the overlap count, a query constant). */
  def velocityHopping(txns: DataFrame, windowSec: Int, advanceSec: Int,
      minTxns: Long,
      tsCol: Column = timestamp_micros(col("event_time_us"))): DataFrame =
    txns
      .groupBy(
        col("account_id"),
        window(tsCol, s"$windowSec seconds", s"$advanceSec seconds").as("w"))
      .agg(count(lit(1)).as("n_txns"))
      .filter(col("n_txns") >= minTxns)
      .select(
        col("account_id"),
        unix_millis(col("w.start")).as("window_start_ms"),
        unix_millis(col("w.end")).as("window_end_ms"),
        col("n_txns"))

  /** W2 daily spend: 24 h tumbling sum of completed debit amounts per
    * account; alert when total >= `alertThreshold`
    * (reference `topology/ABBankTopology.java:385-400`). Sum rounded to the
    * money precision (2 dp) — input amounts are exact 2-dp values, so the
    * rounded sum is engine-exact. Includes the Lagos-local date label the
    * reference stamps on the alert (F6). */
  def dailySpend(completedDebits: DataFrame, alertThreshold: Double,
      tsCol: Column = timestamp_micros(col("event_time_us"))): DataFrame =
    completedDebits
      .groupBy(
        col("account_id"),
        window(tsCol, "1 day").as("w"))
      .agg(round(sum(col("amount")), 2).as("total_spend"), count(lit(1)).as("n_txns"))
      .filter(col("total_spend") >= alertThreshold)
      .select(
        col("account_id"),
        unix_millis(col("w.start")).as("day_start_ms"),
        Notify.lagosDate(unix_millis(col("w.start"))).as("lagos_date"),
        col("total_spend"),
        col("n_txns"))

  /** W3 dormancy: session windows with `gap` inactivity
    * (reference `topology/ABBankTopology.java:333-342`, 30-day gap at
    * production config). Emits every closed session with its event count and
    * a dormancy flag for single-event sessions — the documented alert intent
    * ("session closes having had only one event", README:73-80; we take the
    * append-mode reading per SURVEY §2.5).
    *
    * Session identity: start = first event, end = last event + gap; an event
    * exactly `gap` after the previous one starts a NEW session (half-open
    * window), which the lag-based oracle mirrors with `diff >= gap`. */
  def dormancySessions(txns: DataFrame, gap: String,
      tsCol: Column = timestamp_micros(col("event_time_us"))): DataFrame =
    txns
      .groupBy(
        col("account_id"),
        session_window(tsCol, gap).as("w"))
      .agg(count(lit(1)).as("n_events"))
      .select(
        col("account_id"),
        unix_millis(col("w.start")).as("session_start_ms"),
        unix_millis(col("w.end")).as("session_end_ms"),
        col("n_events"),
        (col("n_events") === 1).as("is_dormant"))

  /** Trailing rolling-window spend: for EVERY transaction, the sum of the
    * account's amounts over the trailing `windowSec` seconds (RANGE frame
    * on integer event time; same-timestamp rows are peers and always share
    * one frame, so the result is order-independent). The continuous
    * counterpart of [[dailySpend]]'s tumbling buckets — and the shape
    * fraud features actually use: a transaction is scored against ITS OWN
    * trailing window, not a calendar bucket that resets at midnight.
    *
    * Money accumulates in integer kobo (inputs are exact 2-dp values), so
    * engines agree bit-for-bit regardless of accumulation order. Shuffle
    * shape: ONE hash shuffle on account + a per-partition sort — the
    * window never crosses accounts, so no global ordering exists anywhere
    * (the classic scale trap for rolling features is an unpartitioned
    * ORDER BY; partitioning by the entity key is what makes this linear). */
  def rollingSpend(txns: DataFrame, windowSec: Long): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("account_id"))
      .orderBy(col("event_time_us"))
      .rangeBetween(-windowSec * 1000000L, 0L)
    txns
      .select(col("txn_id"), col("account_id"), col("event_time_us"),
        round(col("amount") * 100).cast("long").as("__kobo"))
      .withColumn("rolling_spend_kobo", sum(col("__kobo")).over(w))
      .withColumn("rolling_n_txns", count(lit(1)).over(w))
      .select("txn_id", "account_id", "event_time_us",
        "rolling_spend_kobo", "rolling_n_txns")
  }
}
