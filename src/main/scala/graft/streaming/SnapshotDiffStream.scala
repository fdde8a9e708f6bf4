package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming twin of [[graft.cdc.SnapshotDiff.changelogDiff]] — a
  * continuously-maintained added / deleted / changed view between two
  * event-time horizons, fed by the live versioned changelog. The batch
  * operator recovers both horizons' latest states in one keyed
  * conditional-struct-max aggregation; the streaming form keeps exactly
  * that aggregation's state per key — the latest version at-or-before
  * `t1` and at-or-before `t2`, each a fixed-size 4-tuple — and re-emits
  * the key's classification whenever an arriving version changes it.
  *
  * Emission contract (the [[DocStream.kmvSketches]] discipline): each
  * micro-batch emits the refreshed classification for every touched
  * key; the LAST emission per key equals the batch operator over
  * everything ingested so far, because conditional max is associative
  * and commutative — batch-boundary placement cannot change the result
  * (spec-pinned, including late old-side versions that flip an 'added'
  * to 'changed'). Keys currently classified 'unchanged' emit that too,
  * so a key whose classification REVERTS (late data filling the `t1`
  * side) supersedes its earlier row downstream.
  *
  * Version order is (seq, tie, op, digest) — the batch struct-max's
  * field order; pass a unique `tie` (e.g. the record id) per
  * [[graft.cdc.SnapshotDiff.changelogDiff]]'s determinism contract.
  *
  * Scale posture: state is two 4-tuples per key — seq/tie/op/digest,
  * never a row payload (callers digest value columns BEFORE the
  * stream, exactly like the batch operator's pre-shuffle digest). No
  * watermark/TTL: horizon state must outlive arrivals by definition
  * (a version for a closed comparison window is still a legal late
  * arrival), so the bound is key cardinality — the same bound the
  * batch aggregation's shuffle carries.
  */
object SnapshotDiffStream {

  /** One changelog version on the wire: key, event-time sequence,
    * deterministic tie-break, op ("d" = tombstone), value digest. */
  case class DiffVersion(key: Long, seq: Long, tie: String, op: String,
      digest: String)

  /** Latest classification of one key (re-emitted on change). */
  case class DiffChange(key: Long, change: String, old_seq: Option[Long],
      new_seq: Option[Long])

  private type Side = (Long, String, String, String) // (seq, tie, op, digest)
  private type State = (Option[Side], Option[Side])

  /** versions (key, seq, tie, op, digest) -> continuously-maintained
    * diff view between horizons `t1` and `t2` (inclusive, on seq). */
  def changelogDiffStream(spark: SparkSession, versions: DataFrame,
      t1: Long, t2: Long): Dataset[DiffChange] = {
    import spark.implicits._
    versions
      .select(col("key").cast("long"), col("seq").cast("long"),
        col("tie").cast("string"), col("op").cast("string"),
        col("digest").cast("string"))
      .as[DiffVersion]
      .groupByKey(_.key)
      .flatMapGroupsWithState(OutputMode.Append,
        GroupStateTimeout.NoTimeout)(process(t1, t2))
  }

  /** Fold the batch's conditional struct-max into per-key state, then
    * classify — exposed for TestGroupState unit pinning. */
  private[graft] def process(t1: Long, t2: Long)(key: Long,
      rows: Iterator[DiffVersion],
      state: GroupState[State]): Iterator[DiffChange] = {
    var (o, n) = state.getOption.getOrElse((None: Option[Side], None: Option[Side]))
    def max(cur: Option[Side], v: Side): Option[Side] =
      cur match {
        case Some(c) if Ordering[Side].gteq(c, v) => cur
        case _ => Some(v)
      }
    rows.foreach { r =>
      val v = (r.seq, r.tie, r.op, r.digest)
      if (r.seq <= t1) o = max(o, v)
      if (r.seq <= t2) n = max(n, v)
    }
    state.update((o, n))
    val presentO = o.exists(_._3 != "d")
    val presentN = n.exists(_._3 != "d")
    val change =
      if (!presentO && presentN) "added"
      else if (presentO && !presentN) "deleted"
      else if (presentO && presentN && o.get._4 != n.get._4) "changed"
      else "unchanged"
    Iterator.single(DiffChange(key, change,
      if (presentO) o.map(_._1) else None,
      if (presentN) n.map(_._1) else None))
  }
}
