package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Bounded KMV (k-minimum-values / bottom-k theta sketch) buffer: the `k`
  * smallest DISTINCT signed-long hash values seen so far.
  *
  * Signed ordering is deliberate: ranking signed longs ascending is the
  * same permutation as ranking `h + 2^63` (unsigned) ascending, so the
  * standard KMV estimator applies with `theta_u = kth_value + 2^63` — and
  * both Spark and the DuckDB oracle sort plain BIGINTs, no unsigned
  * conversion anywhere near the data path.
  *
  * The structure is a sorted distinct set capped at `k` entries
  * (java.util.TreeSet: k <= a few thousand, per-insert cost is log k on a
  * structure that fits in L1/L2 — this is a per-partition/per-group
  * summary, not a per-row allocation).
  */
final class KmvBuffer(val k: Int) {
  require(k > 0, s"kmv sketch size must be positive, got $k")
  private val set = new java.util.TreeSet[java.lang.Long]()

  def add(v: Long): Unit =
    if (set.size < k) { set.add(v); () }
    else if (v < set.last()) { if (set.add(v)) { set.pollLast(); () } }

  def mergeFrom(other: KmvBuffer): Unit = {
    val it = other.iterator
    while (it.hasNext) add(it.next())
  }

  def size: Int = set.size
  def iterator: java.util.Iterator[java.lang.Long] = set.iterator()

  /** Ascending distinct values, size <= k. */
  def toArray: Array[Long] = {
    val out = new Array[Long](set.size)
    var i = 0
    val it = set.iterator()
    while (it.hasNext) { out(i) = it.next(); i += 1 }
    out
  }
}

/** `graft_kmv(hash, k)` — per-group KMV distinct sketch as a native
  * Catalyst aggregate: `array<bigint>` of the group's `k` smallest
  * distinct hash values, ascending.
  *
  * Scale posture (the reason this is a TypedImperativeAggregate and not a
  * distinct+window composition): partial aggregation runs map-side, so a
  * partition's whole stream collapses into one <= 8k-byte buffer BEFORE
  * the exchange — the shuffle moves O(groups x k x map_partitions) longs
  * no matter how many rows were scanned, where a distinct-then-rank plan
  * would shuffle every distinct hash. Buffers merge associatively
  * (bottom-k of a union of bottom-k's), which is exactly the contract
  * partial/final aggregation needs, and the same property gives
  * cross-dataset sketch union for free ([[graft.ops.Sketches.kmvOverlap]]).
  *
  * From the sketch: distinct-count estimate `(k-1) * 2^64 / theta_u` once
  * saturated (`theta_u` = k-th minimum + 2^63), exact count while not.
  * Estimation error ~ 1/sqrt(k-2) (Beyer et al., "On Synopses for
  * Distinct-Value Estimation Under Multiset Operations", SIGMOD'07).
  */
case class KmvSketchAgg(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[KmvBuffer] with UnaryLike[Expression] {

  require(k > 0 && k <= (1 << 20), s"graft_kmv k out of range: $k")

  override def createAggregationBuffer(): KmvBuffer = new KmvBuffer(k)

  override def update(buffer: KmvBuffer, input: InternalRow): KmvBuffer = {
    val v = child.eval(input)
    if (v != null) buffer.add(v.asInstanceOf[Long])
    buffer
  }

  override def merge(buffer: KmvBuffer, other: KmvBuffer): KmvBuffer = {
    buffer.mergeFrom(other)
    buffer
  }

  override def eval(buffer: KmvBuffer): Any =
    new GenericArrayData(buffer.toArray)

  override def serialize(buffer: KmvBuffer): Array[Byte] = {
    val bb = ByteBuffer.allocate(4 + 8 * buffer.size)
    bb.putInt(buffer.size)
    val it = buffer.iterator
    while (it.hasNext) bb.putLong(it.next())
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): KmvBuffer = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val buf = new KmvBuffer(k)
    var i = 0
    while (i < n) { buf.add(bb.getLong); i += 1 }
    buf
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = false

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == LongType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_kmv requires a bigint hash argument, got ${child.dataType.catalogString}")

  override def withNewMutableAggBufferOffset(newOffset: Int): KmvSketchAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): KmvSketchAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): KmvSketchAgg =
    copy(child = newChild)

  override def prettyName: String = "graft_kmv"
}
