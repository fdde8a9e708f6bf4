package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.BinaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StructField, StructType}

/** Bounded priority-sample buffer: the `k` entries with the smallest
  * DISTINCT hash keys seen so far, each carrying its row's value.
  *
  * This is the KMV bottom-k set ([[KmvBuffer]]) with a payload: ranking
  * rows by a uniform 64-bit hash of their identity and keeping the k
  * hash-smallest ones IS a uniform without-replacement sample of the
  * group (bottom-k / priority sampling), and "bottom-k of a union of
  * bottom-k's" makes the merge associative and commutative — the sample
  * is a mergeable summary, independent of partition layout and merge
  * order. On a hash-key collision the smaller value wins (an arbitrary
  * but commutative rule, so engines cannot disagree; at 2^-64 collision
  * odds it exists for determinism, not statistics).
  */
final class QSampleBuffer(val k: Int) {
  require(k > 0, s"qsample size must be positive, got $k")
  private val map = new java.util.TreeMap[java.lang.Long, java.lang.Long]()

  def add(h: Long, v: Long): Unit = {
    val cur = map.get(h)
    if (cur != null) { if (v < cur) { map.put(h, v); () } }
    else if (map.size < k) { map.put(h, v); () }
    else if (h < map.lastKey()) { map.put(h, v); map.pollLastEntry(); () }
  }

  def mergeFrom(other: QSampleBuffer): Unit = {
    val it = other.entryIterator
    while (it.hasNext) { val e = it.next(); add(e.getKey, e.getValue) }
  }

  def size: Int = map.size
  def entryIterator: java.util.Iterator[java.util.Map.Entry[java.lang.Long, java.lang.Long]] =
    map.entrySet().iterator()

  /** (hash, value) pairs ascending by hash, size <= k. */
  def toPairs: Array[(Long, Long)] = {
    val out = new Array[(Long, Long)](map.size)
    var i = 0
    val it = entryIterator
    while (it.hasNext) { val e = it.next(); out(i) = (e.getKey, e.getValue); i += 1 }
    out
  }
}

/** `graft_qsample(hash, value, k)` — per-group uniform bottom-k priority
  * sample as a native Catalyst aggregate:
  * `array<struct<h: bigint, v: bigint>>` ascending by `h`.
  *
  * The quantile-sketch counterpart of [[KmvSketchAgg]]: where KMV keeps
  * only the hashes (distinct counting), this keeps the sampled rows'
  * values, so any order statistic of the group can be estimated from the
  * returned sample — approximate percentiles with standard
  * `O(1/sqrt(k))` rank error, in ONE aggregation pass with bounded
  * per-group state. The alternatives at 100 TB are a per-group sort
  * (shuffles every row) or iterative exact selection
  * ([[graft.ops.OrderStatistics.kthSmallest]] — exact but multi-pass);
  * this is the single-pass, mergeable, streaming-compatible point on
  * that trade-off curve.
  *
  * Scale posture: partial aggregation runs map-side, so the shuffle
  * moves `O(groups x k x map_partitions)` 16-byte entries no matter how
  * many rows were scanned. Deterministic by construction: the sample is
  * a pure function of the (hash, value) multiset.
  */
case class QSampleAgg(
    hashChild: Expression,
    valueChild: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[QSampleBuffer] with BinaryLike[Expression] {

  require(k > 0 && k <= (1 << 20), s"graft_qsample k out of range: $k")

  override def left: Expression = hashChild
  override def right: Expression = valueChild

  override def createAggregationBuffer(): QSampleBuffer = new QSampleBuffer(k)

  override def update(buffer: QSampleBuffer, input: InternalRow): QSampleBuffer = {
    val h = hashChild.eval(input)
    val v = valueChild.eval(input)
    if (h != null && v != null)
      buffer.add(h.asInstanceOf[Long], v.asInstanceOf[Long])
    buffer
  }

  override def merge(buffer: QSampleBuffer, other: QSampleBuffer): QSampleBuffer = {
    buffer.mergeFrom(other)
    buffer
  }

  override def eval(buffer: QSampleBuffer): Any = {
    val pairs = buffer.toPairs
    new GenericArrayData(pairs.map { case (h, v) => InternalRow(h, v) })
  }

  override def serialize(buffer: QSampleBuffer): Array[Byte] = {
    val bb = ByteBuffer.allocate(4 + 16 * buffer.size)
    bb.putInt(buffer.size)
    val it = buffer.entryIterator
    while (it.hasNext) {
      val e = it.next()
      bb.putLong(e.getKey)
      bb.putLong(e.getValue)
    }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): QSampleBuffer = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val buf = new QSampleBuffer(k)
    var i = 0
    while (i < n) { buf.add(bb.getLong, bb.getLong); i += 1 }
    buf
  }

  override def dataType: DataType = ArrayType(
    StructType(Seq(
      StructField("h", LongType, nullable = false),
      StructField("v", LongType, nullable = false))),
    containsNull = false)
  override def nullable: Boolean = false

  override def checkInputDataTypes(): TypeCheckResult =
    if (hashChild.dataType == LongType && valueChild.dataType == LongType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_qsample requires (bigint hash, bigint value), got " +
        s"(${hashChild.dataType.catalogString}, ${valueChild.dataType.catalogString})")

  override def withNewMutableAggBufferOffset(newOffset: Int): QSampleAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): QSampleAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): QSampleAgg =
    copy(hashChild = newLeft, valueChild = newRight)

  override def prettyName: String = "graft_qsample"
}
