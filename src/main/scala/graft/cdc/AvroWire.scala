package graft.cdc

import scala.util.control.NonFatal

import org.apache.spark.sql.{DataFrame, Encoders, Row}
import org.apache.spark.sql.types._

/** Confluent-framed Avro BINARY decode — the registryless stand-in for
  * `from_avro` + Schema Registry (reference `serde/AvroSerdes.java:35-59`:
  * magic byte, 4-byte big-endian schema id, Avro binary body).
  *
  * The container ships no spark-avro jar, so this is a MINIMAL hand-written
  * Avro binary reader proving the wire seam against the real byte format
  * (GoldenWireSpec's fixtures), not its JSON shadow: zigzag-varint
  * longs/ints, little-endian IEEE doubles, length-prefixed UTF-8 strings,
  * and `union [null, T]` branches — the Avro primitives a Debezium
  * envelope uses. The decode is DRIVEN BY the same [[Schemas]] StructTypes
  * the JSON path uses, with the Debezium-Connect convention that every
  * field is an optional `union [null, T]` (branch 0 = null, 1 = value),
  * so the decoded struct is column-for-column the `from_json` shape and
  * [[EnvelopeOps.parseTxnEnvelope]] runs on it unchanged.
  *
  * Production swap: `format("kafka")` + `from_avro(value, registrySchema)`
  * replaces [[decodeAvroEnvelope]]; everything downstream is already
  * schema-identical. Decode is permissive like the JSON seam: malformed
  * or truncated bodies yield a null envelope (dropped by
  * [[EnvelopeOps.upsertsOnly]]), never a failure — the reference's
  * LogAndContinue contract (`config/ABBankStreamsConfig.java:93-94`).
  */
object AvroWire {

  val Magic: Byte = 0x00

  /** Schema id of a Confluent frame (bytes 1-4, big-endian). */
  def schemaId(frame: Array[Byte]): Int = {
    require(frame.length >= 5 && frame(0) == Magic,
      "not a Confluent-framed payload (magic byte 0x00 + 4-byte schema id)")
    ((frame(1) & 0xff) << 24) | ((frame(2) & 0xff) << 16) |
      ((frame(3) & 0xff) << 8) | (frame(4) & 0xff)
  }

  /** Sequential reader over an Avro binary body. */
  final class BinaryReader(buf: Array[Byte], private var pos: Int) {
    private def next(): Int = {
      if (pos >= buf.length)
        throw new IllegalArgumentException("truncated Avro body")
      val b = buf(pos) & 0xff; pos += 1; b
    }

    /** Avro long/int: zigzag-encoded little-endian base-128 varint. */
    def readLong(): Long = {
      var shift = 0; var acc = 0L; var b = next()
      while ((b & 0x80) != 0) {
        acc |= (b & 0x7fL) << shift; shift += 7; b = next()
      }
      acc |= b.toLong << shift
      (acc >>> 1) ^ -(acc & 1) // zigzag decode
    }

    /** Avro double: 8 bytes, little-endian IEEE 754. */
    def readDouble(): Double = {
      var bits = 0L
      var i = 0
      while (i < 8) { bits |= next().toLong << (8 * i); i += 1 }
      java.lang.Double.longBitsToDouble(bits)
    }

    /** Avro string: varint byte length + UTF-8 bytes. */
    def readString(): String = {
      val n = readLong().toInt
      require(n >= 0 && pos + n <= buf.length, "truncated Avro string")
      val s = new String(buf, pos, n, "UTF-8"); pos += n; s
    }

    /** `union [null, T]` branch index: true iff the value branch. */
    def readPresent(): Boolean = readLong() match {
      case 0 => false
      case 1 => true
      case i => throw new IllegalArgumentException(s"union branch $i")
    }
  }

  /** One record body under the all-fields-optional convention. */
  private def decodeRecord(r: BinaryReader, schema: StructType): Row =
    Row.fromSeq(schema.fields.toSeq.map { f =>
      if (!r.readPresent()) null
      else f.dataType match {
        case LongType => r.readLong()
        case DoubleType => r.readDouble()
        case StringType => r.readString()
        case s: StructType => decodeRecord(r, s)
        case dt => throw new IllegalArgumentException(
          s"unsupported Avro field type $dt (field ${f.name})")
      }
    })

  /** Frame bytes -> envelope Row (null on any malformation). */
  def decodeFrame(frame: Array[Byte], schema: StructType): Row =
    try {
      schemaId(frame) // validates magic + length
      decodeRecord(new BinaryReader(frame, 5), schema)
    } catch { case NonFatal(_) => null }

  /** S1 deserialization seam over the real wire format: a `value` BINARY
    * column carrying Confluent-framed Avro envelopes -> the same nested
    * `envelope` struct column [[EnvelopeOps.decodeJsonEnvelope]] produces
    * from JSON. Swap for `from_avro` when the connector jar is present. */
  def decodeAvroEnvelope(wire: DataFrame,
      schema: StructType = Schemas.transactionEnvelope,
      valueCol: String = "value"): DataFrame = {
    val out = StructType(Seq(StructField("envelope", schema)))
    wire.select(valueCol).map { r =>
      Row(decodeFrame(r.getAs[Array[Byte]](0), schema))
    }(Encoders.row(out))
  }
}
