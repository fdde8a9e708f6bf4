package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{BooleanType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Deterministic Bloom-filter kernel shared by the build (driver folds the
  * small side's element hashes into a packed bitset) and the probe (the
  * [[BloomContains]] expression). Probe p of element hash h lands at
  * `splitmix64(h + p) mod numBits` — pure arithmetic, no RNG state, so
  * the same elements produce the same bitset on every run and layout. */
object BloomKernel {

  /** SplitMix64 finalizer (Steele et al., public domain reference
    * constants) — decorrelates the probe index from the element hash. */
  def splitmix64(z0: Long): Long = {
    var z = z0 + 0x9E3779B97F4A7C15L
    z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
    z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
    z ^ (z >>> 31)
  }

  def position(h: Long, probe: Int, numBits: Int): Int =
    java.lang.Math.floorMod(splitmix64(h + probe), numBits.toLong).toInt

  /** Fold element hashes into a packed bitset of `numBits` bits. */
  def build(hashes: Array[Long], numBits: Int, numProbes: Int): Array[Long] = {
    require(numBits % 64 == 0, "bitset packs into 64-bit words")
    val bits = new Array[Long](numBits / 64)
    var i = 0
    while (i < hashes.length) {
      var p = 0
      while (p < numProbes) {
        val pos = position(hashes(i), p, numBits)
        bits(pos >> 6) |= 1L << (pos & 63)
        p += 1
      }
      i += 1
    }
    bits
  }

  /** Probe: true iff every probe bit for FNV-1a64(s) is set. Callable
    * from generated Java code. */
  def contains(bits: Array[Long], numProbes: Int, s: UTF8String): Boolean = {
    val h = Fnv1a64Helper.hash(s)
    val numBits = bits.length * 64
    var p = 0
    while (p < numProbes) {
      val pos = position(h, p, numBits)
      if ((bits(pos >> 6) & (1L << (pos & 63))) == 0L) return false
      p += 1
    }
    true
  }
}

/** `graft_bloom_probe(text)` — membership probe against a query-constant
  * packed bitset, as a native codegen'd Catalyst expression. The bitset
  * rides in the PLAN (one reference object per query, `addReferenceObj`),
  * not in the data: attaching it as a joined column would copy the whole
  * array into every probed row's UnsafeRow — measured 7× slower at sf0.1.
  * This is the same shape as Spark's internal runtime-filter
  * `BloomFilterMightContain`, built from public extension points. The
  * expression itself is deterministic arithmetic (FNV-1a64 + SplitMix64
  * probes), so plans using it stay reproducible across runs/layouts. */
case class BloomContains(child: Expression, bits: Array[Long],
    numProbes: Int) extends UnaryExpression {
  require(numProbes >= 1, "need at least one probe")

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_bloom_probe requires a string argument, got ${child.dataType.catalogString}")

  override def dataType: DataType = BooleanType
  override def prettyName: String = "graft_bloom_probe"

  override protected def nullSafeEval(input: Any): Any =
    BloomKernel.contains(bits, numProbes, input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val bitsRef = ctx.addReferenceObj("bloomBits", bits, "long[]")
    defineCodeGen(ctx, ev,
      c => s"graft.functions.BloomKernel.contains($bitsRef, $numProbes, $c)")
  }

  override protected def withNewChildInternal(newChild: Expression): BloomContains =
    copy(child = newChild)
}
