package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType}

/** Morton (Z-order) bit-interleave kernel, callable from generated code. */
object ZOrderHelper {
  /** Interleave the low `bits` bits of `x` (even output positions) and `y`
    * (odd positions) into one long: z = y_{b-1} x_{b-1} … y_1 x_1 y_0 x_0.
    * Points close in BOTH dimensions land close on the curve, which is the
    * whole trick: sorting by z gives a file layout whose per-file min/max
    * envelopes are tight in x AND y simultaneously, so a two-dimensional
    * box predicate prunes files — a single-column sort can only ever be
    * tight in its own column. Inputs must already be quantized to
    * [0, 2^bits) cells; out-of-range inputs fail loudly rather than
    * silently aliasing distant cells onto the same curve position. */
  def interleave(x: Long, y: Long, bits: Int): Long = {
    if (x < 0 || y < 0 || x >= (1L << bits) || y >= (1L << bits))
      throw new IllegalArgumentException(
        s"graft_zorder: inputs must be quantized to [0, 2^$bits): got ($x, $y)")
    var z = 0L
    var i = 0
    while (i < bits) {
      z |= ((x >> i) & 1L) << (2 * i)
      z |= ((y >> i) & 1L) << (2 * i + 1)
      i += 1
    }
    z
  }
}

/** `graft_zorder(x, y[, bits])`: the Morton interleave of two quantized
  * cell ids as a native codegen'd Catalyst expression — the clustering key
  * behind multi-dimensional data skipping (the published Z-ORDER layout
  * idea: sort-by-curve, then min/max footer stats prune files for box
  * predicates on EITHER or BOTH dimensions).
  */
case class ZOrder2(left: Expression, right: Expression, bits: Int)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == LongType && right.dataType == LongType &&
        bits >= 1 && bits <= 31)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_zorder requires two BIGINT cell ids and 1 <= bits <= 31, got " +
        s"${left.dataType.catalogString}, ${right.dataType.catalogString}, bits=$bits")

  override def dataType: DataType = LongType
  override def prettyName: String = "graft_zorder"

  override protected def nullSafeEval(a: Any, b: Any): Any =
    ZOrderHelper.interleave(a.asInstanceOf[Long], b.asInstanceOf[Long], bits)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      (a, b) => s"graft.functions.ZOrderHelper.interleave($a, $b, $bits)")

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): ZOrder2 = copy(left = newLeft, right = newRight)
}
