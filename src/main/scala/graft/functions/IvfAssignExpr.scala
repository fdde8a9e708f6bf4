package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, LongType}

/** Shared JVM kernel for [[IvfAssign]] — interpreted eval and codegen call
  * the same method, so the two paths cannot drift. */
object IvfKernel {
  /** Nearest-centroid argmax by cosine over a flattened row-major centroid
    * matrix. Cells are in ascending c_id order and the comparison is
    * STRICT, so ties keep the smallest c_id — exactly the
    * `max_by(c_id, struct(sim, -c_id))` tiebreak of the join+aggregate
    * form this replaces (bit-identical: same graft_dot fold order, same
    * `dot / (norm * cnorm)` rounding points).
    *
    * Fail-loud on ragged or null-element vectors, the dot-kernel policy:
    * an argmax over a silently-zeroed element is a wrong ANSWER, not a
    * wrong row. */
  def assign(flat: Array[Double], cnorms: Array[Double], cids: Array[Long],
      d: Int, v: ArrayData, norm: Double): Long = {
    val n = v.numElements()
    if (n != d)
      throw new IllegalArgumentException(
        s"graft_ivf_cell: vector has $n dims, centroid model has $d")
    // one validation + unbox pass, not one per centroid: fail-loud on
    // null elements, then the hot loop reads a primitive array
    val vv = new Array[Double](d)
    var i = 0
    while (i < d) {
      if (v.isNullAt(i))
        throw new IllegalArgumentException(
          s"graft_ivf_cell: null element at index $i")
      vv(i) = v.getDouble(i)
      i += 1
    }
    val k = cids.length
    var best = -1
    var bestSim = Double.NegativeInfinity
    var bestIsNaN = false
    var c = 0
    while (c < k) {
      var dot = 0.0
      val off = c * d
      i = 0
      while (i < d) { dot += vv(i) * flat(off + i); i += 1 }
      val sim = dot / (norm * cnorms(c))
      // NaN ordering parity with the max_by(struct(sim, -c_id)) form this
      // replaces: Spark orders NaN greater than every double, ties break
      // to the smallest c_id — so the FIRST NaN wins and nothing beats it
      if (!bestIsNaN && (sim > bestSim || java.lang.Double.isNaN(sim))) {
        bestSim = sim; best = c; bestIsNaN = java.lang.Double.isNaN(sim)
      }
      c += 1
    }
    // all sims -Infinity (never exceeds the initial bound): max_by ties
    // break to the smallest c_id
    if (best < 0) best = 0
    cids(best)
  }
}

/** `graft_ivf_cell(v, norm)` -> c_id of the nearest coarse centroid.
  *
  * The centroid model (row-major flattened matrix + norms + ids) rides in
  * the PLAN as reference objects, not in the data: the join+aggregate
  * assignment this replaces materialized |corpus| × |cells| joined rows
  * and re-shuffled every vector through a `max_by` aggregation — measured
  * ~10 s at sf1 (20k vectors × 544 cells) against ~0.5 s for this per-row
  * scan, same flops, none of the row machinery. Same plan-constant
  * discipline as [[BloomContains]]; the model is deterministic training
  * output, so plans stay reproducible. */
case class IvfAssign(vec: Expression, norm: Expression,
    flat: Array[Double], cnorms: Array[Double], cids: Array[Long], d: Int)
  extends BinaryExpression {
  require(cids.length > 0, "empty centroid model")
  require(flat.length == cids.length * d && cnorms.length == cids.length,
    "centroid model arrays disagree on cell count / dims")

  override def left: Expression = vec
  override def right: Expression = norm

  override def checkInputDataTypes(): TypeCheckResult = (vec.dataType match {
    case ArrayType(DoubleType, _) => true
    case _ => false
  }) match {
    case true if norm.dataType == DoubleType => TypeCheckResult.TypeCheckSuccess
    case _ => TypeCheckResult.TypeCheckFailure(
      "graft_ivf_cell requires (array<double>, double), got " +
        s"${vec.dataType.catalogString} and ${norm.dataType.catalogString}")
  }

  override def dataType: DataType = LongType
  override def prettyName: String = "graft_ivf_cell"

  override protected def nullSafeEval(v: Any, n: Any): Any =
    IvfKernel.assign(flat, cnorms, cids, d,
      v.asInstanceOf[ArrayData], n.asInstanceOf[Double])

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode = {
    val flatRef = ctx.addReferenceObj("ivfFlat", flat, "double[]")
    val cnormsRef = ctx.addReferenceObj("ivfCnorms", cnorms, "double[]")
    val cidsRef = ctx.addReferenceObj("ivfCids", cids, "long[]")
    defineCodeGen(ctx, ev, (v, n) =>
      s"graft.functions.IvfKernel.assign($flatRef, $cnormsRef, $cidsRef, $d, $v, $n)")
  }

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): IvfAssign = copy(vec = newLeft, norm = newRight)
}
