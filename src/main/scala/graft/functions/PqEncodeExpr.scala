package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Shared JVM kernel for [[PqEncode]] — interpreted eval and codegen call
  * the same method, so the two paths cannot drift (the [[IvfKernel]]
  * discipline). */
object PqKernel {
  /** All `m` subspace codes in ONE pass over the grid-code vector.
    *
    * Model layout (subspace-major, ids ascending within a subspace):
    * `cids(j)` = centroid id of global slot `j`; subspace `s` owns slots
    * `off(s) until off(s+1)`; slot `j`'s subvector sits at
    * `cen(j*subDim) until ((j+1)*subDim)`. Argmin is STRICT integer-L2
    * (`<`), so ties keep the first slot = the lowest surviving centroid
    * id — exactly the `array_position(dists, array_min(dists))` first-hit
    * of the expression form this replaces, and the `ORDER BY dist, c_id`
    * of the SQL oracle. */
  def encode(cen: Array[Long], cids: Array[Long], off: Array[Int],
      m: Int, subDim: Int, g: ArrayData): ArrayData = {
    val n = g.numElements()
    if (n != m * subDim)
      throw new IllegalArgumentException(
        s"graft_pq_encode: vector has $n grid codes, model expects ${m * subDim}")
    val gv = new Array[Long](n)
    var i = 0
    while (i < n) {
      if (g.isNullAt(i))
        throw new IllegalArgumentException(
          s"graft_pq_encode: null grid code at index $i")
      gv(i) = g.getLong(i)
      i += 1
    }
    val out = new Array[Long](m)
    var s = 0
    while (s < m) {
      val gBase = s * subDim
      var best = off(s)
      var bestD = Long.MaxValue
      var j = off(s)
      while (j < off(s + 1)) {
        var dsum = 0L
        val cBase = j * subDim
        i = 0
        while (i < subDim) {
          val d = gv(gBase + i) - cen(cBase + i)
          dsum += d * d
          i += 1
        }
        if (dsum < bestD) { bestD = dsum; best = j }
        j += 1
      }
      out(s) = cids(best)
      s += 1
    }
    new GenericArrayData(out)
  }

  /** ADC lookup table for a query's grid codes: integer L2 to every
    * surviving centroid, at `lut(s * ksubMax + c_id)`; missing (dropped)
    * centroid slots stay Long.MaxValue. Same validation and distance
    * arithmetic as [[encode]]. */
  def lut(cen: Array[Long], cids: Array[Long], off: Array[Int],
      m: Int, subDim: Int, ksubMax: Int, g: ArrayData): ArrayData = {
    val n = g.numElements()
    if (n != m * subDim)
      throw new IllegalArgumentException(
        s"graft_pq_lut: vector has $n grid codes, model expects ${m * subDim}")
    val gv = new Array[Long](n)
    var i = 0
    while (i < n) {
      if (g.isNullAt(i))
        throw new IllegalArgumentException(
          s"graft_pq_lut: null grid code at index $i")
      gv(i) = g.getLong(i)
      i += 1
    }
    val out = Array.fill(m * ksubMax)(Long.MaxValue)
    var s = 0
    while (s < m) {
      val gBase = s * subDim
      var j = off(s)
      while (j < off(s + 1)) {
        var dsum = 0L
        val cBase = j * subDim
        i = 0
        while (i < subDim) {
          val d = gv(gBase + i) - cen(cBase + i)
          dsum += d * d
          i += 1
        }
        out(s * ksubMax + cids(j).toInt) = dsum
        j += 1
      }
      s += 1
    }
    new GenericArrayData(out)
  }
}

/** `graft_pq_encode(g)` -> array of the `m` nearest-centroid ids, one per
  * subspace — the PQ code word.
  *
  * The codebooks ride in the PLAN as reference objects (the
  * [[IvfAssign]] / [[BloomContains]] plan-constant discipline). The
  * expression-tree form this replaces built `m × ksub` interpreted
  * `aggregate(zip_with(slice(...)))` sub-expressions per row — measured
  * 80 s for 1M×64 vectors; this kernel does the same integer flops in one
  * tight loop per row. */
case class PqEncode(grid: Expression, cen: Array[Long], cids: Array[Long],
    off: Array[Int], m: Int, subDim: Int) extends UnaryExpression {
  require(off.length == m + 1 && off(m) == cids.length &&
    cen.length == cids.length * subDim,
    "PQ codebook arrays disagree on subspace/centroid layout")
  require((0 until m).forall(s => off(s) < off(s + 1)),
    "PQ codebook has an empty subspace")

  override def child: Expression = grid

  override def checkInputDataTypes(): TypeCheckResult = grid.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"graft_pq_encode requires array<bigint>, got ${other.catalogString}")
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_pq_encode"

  override protected def nullSafeEval(g: Any): Any =
    PqKernel.encode(cen, cids, off, m, subDim, g.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode = {
    val cenRef = ctx.addReferenceObj("pqCen", cen, "long[]")
    val cidsRef = ctx.addReferenceObj("pqCids", cids, "long[]")
    val offRef = ctx.addReferenceObj("pqOff", off, "int[]")
    defineCodeGen(ctx, ev, g =>
      s"graft.functions.PqKernel.encode($cenRef, $cidsRef, $offRef, $m, $subDim, $g)")
  }

  override protected def withNewChildInternal(newChild: Expression): PqEncode =
    copy(grid = newChild)
}

/** `graft_pq_lut(g)` -> the query-side ADC lookup table: integer L2 from
  * the query's grid codes to EVERY surviving centroid, flattened as
  * `lut(s * ksubMax + c_id)` (0-based; dropped-cell slots keep
  * Long.MaxValue so positions stay aligned). One kernel call replaces the
  * `m × ksub` aggregate sub-expressions the expression-tree form built. */
case class PqLut(grid: Expression, cen: Array[Long], cids: Array[Long],
    off: Array[Int], m: Int, subDim: Int, ksubMax: Int)
  extends UnaryExpression {
  require(off.length == m + 1 && off(m) == cids.length &&
    cen.length == cids.length * subDim,
    "PQ codebook arrays disagree on subspace/centroid layout")

  override def child: Expression = grid

  override def checkInputDataTypes(): TypeCheckResult = grid.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"graft_pq_lut requires array<bigint>, got ${other.catalogString}")
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_pq_lut"

  override protected def nullSafeEval(g: Any): Any =
    PqKernel.lut(cen, cids, off, m, subDim, ksubMax, g.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode = {
    val cenRef = ctx.addReferenceObj("pqCen", cen, "long[]")
    val cidsRef = ctx.addReferenceObj("pqCids", cids, "long[]")
    val offRef = ctx.addReferenceObj("pqOff", off, "int[]")
    defineCodeGen(ctx, ev, g =>
      s"graft.functions.PqKernel.lut($cenRef, $cidsRef, $offRef, $m, $subDim, $ksubMax, $g)")
  }

  override protected def withNewChildInternal(newChild: Expression): PqLut =
    copy(grid = newChild)
}
