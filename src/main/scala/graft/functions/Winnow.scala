package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Winnowing fingerprint kernel (Schleimer/Wilkerson/Aiken, SIGMOD'03):
  * O(n) rolling polynomial hash over byte k-grams + rightmost-min window
  * selection. Guarantees: any shared substring of length >= w + k - 1
  * between two documents yields at least one shared fingerprint — the
  * containment-detection property plain whole-doc hashing lacks.
  */
object WinnowHelper {
  final val Base = 257L

  /** Distinct sorted winnowed fingerprints of `s` (byte k-grams, window w). */
  def winnow(s: UTF8String, k: Int, w: Int): ArrayData = {
    val bytes = s.getBytes
    val n = bytes.length
    if (n < k) return new GenericArrayData(Array.empty[Long])

    // rolling hashes of all n-k+1 k-grams (unsigned wrap arithmetic)
    val m = n - k + 1
    val hs = new Array[Long](m)
    var pow = 1L
    var i = 0
    while (i < k - 1) { pow *= Base; i += 1 }
    var h = 0L
    i = 0
    while (i < k) { h = h * Base + (bytes(i) & 0xffL); i += 1 }
    hs(0) = h
    i = 1
    while (i < m) {
      h = (h - (bytes(i - 1) & 0xffL) * pow) * Base + (bytes(i + k - 1) & 0xffL)
      hs(i) = h
      i += 1
    }

    // winnow: rightmost minimum of each w-window, record on change
    val selected = scala.collection.mutable.TreeSet.empty[Long]
    if (m <= w) { // shorter than one window: keep the global min
      var mn = hs(0); i = 1
      while (i < m) { if (hs(i) <= mn) mn = hs(i); i += 1 }
      selected += mn
    } else {
      var start = 0
      while (start + w <= m) {
        var mnIdx = start
        var j = start + 1
        while (j < start + w) { if (hs(j) <= hs(mnIdx)) mnIdx = j; j += 1 }
        selected += hs(mnIdx)
        start += 1
      }
    }
    new GenericArrayData(selected.toArray)
  }
}

/** `graft_winnow(text, k, w)` — winnowed rolling-hash fingerprints as a
  * native codegen'd Catalyst expression. k and w are fixed at plan time. */
case class Winnow(child: Expression, k: Int, w: Int) extends UnaryExpression {
  require(k >= 2 && w >= 1, "need k >= 2, w >= 1")

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_winnow requires a string argument, got ${child.dataType.catalogString}")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_winnow"

  override protected def nullSafeEval(input: Any): Any =
    WinnowHelper.winnow(input.asInstanceOf[UTF8String], k, w)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.WinnowHelper.winnow($c, $k, $w)")

  override protected def withNewChildInternal(newChild: Expression): Winnow =
    copy(child = newChild)
}
