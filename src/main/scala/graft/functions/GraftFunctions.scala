package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{AbstractDataType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** FNV-1a 64-bit hash kernel, callable from generated Java code. */
object Fnv1a64Helper {
  final val Offset = 0xcbf29ce484222325L
  final val Prime  = 0x100000001b3L

  def hash(s: UTF8String): Long = hashBytes(s.getBytes)

  def hashBytes(bytes: Array[Byte]): Long = {
    var h = Offset
    var i = 0
    while (i < bytes.length) {
      h ^= (bytes(i) & 0xffL)
      h *= Prime
      i += 1
    }
    h
  }
}

/** Document fingerprinting primitive: FNV-1a 64 over the UTF-8 bytes of a
  * string, as a native Catalyst `Expression` with whole-stage codegen
  * (`doGenCode` emits a static call — no UDF/serialization overhead, stays
  * inside the codegen'd stage).
  *
  * The reference has no fingerprinting surface; this is part of the
  * LLM-data-pipeline extension set (text fingerprinting for dedup at scale).
  * FNV-1a is engine-independent and stable across runs/partitions — unlike
  * `hash()`/`xxhash64`, its definition is a published constant-multiply
  * fold, so fingerprints are reproducible outside Spark too.
  */
case class Fnv1a64(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_fnv64 requires a string argument, got ${child.dataType.catalogString}")

  override def dataType: DataType = LongType
  override def prettyName: String = "graft_fnv64"

  override protected def nullSafeEval(input: Any): Any =
    Fnv1a64Helper.hash(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.Fnv1a64Helper.hash($c)")

  override protected def withNewChildInternal(newChild: Expression): Fnv1a64 =
    copy(child = newChild)
}

/** Nondeterministic identity — the parse-once fence
  * ([[graft.cdc.EnvelopeOps.parseFence]] documents the optimizer contract
  * it enforces). Evaluation and generated code are the child's,
  * untouched; only the `deterministic` flag differs, which is exactly the
  * property PushPredicateThroughNonJoin / CollapseProject key off. */
case class ParseFence(child: Expression) extends UnaryExpression {
  override lazy val deterministic: Boolean = false
  override def dataType: DataType = child.dataType
  override def nullable: Boolean = child.nullable
  override def prettyName: String = "graft_fence"

  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any =
    child.eval(input)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val c = child.genCode(ctx)
    ev.copy(code = c.code, isNull = c.isNull, value = c.value)
  }

  override protected def withNewChildInternal(newChild: Expression): ParseFence =
    copy(child = newChild)
}

/** Dot-product kernel over two double arrays, callable from generated
  * code. The fold is strictly sequential (index 0 upward) — the SAME IEEE
  * addition order as `aggregate(zip_with(a, b, (x, y) -> x * y), 0D,
  * (acc, p) -> acc + p)`, so swapping the interpreted HOF for this kernel
  * never changes a result bit (the DuckDB oracles keep matching).
  * Ragged arrays fail loudly — the equal-dims contract of the embedding
  * tables, same policy as VecSumAgg. */
object DotHelper {
  def dot(a: org.apache.spark.sql.catalyst.util.ArrayData,
      b: org.apache.spark.sql.catalyst.util.ArrayData): Double = {
    val n = a.numElements()
    require(b.numElements() == n,
      s"graft_dot: ragged arrays ($n vs ${b.numElements()} dims)")
    var s = 0.0
    var i = 0
    while (i < n) { s += a.getDouble(i) * b.getDouble(i); i += 1 }
    s
  }

  /** Null-element-aware variant, taken only when either input's element
    * type has `containsNull = true`: any null element makes the whole
    * result NULL — the exact semantics of the interpreted
    * `aggregate(zip_with(a, b, (x, y) -> x * y), 0D, (acc, p) -> acc + p)`
    * this kernel replaces (null * y = null, null + acc = null). The
    * per-element `isNullAt` bit test is cheap; the single result box is
    * per-row, not per-element. */
  def dotNullable(a: org.apache.spark.sql.catalyst.util.ArrayData,
      b: org.apache.spark.sql.catalyst.util.ArrayData): java.lang.Double = {
    val n = a.numElements()
    require(b.numElements() == n,
      s"graft_dot: ragged arrays ($n vs ${b.numElements()} dims)")
    var s = 0.0
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      s += a.getDouble(i) * b.getDouble(i)
      i += 1
    }
    java.lang.Double.valueOf(s)
  }
}

/** `graft_dot(a, b)`: native codegen'd dot product over `array<double>`
  * columns — the hot kernel of every similarity/ANN/near-dup query. The
  * interpreted `aggregate(zip_with(...))` form allocates a zipped array
  * and boxes each lambda application per row; this stays a primitive loop
  * inside the codegen'd stage. */
case class Dot(left: Expression, right: Expression)
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression {
  import org.apache.spark.sql.types.{ArrayType, DoubleType}

  override def checkInputDataTypes(): TypeCheckResult = {
    val ok = ArrayType(DoubleType)
    def conforms(t: DataType) = t match {
      case ArrayType(DoubleType, _) => true
      case _ => false
    }
    if (conforms(left.dataType) && conforms(right.dataType))
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_dot requires two ${ok.catalogString} arguments, got " +
        s"${left.dataType.catalogString} and ${right.dataType.catalogString}")
  }

  override def dataType: DataType = org.apache.spark.sql.types.DoubleType
  override def prettyName: String = "graft_dot"

  // statically known from the schema: when neither element type admits
  // nulls the primitive fast path is provably safe; otherwise take the
  // HOF-equivalent null-propagating path
  private def mayHaveNullElements: Boolean = Seq(left, right).exists {
    _.dataType match {
      case ArrayType(_, containsNull) => containsNull
      case _ => true
    }
  }

  override def nullable: Boolean =
    left.nullable || right.nullable || mayHaveNullElements

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val ad = a.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
    val bd = b.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
    if (mayHaveNullElements) DotHelper.dotNullable(ad, bd)
    else DotHelper.dot(ad, bd)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    if (!mayHaveNullElements) {
      defineCodeGen(ctx, ev, (a, b) => s"graft.functions.DotHelper.dot($a, $b)")
    } else {
      nullSafeCodeGen(ctx, ev, (a, b) => {
        val boxed = ctx.freshName("dotBoxed")
        s"""
           |java.lang.Double $boxed = graft.functions.DotHelper.dotNullable($a, $b);
           |if ($boxed == null) {
           |  ${ev.isNull} = true;
           |} else {
           |  ${ev.value} = $boxed.doubleValue();
           |}
         """.stripMargin
      })
    }

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): Dot = copy(left = newLeft, right = newRight)
}

/** Session registration for graft's custom functions — after this,
  * `expr("graft_fnv64(text)")` (and SQL) resolve, including inside
  * higher-order-function lambdas. */
object GraftFunctions {
  private[functions] def requireArity(name: String, exprs: Seq[Expression], n: Int): Unit =
    require(exprs.size == n, s"$name takes $n argument(s), got ${exprs.size}")

  private[functions] def buildWinnow(exprs: Seq[Expression]): Winnow = exprs match {
    case Seq(t) => Winnow(t, k = 8, w = 16)
    case Seq(t, kE, wE) =>
      Winnow(t,
        kE.eval().asInstanceOf[Number].intValue(),
        wE.eval().asInstanceOf[Number].intValue())
    case _ => throw new IllegalArgumentException(
      s"graft_winnow takes 1 or 3 arguments, got ${exprs.size}")
  }

  /** Resolve the literal topic/schema-name argument of the SQL Avro serde
    * functions to its registered envelope StructType — the stand-in for a
    * Schema Registry lookup (`from_avro(value, registrySchema)` takes the
    * schema as a literal the same way). */
  private[functions] def envelopeSchemaFor(e: Expression) = {
    val name = e.eval() match {
      case s: org.apache.spark.unsafe.types.UTF8String => s.toString
      case s: String => s
      case other => throw new IllegalArgumentException(
        s"schema name must be a string literal, got $other")
    }
    name match {
      case "transactions" => graft.cdc.Schemas.transactionEnvelope
      case "accounts" => graft.cdc.Schemas.accountEnvelope
      case "customers" => graft.cdc.Schemas.customerEnvelope
      case other => throw new IllegalArgumentException(
        s"unknown envelope schema '$other' " +
          "(expected transactions|accounts|customers)")
    }
  }

  private[functions] def buildAvroDecode(exprs: Seq[Expression]) = {
    requireArity("graft_avro_decode", exprs, 2)
    graft.cdc.AvroWireDecode(exprs.head, envelopeSchemaFor(exprs(1)))
  }

  private[functions] def buildAvroEncode(exprs: Seq[Expression]) = exprs match {
    case Seq(v, s) => graft.cdc.AvroWireEncode(v, envelopeSchemaFor(s), 1)
    case Seq(v, s, id) => graft.cdc.AvroWireEncode(v, envelopeSchemaFor(s),
      id.eval().asInstanceOf[Number].intValue())
    case _ => throw new IllegalArgumentException(
      s"graft_avro_encode takes 2 or 3 arguments, got ${exprs.size}")
  }

  private[functions] def buildZOrder(exprs: Seq[Expression]): ZOrder2 = exprs match {
    case Seq(x, y) => ZOrder2(x, y, bits = 16)
    case Seq(x, y, bE) =>
      ZOrder2(x, y, bE.eval().asInstanceOf[Number].intValue())
    case _ => throw new IllegalArgumentException(
      s"graft_zorder takes 2 or 3 arguments, got ${exprs.size}")
  }

  private[functions] def buildKmv(exprs: Seq[Expression]): KmvSketchAgg = {
    requireArity("graft_kmv", exprs, 2)
    KmvSketchAgg(exprs.head,
      exprs(1).eval().asInstanceOf[Number].intValue())
  }

  private[functions] def buildQSample(exprs: Seq[Expression]): QSampleAgg = {
    requireArity("graft_qsample", exprs, 3)
    QSampleAgg(exprs.head, exprs(1),
      exprs(2).eval().asInstanceOf[Number].intValue())
  }

  def register(spark: SparkSession): Unit = {
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_fnv64",
      exprs => { requireArity("graft_fnv64", exprs, 1); Fnv1a64(exprs.head) },
      "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_kmv", buildKmv, "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_qsample", buildQSample, "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_fence",
      exprs => { requireArity("graft_fence", exprs, 1); ParseFence(exprs.head) },
      "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_zorder", buildZOrder, "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_winnow", buildWinnow, "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_dot",
      exprs => { requireArity("graft_dot", exprs, 2); Dot(exprs(0), exprs(1)) },
      "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_avro_decode", buildAvroDecode, "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_avro_encode", buildAvroEncode, "built-in")
  }
}

/** The `SparkSessionExtensions` form of the same registration, for
  * cluster-wide installs without code changes:
  * `--conf spark.sql.extensions=graft.functions.GraftExtensions`
  * (or `SparkSession.builder().withExtensions(new GraftExtensions)`). */
class GraftExtensions extends (org.apache.spark.sql.SparkSessionExtensions => Unit) {
  override def apply(e: org.apache.spark.sql.SparkSessionExtensions): Unit = {
    e.injectFunction((
      new org.apache.spark.sql.catalyst.FunctionIdentifier("graft_fnv64"),
      new org.apache.spark.sql.catalyst.expressions.ExpressionInfo(
        classOf[Fnv1a64].getCanonicalName, "graft_fnv64"),
      (exprs: Seq[Expression]) => { GraftFunctions.requireArity("graft_fnv64", exprs, 1); Fnv1a64(exprs.head) }))
    e.injectFunction((
      new org.apache.spark.sql.catalyst.FunctionIdentifier("graft_winnow"),
      new org.apache.spark.sql.catalyst.expressions.ExpressionInfo(
        classOf[Winnow].getCanonicalName, "graft_winnow"),
      (exprs: Seq[Expression]) => GraftFunctions.buildWinnow(exprs)))
    e.injectFunction((
      new org.apache.spark.sql.catalyst.FunctionIdentifier("graft_dot"),
      new org.apache.spark.sql.catalyst.expressions.ExpressionInfo(
        classOf[Dot].getCanonicalName, "graft_dot"),
      (exprs: Seq[Expression]) => {
        GraftFunctions.requireArity("graft_dot", exprs, 2)
        Dot(exprs(0), exprs(1))
      }))
    e.injectFunction((
      new org.apache.spark.sql.catalyst.FunctionIdentifier("graft_avro_decode"),
      new org.apache.spark.sql.catalyst.expressions.ExpressionInfo(
        classOf[graft.cdc.AvroWireDecode].getCanonicalName, "graft_avro_decode"),
      (exprs: Seq[Expression]) => GraftFunctions.buildAvroDecode(exprs)))
    e.injectFunction((
      new org.apache.spark.sql.catalyst.FunctionIdentifier("graft_avro_encode"),
      new org.apache.spark.sql.catalyst.expressions.ExpressionInfo(
        classOf[graft.cdc.AvroWireEncode].getCanonicalName, "graft_avro_encode"),
      (exprs: Seq[Expression]) => GraftFunctions.buildAvroEncode(exprs)))
    e.injectFunction((
      new org.apache.spark.sql.catalyst.FunctionIdentifier("graft_zorder"),
      new org.apache.spark.sql.catalyst.expressions.ExpressionInfo(
        classOf[ZOrder2].getCanonicalName, "graft_zorder"),
      (exprs: Seq[Expression]) => GraftFunctions.buildZOrder(exprs)))
    e.injectFunction((
      new org.apache.spark.sql.catalyst.FunctionIdentifier("graft_kmv"),
      new org.apache.spark.sql.catalyst.expressions.ExpressionInfo(
        classOf[KmvSketchAgg].getCanonicalName, "graft_kmv"),
      (exprs: Seq[Expression]) => GraftFunctions.buildKmv(exprs)))
    e.injectFunction((
      new org.apache.spark.sql.catalyst.FunctionIdentifier("graft_qsample"),
      new org.apache.spark.sql.catalyst.expressions.ExpressionInfo(
        classOf[QSampleAgg].getCanonicalName, "graft_qsample"),
      (exprs: Seq[Expression]) => GraftFunctions.buildQSample(exprs)))
    // planner strategy: rank-filter windows -> bounded-heap per-group
    // top-k (graft.plans.BoundedTopKStrategy scaladoc has the contract)
    e.injectPlannerStrategy(_ => graft.plans.BoundedTopKStrategy)
  }
}
