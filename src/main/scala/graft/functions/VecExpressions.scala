package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, GenericInternalRow, UnaryExpression, UnsafeArrayData}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType, IntegerType, StructField, StructType}

/** Native dot product over embedding arrays.
  *
  * Why this exists: Spark's higher-order functions (`zip_with`,
  * `aggregate`) are CodegenFallback — every element of every pair
  * comparison runs through the interpreted lambda evaluator with boxed
  * intermediates. The dot product is THE inner loop of similarity
  * search and embedding dedup (one evaluation per candidate pair per
  * dimension), so at 100 TB the interpreter tax dominates those jobs.
  * This expression compiles to a tight primitive loop inside
  * whole-stage codegen via a static call.
  *
  * Arithmetic is identical to the declarative formulation
  * (left-to-right double accumulation of elementwise products, floats
  * widened before multiplying), so results are bit-identical and
  * oracle comparisons are unaffected.
  */
object VecRuntime {

  private def checkLengths(a: ArrayData, b: ArrayData): Int = {
    val n = a.numElements()
    if (b.numElements() != n)
      throw new IllegalArgumentException(
        s"vec_dot: mismatched vector lengths ${n} and ${b.numElements()}")
    n
  }

  def dotFF(a: ArrayData, b: ArrayData): Double = {
    val n = checkLengths(a, b)
    var s = 0.0; var i = 0
    while (i < n) { s += a.getFloat(i).toDouble * b.getFloat(i).toDouble; i += 1 }
    s
  }

  def dotFD(a: ArrayData, b: ArrayData): Double = {
    val n = checkLengths(a, b)
    var s = 0.0; var i = 0
    while (i < n) { s += a.getFloat(i).toDouble * b.getDouble(i); i += 1 }
    s
  }

  def dotDF(a: ArrayData, b: ArrayData): Double = dotFD(b, a)

  def dotDD(a: ArrayData, b: ArrayData): Double = {
    val n = checkLengths(a, b)
    var s = 0.0; var i = 0
    while (i < n) { s += a.getDouble(i) * b.getDouble(i); i += 1 }
    s
  }

  // --- int8 quantization -------------------------------------------------
  // Arithmetic mirrors the declarative form exactly so the two stay
  // oracle-equivalent: mx = max(|x_i|) with Spark's NaN-is-greatest
  // array_max ordering, scale = mx > 0 ? 127/mx : 0 (NaN > 0 is TRUE in
  // Spark SQL comparisons), q_i = (int) floor(x_i*scale + 0.5) with
  // Java's NaN-to-0 int conversion. Elements must be non-null (same
  // contract as vec_dot).

  private def quantize(n: Int, get: Int => Double): InternalRow = {
    var mx = 0.0; var i = 0
    while (i < n) {
      val v = math.abs(get(i))
      if (v > mx || java.lang.Double.isNaN(v)) mx = v
      i += 1
    }
    val scale = if (mx > 0.0 || java.lang.Double.isNaN(mx)) 127.0 / mx else 0.0
    val out = new Array[Int](n)
    i = 0
    while (i < n) { out(i) = math.floor(get(i) * scale + 0.5).toInt; i += 1 }
    new GenericInternalRow(Array[Any](UnsafeArrayData.fromPrimitiveArray(out), scale))
  }

  def quantizeF(a: ArrayData): InternalRow = quantize(a.numElements(), i => a.getFloat(i).toDouble)

  def quantizeD(a: ArrayData): InternalRow = quantize(a.numElements(), a.getDouble)
}

/** vec_dot(a, b): double dot product of two array<float>/array<double>
  * columns (any combination; floats widen to double elementwise).
  * Null-preserving; mismatched lengths error at runtime.
  */
case class VecDot(left: Expression, right: Expression) extends BinaryExpression {

  private def isFloat(e: Expression): Boolean =
    e.dataType.asInstanceOf[ArrayType].elementType == FloatType

  private def valid(t: DataType): Boolean = t match {
    case ArrayType(FloatType, _) | ArrayType(DoubleType, _) => true
    case _ => false
  }

  override def checkInputDataTypes(): TypeCheckResult =
    if (valid(left.dataType) && valid(right.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"vec_dot requires array<float>/array<double> arguments, got ${left.dataType.sql} and ${right.dataType.sql}")

  override def dataType: DataType = DoubleType
  override def prettyName: String = "vec_dot"

  private def method: String =
    (if (isFloat(left)) "F" else "D") + (if (isFloat(right)) "F" else "D")

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val (x, y) = (a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
    method match {
      case "FF" => VecRuntime.dotFF(x, y)
      case "FD" => VecRuntime.dotFD(x, y)
      case "DF" => VecRuntime.dotDF(x, y)
      case _ => VecRuntime.dotDD(x, y)
    }
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val rt = VecRuntime.getClass.getName.stripSuffix("$")
    defineCodeGen(ctx, ev, (a, b) => s"$rt.dot$method($a, $b)")
  }

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): VecDot =
    copy(left = newLeft, right = newRight)
}

/** vec_quantize_int8(v): symmetric per-vector int8 quantization of an
  * array<float>/array<double> column, returned as
  * struct<qvec: array<int>, qscale: double> with
  * scale = 127/max|x| (0 for zero/empty vectors) and
  * q_i = floor(x_i*scale + 0.5) — round-half-up.
  *
  * Why native: the declarative formulation builds the scale as a column
  * expression referenced inside a per-element `transform` lambda;
  * CollapseProject inlines it into the lambda body, so the executed
  * plan recomputes the O(d) `array_max` pass for EVERY element — O(d²)
  * interpreted work per vector (this was 17% of the round-7 bench).
  * Here max-abs and scaling are two tight primitive passes inside
  * whole-stage codegen, evaluated once per vector. Arithmetic is
  * bit-identical to the declarative form (see [[VecRuntime.quantizeF]]).
  */
case class VecQuantizeInt8(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) | ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"vec_quantize_int8 requires an array<float>/array<double> argument, got ${t.sql}")
  }

  override def dataType: DataType = StructType(Seq(
    StructField("qvec", ArrayType(IntegerType, containsNull = false), nullable = false),
    StructField("qscale", DoubleType, nullable = false)))

  override def prettyName: String = "vec_quantize_int8"

  private def isFloat: Boolean =
    child.dataType.asInstanceOf[ArrayType].elementType == FloatType

  override protected def nullSafeEval(v: Any): Any = {
    val a = v.asInstanceOf[ArrayData]
    if (isFloat) VecRuntime.quantizeF(a) else VecRuntime.quantizeD(a)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val rt = VecRuntime.getClass.getName.stripSuffix("$")
    val m = if (isFloat) "quantizeF" else "quantizeD"
    defineCodeGen(ctx, ev, a => s"$rt.$m($a)")
  }

  override protected def withNewChildInternal(newChild: Expression): VecQuantizeInt8 =
    copy(child = newChild)
}

/** Column-API surface for the native vector expressions. */
object VecOps {
  def dot(a: Column, b: Column): Column =
    ColumnBridge.column(VecDot(ColumnBridge.expression(a), ColumnBridge.expression(b)))

  def quantizeInt8(v: Column): Column =
    ColumnBridge.column(VecQuantizeInt8(ColumnBridge.expression(v)))

  /** SQL builder for function-registry injection. */
  private[functions] def vecDotBuilder(children: Seq[Expression]): Expression = {
    if (children.length != 2)
      throw new IllegalArgumentException(s"vec_dot expects 2 arguments, got ${children.length}")
    VecDot(children.head, children(1))
  }

  private[functions] def vecQuantizeInt8Builder(children: Seq[Expression]): Expression = {
    if (children.length != 1)
      throw new IllegalArgumentException(s"vec_quantize_int8 expects 1 argument, got ${children.length}")
    VecQuantizeInt8(children.head)
  }
}
