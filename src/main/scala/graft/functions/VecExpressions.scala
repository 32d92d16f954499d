package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

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

/** Column-API surface for the native vector expressions. */
object VecOps {
  def dot(a: Column, b: Column): Column =
    ColumnBridge.column(VecDot(ColumnBridge.expression(a), ColumnBridge.expression(b)))

  /** SQL builder for function-registry injection. */
  private[functions] def vecDotBuilder(children: Seq[Expression]): Expression = {
    if (children.length != 2)
      throw new IllegalArgumentException(s"vec_dot expects 2 arguments, got ${children.length}")
    VecDot(children.head, children(1))
  }
}
