package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, GenericInternalRow, TernaryExpression, UnaryExpression, UnsafeArrayData}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType, IntegerType, LongType, StructField, StructType}

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

  // --- fixed-point + nearest-centroid (integer k-means kernels) ----------
  // Fixed-point maps x -> floor(x*scale + 0.5) as a LONG: float widens to
  // double first, so the arithmetic is the same IEEE sequence an external
  // engine runs on the same parquet floats — quantized vectors (and
  // everything integer downstream: squared-L2, truncated-mean centroids)
  // are bit-identical across engines.

  private def fixedPoint(n: Int, scale: Double, get: Int => Double): ArrayData = {
    val out = new Array[Long](n)
    var i = 0
    while (i < n) { out(i) = math.floor(get(i) * scale + 0.5).toLong; i += 1 }
    UnsafeArrayData.fromPrimitiveArray(out)
  }

  def fixedPointF(a: ArrayData, scale: Double): ArrayData =
    fixedPoint(a.numElements(), scale, i => a.getFloat(i).toDouble)

  def fixedPointD(a: ArrayData, scale: Double): ArrayData =
    fixedPoint(a.numElements(), scale, a.getDouble)

  // --- product quantization kernels --------------------------------------
  // PQ (Jégou et al. 2011) over the same fixed-point integer space as
  // k-means: a d-dim vector splits into m contiguous subvectors, each
  // encoded as the ordinal of its nearest subspace centroid; asymmetric
  // distance (ADC) between a query and a code is the sum of m table
  // lookups. With integer vectors and integer centroids every distance
  // is an exact 64-bit sum — rankings reproduce across engines.

  /** Per-query ADC lookup table: for each subspace j of m and centroid
    * c of k, the integer squared-L2 between the query's j-th subvector
    * and centroid (j, c). `cents` is m·k·dsub longs, subspace-major
    * ((j·k + c)·dsub + i); the result is m·k longs ordered (j·k + c) —
    * exactly the layout [[pqAdc]] indexes.
    */
  def pqLut(q: ArrayData, cents: ArrayData, m: Int): ArrayData = {
    val d = q.numElements()
    if (m <= 0 || d % m != 0)
      throw new IllegalArgumentException(
        s"pq_lut: vector length $d is not divisible into $m subspaces")
    val dsub = d / m
    val mk = cents.numElements() / dsub
    if (cents.numElements() != mk * dsub || mk % m != 0)
      throw new IllegalArgumentException(
        s"pq_lut: centroid array length ${cents.numElements()} does not tile m=$m subspaces of width $dsub")
    val k = mk / m
    val out = new Array[Long](m * k)
    var j = 0
    while (j < m) {
      var c = 0
      while (c < k) {
        val co = (j * k + c) * dsub
        val qo = j * dsub
        var s = 0L
        var i = 0
        while (i < dsub) { val t = q.getLong(qo + i) - cents.getLong(co + i); s += t * t; i += 1 }
        out(j * k + c) = s
        c += 1
      }
      j += 1
    }
    UnsafeArrayData.fromPrimitiveArray(out)
  }

  /** ADC distance: sum over subspaces of the query LUT entry for this
    * code word. `lut` is m·k longs ((j·k + c)-ordered, from [[pqLut]]);
    * m = codes.length, k inferred.
    */
  def pqAdc(codes: ArrayData, lut: ArrayData): Long = {
    val m = codes.numElements()
    if (m == 0 || lut.numElements() % m != 0)
      throw new IllegalArgumentException(
        s"pq_adc: LUT length ${lut.numElements()} is not a multiple of m=$m")
    val k = lut.numElements() / m
    var s = 0L
    var j = 0
    while (j < m) {
      val c = codes.getInt(j)
      if (c < 0 || c >= k)
        throw new IllegalArgumentException(s"pq_adc: code $c out of range [0, $k)")
      s += lut.getLong(j * k + c)
      j += 1
    }
    s
  }

  /** Argmin squared-L2 over k centroids packed row-major into one flat
    * long array (k = cents.length / d). Ties break toward the LOWEST
    * centroid ordinal (strict `<`), matching a `(dist, cid)` sort.
    * Returns struct(cluster int, dist long). All arithmetic is 64-bit
    * integer: with |q_i| ≤ s the per-dim square is ≤ 4s² — at the
    * default fixed-point scale 1000 a 2^63 overflow needs d > 10^12.
    */
  def nearestCentroid(v: ArrayData, cents: ArrayData): InternalRow = {
    val d = v.numElements()
    val m = cents.numElements()
    if (d == 0 || m == 0 || m % d != 0)
      throw new IllegalArgumentException(
        s"vec_nearest_centroid: centroid array length $m is not a positive multiple of vector length $d")
    val k = m / d
    var best = -1
    var bestDist = Long.MaxValue
    var j = 0
    while (j < k) {
      var s = 0L
      var i = 0
      val off = j * d
      while (i < d) { val t = v.getLong(i) - cents.getLong(off + i); s += t * t; i += 1 }
      if (s < bestDist) { bestDist = s; best = j }
      j += 1
    }
    new GenericInternalRow(Array[Any](best, bestDist))
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

/** vec_fixed_point(v, scale): array<long> fixed-point quantization
  * q_i = floor(x_i*scale + 0.5) of an array<float>/array<double>
  * column. Unlike [[VecQuantizeInt8]] the scale is GLOBAL (caller-
  * chosen), so squared-L2 geometry is preserved across vectors and the
  * quantized space supports exact integer k-means
  * ([[graft.operators.Clustering]]). One tight primitive pass inside
  * whole-stage codegen.
  */
case class VecFixedPoint(left: Expression, right: Expression) extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (ArrayType(FloatType, _) | ArrayType(DoubleType, _), DoubleType) =>
      TypeCheckResult.TypeCheckSuccess
    case (l, r) => TypeCheckResult.TypeCheckFailure(
      s"vec_fixed_point requires (array<float>/array<double>, double), got ${l.sql} and ${r.sql}")
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "vec_fixed_point"

  private def isFloat: Boolean =
    left.dataType.asInstanceOf[ArrayType].elementType == FloatType

  override protected def nullSafeEval(v: Any, s: Any): Any = {
    val a = v.asInstanceOf[ArrayData]
    val sc = s.asInstanceOf[Double]
    if (isFloat) VecRuntime.fixedPointF(a, sc) else VecRuntime.fixedPointD(a, sc)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val rt = VecRuntime.getClass.getName.stripSuffix("$")
    val m = if (isFloat) "fixedPointF" else "fixedPointD"
    defineCodeGen(ctx, ev, (a, s) => s"$rt.$m($a, $s)")
  }

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): VecFixedPoint =
    copy(left = newLeft, right = newRight)
}

/** vec_nearest_centroid(v, cents): struct<cluster: int, dist: bigint> —
  * argmin squared-L2 of an array<long> vector over k centroids packed
  * row-major into one flat array<long> (k inferred as
  * cents.length / v.length; ties break to the lowest ordinal). The
  * centroid argument is typically a plan literal (k·d longs), so the
  * whole k-means assignment step is one codegen'd map pass over the
  * corpus with zero joins and zero shuffles.
  */
case class VecNearestCentroid(left: Expression, right: Expression) extends BinaryExpression {

  private def isLongArray(t: DataType): Boolean = t match {
    case ArrayType(LongType, _) => true
    case _ => false
  }

  override def checkInputDataTypes(): TypeCheckResult =
    if (isLongArray(left.dataType) && isLongArray(right.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"vec_nearest_centroid requires array<bigint> arguments, got ${left.dataType.sql} and ${right.dataType.sql}")

  override def dataType: DataType = StructType(Seq(
    StructField("cluster", IntegerType, nullable = false),
    StructField("dist", LongType, nullable = false)))

  override def prettyName: String = "vec_nearest_centroid"

  override protected def nullSafeEval(v: Any, c: Any): Any =
    VecRuntime.nearestCentroid(v.asInstanceOf[ArrayData], c.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val rt = VecRuntime.getClass.getName.stripSuffix("$")
    defineCodeGen(ctx, ev, (a, b) => s"$rt.nearestCentroid($a, $b)")
  }

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): VecNearestCentroid =
    copy(left = newLeft, right = newRight)
}

/** pq_lut(qv, cents, m): array<long> of m·k integer squared-L2 entries
  * — the per-query ADC lookup table over a flat subspace-major centroid
  * literal (see [[VecRuntime.pqLut]]). One codegen'd pass per query
  * row; the centroid argument is a plan literal like
  * [[VecNearestCentroid]]'s.
  */
case class PqLut(first: Expression, second: Expression, third: Expression)
    extends TernaryExpression {

  private def isLongArray(t: DataType): Boolean = t match {
    case ArrayType(LongType, _) => true
    case _ => false
  }

  override def checkInputDataTypes(): TypeCheckResult =
    if (isLongArray(first.dataType) && isLongArray(second.dataType) &&
      third.dataType == IntegerType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"pq_lut requires (array<bigint>, array<bigint>, int), got " +
        s"${first.dataType.sql}, ${second.dataType.sql}, ${third.dataType.sql}")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "pq_lut"

  override protected def nullSafeEval(q: Any, c: Any, m: Any): Any =
    VecRuntime.pqLut(q.asInstanceOf[ArrayData], c.asInstanceOf[ArrayData], m.asInstanceOf[Int])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val rt = VecRuntime.getClass.getName.stripSuffix("$")
    defineCodeGen(ctx, ev, (q, c, m) => s"$rt.pqLut($q, $c, $m)")
  }

  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression, newThird: Expression): PqLut =
    copy(first = newFirst, second = newSecond, third = newThird)
}

/** pq_adc(codes, lut): bigint asymmetric PQ distance — m table lookups
  * summed in a codegen'd loop (see [[VecRuntime.pqAdc]]). The inner
  * loop of PQ serving: one evaluation per (query, code) pair.
  */
case class PqAdc(left: Expression, right: Expression) extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (ArrayType(IntegerType, _), ArrayType(LongType, _)) => TypeCheckResult.TypeCheckSuccess
    case (l, r) => TypeCheckResult.TypeCheckFailure(
      s"pq_adc requires (array<int>, array<bigint>), got ${l.sql} and ${r.sql}")
  }

  override def dataType: DataType = LongType
  override def prettyName: String = "pq_adc"

  override protected def nullSafeEval(codes: Any, lut: Any): Any =
    VecRuntime.pqAdc(codes.asInstanceOf[ArrayData], lut.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val rt = VecRuntime.getClass.getName.stripSuffix("$")
    defineCodeGen(ctx, ev, (c, l) => s"$rt.pqAdc($c, $l)")
  }

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): PqAdc =
    copy(left = newLeft, right = newRight)
}

/** Column-API surface for the native vector expressions. */
object VecOps {
  def dot(a: Column, b: Column): Column =
    ColumnBridge.column(VecDot(ColumnBridge.expression(a), ColumnBridge.expression(b)))

  def quantizeInt8(v: Column): Column =
    ColumnBridge.column(VecQuantizeInt8(ColumnBridge.expression(v)))

  def fixedPoint(v: Column, scale: Double): Column =
    ColumnBridge.column(VecFixedPoint(ColumnBridge.expression(v),
      org.apache.spark.sql.catalyst.expressions.Literal(scale)))

  def nearestCentroid(v: Column, cents: Column): Column =
    ColumnBridge.column(VecNearestCentroid(ColumnBridge.expression(v), ColumnBridge.expression(cents)))

  def pqLut(q: Column, cents: Column, m: Int): Column =
    ColumnBridge.column(PqLut(ColumnBridge.expression(q), ColumnBridge.expression(cents),
      org.apache.spark.sql.catalyst.expressions.Literal(m)))

  def pqAdc(codes: Column, lut: Column): Column =
    ColumnBridge.column(PqAdc(ColumnBridge.expression(codes), ColumnBridge.expression(lut)))

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

  private[functions] def vecFixedPointBuilder(children: Seq[Expression]): Expression = {
    if (children.length != 2)
      throw new IllegalArgumentException(s"vec_fixed_point expects 2 arguments, got ${children.length}")
    VecFixedPoint(children.head, children(1))
  }

  private[functions] def vecNearestCentroidBuilder(children: Seq[Expression]): Expression = {
    if (children.length != 2)
      throw new IllegalArgumentException(s"vec_nearest_centroid expects 2 arguments, got ${children.length}")
    VecNearestCentroid(children.head, children(1))
  }

  private[functions] def pqLutBuilder(children: Seq[Expression]): Expression = {
    if (children.length != 3)
      throw new IllegalArgumentException(s"pq_lut expects 3 arguments, got ${children.length}")
    PqLut(children.head, children(1), children(2))
  }

  private[functions] def pqAdcBuilder(children: Seq[Expression]): Expression = {
    if (children.length != 2)
      throw new IllegalArgumentException(s"pq_adc expects 2 arguments, got ${children.length}")
    PqAdc(children.head, children(1))
  }
}
