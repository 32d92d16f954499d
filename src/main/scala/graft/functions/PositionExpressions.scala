package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, TernaryExpression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StructType}

/** Native kernels for positional-index serving
  * ([[graft.operators.Retrieval.phraseSearch]] /
  * [[graft.operators.Retrieval.proximitySearch]]).
  *
  * Why native: the declarative formulations fold position lists with
  * `transform`/`aggregate`/`filter` — CodegenFallback higher-order
  * functions whose per-element interpreted cost is fine on a handful
  * of matched documents but becomes corpus-scale the moment a query
  * holds a COMMON term (the pruned postings of "the" are most of the
  * corpus, and the nested-transform pair count is O(n²) per doc on
  * top of the interpreter tax). These kernels run the same arithmetic
  * as tight primitive loops inside whole-stage codegen: the
  * intersection is a linear two-pointer merge and the pair count a
  * linear sliding window — better asymptotics AND no boxing.
  *
  * Both kernels REQUIRE sorted-ascending position arrays — exactly
  * what [[graft.operators.Retrieval.buildPositionalIndex]] emits
  * (`sort_array(collect_list(pos))`), a property parquet round trips
  * preserve.
  */
object PosRuntime {

  /** |∩_i (positions_i − slot_i)| over an array of (slot, positions)
    * structs — the phrase-occurrence count: a phrase start p needs
    * term_i at p + slot_i for every slot, i.e. p ∈ positions_i − slot_i
    * for all i. Arrays are sorted ascending; shifting by a constant
    * preserves that, so the fold is a chain of linear two-pointer
    * merge-intersections. Empty input counts zero.
    */
  def slotIntersectCount(pairs: ArrayData): Long = {
    val n = pairs.numElements()
    if (n == 0) return 0L
    def shifted(i: Int): Array[Long] = {
      val row = pairs.getStruct(i, 2)
      val slot = row.getLong(0)
      val ps = row.getArray(1)
      val m = ps.numElements()
      val out = new Array[Long](m)
      var j = 0
      while (j < m) { out(j) = ps.getLong(j) - slot; j += 1 }
      out
    }
    var acc = shifted(0)
    var i = 1
    while (i < n && acc.length > 0) {
      val b = shifted(i)
      val out = new Array[Long](math.min(acc.length, b.length))
      var x = 0; var y = 0; var k = 0
      while (x < acc.length && y < b.length) {
        val d = acc(x) - b(y)
        if (d == 0L) { out(k) = acc(x); k += 1; x += 1; y += 1 }
        else if (d < 0L) x += 1
        else y += 1
      }
      acc = java.util.Arrays.copyOf(out, k)
      i += 1
    }
    acc.length.toLong
  }

  /** Count of pairs (x ∈ pa, y ∈ pb) with 1 ≤ |x − y| ≤ maxDist over
    * two sorted-ascending long arrays — the proximity score. Linear:
    * the window [x − maxDist, x + maxDist] slides monotonically with
    * x (three pointers into pb), minus the y == x coincidences.
    */
  def pairCount(pa: ArrayData, pb: ArrayData, maxDist: Long): Long = {
    val na = pa.numElements()
    val nb = pb.numElements()
    var lo = 0; var hi = 0; var eq = 0
    var cnt = 0L
    var i = 0
    while (i < na) {
      val x = pa.getLong(i)
      while (lo < nb && pb.getLong(lo) < x - maxDist) lo += 1
      if (hi < lo) hi = lo
      while (hi < nb && pb.getLong(hi) <= x + maxDist) hi += 1
      cnt += (hi - lo).toLong
      while (eq < nb && pb.getLong(eq) < x) eq += 1
      if (eq < nb && pb.getLong(eq) == x) cnt -= 1L
      i += 1
    }
    cnt
  }
}

/** pos_slot_intersect_count(pairs): phrase-occurrence count over an
  * array<struct<slot: long, positions: array<long>>> column (sorted
  * positions). Null-preserving.
  */
case class PosSlotIntersectCount(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(s: StructType, _) if s.length == 2 &&
      s.head.dataType == LongType &&
      s(1).dataType.isInstanceOf[ArrayType] &&
      s(1).dataType.asInstanceOf[ArrayType].elementType == LongType =>
      TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"pos_slot_intersect_count requires array<struct<slot: bigint, positions: array<bigint>>>, got ${t.sql}")
  }

  override def dataType: DataType = LongType
  override def prettyName: String = "pos_slot_intersect_count"

  override protected def nullSafeEval(v: Any): Any =
    PosRuntime.slotIntersectCount(v.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val rt = PosRuntime.getClass.getName.stripSuffix("$")
    defineCodeGen(ctx, ev, c => s"$rt.slotIntersectCount($c)")
  }

  override protected def withNewChildInternal(newChild: Expression): PosSlotIntersectCount =
    copy(child = newChild)
}

/** pos_pair_count(pa, pb, maxDist): within-window position-pair count
  * over two sorted array<long> columns (see [[PosRuntime.pairCount]]).
  * Null-preserving.
  */
case class PosPairCount(first: Expression, second: Expression, third: Expression)
    extends TernaryExpression {

  private def isLongArray(t: DataType): Boolean = t match {
    case ArrayType(LongType, _) => true
    case _ => false
  }

  override def checkInputDataTypes(): TypeCheckResult =
    if (isLongArray(first.dataType) && isLongArray(second.dataType) &&
      third.dataType == LongType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"pos_pair_count requires (array<bigint>, array<bigint>, bigint), got " +
        s"(${first.dataType.sql}, ${second.dataType.sql}, ${third.dataType.sql})")

  override def dataType: DataType = LongType
  override def prettyName: String = "pos_pair_count"

  override protected def nullSafeEval(a: Any, b: Any, d: Any): Any =
    PosRuntime.pairCount(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData],
      d.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val rt = PosRuntime.getClass.getName.stripSuffix("$")
    defineCodeGen(ctx, ev, (a, b, d) => s"$rt.pairCount($a, $b, $d)")
  }

  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression, newThird: Expression): PosPairCount =
    copy(first = newFirst, second = newSecond, third = newThird)
}

object PosOps {
  def slotIntersectCount(pairs: Column): Column =
    ColumnBridge.column(PosSlotIntersectCount(ColumnBridge.expression(pairs)))

  def pairCount(pa: Column, pb: Column, maxDist: Column): Column =
    ColumnBridge.column(PosPairCount(ColumnBridge.expression(pa),
      ColumnBridge.expression(pb), ColumnBridge.expression(maxDist)))

  private[functions] def posSlotIntersectCountBuilder(children: Seq[Expression]): Expression = {
    if (children.length != 1)
      throw new IllegalArgumentException(
        s"pos_slot_intersect_count expects 1 argument, got ${children.length}")
    PosSlotIntersectCount(children.head)
  }

  private[functions] def posPairCountBuilder(children: Seq[Expression]): Expression = {
    if (children.length != 3)
      throw new IllegalArgumentException(
        s"pos_pair_count expects 3 arguments, got ${children.length}")
    PosPairCount(children(0), children(1), children(2))
  }
}
