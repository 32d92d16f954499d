package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Misra–Gries heavy-hitters state: at most k counters plus the
  * processed-item count. Mutable by design — TypedImperativeAggregate
  * buffers are owned by the operator between update calls.
  */
final class MgState(val counts: java.util.HashMap[String, Long], var n: Long)

/** heavy_hitters(item, k): mergeable Misra–Gries heavy-hitters sketch
  * as a native Catalyst aggregate — the sketch the 100 TB profile pass
  * wants when the item domain is too large to groupBy: each task
  * carries AT MOST k counters (not the domain), partials combine
  * map-side like any aggregate, and the final merge touches
  * numPartitions × k entries, never the corpus.
  *
  * Guarantees (classic MG + the mergeable-summaries merge, both
  * order-independent facts certified by q119's oracle even though the
  * raw estimates are partition-order dependent):
  *  - no overcount: est(x) <= true(x);
  *  - bounded undercount: true(x) - est(x) <= n/(k+1);
  *  - total recall above the bound: any x with true(x) > n/(k+1) IS
  *    in the sketch.
  *
  * Update is the textbook rule (hit: +1; miss with spare slot:
  * insert 1; miss when full: decrement ALL, evict zeros — the arriving
  * item cancels against k incumbents). Merge sums counterparts, then
  * restores the k-bound by subtracting the (k+1)-th largest value from
  * every counter and evicting non-positives (Agarwal et al.,
  * "Mergeable Summaries" — this is the step that keeps the bound
  * additive in n across partials).
  *
  * eval returns array<struct<item,est>> sorted (est desc, item asc);
  * NULL items are ignored (they are absence, not a key).
  */
case class HeavyHitters(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[MgState] with ExpectsInputTypes {

  require(k >= 1, s"heavy_hitters k must be >= 1, got $k")

  override def children: Seq[Expression] = Seq(child)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): HeavyHitters =
    copy(child = newChildren.head)

  override def inputTypes = Seq(StringType)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(
    StructType(Seq(
      StructField("item", StringType, nullable = false),
      StructField("est", LongType, nullable = false))),
    containsNull = false)

  override def withNewMutableAggBufferOffset(newOffset: Int): HeavyHitters =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): HeavyHitters =
    copy(inputAggBufferOffset = newOffset)

  override def createAggregationBuffer(): MgState =
    new MgState(new java.util.HashMap[String, Long](k * 2), 0L)

  override def update(state: MgState, input: InternalRow): MgState = {
    val v = child.eval(input)
    if (v == null) return state
    val item = v.asInstanceOf[UTF8String].toString
    state.n += 1
    val cur = state.counts.get(item)
    if (cur != 0L || state.counts.containsKey(item)) {
      state.counts.put(item, cur + 1L)
    } else if (state.counts.size < k) {
      state.counts.put(item, 1L)
    } else {
      // miss at capacity: the arriving item cancels one unit of every
      // incumbent (and itself) — the O(k) step that buys the n/(k+1)
      // undercount bound
      val it = state.counts.entrySet().iterator()
      while (it.hasNext) {
        val e = it.next()
        if (e.getValue <= 1L) it.remove() else e.setValue(e.getValue - 1L)
      }
    }
    state
  }

  override def merge(a: MgState, b: MgState): MgState = {
    val bi = b.counts.entrySet().iterator()
    while (bi.hasNext) {
      val e = bi.next()
      val cur = a.counts.get(e.getKey)
      a.counts.put(e.getKey, cur + e.getValue)
    }
    a.n += b.n
    if (a.counts.size > k) {
      // subtract the (k+1)-th largest counter from everything; at most
      // k strictly larger values survive
      val vals = new Array[Long](a.counts.size)
      val vi = a.counts.values().iterator()
      var i = 0
      while (vi.hasNext) { vals(i) = vi.next(); i += 1 }
      java.util.Arrays.sort(vals)
      val d = vals(vals.length - (k + 1)) // (k+1)-th largest
      val it = a.counts.entrySet().iterator()
      while (it.hasNext) {
        val e = it.next()
        if (e.getValue <= d) it.remove() else e.setValue(e.getValue - d)
      }
    }
    a
  }

  override def eval(state: MgState): Any = {
    val entries = new Array[(String, Long)](state.counts.size)
    val it = state.counts.entrySet().iterator()
    var i = 0
    while (it.hasNext) {
      val e = it.next()
      entries(i) = (e.getKey, e.getValue)
      i += 1
    }
    val sorted = entries.sortBy { case (item, est) => (-est, item) }
    new GenericArrayData(sorted.map { case (item, est) =>
      InternalRow(UTF8String.fromString(item), est)
    })
  }

  override def serialize(state: MgState): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeLong(state.n)
    out.writeInt(state.counts.size)
    val it = state.counts.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      out.writeUTF(e.getKey)
      out.writeLong(e.getValue)
    }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): MgState = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val n = in.readLong()
    val size = in.readInt()
    val m = new java.util.HashMap[String, Long](math.max(size * 2, k * 2))
    var i = 0
    while (i < size) {
      val key = in.readUTF()
      m.put(key, in.readLong())
      i += 1
    }
    new MgState(m, n)
  }

  override def prettyName: String = "heavy_hitters"
}

/** Count-Min sketch state: a d×w counter matrix (row-major) plus the
  * processed-item count.
  */
final class CmsState(val counts: Array[Long], var n: Long)

/** Shared hash/query runtime — the aggregate (build) and the scalar
  * expression (point query) must hash identically.
  */
object SketchRuntime {
  /** FNV-1a 64 over the item's UTF-8 bytes with golden-ratio seed
    * mixing and a finalizing xor-shift, reduced to [0, w). Any
    * deterministic family works (the certification oracle compares
    * against EXACT counts, not against another engine's hashes); FNV
    * keeps it dependency-free and byte-stable.
    */
  def cmsBucket(seed: Int, item: UTF8String, w: Int): Int = {
    val bytes = item.getBytes
    var h = 0xcbf29ce484222325L ^ (seed.toLong * 0x9e3779b97f4a7c15L)
    var i = 0
    while (i < bytes.length) {
      h = (h ^ (bytes(i) & 0xffL)) * 0x100000001b3L
      i += 1
    }
    h ^= h >>> 33
    java.lang.Math.floorMod(h, w.toLong).toInt
  }

  /** Point query: min over the d rows' cells — never undercounts. */
  def cmsQuery(sketch: InternalRow, item: UTF8String, d: Int, w: Int): Long = {
    val counts = sketch.getArray(1)
    var est = Long.MaxValue
    var i = 0
    while (i < d) {
      val v = counts.getLong(i * w + cmsBucket(i, item, w))
      if (v < est) est = v
      i += 1
    }
    est
  }
}

/** cms_sketch(item, d, w): Count-Min sketch as a native Catalyst
  * aggregate — the mergeable frequency summary for domains too large
  * to groupBy, complementing [[HeavyHitters]]: Misra–Gries never
  * OVERcounts and keeps only k items; Count-Min never UNDERcounts and
  * answers point queries for EVERY item (d·w longs of state,
  * independent of the domain). Merge is elementwise addition — exactly
  * mergeable with no bound degradation, so partials combine map-side
  * like any aggregate and the final merge moves d·w longs per task,
  * never the corpus.
  *
  * Guarantees: est(x) >= true(x) always (each cell only ever adds);
  * est(x) <= true(x) + ~n/w per row with high probability in d (the
  * certified slack in [[graft.operators.Profiling.cmsCertify]] is a
  * deliberate 16·n/w so the bound assertion is deterministic-in-
  * practice for any fixture while staying 60× tighter than n).
  *
  * eval returns struct<n: long, counts: array<long>> (row-major d×w)
  * — point queries go through `cms_query` which re-derives the same
  * hashes. NULL items are ignored.
  */
case class CmsSketch(
    child: Expression,
    d: Int,
    w: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[CmsState] with ExpectsInputTypes {

  require(d >= 1 && d <= 16, s"cms_sketch depth must be in [1,16], got $d")
  require(w >= 2, s"cms_sketch width must be >= 2, got $w")

  override def children: Seq[Expression] = Seq(child)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): CmsSketch =
    copy(child = newChildren.head)

  override def inputTypes = Seq(StringType)
  override def nullable: Boolean = false
  override def dataType: DataType = StructType(Seq(
    StructField("n", LongType, nullable = false),
    StructField("counts", ArrayType(LongType, containsNull = false), nullable = false)))

  override def withNewMutableAggBufferOffset(newOffset: Int): CmsSketch =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): CmsSketch =
    copy(inputAggBufferOffset = newOffset)

  override def createAggregationBuffer(): CmsState =
    new CmsState(new Array[Long](d * w), 0L)

  override def update(state: CmsState, input: InternalRow): CmsState = {
    val v = child.eval(input)
    if (v == null) return state
    val item = v.asInstanceOf[UTF8String]
    state.n += 1
    var i = 0
    while (i < d) {
      state.counts(i * w + SketchRuntime.cmsBucket(i, item, w)) += 1L
      i += 1
    }
    state
  }

  override def merge(a: CmsState, b: CmsState): CmsState = {
    var i = 0
    while (i < a.counts.length) { a.counts(i) += b.counts(i); i += 1 }
    a.n += b.n
    a
  }

  override def eval(state: CmsState): Any =
    InternalRow(state.n, new GenericArrayData(state.counts.clone()))

  override def serialize(state: CmsState): Array[Byte] = {
    val bos = new ByteArrayOutputStream(8 + 8 * state.counts.length)
    val out = new DataOutputStream(bos)
    out.writeLong(state.n)
    var i = 0
    while (i < state.counts.length) { out.writeLong(state.counts(i)); i += 1 }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): CmsState = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val n = in.readLong()
    val counts = new Array[Long](d * w)
    var i = 0
    while (i < counts.length) { counts(i) = in.readLong(); i += 1 }
    new CmsState(counts, n)
  }

  override def prettyName: String = "cms_sketch"
}

/** cms_query(sketch, item): point-frequency estimate from a
  * `cms_sketch` struct — min over the d hashed cells. d and w ride on
  * the expression (they parameterize the hash family and layout, and
  * must match the sketch that was built).
  */
case class CmsQuery(left: Expression, right: Expression, d: Int, w: Int)
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (StructType(Array(StructField("n", LongType, _, _),
      StructField("counts", ArrayType(LongType, _), _, _))), StringType) =>
      TypeCheckResult.TypeCheckSuccess
    case (l, r) => TypeCheckResult.TypeCheckFailure(
      s"cms_query requires (struct<n,counts>, string), got ${l.sql} and ${r.sql}")
  }
  override def dataType: DataType = LongType
  override def prettyName: String = "cms_query"
  override protected def nullSafeEval(sk: Any, item: Any): Any =
    SketchRuntime.cmsQuery(sk.asInstanceOf[InternalRow], item.asInstanceOf[UTF8String], d, w)
  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
      : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode = {
    val rt = SketchRuntime.getClass.getName.stripSuffix("$")
    defineCodeGen(ctx, ev, (s, it) => s"$rt.cmsQuery($s, $it, $d, $w)")
  }
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): CmsQuery =
    copy(left = newLeft, right = newRight)
}

/** Column API + SQL builder for the sketch aggregates. */
object Sketch {
  def heavyHitters(item: Column, k: Int): Column =
    ColumnBridge.column(HeavyHitters(ColumnBridge.expression(item), k)
      .toAggregateExpression())

  def cmsSketch(item: Column, d: Int, w: Int): Column =
    ColumnBridge.column(CmsSketch(ColumnBridge.expression(item), d, w)
      .toAggregateExpression())

  def cmsQuery(sketch: Column, item: Column, d: Int, w: Int): Column =
    ColumnBridge.column(CmsQuery(
      ColumnBridge.expression(sketch), ColumnBridge.expression(item), d, w))

  private[functions] def heavyHittersBuilder(children: Seq[Expression]): Expression = {
    if (children.length != 2)
      throw new IllegalArgumentException(
        s"heavy_hitters expects 2 arguments, got ${children.length}")
    val kExpr = children(1)
    if (!kExpr.foldable)
      throw new IllegalArgumentException("heavy_hitters k must be a literal")
    val k = kExpr.eval() match {
      case n: Number => n.intValue()
      case other => throw new IllegalArgumentException(
        s"heavy_hitters k must be an integer literal, got ${if (other == null) "NULL" else other}")
    }
    HeavyHitters(children.head, k)
  }

  private def intLit(e: Expression, what: String): Int = {
    if (!e.foldable)
      throw new IllegalArgumentException(s"$what must be a literal")
    e.eval() match {
      case n: Number => n.intValue()
      case other => throw new IllegalArgumentException(
        s"$what must be an integer literal, got ${if (other == null) "NULL" else other}")
    }
  }

  private[functions] def cmsSketchBuilder(children: Seq[Expression]): Expression = {
    if (children.length != 3)
      throw new IllegalArgumentException(
        s"cms_sketch expects 3 arguments, got ${children.length}")
    CmsSketch(children.head, intLit(children(1), "cms_sketch d"),
      intLit(children(2), "cms_sketch w"))
  }

  private[functions] def cmsQueryBuilder(children: Seq[Expression]): Expression = {
    if (children.length != 4)
      throw new IllegalArgumentException(
        s"cms_query expects 4 arguments, got ${children.length}")
    CmsQuery(children.head, children(1), intLit(children(2), "cms_query d"),
      intLit(children(3), "cms_query w"))
  }
}
