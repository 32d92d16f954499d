package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
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

/** Column API + SQL builder for the sketch aggregates. */
object Sketch {
  def heavyHitters(item: Column, k: Int): Column =
    ColumnBridge.column(HeavyHitters(ColumnBridge.expression(item), k)
      .toAggregateExpression())

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
}
