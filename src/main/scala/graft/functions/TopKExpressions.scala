package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._

/** Bounded top-k (score, id) state: a binary heap on parallel arrays
  * with the WORST-ranked entry at the root, so insert-when-better is
  * O(log k) and the state is k pairs regardless of input size.
  * Ranking matches the engine's window convention exactly:
  * score DESC (java.lang.Double.compare total order — NaN greatest,
  * and scores are normalized -0.0 → 0.0 on entry, mirroring Spark's
  * NormalizeFloatingNumbers in sort keys), then id ASC.
  */
final class TopKPairsState(val k: Int) {
  val scores = new Array[Double](k)
  val ids = new Array[Long](k)
  var size = 0

  /** > 0 iff (s1, i1) ranks BETTER than (s2, i2). */
  @inline private def rankCmp(s1: Double, i1: Long, s2: Double, i2: Long): Int = {
    val c = java.lang.Double.compare(s1, s2)
    if (c != 0) c else java.lang.Long.compare(i2, i1)
  }

  @inline private def worseThan(i: Int, j: Int): Boolean =
    rankCmp(scores(i), ids(i), scores(j), ids(j)) < 0

  @inline private def swap(i: Int, j: Int): Unit = {
    val s = scores(i); scores(i) = scores(j); scores(j) = s
    val d = ids(i); ids(i) = ids(j); ids(j) = d
  }

  def insert(score0: Double, id: Long): Unit = {
    val score = if (score0 == 0.0d) 0.0d else score0 // -0.0 -> 0.0
    if (size < k) {
      scores(size) = score; ids(size) = id
      var i = size; size += 1
      // sift up: the root must be the worst
      while (i > 0 && worseThan(i, (i - 1) / 2)) { swap(i, (i - 1) / 2); i = (i - 1) / 2 }
    } else if (k > 0 && rankCmp(score, id, scores(0), ids(0)) > 0) {
      scores(0) = score; ids(0) = id
      // sift down toward the worse child
      var i = 0
      var done = false
      while (!done) {
        val l = 2 * i + 1; val r = l + 1
        var w = i
        if (l < size && worseThan(l, w)) w = l
        if (r < size && worseThan(r, w)) w = r
        if (w == i) done = true else { swap(i, w); i = w }
      }
    }
  }

  /** Entries best-first — (score desc, id asc). */
  def sortedPairs: Array[(Double, Long)] = {
    val out = Array.tabulate(size)(i => (scores(i), ids(i)))
    out.sortWith((a, b) => rankCmp(a._1, a._2, b._1, b._2) > 0)
  }
}

/** topk_pairs(score, id, k): exact bounded top-k per group as a native
  * aggregate — the "aggregate before you shuffle" form of the
  * per-group ranking window (guide §2.3): where
  * `row_number().over(partitionBy(g).orderBy(score.desc, id))` ships
  * EVERY scored row through the exchange and sorts it, this carries at
  * most k pairs per (group × task) through map-side partial
  * aggregation — for a brute-force query×corpus pair web the exchange
  * shrinks ~corpus/k-fold. Output: array<struct<neighbor_id, cos>>
  * best-first, identical content and tie-breaks
  * (score desc, id asc) to the window form — spec-pinned in
  * TopKPairsSpec including boundary ties. NULL score or id rows are
  * ignored.
  */
case class TopKPairs(
    score: Expression,
    id: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[TopKPairsState] with ExpectsInputTypes {

  require(k >= 1, s"topk_pairs k must be >= 1, got $k")

  override def children: Seq[Expression] = Seq(score, id)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): TopKPairs =
    copy(score = newChildren(0), id = newChildren(1))

  override def inputTypes = Seq(DoubleType, LongType)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(
    StructType(Seq(
      StructField("neighbor_id", LongType, nullable = false),
      StructField("cos", DoubleType, nullable = false))),
    containsNull = false)

  override def withNewMutableAggBufferOffset(newOffset: Int): TopKPairs =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): TopKPairs =
    copy(inputAggBufferOffset = newOffset)

  override def createAggregationBuffer(): TopKPairsState = new TopKPairsState(k)

  override def update(state: TopKPairsState, input: InternalRow): TopKPairsState = {
    val s = score.eval(input)
    val i = id.eval(input)
    if (s == null || i == null) return state
    state.insert(s.asInstanceOf[Double], i.asInstanceOf[Long])
    state
  }

  override def merge(a: TopKPairsState, b: TopKPairsState): TopKPairsState = {
    var i = 0
    while (i < b.size) { a.insert(b.scores(i), b.ids(i)); i += 1 }
    a
  }

  override def eval(state: TopKPairsState): Any =
    new GenericArrayData(state.sortedPairs.map { case (s, i) => InternalRow(i, s) })

  override def serialize(state: TopKPairsState): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(state.size)
    var i = 0
    while (i < state.size) {
      out.writeDouble(state.scores(i)); out.writeLong(state.ids(i)); i += 1
    }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): TopKPairsState = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val n = in.readInt()
    val state = new TopKPairsState(k)
    var i = 0
    while (i < n) { state.insert(in.readDouble(), in.readLong()); i += 1 }
    state
  }

  override def prettyName: String = "topk_pairs"
}

/** Column API for the bounded top-k aggregate. */
object TopK {
  def pairs(score: Column, id: Column, k: Int): Column =
    ColumnBridge.column(TopKPairs(
      ColumnBridge.expression(score), ColumnBridge.expression(id), k)
      .toAggregateExpression())
}
