package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream}

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, Literal}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{BinaryType, BooleanType, DataType, LongType}
import org.apache.spark.util.sketch.BloomFilter

/** bloom_might_contain(h, filter): membership probe of a 64-bit hash
  * against a serialized `org.apache.spark.util.sketch.BloomFilter`
  * (the sketch behind `df.stat.bloomFilter` and Spark's own runtime
  * row-level filtering).
  *
  * Why an expression and not a join: a decontamination prefilter wants
  * "does this document share ANY shingle with the benchmark set"
  * answered inside the corpus scan — `exists(shingle_hashes(text),
  * h -> bloom_might_contain(h, filter))` is map-only, so the corpus
  * never explodes and never shuffles; only probe hits continue to the
  * exact verify join. A broadcast hash join can do the same prefilter,
  * but costs 8+ bytes per distinct item in the hash table vs ~1.2
  * bytes at 1% fpp here — at a 10^9-shingle benchmark suite that is
  * the difference between "fits on every executor" and not.
  *
  * The filter argument must be a foldable BinaryType (a literal): it
  * is deserialized ONCE per expression instance (driver + each
  * executor after plan ship), not per row. No false negatives ever;
  * false positives at the configured fpp — callers either accept
  * over-matching (prefilter + exact verify) or size fpp accordingly.
  */
case class BloomMightContain(left: Expression, right: Expression) extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType != LongType)
      TypeCheckResult.TypeCheckFailure(
        s"bloom_might_contain requires a BIGINT probe value, got ${left.dataType.sql}")
    else if (right.dataType != BinaryType || !right.foldable)
      TypeCheckResult.TypeCheckFailure(
        "bloom_might_contain requires a foldable BINARY serialized filter as its second argument")
    else if (right.eval(InternalRow.empty) == null)
      // fail at analysis, not as an NPE inside the first task's
      // lazy deserialization
      TypeCheckResult.TypeCheckFailure(
        "bloom_might_contain filter must not be null")
    else TypeCheckResult.TypeCheckSuccess

  override def dataType: DataType = BooleanType
  override def prettyName: String = "bloom_might_contain"

  // Deserialized once per task after plan ship; the serialized bytes
  // travel inside the expression tree (a binary literal), which Spark
  // ships once per stage like any other plan constant.
  @transient lazy val bloom: BloomFilter = {
    val bytes = right.eval(InternalRow.empty).asInstanceOf[Array[Byte]]
    BloomFilter.readFrom(new ByteArrayInputStream(bytes))
  }

  override def eval(input: InternalRow): Any = {
    val v = left.eval(input)
    if (v == null) null else bloom.mightContainLong(v.asInstanceOf[Long])
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    // reference the DESERIALIZED filter (not this expression): the
    // reference array ships the BloomFilter object itself, so codegen
    // probes it directly with no per-row indirection
    val bf = ctx.addReferenceObj("bloomFilter", bloom, classOf[BloomFilter].getName)
    val c = left.genCode(ctx)
    ev.copy(code = code"""
        ${c.code}
        boolean ${ev.isNull} = ${c.isNull};
        boolean ${ev.value} = false;
        if (!${ev.isNull}) {
          ${ev.value} = $bf.mightContainLong(${c.value});
        }
      """)
  }

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): BloomMightContain =
    copy(left = newLeft, right = newRight)
}

/** Column API + (de)serialization helpers for the bloom probe. */
object BloomOps {

  def serialize(bf: BloomFilter): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    bf.writeTo(bos)
    bos.toByteArray
  }

  /** Probe `value` (BIGINT column) against a serialized filter. */
  def mightContain(value: Column, filterBytes: Array[Byte]): Column =
    ColumnBridge.column(BloomMightContain(
      ColumnBridge.expression(value), Literal(filterBytes, BinaryType)))

  /** SQL builder for function-registry injection. */
  private[functions] def bloomMightContainBuilder(children: Seq[Expression]): Expression = {
    if (children.length != 2)
      throw new IllegalArgumentException(
        s"bloom_might_contain expects 2 arguments, got ${children.length}")
    BloomMightContain(children.head, children(1))
  }
}
