package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{DataType, LongType}

/** Z-order (Morton) interleaving for multi-dimensional data layout.
  *
  * Writing a 100 TB table sorted by ONE column gives min/max zone-map
  * pruning on that column only; sorting by the Morton interleave of
  * two columns gives useful pruning on BOTH — each file's z-range maps
  * to a small rectangle in (x, y) space, so a predicate on either
  * dimension skips most files. This is the standard lakehouse
  * clustering trick (Delta/Iceberg `ZORDER BY`), expressed here as a
  * plain codegen'd expression feeding `repartitionByRange` +
  * per-partition sort, so the engine's writer needs no special
  * support.
  */
object LayoutRuntime {

  /** Bit-spread the low 31 bits of x to even bit positions (the
    * classic 64-bit magic-mask chain). Inputs are masked to 31 bits so
    * the interleaved result (≤ 62 bits, plus one shift) always stays a
    * positive long — no sign surprises on either engine.
    */
  def spread31(v: Long): Long = {
    var x = v & 0x7fffffffL
    x = (x | (x << 16)) & 0x0000ffff0000ffffL
    x = (x | (x << 8)) & 0x00ff00ff00ff00ffL
    x = (x | (x << 4)) & 0x0f0f0f0f0f0f0f0fL
    x = (x | (x << 2)) & 0x3333333333333333L
    x = (x | (x << 1)) & 0x5555555555555555L
    x
  }

  /** Morton code of (x, y): x's bits at even positions, y's at odd. */
  def interleave2(x: Long, y: Long): Long =
    spread31(x) | (spread31(y) << 1)
}

/** zorder2(x, y): 62-bit Morton code over the low 31 bits of two
  * bigint columns — one straight-line codegen'd bit chain per row,
  * replicable in plain SQL (shift/mask arithmetic) for oracle parity.
  */
case class ZOrder2(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes {
  override def inputTypes = Seq(LongType, LongType)
  override def dataType: DataType = LongType
  override def prettyName: String = "zorder2"
  override protected def nullSafeEval(x: Any, y: Any): Any =
    LayoutRuntime.interleave2(x.asInstanceOf[Long], y.asInstanceOf[Long])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val rt = LayoutRuntime.getClass.getName.stripSuffix("$")
    defineCodeGen(ctx, ev, (a, b) => s"$rt.interleave2($a, $b)")
  }
  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): ZOrder2 =
    copy(left = newLeft, right = newRight)
}

object LayoutOps {
  def zorder2(x: Column, y: Column): Column =
    ColumnBridge.column(ZOrder2(ColumnBridge.expression(x), ColumnBridge.expression(y)))

  private[functions] def zorder2Builder(children: Seq[Expression]): Expression = {
    if (children.length != 2)
      throw new IllegalArgumentException(s"zorder2 expects 2 arguments, got ${children.length}")
    ZOrder2(children.head, children(1))
  }
}
