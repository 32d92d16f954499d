package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native text-fingerprint expressions. The declarative rolling hash
  * (`aggregate` over `transform(split(s, ""), ascii)`) materializes one
  * String object PER CHARACTER and folds through the interpreted
  * lambda evaluator — the worst per-byte cost in the text ops. The
  * native fold is a primitive loop; upstream normalization
  * (lower/trim/regexp_replace) stays in codegen'd built-ins, so the
  * expression only replaces the fold itself.
  */
object TextRuntime {

  /** Rabin-Karp rolling hash, base 31, mod 2^31-1, over UTF-16 code
    * units — identical to folding pmod(acc*31 + ascii(ch), m) over
    * split(s, "") for BMP text (the declarative reference the spec
    * compares against).
    */
  def rollingHash(s: UTF8String): Long = {
    val str = s.toString
    val m = 2147483647L
    var acc = 0L
    var i = 0
    while (i < str.length) {
      acc = java.lang.Math.floorMod(acc * 31L + str.charAt(i).toLong, m)
      i += 1
    }
    acc
  }
}

/** rolling_hash64(text): order-sensitive content fingerprint. */
case class RollingHash64(child: Expression) extends UnaryExpression with ExpectsInputTypes {
  override def inputTypes = Seq(StringType)
  override def dataType: DataType = LongType
  override def prettyName: String = "rolling_hash64"
  override protected def nullSafeEval(input: Any): Any =
    TextRuntime.rollingHash(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val rt = TextRuntime.getClass.getName.stripSuffix("$")
    defineCodeGen(ctx, ev, c => s"$rt.rollingHash($c)")
  }
  override protected def withNewChildInternal(newChild: Expression): RollingHash64 =
    copy(child = newChild)
}

object TextOps {
  def rollingHash64(s: Column): Column =
    ColumnBridge.column(RollingHash64(ColumnBridge.expression(s)))

  private[functions] def rollingHash64Builder(children: Seq[Expression]): Expression = {
    if (children.length != 1)
      throw new IllegalArgumentException(s"rolling_hash64 expects 1 argument, got ${children.length}")
    RollingHash64(children.head)
  }
}
