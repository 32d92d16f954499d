package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Aho–Corasick automaton over UTF-16 code units: one linear scan of
  * the text counts ALL occurrences (overlapping included) of every
  * pattern simultaneously. This is the seam the token-level blocklist
  * documents for large lexicons: a 10^5-phrase safety list costs the
  * same single pass as a 3-term one — O(len + matches) per document
  * instead of O(len · patterns) for repeated `contains`, and patterns
  * are SUBSTRINGS (multi-word phrases, no tokenizer dependency).
  *
  * Built once per expression instance per executor (@transient lazy in
  * the expression); the automaton is goto/fail/output with the output
  * counts closed over fail links at build time, so the scan adds
  * `outCount(state)` per position with no link-chasing.
  */
final class AcAutomaton(patterns: Seq[String]) extends Serializable {
  // trie build — per-node char map, then BFS fail links
  private val childMaps = scala.collection.mutable.ArrayBuffer(
    new java.util.HashMap[Character, Integer]())
  private val ends = scala.collection.mutable.ArrayBuffer(0)
  patterns.foreach { p =>
    require(p.nonEmpty, "empty pattern")
    var node = 0
    p.foreach { ch =>
      val m = childMaps(node)
      val nxt = m.get(ch)
      node = if (nxt != null) nxt.intValue()
      else {
        childMaps += new java.util.HashMap[Character, Integer]()
        ends += 0
        m.put(ch, childMaps.size - 1)
        childMaps.size - 1
      }
    }
    ends(node) += 1
  }
  private val n = childMaps.size
  private val fail = new Array[Int](n)
  private val outCount = ends.toArray
  locally {
    val queue = new java.util.ArrayDeque[Integer]()
    childMaps(0).forEach((_, v0) => { fail(v0.intValue()) = 0; queue.add(v0) })
    while (!queue.isEmpty) {
      val u = queue.poll().intValue()
      outCount(u) += outCount(fail(u)) // closure: suffix outputs fold in
      childMaps(u).forEach { (ch, v0) =>
        val v = v0.intValue()
        var f = fail(u)
        while (f != 0 && !childMaps(f).containsKey(ch)) f = fail(f)
        val t = childMaps(f).get(ch)
        fail(v) = if (t != null && t.intValue() != v) t.intValue() else 0
        queue.add(v0)
      }
    }
  }

  /** Total occurrences of all patterns in s (overlapping included). */
  def countAll(s: UTF8String): Long = {
    val str = s.toString
    var state = 0
    var total = 0L
    var i = 0
    while (i < str.length) {
      val ch: Character = str.charAt(i)
      var st = state
      while (st != 0 && !childMaps(st).containsKey(ch)) st = fail(st)
      val nxt = childMaps(st).get(ch)
      state = if (nxt != null) nxt.intValue() else 0
      total += outCount(state)
      i += 1
    }
    total
  }
}

/** multi_pattern_count(text): total occurrence count of a literal
  * pattern list via one Aho–Corasick scan. Patterns ride on the
  * expression (a broadcast-scale model, like the CDC parameters).
  */
case class MultiPatternCount(child: Expression, patterns: Seq[String])
    extends UnaryExpression with ExpectsInputTypes {
  require(patterns.nonEmpty, "multi_pattern_count needs at least one pattern")
  require(patterns.distinct.size == patterns.size, s"duplicate patterns: $patterns")

  @transient private lazy val automaton = new AcAutomaton(patterns)

  override def inputTypes = Seq(StringType)
  override def dataType: DataType = LongType
  override def prettyName: String = "multi_pattern_count"
  override protected def nullSafeEval(input: Any): Any =
    automaton.countAll(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ac = ctx.addReferenceObj("acAutomaton", automaton,
      classOf[AcAutomaton].getName)
    defineCodeGen(ctx, ev, c => s"$ac.countAll($c)")
  }
  override protected def withNewChildInternal(newChild: Expression): MultiPatternCount =
    copy(child = newChild)
}

object MultiPattern {
  def count(text: Column, patterns: Seq[String]): Column =
    ColumnBridge.column(MultiPatternCount(ColumnBridge.expression(text), patterns))
}
