package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Greedy longest-match-first segmentation against a fixed vocabulary
  * — WordPiece INFERENCE (Schuster & Nakajima 2012; the BERT
  * tokenizer's apply step, sans the `##` continuation markup, matching
  * this engine's marker-free BPE convention): at each position take
  * the LONGEST vocabulary piece that matches, advance past it, repeat.
  * No backtracking — a vocabulary that contains every single character
  * of its training corpus (which [[graft.operators.Training
  * .trainWordPiece]]'s vocab always does) can never strand the scan on
  * in-corpus text; a word containing a character absent from the
  * vocabulary returns the EMPTY array (never null), the
  * [[UnigramSegment]] unseen-text convention.
  *
  * Deterministic by construction (longest match is unique — one
  * substring per length), so cross-engine reproducible with no
  * tie-break glue at all.
  */
object WordPieceRuntime {
  def segment(word: UTF8String,
      vocab: java.util.HashSet[String],
      maxLen: Int): ArrayData = {
    val s = word.toString
    val L = s.length
    if (L == 0) return new GenericArrayData(Array.empty[Any])
    val out = new scala.collection.mutable.ArrayBuffer[Any](4)
    var i = 0
    while (i < L) {
      var l = math.min(maxLen, L - i)
      var found = 0
      while (l >= 1 && found == 0) {
        if (vocab.contains(s.substring(i, i + l))) found = l
        l -= 1
      }
      if (found == 0) return new GenericArrayData(Array.empty[Any])
      out += UTF8String.fromString(s.substring(i, i + found))
      i += found
    }
    new GenericArrayData(out.toArray)
  }
}

/** wordpiece_segment(word): array<string> — the vocabulary is bound at
  * CONSTRUCTION ([[UnigramSegment]]'s model-as-reference-object
  * pattern): driver-bounded model state ships to executors once, and
  * segmentation is a map-only codegen'd projection with zero joins.
  */
case class WordPieceSegment(child: Expression, vocab: Seq[String])
    extends UnaryExpression with ExpectsInputTypes {
  require(vocab.distinct.size == vocab.size, "wordpiece_segment: duplicate pieces")

  @transient private lazy val vocabSet: java.util.HashSet[String] = {
    val s = new java.util.HashSet[String](vocab.length * 2)
    vocab.foreach(s.add)
    s
  }
  private val maxLen: Int =
    if (vocab.isEmpty) 1 else vocab.iterator.map(_.length).max.max(1)

  override def inputTypes = Seq(StringType)
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "wordpiece_segment"
  override protected def nullSafeEval(input: Any): Any =
    WordPieceRuntime.segment(input.asInstanceOf[UTF8String], vocabSet, maxLen)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val rt = WordPieceRuntime.getClass.getName.stripSuffix("$")
    val v = ctx.addReferenceObj("wordpieceVocab", vocabSet, "java.util.HashSet")
    defineCodeGen(ctx, ev, c => s"$rt.segment($c, $v, $maxLen)")
  }
  override protected def withNewChildInternal(newChild: Expression): WordPieceSegment =
    copy(child = newChild)
}

object WordPieceOps {
  def wordpieceSegment(word: Column, vocab: Seq[String]): Column =
    ColumnBridge.column(WordPieceSegment(ColumnBridge.expression(word), vocab))
}
