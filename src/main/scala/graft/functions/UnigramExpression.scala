package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Viterbi segmentation under an integer unigram piece model — the
  * E-step kernel of [[graft.operators.Training.trainUnigramLm]]'s
  * hard-EM loop. For one word, among all ways to tile it with model
  * pieces, picks the segmentation minimizing
  *
  *   (piece count ASC, total piece score DESC, space-joined
  *    segmentation string ASC)
  *
  * — fully deterministic, no float log-probs anywhere (the engine's
  * integer-exact variant of SentencePiece's Viterbi E-step; real
  * SentencePiece maximizes Σ log p, this maximizes coverage-per-piece
  * with frequency as the tiebreak). The string tiebreak is total-order
  * glue: two optimal candidates with equal piece counts produce
  * equal-length joined strings, so Java's UTF-16 comparison matches
  * DuckDB's UTF-8 byte order on ASCII vocabularies (the oracle
  * contract; segmentation of supplementary-plane text is deterministic
  * per engine but not cross-checked).
  *
  * The DP keeps one best (count, score, string) per word position;
  * prefix-optimality holds because counts and scores are additive and
  * equal-(count, score) prefixes extend with the SAME optimal suffix,
  * so the lexicographically smaller prefix stays smaller.
  *
  * Unsegmentable words (a character absent from the model — possible
  * only when applying a trained model to unseen text, since training
  * always seeds all single characters) and empty words return the
  * EMPTY array, never null, so downstream explode simply drops them.
  */
object UnigramRuntime {
  def segment(word: UTF8String,
      model: java.util.HashMap[String, java.lang.Long],
      maxLen: Int): ArrayData = {
    val s = word.toString
    val L = s.length
    if (L == 0) return new GenericArrayData(Array.empty[Any])
    val np = new Array[Int](L + 1)
    val sc = new Array[Long](L + 1)
    val seg = new Array[String](L + 1)
    seg(0) = ""
    var j = 1
    while (j <= L) {
      var bestNp = Int.MaxValue
      var bestSc = 0L
      var bestSeg: String = null
      val lim = math.min(maxLen, j)
      var l = 1
      while (l <= lim) {
        val i = j - l
        if (seg(i) != null) {
          val piece = s.substring(i, j)
          val v = model.get(piece)
          if (v != null) {
            val cnp = np(i) + 1
            val csc = sc(i) + v.longValue()
            val cseg = if (i == 0) piece else seg(i) + " " + piece
            if (bestSeg == null || cnp < bestNp ||
                (cnp == bestNp && (csc > bestSc ||
                  (csc == bestSc && cseg.compareTo(bestSeg) < 0)))) {
              bestNp = cnp; bestSc = csc; bestSeg = cseg
            }
          }
        }
        l += 1
      }
      if (bestSeg != null) { np(j) = bestNp; sc(j) = bestSc; seg(j) = bestSeg }
      j += 1
    }
    if (seg(L) == null) return new GenericArrayData(Array.empty[Any])
    val parts = seg(L).split(" ")
    new GenericArrayData(parts.map(p => UTF8String.fromString(p): Any))
  }
}

/** unigram_segment(word): array<string> — the model (piece → integer
  * score) is bound at CONSTRUCTION, like [[TermFreqs]]' term list: the
  * trained vocabulary is driver-bounded model state, shipped to
  * executors as one codegen reference object, so scoring is a map-only
  * projection with zero joins or broadcasts in the plan.
  */
case class UnigramSegment(child: Expression, pieces: Seq[String], scores: Seq[Long])
    extends UnaryExpression with ExpectsInputTypes {
  require(pieces.length == scores.length,
    s"unigram_segment: ${pieces.length} pieces vs ${scores.length} scores")
  require(pieces.distinct.size == pieces.size, "unigram_segment: duplicate pieces")

  @transient private lazy val model: java.util.HashMap[String, java.lang.Long] = {
    val m = new java.util.HashMap[String, java.lang.Long](pieces.length * 2)
    pieces.iterator.zip(scores.iterator).foreach { case (p, s) => m.put(p, s) }
    m
  }
  private val maxLen: Int =
    if (pieces.isEmpty) 1 else pieces.iterator.map(_.length).max.max(1)

  override def inputTypes = Seq(StringType)
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "unigram_segment"
  override protected def nullSafeEval(input: Any): Any =
    UnigramRuntime.segment(input.asInstanceOf[UTF8String], model, maxLen)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val rt = UnigramRuntime.getClass.getName.stripSuffix("$")
    val m = ctx.addReferenceObj("unigramModel", model, "java.util.HashMap")
    defineCodeGen(ctx, ev, c => s"$rt.segment($c, $m, $maxLen)")
  }
  override protected def withNewChildInternal(newChild: Expression): UnigramSegment =
    copy(child = newChild)
}

object UnigramOps {
  def unigramSegment(word: Column, pieces: Seq[String], scores: Seq[Long]): Column =
    ColumnBridge.column(UnigramSegment(ColumnBridge.expression(word), pieces, scores))
}
