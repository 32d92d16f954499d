package graft.functions

import org.apache.spark.unsafe.types.UTF8String
import org.scalacheck.{Gen, Properties}
import org.scalacheck.Prop.forAll

/** Property tests for the single-pass [[TextRuntime.termFreqs]] scan
  * against an independent split-based reference: the scan must agree
  * with `String.split` on the exact `\s` regex class for arbitrary
  * text, including Unicode spaces that Java's `\s` does NOT treat as
  * whitespace (NBSP etc. must stay inside tokens).
  */
object TermFreqsProps extends Properties("TermFreqs") {

  // alphabet stresses the contract: ASCII ws, the vertical tab /
  // form feed edge chars, a non-breaking space (NOT \s), multi-char
  // tokens that collide on prefixes
  private val emoji = new String(Character.toChars(0x1F600)) // surrogate pair
  private val chunk = Gen.oneOf(
    "a", "b", "ab", "ba", "aa", " ", "\t", "\n", "\u000B", "\f", "\r",
    "\u00A0", "é", "  ", "a a", emoji, emoji + "a")
  private val textGen = Gen.listOf(chunk).map(_.mkString)
  private val termsGen = Gen.pick(3, Seq("a", "b", "ab", "aa", "ba", "\u00A0", "é", emoji))
    .map(_.toSeq)

  private def reference(s: String, terms: Seq[String]): (Long, Seq[Long]) = {
    val toks = s.split("\\s+").filter(_.nonEmpty).toSeq
    (toks.length.toLong, terms.map(t => toks.count(_ == t).toLong))
  }

  property("agrees with the split-based reference on arbitrary text") =
    forAll(textGen, termsGen) { (s, terms) =>
      val row = TextRuntime.termFreqs(UTF8String.fromString(s), terms.toArray)
      val dl = row.getLong(0)
      val tfs = row.getArray(1)
      val got = (dl, terms.indices.map(tfs.getLong))
      got == reference(s, terms)
    }

  property("sum of tfs never exceeds dl") =
    forAll(textGen, termsGen) { (s, terms) =>
      val row = TextRuntime.termFreqs(UTF8String.fromString(s), terms.distinct.toArray)
      val tfs = row.getArray(1)
      terms.distinct.indices.map(tfs.getLong).sum <= row.getLong(0)
    }
}
