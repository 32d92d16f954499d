package graft.functions

import org.apache.spark.sql.functions._
import graft.SparkTestBase

class MultiPatternSpec extends SparkTestBase {

  private def count(text: String, patterns: Seq[String]): Long =
    new AcAutomaton(patterns).countAll(
      org.apache.spark.unsafe.types.UTF8String.fromString(text))

  test("AcAutomaton: hand-checked counts incl. overlaps and nested suffixes") {
    // self-overlapping pattern: "aa" in "aaaa" -> 3 end positions
    assert(count("aaaa", Seq("aa")) == 3L)
    // suffix pattern fires inside a longer match: she@0, he@1, he@9
    assert(count("she said he did", Seq("she", "he")) == 3L)
    // "ushers" classic: he, she, his, hers -> he@4, she@4, hers@6
    assert(count("ushers", Seq("he", "she", "his", "hers")) == 3L)
    // multi-word phrase matching crosses token boundaries
    assert(count("a fast table is a fast table", Seq("fast table")) == 2L)
    // no match
    assert(count("nothing here", Seq("zzz")) == 0L)
    // empty text
    assert(count("", Seq("x")) == 0L)
  }

  test("AcAutomaton: agrees with brute-force scan on random text") {
    val rnd = new scala.util.Random(7)
    val pats = Seq("ab", "aba", "ba", "bab", "aaa", "c")
    for (_ <- 0 until 50) {
      val s = (0 until 60).map(_ => "abc" (rnd.nextInt(3))).mkString
      val brute = pats.map { p =>
        (0 to s.length - p.length).count(i => s.regionMatches(i, p, 0, p.length)).toLong
      }.sum
      assert(count(s, pats) == brute, s"text=$s")
    }
  }

  test("multiPatternFilter: codegen path over a DataFrame, threshold splits") {
    import spark.implicits._
    val df = Seq(
      (0L, "clean doc"),
      (1L, "one slow phrase"),
      (2L, "slow slow fast table")).toDF("doc_id", "text")
    val out = graft.operators.TextAnalysis.multiPatternFilter(
      df, col("doc_id"), col("text"), Seq("slow", "fast table"), maxMatches = 1L)
      .orderBy("doc_id").as[(Long, Long, Boolean)].collect().toSeq
    assert(out == Seq((0L, 0L, true), (1L, 1L, true), (2L, 3L, false)))
  }
}
