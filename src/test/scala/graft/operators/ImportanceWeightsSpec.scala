package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkTestBase

class ImportanceWeightsSpec extends SparkTestBase {

  // Corpus: d0 (target) "cat cat dog", d1 "dog dog fish".
  // Counts: cat src 2 tgt 2; dog src 3 tgt 1; fish src 1 tgt 0.
  // vocab (top-2 by src): dog (3), cat (2). totals: src 5, tgt 3.
  // r(dog) = ((1+1)*5*10000) div ((3+1)*3) = 100000 div 12 = 8333
  // r(cat) = ((2+1)*5*10000) div ((2+1)*3) = 150000 div 9 = 16666
  // d0: tokens cat,cat,dog -> n=3, in_vocab=3, sum=16666*2+8333=41665, mean=13888
  // d1: dog,dog,fish -> n=3, in_vocab=2, sum=16666, mean=5555
  test("importanceWeights: hand-computed ratios, OOV scores zero") {
    import spark.implicits._
    val df = Seq(
      (0L, "cat cat dog", "en"),
      (1L, "dog dog fish", "de")).toDF("doc_id", "text", "lang")
    val out = Sampling.importanceWeights(df, col("doc_id"), col("text"),
      col("lang") === "en", vocabSize = 2)
      .orderBy("doc_id")
      .as[(Long, Long, Long, Long, Long)].collect().toSeq
    assert(out == Seq(
      (0L, 3L, 3L, 41665L, 13888L),
      (1L, 3L, 2L, 16666L, 5555L)))
  }

  test("importanceWeights: target docs outscore off-domain docs") {
    import spark.implicits._
    // target speaks "alpha beta", the rest speak "gamma delta"
    val rows = (0L until 40L).map { i =>
      if (i < 10) (i, "alpha beta alpha beta", "en")
      else (i, "gamma delta gamma delta", "de")
    }
    val df = rows.toDF("doc_id", "text", "lang")
    val out = Sampling.importanceWeights(df, col("doc_id"), col("text"),
      col("lang") === "en", vocabSize = 10)
      .select("doc_id", "importance_mean")
      .as[(Long, Long)].collect().toMap
    val tgtMean = out(0L)
    val offMean = out(20L)
    assert(tgtMean > offMean,
      s"target doc scored $tgtMean, off-domain $offMean")
    // all target docs identical; all off-domain identical
    assert((0L until 10L).forall(out(_) == tgtMean))
    assert((10L until 40L).forall(out(_) == offMean))
  }
}
