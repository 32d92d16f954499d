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

  test("hashedImportanceWeights: target bigram docs outrank and fill the resample cut") {
    import spark.implicits._
    // target speaks the bigram "alpha beta"; off-domain "gamma delta"
    val rows = (0L until 40L).map { i =>
      if (i < 10) (i, "alpha beta alpha beta", "en")
      else (i, "gamma delta gamma delta", "de")
    }
    val df = rows.toDF("doc_id", "text", "lang")
    val out = Sampling.hashedImportanceWeights(df, col("doc_id"), col("text"),
      col("lang") === "en", nBuckets = 64, selectN = 10)
      .select("doc_id", "importance_mean", "selected")
      .as[(Long, Long, Boolean)].collect()
    assert(out.length == 40)
    val sel = out.filter(_._3).map(_._1).toSet
    assert(sel == (0L until 10L).toSet,
      s"resample cut must pick exactly the target-bigram docs, got $sel")
    val tgt = out.filter(_._1 < 10).map(_._2).toSet
    val off = out.filter(_._1 >= 10).map(_._2).toSet
    assert(tgt.size == 1 && off.size == 1 && tgt.head > off.head)
  }

  test("hashedImportanceWeights: zero-bigram docs score zero and survive with the flag off") {
    import spark.implicits._
    val df = Seq(
      (0L, "alpha beta gamma", "en"),
      (1L, "single", "en"),   // one token -> no bigram
      (2L, "", "de")          // empty text
    ).toDF("doc_id", "text", "lang")
    val out = Sampling.hashedImportanceWeights(df, col("doc_id"), col("text"),
      col("lang") === "en", nBuckets = 16, selectN = 1)
      .orderBy("doc_id")
      .select("doc_id", "n_feats", "importance_sum", "importance_mean", "selected")
      .as[(Long, Long, Long, Long, Boolean)].collect().toSeq
    assert(out.map(r => (r._1, r._2)) == Seq((0L, 2L), (1L, 0L), (2L, 0L)))
    assert(out.filter(_._2 == 0L).forall(r => r._3 == 0L && r._4 == 0L && !r._5))
    assert(out.count(_._5) == 1 && out.head._5)
  }

  test("hashedImportanceWeights is invariant to input partitioning") {
    import spark.implicits._
    val rows = (0L until 30L).map(i =>
      (i, s"tok${i % 5} tok${(i + 1) % 7} tok${i % 3} tail", if (i % 4 == 0) "en" else "de"))
    val df = rows.toDF("doc_id", "text", "lang")
    def sig(d: org.apache.spark.sql.DataFrame) =
      d.orderBy("doc_id").collect().map(_.toString).toSeq
    val a = sig(Sampling.hashedImportanceWeights(df, col("doc_id"), col("text"),
      col("lang") === "en", nBuckets = 32, selectN = 7))
    val b = sig(Sampling.hashedImportanceWeights(df.repartition(11), col("doc_id"), col("text"),
      col("lang") === "en", nBuckets = 32, selectN = 7))
    assert(a == b)
  }

  test("dsirScoreAgainst: micro-batch splits score identically to one pass (q274's contract)") {
    import spark.implicits._
    val docs = (0L until 40L).map(i =>
      (i, s"alpha beta gamma token$i delta epsilon token${i % 7}", if (i % 3 == 0) "en" else "de"))
      .toDF("doc_id", "text", "lang")
    val ratio = Sampling.hashedBigramRatio(
      docs, col("text"), col("lang") === "en", nBuckets = 32, scale = 10000L)
    def rows(df: org.apache.spark.sql.DataFrame) =
      Sampling.dsirScoreAgainst(df, col("doc_id"), col("text"), ratio, nBuckets = 32)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
        .sortBy(_._1).toSeq
    val onePass = rows(docs)
    val split = (rows(docs.where(col("doc_id") < 13)) ++
      rows(docs.where(col("doc_id") >= 13 && col("doc_id") < 29)) ++
      rows(docs.where(col("doc_id") >= 29))).sortBy(_._1)
    assert(onePass == split, "per-batch scoring must equal the one-pass scorer")
    // refactor guard: ratio + score + select == the original one-call form
    val composed = Sampling.dsirSelect(
        Sampling.dsirScoreAgainst(docs, col("doc_id"), col("text"), ratio, 32), 10)
      .orderBy("doc_id").collect().map(_.toString).toSeq
    val oneCall = Sampling.hashedImportanceWeights(docs, col("doc_id"), col("text"),
        col("lang") === "en", nBuckets = 32, scale = 10000L, selectN = 10)
      .orderBy("doc_id").collect().map(_.toString).toSeq
    assert(composed == oneCall)
  }
}
