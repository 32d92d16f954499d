package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkTestBase

class CorpusPipelineSpec extends SparkTestBase {

  test("prepare: dedups, filters low-quality, redacts, splits — deterministically") {
    import spark.implicits._
    val docs = Seq(
      (1L, "The quick brown fox jumps over the lazy dog near 12345 Main St", 62L),
      (2L, "the  QUICK brown fox jumps over the lazy dog near 12345 main st", 64L), // dup of 1, higher score
      (3L, "spam spam spam spam spam spam", 30L), // top_token_frac = 1.0 -> filtered
      (4L, "too few", 7L), // 2 tokens -> filtered
      (5L, "Contact alice@example.org for a completely different document entirely", 70L)
    ).toDF("doc_id", "text", "n_chars")
    val out = CorpusPipeline.prepare(docs, col("doc_id"), col("text"), col("n_chars"))
      .orderBy("doc_id").collect()
    // doc 2 beats its duplicate 1 on score; 3 and 4 fail quality
    assert(out.map(_.getLong(0)).toSeq == Seq(2L, 5L))
    val r5 = out.find(_.getLong(0) == 5L).get
    assert(r5.getAs[String]("redacted").contains("<EMAIL>"))
    assert(r5.getAs[String]("redacted") ==
      "Contact <EMAIL> for a completely different document entirely")
    val r2 = out.find(_.getLong(0) == 2L).get
    assert(r2.getAs[String]("redacted").contains("<NUM> main st"))
    assert(Set("train", "val", "test")(r2.getAs[String]("split")))
    // identical on a second run (pure function of input)
    val again = CorpusPipeline.prepare(docs, col("doc_id"), col("text"), col("n_chars"))
      .orderBy("doc_id").collect()
    assert(out.map(_.toString).toSeq == again.map(_.toString).toSeq)
  }

  test("prepareLines: cap drops late docs per source, line dedup feeds packing") {
    import spark.implicits._
    val docs = Seq(
      (0L, "alpha beta\nshared one two", "s1"),
      (1L, "shared one two\ngamma delta", "s1"),   // loses its shared line to doc 0
      (2L, "epsilon zeta", "s1"),                   // capped away (3rd doc of s1)
      (3L, "shared one two", "s2")                  // line gone -> 0 kept -> dropped
    ).toDF("doc_id", "text", "source")
    val out = CorpusPipeline.prepareLines(docs, col("doc_id"), col("text"), col("source"),
      capPerSource = 2, minKeptLines = 1L, capacity = 4L, nShards = 1)
      .orderBy("doc_id")
      .select("doc_id", "bin", "start_tok", "n_tokens")
      .as[(Long, Long, Long, Long)].collect().toSeq
    // doc 0 keeps both lines (5 tokens); doc 1 keeps "gamma delta" (2)
    assert(out == Seq((0L, 0L, 0L, 5L), (1L, 1L, 5L, 2L)))
  }

  test("prepareFuzzy: near-dup component collapses to its best-scored representative") {
    import spark.implicits._
    val docs = Seq(
      // 1-2-3 chain by one-word edits (1~2 and 2~3 high jaccard); 3 has
      // the best score so it represents the whole component
      (1L, "alpha beta gamma delta epsilon zeta eta theta", 10L),
      (2L, "alpha beta gamma delta epsilon zeta eta iota", 20L),
      (3L, "alpha beta gamma delta epsilon zeta eta kappa", 30L),
      (4L, "a completely unrelated document about something else entirely", 5L))
      .toDF("doc_id", "text", "score")
      .withColumn("lang", lit("en")).withColumn("n_chars", length(col("text")))
    val out = CorpusPipeline.prepareFuzzy(docs,
      col("doc_id"), col("text"), col("lang"), col("n_chars"), col("score"),
      jaccardThreshold = 0.5, bucketWidth = 1000)
      .orderBy("doc_id")
      .select("doc_id", "n_members").as[(Long, Long)].collect().toSeq
    assert(out == Seq((3L, 3L), (4L, 1L)))
  }
}
