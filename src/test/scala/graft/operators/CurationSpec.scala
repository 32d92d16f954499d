package graft.operators

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.SparkTestBase

class CurationSpec extends SparkTestBase {

  test("selectTokenBudget equals the single-window global reference, tie-heavy scores") {
    import spark.implicits._
    val rnd = new scala.util.Random(19)
    val docs = (0L until 300L).map { i =>
      (i, ("tok " * (1 + rnd.nextInt(12))).trim, (rnd.nextInt(4)).toLong)
    }.toDF("doc_id", "text", "score")
    def reference(budget: Long): Seq[(Long, Long, Long, Long)] = {
      val n = docs.select(col("doc_id"), col("score"),
        TextAnalysis.tokenCount(col("text")).cast("long").as("n"))
      val w = Window.orderBy(col("score").desc, col("doc_id").asc)
        .rowsBetween(Window.unboundedPreceding, 0)
      n.withColumn("cum", sum("n").over(w))
        .where(col("cum") <= budget)
        .select("doc_id", "score", "n", "cum")
        .as[(Long, Long, Long, Long)].collect().toSeq.sortBy(_._1)
    }
    for (budget <- Seq(0L, 1L, 50L, 500L, 1500L, 100000L); shards <- Seq(2, 5)) {
      val got = Curation.selectTokenBudget(docs, col("doc_id"), col("text"),
          col("score"), budget, nShards = shards)
        .as[(Long, Long, Long, Long)].collect().toSeq.sortBy(_._1)
      assert(got == reference(budget), s"budget=$budget shards=$shards")
    }
  }

  test("selectTokenBudget: selection is partitioning-independent") {
    import spark.implicits._
    val docs = (0L until 200L).map(i => (i, ("w " * (1 + (i % 9).toInt)).trim, i % 3))
    val a = Curation.selectTokenBudget(docs.toDF("doc_id", "text", "score"),
      col("doc_id"), col("text"), col("score"), 400L, 4)
      .orderBy("doc_id").collect().toSeq
    val b = Curation.selectTokenBudget(docs.toDF("doc_id", "text", "score").repartition(17),
      col("doc_id"), col("text"), col("score"), 400L, 4)
      .orderBy("doc_id").collect().toSeq
    assert(a == b && a.nonEmpty)
  }

  test("selectTokenBudget: skinny exchanges, text never shuffles") {
    import spark.implicits._
    val docs = (0L until 100L).map(i => (i, "some text here", i % 5)).toDF("doc_id", "text", "score")
    val out = Curation.selectTokenBudget(docs, col("doc_id"), col("text"), col("score"), 100L, 4)
    val cols = Scale.shuffleOutputColumns(out)
    assert(cols.forall(c => !c.contains("text")),
      s"text rode an exchange: $cols")
  }

  test("selectTokenBudgetPerGroup equals the per-group single-window reference") {
    import spark.implicits._
    val rnd = new scala.util.Random(29)
    val docs = (0L until 400L).map { i =>
      (i, ("tok " * (1 + rnd.nextInt(12))).trim, rnd.nextInt(4).toLong,
        s"g${rnd.nextInt(7)}")
    }.toDF("doc_id", "text", "score", "grp")
    def reference(budget: Long): Seq[(String, Long, Long, Long, Long)] = {
      val n = docs.select(col("grp"), col("doc_id"), col("score"),
        TextAnalysis.tokenCount(col("text")).cast("long").as("n"))
      val w = Window.partitionBy("grp").orderBy(col("score").desc, col("doc_id").asc)
        .rowsBetween(Window.unboundedPreceding, 0)
      n.withColumn("cum", sum("n").over(w))
        .where(col("cum") <= budget)
        .select("grp", "doc_id", "score", "n", "cum")
        .as[(String, Long, Long, Long, Long)].collect().toSeq.sortBy(r => (r._1, r._2))
    }
    for (budget <- Seq(0L, 1L, 40L, 300L, 100000L); shards <- Seq(2, 5)) {
      val got = Curation.selectTokenBudgetPerGroup(docs, col("doc_id"), col("text"),
          col("score"), col("grp"), budget, nShards = shards)
        .as[(String, Long, Long, Long, Long)].collect().toSeq.sortBy(r => (r._1, r._2))
      assert(got == reference(budget), s"budget=$budget shards=$shards")
    }
  }

  test("selectTokenBudgetPerGroup: one group's budget never leaks into another") {
    import spark.implicits._
    // gA's high scores would exhaust a GLOBAL budget before gB ranks;
    // per-group, gB still gets its own full quota
    val docs = Seq(
      (0L, "w w w w", 9L, "gA"), (1L, "w w w w", 9L, "gA"),
      (2L, "w w w w", 9L, "gA"), (3L, "w w", 1L, "gB"),
      (4L, "w w", 1L, "gB")).toDF("doc_id", "text", "score", "grp")
    val out = Curation.selectTokenBudgetPerGroup(docs, col("doc_id"), col("text"),
        col("score"), col("grp"), budgetTokens = 8L, nShards = 2)
      .select("grp", "doc_id").as[(String, Long)].collect().toSet
    assert(out == Set(("gA", 0L), ("gA", 1L), ("gB", 3L), ("gB", 4L)))
  }

  test("selectTokenBudgetPerGroup: text never shuffles") {
    import spark.implicits._
    val docs = (0L until 100L).map(i => (i, "some text here", i % 5, s"g${i % 3}"))
      .toDF("doc_id", "text", "score", "grp")
    val out = Curation.selectTokenBudgetPerGroup(docs, col("doc_id"), col("text"),
      col("score"), col("grp"), 100L, 4)
    val cols = Scale.shuffleOutputColumns(out)
    assert(cols.forall(c => !c.contains("text")),
      s"text rode an exchange: $cols")
  }
}
