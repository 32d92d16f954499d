package graft.operators

import graft.SparkTestBase
import org.apache.spark.sql.functions._

class SnapshotSpec extends SparkTestBase {

  test("diff classifies added/removed/changed/unchanged") {
    import spark.implicits._
    val oldSnap = Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("doc_id", "text")
    val newSnap = Seq((2L, "b"), (3L, "C2"), (4L, "d")).toDF("doc_id", "text")
    val out = Snapshot.diff(oldSnap, newSnap, col("doc_id"), col("text"))
      .as[(Long, String)].collect().sortBy(_._1).toSeq
    assert(out == Seq(
      (1L, "removed"), (2L, "unchanged"), (3L, "changed"), (4L, "added")))
  }

  test("diffCounts aggregates statuses") {
    import spark.implicits._
    val oldSnap = Seq((1L, "a"), (2L, "b")).toDF("doc_id", "text")
    val newSnap = Seq((2L, "b"), (3L, "c")).toDF("doc_id", "text")
    val counts = Snapshot.diffCounts(oldSnap, newSnap, col("doc_id"), col("text"))
      .as[(String, Long)].collect().toMap
    assert(counts == Map("removed" -> 1L, "unchanged" -> 1L, "added" -> 1L))
  }

  test("NULL content is presence, not absence") {
    import spark.implicits._
    // id 1: null → null (unchanged); id 2: null → text (changed);
    // id 3: text → null (changed); id 4: null → "" (changed — the
    // sentinel must not collide with the empty string's md5)
    val oldSnap = Seq((1L, None), (2L, None), (3L, Some("t")), (4L, None))
      .toDF("doc_id", "text")
    val newSnap = Seq((1L, None), (2L, Some("t")), (3L, None), (4L, Some("")))
      .toDF("doc_id", "text")
    val out = Snapshot.diff(oldSnap, newSnap, col("doc_id"), col("text"))
      .as[(Long, String)].collect().sortBy(_._1).toSeq
    assert(out == Seq(
      (1L, "unchanged"), (2L, "changed"), (3L, "changed"), (4L, "changed")))
  }

  test("the exchange carries fingerprints, not documents") {
    import spark.implicits._
    val oldSnap = Seq((1L, "x" * 10000)).toDF("doc_id", "text")
    val newSnap = Seq((1L, "x" * 10000)).toDF("doc_id", "text")
    val plan = Snapshot.diff(oldSnap, newSnap, col("doc_id"), col("text"))
      .queryExecution.optimizedPlan
    // the text column must be projected away BELOW the join: no
    // attribute named `text` may survive into the join's inputs
    val join = plan.collect {
      case j: org.apache.spark.sql.catalyst.plans.logical.Join => j
    }
    assert(join.nonEmpty, "expected a join in the plan")
    val joinInputAttrs = join.head.children.flatMap(_.output).map(_.name)
    assert(!joinInputAttrs.contains("text"),
      s"text crosses the join: $joinInputAttrs")
  }

  test("applyChanges: upsert replaces and inserts, delete removes, absent delete no-ops") {
    import spark.implicits._
    val corpus = Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("doc_id", "text")
    val changes = Seq(
      (2L, "upsert", "B2"), // replace
      (4L, "upsert", "d"),  // insert
      (3L, "delete", null.asInstanceOf[String]),
      (9L, "delete", null.asInstanceOf[String])) // absent: no-op
      .toDF("id", "op", "content")
    val out = Snapshot.applyChanges(corpus, col("doc_id"), col("text"), changes)
      .as[(Long, String)].collect().toMap
    assert(out == Map(1L -> "a", 2L -> "B2", 4L -> "d"))
  }

  test("applyChanges: an op outside {upsert, delete} fails loudly, never deletes") {
    import spark.implicits._
    val corpus = Seq((1L, "a"), (2L, "b")).toDF("doc_id", "text")
    for (bad <- Seq("Upsert", "update", "", null.asInstanceOf[String])) {
      val changes = Seq((2L, bad, "B2")).toDF("id", "op", "content")
      val e = intercept[Exception] {
        Snapshot.applyChanges(corpus, col("doc_id"), col("text"), changes)
          .collect()
      }
      def msgs(t: Throwable): Seq[String] =
        Option(t).toSeq.flatMap(x => Option(x.getMessage).toSeq ++ msgs(x.getCause))
      assert(msgs(e).exists(_.contains("unknown op")),
        s"op '$bad' must raise the validation error, got: $e")
    }
  }

  test("applyChanges round-trip: diff(corpus, applied) reports exactly the changeset") {
    import spark.implicits._
    val corpus = (0L until 50L).map(i => (i, s"doc$i")).toDF("doc_id", "text")
    val changes = Seq(
      (5L, "upsert", "doc5 v2"), (60L, "upsert", "new"), (7L, "delete", null.asInstanceOf[String]))
      .toDF("id", "op", "content")
    val applied = Snapshot.applyChanges(corpus, col("doc_id"), col("text"), changes)
      .select(col("id").as("doc_id"), col("content").as("text"))
    val d = Snapshot.diff(corpus, applied, col("doc_id"), col("text"))
      .where(col("status") =!= "unchanged")
      .as[(Long, String)].collect().toMap
    assert(d == Map(5L -> "changed", 60L -> "added", 7L -> "removed"))
  }

  test("incrementalRelease: gate rejects degraded docs — old version survives") {
    import spark.implicits._
    val corpus = Seq(
      (1L, "one two three four five"),   // will vanish from the crawl
      (2L, "alpha beta gamma delta eps"), // will degrade to junk
      (3L, "kept exactly as it was ok"),  // unchanged
      (4L, "to be revised one two three") // revised, passes the gate
    ).toDF("doc_id", "text")
    val crawl = Seq(
      (2L, "junk"),                            // changed but fails gate
      (3L, "kept exactly as it was ok"),       // unchanged
      (4L, "revised version with five words"), // changed, admitted
      (5L, "brand new document with words"),   // added, admitted
      (6L, "tiny")                             // added but fails gate
    ).toDF("doc_id", "text")
    val v2 = CorpusPipeline.incrementalRelease(
        corpus, crawl, col("doc_id"), col("text"), minTokens = 5L)
      .as[(Long, String)].collect().toMap
    assert(v2 == Map(
      2L -> "alpha beta gamma delta eps",      // degraded: OLD kept
      3L -> "kept exactly as it was ok",
      4L -> "revised version with five words",
      5L -> "brand new document with words"))  // 1 deleted, 6 rejected
  }
}
