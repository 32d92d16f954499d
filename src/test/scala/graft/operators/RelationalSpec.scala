package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkTestBase

class RelationalSpec extends SparkTestBase {

  test("collapseValues: sorted, duplicates kept, pipe-joined") {
    import spark.implicits._
    val df = Seq((1, Seq("b", "a", "a"))).toDF("k", "vs")
      .select(Relational.collapseValues(col("vs")).as("c"))
    assert(df.head().getString(0) == "a|a|b")
  }

  test("withContiguousId: ids are a contiguous 0..n-1 permutation honoring order") {
    import spark.implicits._
    val df = (0 until 100).map(i => (i, s"v$i")).toDF("k", "v").repartition(7).orderBy("k")
    val ids = Relational.withContiguousId(df).select("id", "k").as[(Long, Int)].collect().sortBy(_._2)
    assert(ids.map(_._1).toSeq == (0L until 100L))
  }

  test("withContiguousId honors offset") {
    import spark.implicits._
    val df = Seq(1, 2, 3).toDF("k")
    val ids = Relational.withContiguousId(df, offset = 10).select("id").as[Long].collect().sorted
    assert(ids.toSeq == Seq(10L, 11L, 12L))
  }

  test("asofJoin: latest right at-or-before each left, per key") {
    import spark.implicits._
    val left = Seq((1L, 10L, 100L), (1L, 20L, 101L), (1L, 5L, 102L), (2L, 10L, 103L))
      .toDF("key", "time", "id")
    val right = Seq((1L, 8L, 200L), (1L, 20L, 201L), (2L, 99L, 202L))
      .toDF("key", "time", "id")
    val res = Relational.asofJoin(left, right)
      .select("id", "asof_id").as[(Long, Option[Long])].collect().toMap
    assert(res == Map(
      100L -> Some(200L), // t=10: latest right is t=8
      101L -> Some(201L), // t=20: equal-time right matches (inclusive)
      102L -> None,       // t=5: no prior right
      103L -> None))      // key 2: right only at t=99
  }

  test("asofJoinBucketed matches asofJoin on skewed random data (property)") {
    import spark.implicits._
    // one hot key holding half the rows, buckets far smaller than the
    // hot key's time range — carries must cross many empty/full buckets
    val rnd = new scala.util.Random(7)
    val rows = (0 until 2000).map { i =>
      val key = if (rnd.nextBoolean()) 0L else 1L + rnd.nextInt(20)
      (key, rnd.nextInt(500).toLong, i.toLong, rnd.nextBoolean())
    }
    val left = rows.filter(_._4).map(r => (r._1, r._2, r._3)).toDF("key", "time", "id")
    val right = rows.filterNot(_._4).map(r => (r._1, r._2, r._3)).toDF("key", "time", "id")
    def canon(df: org.apache.spark.sql.DataFrame) =
      df.select("id", "asof_id").as[(Long, Option[Long])].collect().toMap
    val plain = canon(Relational.asofJoin(left, right))
    Seq(7L, 50L, 1000L).foreach { width => // many buckets, a few, just one
      assert(canon(Relational.asofJoinBucketed(left, right, width)) == plain,
        s"bucketWidth=$width diverged")
    }

    // null keys and null times must survive bucketing exactly like the
    // single-window variant (nulls group into ordinary partitions),
    // and a null-ID right must stay invisible to the carry instead of
    // erasing its bucket's earlier non-null right
    val leftN = left.unionByName(Seq(
      (Option.empty[Long], Option(3L), Option(9001L)),
      (Option(1L), Option.empty[Long], Option(9002L)),
      (Option(77L), Option(500L), Option(9003L))) // far bucket: match carried across
      .toDF("key", "time", "id"))
    val rightN = right.unionByName(Seq(
      (Option.empty[Long], Option(2L), Option(9100L)),
      (Option(77L), Option(1L), Option(9101L)),
      (Option(77L), Option(2L), Option.empty[Long])) // null-ID right AFTER the real one
      .toDF("key", "time", "id"))
    val plainN = canon(Relational.asofJoin(leftN, rightN))
    assert(plainN.contains(9001L) && plainN.contains(9002L))
    assert(plainN(9003L) == Some(9101L)) // null-ID right skipped by ignoreNulls
    Seq(7L, 1000L).foreach { width =>
      assert(canon(Relational.asofJoinBucketed(leftN, rightN, width)) == plainN,
        s"null key/time/id rows diverged under bucketing (width=$width)")
    }
  }

  test("rangeJoin: exactly the pairs within the window, across buckets") {
    import spark.implicits._
    val left = Seq((1L, 100L, 1L), (1L, 250L, 2L), (2L, 100L, 3L)).toDF("key", "time", "id")
    val right = Seq((1L, 120L, 10L), (1L, 199L, 11L), (1L, 500L, 12L), (2L, 100L, 13L))
      .toDF("key", "time", "id")
    val res = Relational.rangeJoin(left, right, window = 100L)
      .select("l_id", "r_id").as[(Long, Long)].collect()
    assert(res.length == res.toSet.size) // bucket expansion must not duplicate pairs
    assert(res.toSet == Set(
      (1L, 10L), (1L, 11L), // t=100 vs 120, 199; 500 excluded
      (2L, 11L),            // t=250 vs 199; 120 is 130 apart
      (3L, 13L)))
  }

  test("relation extraction: nodes offset + deduped edges") {
    import spark.implicits._
    val df = Seq((0L, "x"), (1L, "y"), (2L, "x"), (2L, "x")).toDF("pid", "v")
    val (nodes, edges) = Relational.extractRelation(df, col("pid"), col("v"), recordCount = 3)
    val n = nodes.as[(Long, String)].collect().sortBy(_._1)
    assert(n.toSeq == Seq((3L, "x"), (4L, "y")))
    val e = edges.as[(Long, Long)].collect().sorted
    assert(e.toSeq == Seq((0L, 3L), (1L, 4L), (2L, 3L))) // (2,x) deduped
  }

  test("sessionize: gap splits, boundary-inclusive, per-key indices") {
    import spark.implicits._
    val events = Seq(
      (1L, 100L), (1L, 150L), (1L, 250L),   // gaps 50,100: all one session (gap<=100)
      (1L, 351L),                            // gap 101 > 100: new session
      (2L, 10L), (2L, 10L),                  // tie: one session of 2 events
      (3L, 500L)).toDF("uid", "t")
    val out = Relational.sessionize(events, col("uid"), col("t"), gap = 100L)
      .as[(Long, Long, Long, Long, Long)].collect().sortBy(r => (r._1, r._2)).toSeq
    assert(out == Seq(
      (1L, 0L, 3L, 100L, 250L),
      (1L, 1L, 1L, 351L, 351L),
      (2L, 0L, 2L, 10L, 10L),
      (3L, 0L, 1L, 500L, 500L)))
  }

  test("sessionizeBucketed equals sessionize on dense, sparse, and boundary-crossing data") {
    import spark.implicits._
    // gaps straddle the bucket width so sessions must merge across
    // buckets and across EMPTY buckets
    val events = (0L until 2000L).map { i =>
      val uid = i % 7
      val t = (i / 7) * 37 + (i % 5) * 900 + uid // mixed small/large gaps
      (uid, t)
    }.toDF("uid", "t")
    for (width <- Seq(50L, 100L, 1000L)) {
      val plain = Relational.sessionize(events, col("uid"), col("t"), gap = 100L)
        .collect().map(_.toSeq).toSet
      val bucketed = Relational.sessionizeBucketed(
        events, col("uid"), col("t"), gap = 100L, bucketWidth = width)
        .collect().map(_.toSeq).toSet
      assert(bucketed == plain, s"divergence at bucketWidth=$width")
    }
  }

  test("sessionize drops NULL timestamps instead of minting ghost sessions") {
    import spark.implicits._
    val events = Seq((1L, Option(100L)), (1L, Option.empty[Long]),
      (1L, Option.empty[Long]), (1L, Option(150L))).toDF("uid", "t")
    val out = Relational.sessionize(events, col("uid"), col("t"), gap = 100L)
      .as[(Long, Long, Long, Long, Long)].collect().toSeq
    assert(out == Seq((1L, 0L, 2L, 100L, 150L)))
    val bucketed = Relational.sessionizeBucketed(
      events, col("uid"), col("t"), gap = 100L, bucketWidth = 60L)
      .as[(Long, Long, Long, Long, Long)].collect().toSeq
    assert(bucketed == out)
  }

  test("sessionize result is partitioning-invariant") {
    import spark.implicits._
    val events = (0L until 500L).map(i => (i % 13, i * 7 % 1000)).toDF("uid", "t")
    val a = Relational.sessionize(events, col("uid"), col("t"), gap = 20L)
      .collect().map(_.toSeq).toSet
    val b = Relational.sessionize(events.repartition(11), col("uid"), col("t"), gap = 20L)
      .collect().map(_.toSeq).toSet
    assert(a == b)
  }

  test("transitionMatrix: hand-computed two-user sequences") {
    import spark.implicits._
    // user 1: a -> b -> a -> c  (a->b, b->a, a->c)
    // user 2: a -> b            (a->b)
    // from a: a->b x2, a->c x1; from b: b->a x1
    val ev = Seq(
      (1L, "a", 10L, 1L), (1L, "b", 20L, 2L), (1L, "a", 30L, 3L), (1L, "c", 40L, 4L),
      (2L, "a", 10L, 5L), (2L, "b", 20L, 6L))
      .toDF("u", "st", "ts", "eid")
    val r = Relational.transitionMatrix(ev, col("u"), col("st"), col("ts"), col("eid"))
      .orderBy("from_state", "to_state")
      .as[(String, String, Long, Long)].collect().toSeq
    assert(r == Seq(
      ("a", "b", 2L, 666666L), ("a", "c", 1L, 333333L), ("b", "a", 1L, 1000000L)))
  }

  test("transitionMatrix: last event contributes nothing; ties broken by tiebreak") {
    import spark.implicits._
    // equal ts — tiebreak eid orders x before y
    val ev = Seq((1L, "x", 5L, 1L), (1L, "y", 5L, 2L)).toDF("u", "st", "ts", "eid")
    val r = Relational.transitionMatrix(ev, col("u"), col("st"), col("ts"), col("eid"))
      .as[(String, String, Long, Long)].collect().toSeq
    assert(r == Seq(("x", "y", 1L, 1000000L)))
    val single = Seq((1L, "x", 5L, 1L)).toDF("u", "st", "ts", "eid")
    assert(Relational.transitionMatrix(single,
      col("u"), col("st"), col("ts"), col("eid")).collect().isEmpty)
  }

  test("transitionMatrix: deterministic across partitionings") {
    val ev = spark.range(6000).select((col("id") % 37).as("u"),
      (col("id") % 5).cast("string").as("st"),
      ((col("id") * 17) % 1000).as("ts"), col("id").as("eid"))
    def run(d: org.apache.spark.sql.DataFrame) =
      Relational.transitionMatrix(d, col("u"), col("st"), col("ts"), col("eid"))
        .orderBy("from_state", "to_state").collect().toSeq
    assert(run(ev.repartition(1)) == run(ev.repartition(11, col("st"))))
  }
}
