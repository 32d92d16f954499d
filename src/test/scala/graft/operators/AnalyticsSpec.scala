package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkTestBase

class AnalyticsSpec extends SparkTestBase {
  import spark.implicits._

  test("joinPreflight: exact per-key products, total, shares; keys on one side only drop") {
    import spark.implicits._
    val l = Seq(1L, 1L, 1L, 2L, 9L).toDF("k")   // 1->3, 2->1, 9->1
    val r = Seq(1L, 1L, 2L, 2L, 2L, 7L).toDF("k") // 1->2, 2->3, 7->1
    val got = Analytics.joinPreflight(l, col("k"), r, col("k"), topK = 5)
      .as[(Long, Long, Long, Long, Long, Long)].collect().toSeq
    // key 1: 3*2=6, key 2: 1*3=3; total 9; 9 and 7 one-sided -> absent
    assert(got == Seq(
      (1L, 3L, 2L, 6L, 9L, 666666L),
      (2L, 1L, 3L, 3L, 9L, 333333L)))
    // sanity: predicted total equals the real join's cardinality
    assert(l.join(r, "k").count() == 9L)
  }

  test("funnel: strict-order chaining — hand-computed") {
    // u1: a@10 b@20 c@30 -> reaches all three
    // u2: a@10 b@10      -> b NOT strictly after a: stops at step 1
    // u3: b@5 a@10 b@20  -> the late b chains: reaches step 2
    // u4: b@5 c@6        -> never does a: reaches nothing
    val ev = Seq(
      (1L, "a", 10L), (1L, "b", 20L), (1L, "c", 30L),
      (2L, "a", 10L), (2L, "b", 10L),
      (3L, "b", 5L), (3L, "a", 10L), (3L, "b", 20L),
      (4L, "b", 5L), (4L, "c", 6L)).toDF("u", "st", "t")
    val r = Analytics.funnel(ev, col("u"), col("st"), col("t"), Seq("a", "b", "c"))
      .orderBy("step_idx").as[(Long, String, Long, Long)].collect().toSeq
    assert(r == Seq(
      (1L, "a", 3L, 1000000L),
      (2L, "b", 2L, 666666L),
      (3L, "c", 1L, 333333L)))
  }

  test("funnel: empty first step yields zero conversions, not division errors") {
    val ev = Seq((1L, "x", 5L)).toDF("u", "st", "t")
    val r = Analytics.funnel(ev, col("u"), col("st"), col("t"), Seq("a", "b"))
      .orderBy("step_idx").as[(Long, String, Long, Long)].collect().toSeq
    assert(r == Seq((1L, "a", 0L, 0L), (2L, "b", 0L, 0L)))
  }

  test("cohortRetention: hand-computed weekly cohorts") {
    // u1 first week 0, active weeks 0,1,2; u2 first week 0, active 0,2
    // u3 first week 1, active 1
    // cohort 0: off 0 -> 2 users (10^6), off 1 -> 1 (500000), off 2 -> 2
    // cohort 1: off 0 -> 1 (10^6)
    val ev = Seq((1L, 0L), (1L, 1L), (1L, 2L), (2L, 0L), (2L, 2L), (2L, 0L),
      (3L, 1L)).toDF("u", "p")
    val r = Analytics.cohortRetention(ev, col("u"), col("p"))
      .orderBy("cohort", "offset").as[(Long, Long, Long, Long)].collect().toSeq
    assert(r == Seq(
      (0L, 0L, 2L, 1000000L), (0L, 1L, 1L, 500000L), (0L, 2L, 2L, 1000000L),
      (1L, 0L, 1L, 1000000L)))
  }

  test("gapProfile: exact type-1 median (odd and even), max, single-event keys absent") {
    // group x / key 1: times 0,10,40,100 -> gaps 10,30,60 (odd: median 30)
    // group y / key 1: times 0,5; key 2: times 0,20 -> gaps 5,20
    //   (even n=2: rank (2+1) div 2 = 1 -> lower element 5)
    // group z: single event -> no gaps -> absent
    val ev = Seq(
      ("x", 1L, 0L, 1L), ("x", 1L, 10L, 2L), ("x", 1L, 40L, 3L), ("x", 1L, 100L, 4L),
      ("y", 1L, 0L, 5L), ("y", 1L, 5L, 6L), ("y", 2L, 0L, 7L), ("y", 2L, 20L, 8L),
      ("z", 9L, 3L, 9L)).toDF("g", "k", "t", "e")
    val r = Analytics.gapProfile(ev, col("g"), col("k"), col("t"), col("e"))
      .orderBy("g").as[(String, Long, Long, Long)].collect().toSeq
    assert(r == Seq(("x", 3L, 30L, 60L), ("y", 2L, 5L, 20L)))
  }

  test("gapProfile: deterministic across partitionings") {
    val ev = spark.range(8000).select(
      (col("id") % 3).cast("string").as("g"), (col("id") % 17).as("k"),
      ((col("id") * 131) % 10007).as("t"), col("id").as("e"))
    def run(d: org.apache.spark.sql.DataFrame) =
      Analytics.gapProfile(d, col("g"), col("k"), col("t"), col("e"))
        .orderBy("g").collect().toSeq
    assert(run(ev.repartition(1)) == run(ev.repartition(13)))
  }

  test("funnel: matches a brute-force per-user simulation on random events") {
    import spark.implicits._
    val rnd = new scala.util.Random(131)
    val states = Vector("a", "b", "c")
    val rows = Seq.fill(2000)(
      (rnd.nextInt(60).toLong, states(rnd.nextInt(3)), rnd.nextInt(500).toLong))
    // brute force: per user, earliest a; earliest b strictly after; etc.
    val byUser = rows.groupBy(_._1)
    def reach(step: String, prev: Map[Long, Long]): Map[Long, Long] =
      byUser.flatMap { case (u, evs) =>
        prev.get(u).flatMap { pt =>
          val ts = evs.filter(e => e._2 == step && e._3 > pt).map(_._3)
          if (ts.isEmpty) None else Some(u -> ts.min)
        }
      }
    val s1 = byUser.flatMap { case (u, evs) =>
      val ts = evs.filter(_._2 == "a").map(_._3)
      if (ts.isEmpty) None else Some(u -> ts.min)
    }
    val s2 = reach("b", s1)
    val s3 = reach("c", s2)
    val expected = Seq(s1.size.toLong, s2.size.toLong, s3.size.toLong)
    val got = Analytics.funnel(rows.toDF("u", "st", "t"),
        col("u"), col("st"), col("t"), Seq("a", "b", "c"))
      .orderBy("step_idx").as[(Long, String, Long, Long)].collect().toSeq
    assert(got.map(_._3) == expected)
    assert(got.map(_._4) ==
      expected.map(n => if (expected.head == 0) 0L else n * 1000000L / expected.head))
  }

  test("cohortRetention: matches a brute-force simulation on random activity") {
    import spark.implicits._
    val rnd = new scala.util.Random(67)
    val rows = Seq.fill(1500)((rnd.nextInt(40).toLong, rnd.nextInt(8).toLong))
    val first = rows.groupBy(_._1).view.mapValues(_.map(_._2).min).toMap
    val expected = rows.map { case (u, p) => (first(u), p - first(u), u) }
      .distinct.groupBy(t => (t._1, t._2)).view.mapValues(_.size.toLong).toMap
    val got = Analytics.cohortRetention(rows.toDF("u", "p"), col("u"), col("p"))
      .as[(Long, Long, Long, Long)].collect()
    assert(got.map(r => (r._1, r._2) -> r._3).toMap == expected)
    got.foreach { case (cohort, off, n, ppm) =>
      assert(ppm == n * 1000000L / expected((cohort, 0L)), s"$cohort/$off")
    }
  }

  test("coOccurrence: hand-computed lifts, per-basket dedup, basket cap") {
    // baskets: {1,2} x3, {1,3}, {2,3}, {1} and one 3-item basket
    // {1,2,3} DROPPED by maxBasket=2. N=6 kept baskets.
    // n_1=5, n_2=4, n_3=2; pairs: (1,2)x3 lift 3*6e6/20=900000,
    // (1,3)x1 & (2,3)x1 below minSupport=2
    val ev = Seq(
      (10L, 1L), (10L, 2L), (10L, 2L), // dup item in basket counts once
      (11L, 1L), (11L, 2L),
      (12L, 1L), (12L, 2L),
      (13L, 1L), (13L, 3L),
      (14L, 2L), (14L, 3L),
      (15L, 1L),
      (99L, 1L), (99L, 2L), (99L, 3L)).toDF("b", "i")
    val r = Analytics.coOccurrence(ev, col("b"), col("i"),
        maxBasket = 2, minSupport = 2L, topK = 10)
      .as[(Long, Long, Long, Long)].collect().toSeq
    assert(r == Seq((1L, 2L, 3L, 900000L)))
  }

  test("coOccurrence: deterministic top-k across partitionings") {
    val ev = spark.range(9000).select(
      (col("id") % 800).as("b"), ((col("id") * 37) % 50).as("i"))
    def run(d: org.apache.spark.sql.DataFrame) =
      Analytics.coOccurrence(d, col("b"), col("i"),
        maxBasket = 15, minSupport = 2L, topK = 25).collect().toSeq
    assert(run(ev.repartition(1)) == run(ev.repartition(13)))
  }

  test("skewProfile: hand-computed hot keys, shares, and ceil-div salt factors") {
    // key 7 x 250 rows, key 3 x 120, key 1 x 30 -> total 400
    val rows = Seq.fill(250)(7L) ++ Seq.fill(120)(3L) ++ Seq.fill(30)(1L)
    val r = Analytics.skewProfile(rows.toDF("k"), col("k"),
        topK = 2, targetPerTask = 100L)
      .as[(Long, Long, Long, Long)].collect().toSeq
    assert(r == Seq(
      (7L, 250L, 625000L, 3L),  // ceil(250/100) = 3
      (3L, 120L, 300000L, 2L)))
  }
}
