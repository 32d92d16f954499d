package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkTestBase

class FeaturesSpec extends SparkTestBase {
  import spark.implicits._

  test("rollingFeatures: hand-computed lag/gap/trailing frame") {
    val df = Seq(
      (1L, 1L, 10L, 1.5), (2L, 1L, 20L, 2.25), (3L, 1L, 30L, -0.5),
      (4L, 2L, 5L, 10.0))
      .toDF("id", "k", "us", "v")
    val r = Features.rollingFeatures(df, col("k"), col("us"), col("v"), col("id"), n = 2)
      .orderBy("key", "ts_us")
      .select("id", "v_c", "prev_v_c", "gap_us", "roll_sum_c", "roll_n",
        "roll_min_c", "roll_max_c")
      .collect().map(r => (r.getLong(0), r.getLong(1),
        Option(r.get(2)).map(_.asInstanceOf[Long]),
        Option(r.get(3)).map(_.asInstanceOf[Long]),
        r.getLong(4), r.getLong(5), r.getLong(6), r.getLong(7))).toSeq
    assert(r == Seq(
      (1L, 150L, None, None, 150L, 1L, 150L, 150L),
      (2L, 225L, Some(150L), Some(10L), 375L, 2L, 150L, 225L),
      // floor(-0.5*100) = -50 exactly
      (3L, -50L, Some(225L), Some(10L), 175L, 2L, -50L, 225L),
      (4L, 1000L, None, None, 1000L, 1L, 1000L, 1000L)))
  }

  test("rollingFeatures: id tiebreak totalizes equal timestamps") {
    val df = Seq((2L, 1L, 10L, 2.0), (1L, 1L, 10L, 1.0)).toDF("id", "k", "us", "v")
    val r = Features.rollingFeatures(df, col("k"), col("us"), col("v"), col("id"), n = 3)
      .orderBy("id").select("id", "prev_v_c")
      .collect().map(r => (r.getLong(0), Option(r.get(1)))).toSeq
    // id 1 first (no prev), id 2 second (prev = 100)
    assert(r == Seq((1L, None), (2L, Some(100L))))
  }

  test("rollingFeatures: deterministic across partitionings") {
    val df = spark.range(5000).select(col("id"), (col("id") % 17).as("k"),
      ((col("id") * 31) % 1000).as("us"), (col("id") % 7).cast("double").as("v"))
    def run(d: org.apache.spark.sql.DataFrame) =
      Features.rollingFeatures(d, col("k"), col("us"), col("v"), col("id"), n = 5)
        .orderBy("key", "ts_us", "id").collect().toSeq
    assert(run(df.repartition(1)) == run(df.repartition(11, col("id"))))
  }

  test("targetEncode: leave-one-out removes the row's own label — hand-computed") {
    // cat A: rows (1,y=1),(2,y=1),(3,y=0); cat B: row (4,y=1)
    // prior = 3*1e6 // 4 = 750000; m = 2
    val df = Seq((1L, "A", true), (2L, "A", true), (3L, "A", false),
      (4L, "B", true)).toDF("id", "c", "t")
    val r = Features.targetEncode(df, col("id"), col("c"), col("t"), m = 2)
      .orderBy("id").as[(Long, String, Long, Long)].collect().toSeq
    // row1: ((2-1)*1e6 + 2*750000) // (3-1+2) = 2500000//4 = 625000
    // row3: ((2-0)*1e6 + 1500000) // 4 = 875000
    // row4 (singleton cat): ((1-1)*1e6 + 1500000) // (1-1+2) = prior
    assert(r == Seq(
      (1L, "A", 1L, 625000L), (2L, "A", 1L, 625000L),
      (3L, "A", 0L, 875000L), (4L, "B", 1L, 750000L)))
  }

  test("targetEncode: a category seen once encodes to exactly the prior") {
    val df = Seq((1L, "solo", true), (2L, "other", false), (3L, "other", false))
      .toDF("id", "c", "t")
    val r = Features.targetEncode(df, col("id"), col("c"), col("t"), m = 7)
      .where(col("cat") === "solo").as[(Long, String, Long, Long)].collect().head
    assert(r._4 == 1000000L / 3L) // prior = 1*1e6 // 3
  }

  test("hashFeatures: slots and signs from the md5-prefix hash; cancellations dropped") {
    val df = Seq((1L, "alpha beta alpha"), (2L, "")).toDF("id", "txt")
    val r = Features.hashFeatures(df, col("id"), col("txt"), dim = 8)
      .as[(Long, Long, Long)].collect().toSeq
    def h(tok: String): Long = {
      val md = java.security.MessageDigest.getInstance("MD5")
        .digest(tok.getBytes("UTF-8")).map("%02x".format(_)).mkString
      java.lang.Long.parseLong(md.take(15), 16)
    }
    def sgn(x: Long): Long = if ((x / 8) % 2 == 1) 1L else -1L
    val expected = Seq("alpha", "beta", "alpha").map(t => (h(t) % 8, sgn(h(t))))
      .groupBy(_._1).view.mapValues(_.map(_._2).sum).toMap
      .filter(_._2 != 0).map { case (s, v) => (1L, s, v) }.toSet
    assert(r.toSet == expected && r.forall(_._1 == 1L))
  }

  test("hashFeatures: opposite-sign collisions cancel to no row") {
    // craft two tokens landing on the same slot with opposite signs
    // under dim=2: slot = h%2, sign from (h/2)%2
    def h(tok: String): Long = {
      val md = java.security.MessageDigest.getInstance("MD5")
        .digest(tok.getBytes("UTF-8")).map("%02x".format(_)).mkString
      java.lang.Long.parseLong(md.take(15), 16)
    }
    val toks = ('a' to 'z').map(_.toString)
    val pair = (for {
      a <- toks; b <- toks if a < b
      if h(a) % 2 == h(b) % 2 && (h(a) / 2) % 2 != (h(b) / 2) % 2
    } yield (a, b)).head
    val df = Seq((1L, s"${pair._1} ${pair._2}")).toDF("id", "txt")
    val r = Features.hashFeatures(df, col("id"), col("txt"), dim = 2).collect()
    assert(r.isEmpty)
  }

  test("targetEncode: deterministic across partitionings") {
    val df = spark.range(4000).select(col("id"),
      (col("id") % 23).cast("string").as("c"), (col("id") % 3 === 0).as("t"))
    def run(d: org.apache.spark.sql.DataFrame) =
      Features.targetEncode(d, col("id"), col("c"), col("t"), m = 10)
        .orderBy("id").collect().toSeq
    assert(run(df.repartition(1)) == run(df.repartition(13, col("c"))))
  }

  test("rankNormalize: hand-computed percentiles with ties") {
    import spark.implicits._
    // group g: scores 10, 20, 20, 30 -> ranks 1,2,2,4 over n=4
    // pct: 0, 333333, 333333, 1000000
    // group h: single member -> 0
    val rows = Seq((1L, "g", 10L), (2L, "g", 20L), (3L, "g", 20L),
      (4L, "g", 30L), (5L, "h", 99L)).toDF("i", "k", "s")
    val r = Features.rankNormalize(rows, col("i"), col("k"), col("s"))
      .orderBy("id").as[(Long, String, Long, Long)].collect().toSeq
    assert(r == Seq(
      (1L, "g", 10L, 0L), (2L, "g", 20L, 333333L), (3L, "g", 20L, 333333L),
      (4L, "g", 30L, 1000000L), (5L, "h", 99L, 0L)))
  }

  test("rankNormalize: null keys/scores are ranked, not dropped (row-count preserving)") {
    import spark.implicits._
    val rows = Seq(
      (1L, Some("g"), Some(10L)), (2L, Some("g"), Option.empty[Long]),
      (3L, Option.empty[String], Some(5L)), (4L, Some("g"), Some(20L)))
      .toDF("i", "k", "s")
    val r = Features.rankNormalize(rows, col("i"), col("k"), col("s"))
      .orderBy("id").collect()
    assert(r.length == 4, "operator must preserve every input row")
    // group g (n=3): null score sorts first -> pct 0; 10 -> 500000;
    // 20 -> 1000000. null key is its own single-member group -> 0.
    val pct = r.map(row => row.getLong(0) -> row.getLong(3)).toMap
    assert(pct == Map(1L -> 500000L, 2L -> 0L, 3L -> 0L, 4L -> 1000000L))
  }

  test("rankNormalize: min maps to 0, max to 10^6, deterministic across partitionings") {
    val df = spark.range(5000).select(col("id"),
      (col("id") % 17).cast("string").as("k"), ((col("id") * 41) % 919).as("s"))
    def run(d: org.apache.spark.sql.DataFrame) =
      Features.rankNormalize(d, col("id"), col("k"), col("s"))
        .orderBy("id").collect().toSeq
    val a = run(df.repartition(1))
    assert(a == run(df.repartition(9, col("k"))))
    val byKey = a.groupBy(_.getString(1))
    byKey.values.foreach { rows =>
      val pcts = rows.map(_.getLong(3))
      assert(pcts.min == 0L && pcts.max == 1000000L)
    }
  }
}
