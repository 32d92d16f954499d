package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkTestBase

class PrivacySpec extends SparkTestBase {
  import spark.implicits._

  /** Scala replica of the Knuth modular hash the operator (and the
    * DuckDB oracle) computes — the ground truth the engine must match
    * row by row.
    */
  private def knuth(id: Long, seed: Long): Long =
    ((id % 1000000007L) * 2654435761L % 1000000007L + seed) * 2654435761L % 1000000007L

  test("kAnonymityProfile: class sizes, diversity, and flags") {
    val df = Seq(
      ("a", 1, "x"), ("a", 1, "x"), ("a", 1, "y"), // class (a,1): size 3, 2 sensitive
      ("b", 1, "x"), // class (b,1): size 1, 1 sensitive
      ("a", 2, "x"), ("a", 2, "y"), ("a", 2, "z")) // class (a,2): size 3, 3 sensitive
      .toDF("q1", "q2", "s")
    val r = Privacy.kAnonymityProfile(df, Seq(col("q1"), col("q2")), col("s"), k = 3, l = 2)
      .orderBy("q1", "q2")
      .as[(String, Int, Long, Long, Boolean, Boolean)].collect().toSeq
    assert(r == Seq(
      ("a", 1, 3L, 2L, true, true),
      ("a", 2, 3L, 3L, true, true),
      ("b", 1, 1L, 1L, false, false)))
  }

  test("randomizedResponse: rows match the hash-coin ground truth") {
    val seed = 11L
    val df = spark.range(500).select(col("id"), (col("id") % 3 === 0).as("v"))
    val got = Privacy.randomizedResponse(df, col("id"), col("v"), seed)
      .select(col("id"), col("reported")).as[(Long, Boolean)].collect().toMap
    (0L until 500L).foreach { id =>
      val h = knuth(id, seed)
      val expected = if (h % 4 < 3) id % 3 == 0 else (h / 4) % 2 == 1
      assert(got(id) == expected, s"id=$id h=$h")
    }
    // both branches must actually fire on 500 rows
    val flipped = (0L until 500L).count(id => knuth(id, seed) % 4 >= 3)
    assert(flipped > 50 && flipped < 250)
  }

  test("rrEstimate: debiased estimator is exact integer algebra") {
    val seed = 7L
    val df = spark.range(1000)
      .select(col("id"), (col("id") % 5 < 2).as("v"), (col("id") % 2).as("g"))
    val r = Privacy.rrEstimate(df, col("id"), col("v"), col("g"), seed)
      .as[(Long, Long, Long, Long)].collect().sortBy(_._1)
    r.foreach { case (g, n, rep, est6) =>
      val ids = (0L until 1000L).filter(_ % 2 == g)
      val expRep = ids.count { id =>
        val h = knuth(id, seed)
        if (h % 4 < 3) id % 5 < 2 else (h / 4) % 2 == 1
      }
      assert(n == ids.size && rep == expRep && est6 == 8L * expRep - ids.size)
      // the debiased estimate lands near the true count (400/6 ≈ 12%
      // tolerance is generous for n=500 — this is a sanity bound, the
      // equality above is the contract)
      val trueCount = ids.count(_ % 5 < 2)
      assert(math.abs(est6 / 6.0 - trueCount) < ids.size * 0.12)
    }
  }

  test("randomizedResponse: deterministic across partitionings") {
    val df = spark.range(2000).select(col("id"), (col("id") % 7 === 0).as("v"))
    val a = Privacy.randomizedResponse(df.repartition(1), col("id"), col("v"), 3L)
      .select("id", "reported").as[(Long, Boolean)].collect().toMap
    val b = Privacy.randomizedResponse(df.repartition(13), col("id"), col("v"), 3L)
      .select("id", "reported").as[(Long, Boolean)].collect().toMap
    assert(a == b)
  }

  test("selectionAudit: hand-computed rates and four-fifths parity") {
    import spark.implicits._
    // a: 4 of 5 selected -> 800000 ppm (the max group, parity 10^6)
    // b: 2 of 4 -> 500000 -> parity 625000 (< 800000 flags it)
    // c: 0 of 2 -> 0 -> parity 0
    val rows = Seq(("a", true), ("a", true), ("a", true), ("a", true), ("a", false),
      ("b", true), ("b", true), ("b", false), ("b", false),
      ("c", false), ("c", false))
    val r = Privacy.selectionAudit(rows.toDF("g", "sel"), col("g"), col("sel"))
      .orderBy("grp").as[(String, Long, Long, Long, Long)].collect().toSeq
    assert(r == Seq(
      ("a", 5L, 4L, 800000L, 1000000L),
      ("b", 4L, 2L, 500000L, 625000L),
      ("c", 2L, 0L, 0L, 0L)))
  }

  test("selectionAudit: all-zero decision reports parity 0, not 0/0") {
    import spark.implicits._
    val rows = Seq(("a", false), ("b", false))
    val r = Privacy.selectionAudit(rows.toDF("g", "sel"), col("g"), col("sel"))
      .as[(String, Long, Long, Long, Long)].collect()
    assert(r.forall(x => x._4 == 0L && x._5 == 0L))
  }
}
