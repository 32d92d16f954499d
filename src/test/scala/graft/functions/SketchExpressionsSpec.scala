package graft.functions

import org.apache.spark.sql.functions._
import graft.SparkTestBase

class SketchExpressionsSpec extends SparkTestBase {

  private def sketchOf(items: Seq[String], k: Int, parts: Int = 4): Map[String, Long] = {
    import spark.implicits._
    items.toDF("it").repartition(parts)
      .agg(Sketch.heavyHitters(col("it"), k).as("hh"))
      .select(explode(col("hh")).as("e"))
      .select(col("e.item"), col("e.est"))
      .as[(String, Long)].collect().toMap
  }

  test("heavy_hitters: k >= domain is exact regardless of partitioning") {
    val items = (0 until 500).map(i => s"w${i % 7}")
    for (parts <- Seq(1, 3, 8)) {
      val got = sketchOf(items, k = 16, parts)
      val exact = items.groupBy(identity).view.mapValues(_.size.toLong).toMap
      assert(got == exact, s"parts=$parts")
    }
  }

  test("heavy_hitters guarantees under eviction: no overcount, bounded undercount, recall") {
    // skewed stream: 3 hot items (200 each), 150 singletons; k=8 << 153
    val items = new scala.util.Random(42).shuffle(
      (0 until 3).flatMap(h => Seq.fill(200)(s"hot$h")) ++
        (0 until 150).map(i => s"cold$i"))
    val n = items.size.toLong
    val exact = items.groupBy(identity).view.mapValues(_.size.toLong).toMap
    for (parts <- Seq(1, 4)) {
      val est = sketchOf(items, k = 8, parts)
      assert(est.size <= 8)
      est.foreach { case (item, e) =>
        assert(e <= exact(item), s"overcount on $item: $e > ${exact(item)}")
        assert(exact(item) - e <= n / 9 + 1, s"undercount bound broken on $item")
      }
      // every item with true count > n/(k+1) must be present
      exact.filter(_._2 > n / 9).keys.foreach { hot =>
        assert(est.contains(hot), s"recall broken: $hot (count ${exact(hot)}) missing, parts=$parts")
      }
    }
  }

  test("heavy_hitters: NULLs ignored; SQL registration works; k must be literal") {
    import spark.implicits._
    val df = Seq(Some("a"), None, Some("a"), Some("b")).toDF("it")
    df.createOrReplaceTempView("hh_in")
    val viaSql = spark.sql("SELECT heavy_hitters(it, 4) AS hh FROM hh_in")
      .select(explode(col("hh")).as("e")).select("e.item", "e.est")
      .as[(String, Long)].collect().toMap
    assert(viaSql == Map("a" -> 2L, "b" -> 1L))
    val err = intercept[Exception](
      spark.sql("SELECT heavy_hitters(it, it) FROM hh_in").collect())
    assert(err.getMessage.contains("literal") || err.getMessage.contains("LITERAL"),
      err.getMessage)
  }

  test("heavyHittersCertify: booleans all true on a skewed domain; output is exact-side only") {
    import spark.implicits._
    val rows = (0L until 4000L).map { i =>
      if (i % 2 == 0) s"h${(i / 2) % 5}" else s"c${i % 997}"
    }.toDF("item")
    val out = graft.operators.Profiling
      .heavyHittersCertify(rows, col("item"), k = 16, topM = 5)
      .as[(String, Long, Boolean, Boolean)].collect().toSeq
    assert(out.size == 5)
    assert(out.forall(r => r._1.startsWith("h") && r._2 == 400L && r._3 && r._4), out.toString)
  }

  test("cms_sketch: estimates never undercount; exact when w >> domain") {
    import spark.implicits._
    val items = (0 until 600).map(i => s"w${i % 6}")
    for (parts <- Seq(1, 4)) {
      // wide sketch, tiny domain: collisions possible but est >= 100 always
      val df = items.toDF("it").repartition(parts)
      val sk = df.agg(Sketch.cmsSketch(col("it"), 4, 2048).as("cms"))
      val ests = df.distinct().crossJoin(sk)
        .select(col("it"), Sketch.cmsQuery(col("cms"), col("it"), 4, 2048))
        .as[(String, Long)].collect().toMap
      assert(ests.size == 6)
      assert(ests.values.forall(_ >= 100L), s"parts=$parts: $ests")
      // 6 distinct items in 2048 cells over 4 rows: min est is exact
      assert(ests.values.forall(_ == 100L), s"parts=$parts: $ests")
    }
  }

  test("cms_sketch: merge across partitions equals single-partition build") {
    import spark.implicits._
    val items = (0L until 3000L).map(i => s"k${i % 37}")
    def build(parts: Int): (Long, Seq[Long]) = {
      val r = items.toDF("it").repartition(parts)
        .agg(Sketch.cmsSketch(col("it"), 3, 64).as("cms"))
        .select(col("cms.n"), col("cms.counts")).as[(Long, Seq[Long])].head()
      r
    }
    // elementwise-add merge is order-independent: identical matrices
    assert(build(1) == build(8))
  }

  test("cms SQL registration and literal-parameter enforcement") {
    import spark.implicits._
    Seq("a", "a", "b").toDF("it").createOrReplaceTempView("cms_in")
    val viaSql = spark.sql(
      """SELECT cms_query(s, 'a', 2, 32) AS ea, cms_query(s, 'b', 2, 32) AS eb,
        |       cms_query(s, 'zzz', 2, 32) AS ez
        |FROM (SELECT cms_sketch(it, 2, 32) AS s FROM cms_in)""".stripMargin)
      .as[(Long, Long, Long)].head()
    assert(viaSql._1 >= 2L && viaSql._2 >= 1L)
    // an item never inserted can still collide, but with 3 inserts in
    // 32 cells the min over 2 rows is 0 unless both rows collide
    assert(viaSql._3 <= 3L)
    val err = intercept[Exception](
      spark.sql("SELECT cms_sketch(it, it, 32) FROM cms_in").collect())
    assert(err.getMessage.contains("literal") || err.getMessage.contains("LITERAL"),
      err.getMessage)
  }

  test("cmsCertify: both guarantees certified on the skewed domain") {
    import spark.implicits._
    val rows = (0L until 4000L).map { i =>
      if (i % 2 == 0) s"h${(i / 2) % 5}" else s"c${i % 997}"
    }.toDF("item")
    val out = graft.operators.Profiling
      .cmsCertify(rows, col("item"), d = 4, w = 1024, topM = 5)
      .as[(String, Long, Boolean, Boolean)].collect().toSeq
    assert(out.size == 5)
    assert(out.forall(r => r._1.startsWith("h") && r._2 == 400L && r._3 && r._4), out.toString)
  }
}
