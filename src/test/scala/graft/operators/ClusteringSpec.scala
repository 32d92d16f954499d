package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkTestBase

class ClusteringSpec extends SparkTestBase {

  private def vecsDf(rows: Seq[(Long, Seq[Float])]) = {
    import spark.implicits._
    rows.toDF("id", "vec")
  }

  test("kmeansFixedPoint: hand-computed 1-D case, iters=1 vs iters=2") {
    // fixed-point scale 1000: values become 0, 100, 200, 10000, 10100
    val df = vecsDf(Seq(
      0L -> Seq(0.0f), 1L -> Seq(0.1f), 2L -> Seq(0.2f),
      3L -> Seq(10.0f), 4L -> Seq(10.1f)))
    // init centroids: ids 0,1 -> c0=[0], c1=[100]
    // iters=1 assignment: 0->c0 (d=0); 1->c1 (0 vs 10000); 2->c1 (d=10000);
    //   3 -> c1 (|10000-100|^2 < |10000|^2); 4 -> c1
    import spark.implicits._
    val a1m = Clustering.kmeansFixedPoint(df, col("id"), col("vec"), k = 2, iters = 1)
      .select("id", "cluster", "dist").as[(Long, Int, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    assert(a1m(0L) == ((0, 0L)))
    assert(a1m(1L) == ((1, 0L)))
    assert(a1m(2L) == ((1, 10000L)))
    assert(a1m(3L) == ((1, 98010000L)))
    assert(a1m(4L) == ((1, 100000000L)))
    // update: c0 = [0]; c1 = mean(100, 200, 10000, 10100) = 20400/4 = 5100
    // iters=2 assignment: 0,1,2 -> c0 (|200|^2 < |200-5100|^2); 3,4 -> c1
    val a2 = Clustering.kmeansFixedPoint(df, col("id"), col("vec"), k = 2, iters = 2)
      .select("id", "cluster", "dist").as[(Long, Int, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    assert(a2(0L) == ((0, 0L)))
    assert(a2(1L) == ((0, 10000L)))
    assert(a2(2L) == ((0, 40000L)))
    assert(a2(3L) == ((1, math.pow(10000 - 5100, 2).toLong)))
    assert(a2(4L) == ((1, math.pow(10100 - 5100, 2).toLong)))
  }

  test("kmeansFixedPoint: truncated mean toward zero on negative coordinates") {
    // quantized: -7, -4, 8 with k=1 -> centroid after update = -3/3 = -1
    // (floor division would give -2; Spark div / DuckDB // truncate)
    val df = vecsDf(Seq(0L -> Seq(-0.007f), 1L -> Seq(-0.004f), 2L -> Seq(0.008f)))
    import spark.implicits._
    val out = Clustering.kmeansFixedPoint(df, col("id"), col("vec"), k = 1, iters = 2)
      .select("id", "dist").as[(Long, Long)].collect().toMap
    // centroid -1: dists (-7+1)^2=36, (-4+1)^2=9, (8+1)^2=81
    assert(out == Map(0L -> 36L, 1L -> 9L, 2L -> 81L))
  }

  test("kmeansFixedPoint: empty cluster keeps its previous centroid") {
    // c1 = [100] loses all members in iteration 1 (everything is closer
    // to c0 or far away at 10000); after the update c1 must survive as
    // [100], not vanish — point 1 still assigns to SOME cluster
    val df = vecsDf(Seq(0L -> Seq(0.0f), 1L -> Seq(0.05f)))
    import spark.implicits._
    // init c0=[0], c1=[50]; iters=1: 0->c0, 1->c1(d=0)
    // update: c0=[0], c1=[50]; stable — iters=3 must equal iters=1
    val r1 = Clustering.kmeansFixedPoint(df, col("id"), col("vec"), k = 2, iters = 1)
      .select("id", "cluster").as[(Long, Int)].collect().toSet
    val r3 = Clustering.kmeansFixedPoint(df, col("id"), col("vec"), k = 2, iters = 3)
      .select("id", "cluster").as[(Long, Int)].collect().toSet
    assert(r1 == r3 && r1 == Set(0L -> 0, 1L -> 1))
  }

  test("kmeansFixedPoint: invariant under input partitioning") {
    import spark.implicits._
    val rows = (0L until 500L).map(i => i -> Seq((i % 23).toFloat, (i % 7).toFloat))
    val df1 = rows.toDF("id", "vec")
    val df2 = rows.toDF("id", "vec").repartition(13)
    def sig(df: org.apache.spark.sql.DataFrame) =
      Clustering.kmeansFixedPoint(df, col("id"), col("vec"), k = 4, iters = 3)
        .select("id", "cluster", "dist").as[(Long, Int, Long)].collect().toSet
    assert(sig(df1) == sig(df2))
  }

  test("kmeansFixedPoint: k larger than the corpus degrades to n centroids; bad input rejected") {
    import spark.implicits._
    val df = vecsDf(Seq(0L -> Seq(0.0f), 1L -> Seq(1.0f)))
    // k=5 with 2 vectors: init takes what exists; every point its own centroid
    val out = Clustering.kmeansFixedPoint(df, col("id"), col("vec"), k = 5, iters = 2)
      .select("id", "cluster", "dist").as[(Long, Int, Long)].collect().toSet
    assert(out == Set((0L, 0, 0L), (1L, 1, 0L)))
    assertThrows[IllegalArgumentException](
      Clustering.kmeansFixedPoint(df, col("id"), col("vec"), k = 0, iters = 1))
    assertThrows[IllegalArgumentException](
      Clustering.kmeansFixedPoint(df, col("id"), col("vec"), k = 2, iters = 0))
    assertThrows[IllegalArgumentException](
      Clustering.kmeansFixedPoint(df.where(col("id") < 0), col("id"), col("vec"), k = 2, iters = 1))
  }

  test("assignFixedPoint: serving new vectors with trained centroids matches the training assignment") {
    import spark.implicits._
    val rows = (0L until 200L).map(i => i -> Seq((i % 17).toFloat, (i % 5).toFloat))
    val df = rows.toDF("id", "vec")
    val cents = Clustering.kmeansCentroidsFixedPoint(df, col("id"), col("vec"), k = 3, iters = 2)
    val trained = Clustering.kmeansFixedPoint(df, col("id"), col("vec"), k = 3, iters = 2)
      .select("id", "cluster", "dist").as[(Long, Int, Long)].collect().toSet
    val served = Clustering.assignFixedPoint(df, col("vec"), cents)
      .select("id", "cluster", "dist").as[(Long, Int, Long)].collect().toSet
    assert(served == trained,
      "serving the training set against the trained centroids must reproduce the final assignment")
    assert(Scale.countShuffles(
      Clustering.assignFixedPoint(df, col("vec"), cents)) == 0,
      "serve assignment must be a stateless zero-shuffle map (streaming-compatible)")
  }

  test("assignFixedPoint runs on a stream: stateless map survives readStream planning") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-kmeans-stream").toString
    try {
      val rows = (0L until 50L).map(i => i -> Seq((i % 7).toFloat))
      rows.toDF("id", "vec").write.mode("overwrite").parquet(dir + "/in")
      val cents = Clustering.kmeansCentroidsFixedPoint(
        rows.toDF("id", "vec"), col("id"), col("vec"), k = 2, iters = 2)
      val stream = spark.readStream
        .schema("id LONG, vec ARRAY<FLOAT>")
        .parquet(dir + "/in")
      val q = Clustering.assignFixedPoint(stream, col("vec"), cents)
        .writeStream.format("parquet")
        .option("path", dir + "/out")
        .option("checkpointLocation", dir + "/ckpt")
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination(60000)
      val got = spark.read.parquet(dir + "/out")
        .select("id", "cluster").as[(Long, Int)].collect().toSet
      val batch = Clustering.assignFixedPoint(rows.toDF("id", "vec"), col("vec"), cents)
        .select("id", "cluster").as[(Long, Int)].collect().toSet
      assert(got == batch, "streamed assignment must equal the batch assignment")
    } finally {
      import scala.reflect.io.Directory
      new Directory(new java.io.File(dir)).deleteRecursively()
    }
  }

  test("pq: hand-computed codes and ADC on a 2-subspace toy; encode is zero-shuffle") {
    import spark.implicits._
    // d=2, m=2 -> 1-dim subspaces; fpScale 1000
    // vectors: 0:(0, 0), 1:(1, 10), 2:(0.1, 9.9), 3:(0.9, 0.2)
    val df = Seq(
      (0L, Seq(0.0f, 0.0f)), (1L, Seq(1.0f, 10.0f)),
      (2L, Seq(0.1f, 9.9f)), (3L, Seq(0.9f, 0.2f))).toDF("id", "vec")
    // k=2, iters=1: subspace 0 centroids [0], [1000]; subspace 1: [0], [10000]
    val model = Clustering.pqTrain(df, col("id"), col("vec"), m = 2, k = 2, iters = 1)
    assert(model.map(_.map(_.toSeq).toSeq).toSeq ==
      Seq(Seq(Seq(0L), Seq(1000L)), Seq(Seq(0L), Seq(10000L))))
    val coded = Clustering.pqEncode(df, col("vec"), model)
    val codes = coded.select("id", "codes").as[(Long, Seq[Int])].collect().toMap
    // 2:(100, 9900) -> nearest [0] vs [1000]: 100 closer to 0; 9900 -> code 1
    // 3:(900, 200) -> 900 closer to 1000 (code 1); 200 -> code 0
    assert(codes == Map(0L -> Seq(0, 0), 1L -> Seq(1, 1), 2L -> Seq(0, 1), 3L -> Seq(1, 0)))
    assert(Scale.countShuffles(Clustering.pqEncode(df, col("vec"), model)) == 0,
      "PQ encode must be a zero-shuffle map pass")
    // ADC from query 0 (lut vs its exact subspace distances):
    // to corpus 1 (codes 1,1): (0-1000)^2 + (0-10000)^2 = 1e6 + 1e8
    val top = Clustering.pqTopK(df.where(col("id") === 0), col("id"), col("vec"),
      coded, col("id"), model, kNN = 3)
      .select("corpus_id", "adc_dist").as[(Long, Long)].collect().toMap
    assert(top(1L) == 1000000L + 100000000L)
    assert(top(2L) == 0L + 100000000L)  // codes (0,1): lut0[0]=0, lut1[1]=1e8
    assert(top(3L) == 1000000L + 0L)    // codes (1,0)
  }

  test("pq ADC equals exact squared-L2 to the RECONSTRUCTED corpus vector (the PQ contract)") {
    import spark.implicits._
    val rows = (0L until 120L).map(i =>
      i -> Seq((i % 13).toFloat, (i % 7).toFloat, (i % 5).toFloat, (i % 3).toFloat))
    val df = rows.toDF("id", "vec")
    val model = Clustering.pqTrain(df, col("id"), col("vec"), m = 2, k = 4, iters = 2)
    val coded = Clustering.pqEncode(df, col("vec"), model)
      .select("id", "codes").as[(Long, Seq[Int])].collect().toMap
    val got = Clustering.pqTopK(df.where(col("id") < 3), col("id"), col("vec"),
      df.transform(d => Clustering.pqEncode(d, col("vec"), model)), col("id"), model, kNN = 119)
      .select("query_id", "corpus_id", "adc_dist").as[(Long, Long, Long)].collect()
    def fp(v: Seq[Float]): Seq[Long] = v.map(x => math.floor(x * 1000.0 + 0.5).toLong)
    val byId = rows.toMap
    got.foreach { case (q, c, adc) =>
      val qv = fp(byId(q))
      val recon = coded(c).zipWithIndex.flatMap { case (code, j) => model(j)(code).toSeq }
      val exact = qv.zip(recon).map { case (a, b) => (a - b) * (a - b) }.sum
      assert(adc == exact, s"ADC($q,$c)=$adc != exact-to-reconstruction $exact")
    }
  }

  test("kmeansFixedPoint plan: assignment is a zero-shuffle map pass with literal centroids") {
    val df = vecsDf((0L until 50L).map(i => i -> Seq(i.toFloat, (i * 2).toFloat)))
    val out = Clustering.kmeansFixedPoint(df, col("id"), col("vec"), k = 3, iters = 2)
    assert(Scale.countShuffles(out) == 0,
      s"assignment must not exchange:\n${out.queryExecution.executedPlan}")
    val plan = out.queryExecution.executedPlan.toString
    assert(plan.contains("vec_nearest_centroid"), s"native assignment missing:\n$plan")
    assert(!plan.contains("Join"), s"centroids must ride as a literal, not a join:\n$plan")
  }

  test("kCenterGreedy: hand-computed farthest-first picks, radii, and tie-break") {
    import spark.implicits._
    // 1-D points 0, 10, 4, 6 (quantized ×1000). Seed = lowest id (pt 0).
    // Pick 1: farthest from 0 is 10 (d² = 1e8). Pick 2: minds
    // {4: 16e6, 6: 16e6} tie at 16e6 -> lowest id wins (id 2, pt 4).
    // Pick 3: pt 6's min-dist to {0, 10, 4} = 4e6.
    val df = Seq((0L, Seq(0f)), (1L, Seq(10f)), (2L, Seq(4f)), (3L, Seq(6f)))
      .toDF("id", "vec")
    val out = Clustering.kCenterGreedy(df, col("id"), col("vec"), k = 4)
      .orderBy("pick_order").as[(Long, Long, Long)].collect().toSeq
    assert(out == Seq(
      (0L, 0L, 0L),
      (1L, 1L, 100000000L),
      (2L, 2L, 16000000L),
      (3L, 3L, 4000000L)))
  }

  test("kCenterGreedy equals the brute-force greedy on random vectors; k > n stops early") {
    import spark.implicits._
    val rnd = new scala.util.Random(97)
    val pts = Seq.tabulate(30)(i => (i.toLong, Seq.fill(4)(rnd.nextFloat() * 10f)))
    val got = Clustering.kCenterGreedy(pts.toDF("id", "vec"),
        col("id"), col("vec"), k = 6)
      .orderBy("pick_order").as[(Long, Long, Long)].collect().toSeq
    val q = pts.map { case (i, v) =>
      (i, v.map(x => math.floor(x * 1000.0 + 0.5).toLong))
    }
    def d2(a: Seq[Long], b: Seq[Long]): Long =
      a.zip(b).map { case (x, y) => (x - y) * (x - y) }.sum
    var sel = Vector(q.minBy(_._1))
    var want = Vector((0L, sel.head._1, 0L))
    for (r <- 1 until 6) {
      val cand = q.filterNot(p => sel.exists(_._1 == p._1))
        .map(p => (p, sel.map(s => d2(p._2, s._2)).min))
      val best = cand.sortBy { case (p, m) => (-m, p._1) }.head
      sel :+= best._1
      want :+= ((r.toLong, best._1._1, best._2))
    }
    assert(got == want)
    // fewer points than k: one pick per point, seed first
    val tiny = Seq((5L, Seq(1f)), (9L, Seq(2f))).toDF("id", "vec")
    val short = Clustering.kCenterGreedy(tiny, col("id"), col("vec"), k = 10)
      .orderBy("pick_order").as[(Long, Long, Long)].collect().toSeq
    assert(short.map(_._2) == Seq(5L, 9L) && short.length == 2)
  }

  test("kCenterGreedy: radii are non-increasing (coverage-radius certificate)") {
    import spark.implicits._
    val rnd = new scala.util.Random(101)
    val pts = Seq.tabulate(50)(i => (i.toLong, Seq.fill(3)(rnd.nextFloat() * 5f)))
    val radii = Clustering.kCenterGreedy(pts.toDF("id", "vec"),
        col("id"), col("vec"), k = 8)
      .orderBy("pick_order").as[(Long, Long, Long)].collect().toSeq
      .drop(1).map(_._3)
    assert(radii == radii.sorted.reverse, radii.toString)
  }

  test("clusterQuality: two tight far-apart blobs — near-zero cohesion, exact inertia") {
    import spark.implicits._
    // blob A around (0,0), blob B around (100,100): ids 0..3 near
    // origin seed the first two centroids (k=2, first-k init)
    val pts = Seq(
      (0L, Seq(0.0, 0.0)), (1L, Seq(100.0, 100.0)),
      (2L, Seq(0.0, 1.0)), (3L, Seq(100.0, 101.0)),
      (4L, Seq(1.0, 0.0)), (5L, Seq(101.0, 100.0))).toDF("id", "vec")
    val r = Clustering.clusterQuality(pts, col("id"), col("vec"), k = 2, iters = 2)
      .orderBy("cluster").as[(Long, Long, Long, Long, Long)].collect().toSeq
    assert(r.map(_._2).sum == 6L)
    // cohesion well below 10^6: clusters are real
    r.foreach { case (_, _, inertia, separation, coh) =>
      assert(separation > inertia)
      assert(coh < 10000L, s"cohesion $coh not tight")
    }
  }

  test("clusterQuality: inertia matches kmeansFixedPoint's per-cluster dist sum") {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    val pts = Seq.tabulate(90)(i =>
      (i.toLong, Seq.fill(6)(rnd.nextDouble() * 3))).toDF("id", "vec")
    val expected = Clustering.kmeansFixedPoint(pts, col("id"), col("vec"), k = 5, iters = 2)
      .groupBy(col("cluster").cast("long")).agg(sum("dist"))
      .as[(Long, Long)].collect().toMap
    val got = Clustering.clusterQuality(pts, col("id"), col("vec"), k = 5, iters = 2)
      .select(col("cluster"), col("inertia")).as[(Long, Long)].collect().toMap
    assert(got == expected)
  }
}
