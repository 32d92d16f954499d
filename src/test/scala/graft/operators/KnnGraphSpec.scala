package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkTestBase

/** Graph-based ANN: LSH-seeded NN-Descent build + beam-search serve
  * (q262-q264). Semantics reference: Dong, Charikar & Li, "Efficient
  * k-nearest neighbor graph construction for generic similarity
  * measures", WWW 2011 (NN-Descent); seed is the SimHash sign-bucket
  * hybrid. All determinism comes from explicit tie-breaks — no RNG.
  */
class KnnGraphSpec extends SparkTestBase {

  // two tight clusters far apart, plus a structured spread inside
  // each — nearest neighbors are unambiguous
  private def clustered(n: Int) = {
    import spark.implicits._
    (0 until n).map { i =>
      val base = if (i % 2 == 0) Array(10.0f, 0.0f) else Array(0.0f, 10.0f)
      val jitter = (i / 2).toFloat * 0.01f
      (i.toLong, Seq(base(0) + jitter, base(1) - jitter, 1.0f + jitter, -jitter))
    }.toDF("id", "vec")
  }

  test("knnGraphBuild: every node has exactly k ranked neighbors, no self-loops") {
    val g = Similarity.knnGraphBuild(clustered(40), k = 3, rounds = 2,
      revCap = 8, lshBits = 2, lshTables = 2)
    val rows = g.collect()
    assert(rows.length == 40 * 3)
    assert(rows.forall(r => r.getLong(0) != r.getLong(2)), "self-loop found")
    val perNode = rows.groupBy(_.getLong(0))
    assert(perNode.values.forall(_.map(_.getLong(1)).sorted.toSeq == Seq(1L, 2L, 3L)),
      "ranks must be exactly 1..k per node")
  }

  test("knnGraphBuild is deterministic under repartition") {
    val base = clustered(40)
    def sig(df: org.apache.spark.sql.DataFrame) =
      df.orderBy("node_id", "nb_rank").collect().map(_.toString).toSeq
    val a = sig(Similarity.knnGraphBuild(base, k = 3, rounds = 2,
      revCap = 8, lshBits = 2, lshTables = 2))
    val b = sig(Similarity.knnGraphBuild(base.repartition(7), k = 3, rounds = 2,
      revCap = 8, lshBits = 2, lshTables = 2))
    assert(a == b)
  }

  test("knnGraphBuild recall: LSH seed + descent recover true neighbors") {
    import spark.implicits._
    // seeded gaussians with genuinely distinct cosines — the clustered()
    // fixture is degenerate here (within-cluster cosines all round to
    // the same 6 digits, so "truth" is itself an id tie-break)
    val rnd = new scala.util.Random(7L)
    val corpus = (0 until 80)
      .map(i => (i.toLong, Seq.fill(8)(rnd.nextGaussian().toFloat)))
      .toDF("id", "vec")
    val g = Similarity.knnGraphBuild(corpus, k = 4, rounds = 3,
      revCap = 16, lshBits = 3, lshTables = 2)
    val truth = Similarity.bruteForceTopK(corpus, corpus, k = 4)
    val rec = Similarity.topKRecall(truth,
        g.select(col("node_id").as("query_id"), col("neighbor_id")))
      .agg(sum("n_hit"), sum("n_truth")).as[(Long, Long)].collect()(0)
    assert(rec._1.toDouble / rec._2 >= 0.8,
      s"recall ${rec._1}/${rec._2} below 0.8 on an 80-vector gaussian corpus")
  }

  test("knnGraphServe finds in-cluster neighbors and never returns self") {
    import spark.implicits._
    val corpus = clustered(60)
    val g = Similarity.knnGraphBuild(corpus, k = 3, rounds = 2,
      revCap = 12, lshBits = 2, lshTables = 2)
    val res = Similarity.knnGraphServe(
      corpus.where(col("id") < 4), g, corpus,
      k = 3, beam = 6, hops = 2, entryStride = 7L)
    val rows = res.select("query_id", "neighbor_id").as[(Long, Long)].collect()
    assert(rows.length == 4 * 3)
    assert(rows.forall { case (q, n) => q != n }, "serve returned a self-match")
    // the clusters are orthogonal: every served neighbor must share
    // the query's parity (its cluster)
    assert(rows.forall { case (q, n) => q % 2 == n % 2 },
      s"cross-cluster neighbor served: ${rows.mkString(",")}")
  }

  test("knnLshSeedEdges: bounded out-degree, co-bucketed endpoints, deterministic") {
    import spark.implicits._
    val rnd = new scala.util.Random(11L)
    val corpus = (0 until 120)
      .map(i => (i.toLong, Seq.fill(8)(rnd.nextGaussian().toFloat)))
      .toDF("id", "vec")
    val edges = Similarity.knnLshSeedEdges(corpus, lshBits = 2, lshTables = 2,
      anchorsPerBucket = 5)
    val rows = edges.as[(Long, Long)].collect()
    assert(rows.forall { case (i, j) => i != j }, "self-loop in seed edges")
    // out-degree bounded by anchors per table times tables
    val deg = rows.groupBy(_._1).values.map(_.length).max
    assert(deg <= 2 * 5, s"out-degree $deg exceeds anchors*tables")
    val again = Similarity.knnLshSeedEdges(corpus.repartition(7), lshBits = 2,
      lshTables = 2, anchorsPerBucket = 5).as[(Long, Long)].collect()
    assert(rows.toSet == again.toSet, "seed edges not partitioning-invariant")
  }

  test("knnLshSeedEdges with anchors >= bucket size degenerates to within-bucket all-pairs") {
    import spark.implicits._
    // one table, one bit -> two buckets split by the sign of dim 1
    val corpus = Seq(
      (0L, Seq(1.0f, 0f)), (1L, Seq(2.0f, 0f)), (2L, Seq(3.0f, 0f)),
      (3L, Seq(-1.0f, 0f)), (4L, Seq(-2.0f, 0f))).toDF("id", "vec")
    val edges = Similarity.knnLshSeedEdges(corpus, lshBits = 1, lshTables = 1,
      anchorsPerBucket = 10).as[(Long, Long)].collect().toSet
    val pos = Set(0L, 1L, 2L); val neg = Set(3L, 4L)
    val expect = (for (a <- pos; b <- pos if a != b) yield (a, b)) ++
      (for (a <- neg; b <- neg if a != b) yield (a, b))
    assert(edges == expect)
  }

  test("knnGraphAppend: arrivals get k ranked edges; old nodes only ever improve") {
    import spark.implicits._
    val rnd = new scala.util.Random(13L)
    val all = (0 until 100)
      .map(i => (i.toLong, Seq.fill(8)(rnd.nextGaussian().toFloat)))
      .toDF("id", "vec")
    val old = all.where(col("id") % 5 =!= 4)
    val g0 = Similarity.knnGraphBuild(old, k = 4, rounds = 2,
      revCap = 12, lshBits = 2, lshTables = 2)
    val g1 = Similarity.knnGraphAppend(g0, all, col("id") % 5 === 4,
      k = 4, lshBits = 2, lshTables = 2, anchorsPerBucket = 12)
    val rows = g1.select("node_id", "nb_rank", "neighbor_id", "cos")
      .as[(Long, Long, Long, Double)].collect()
    // every node of the union corpus is present with ranks 1..4
    assert(rows.map(_._1).distinct.length == 100)
    assert(rows.groupBy(_._1).values.forall(_.map(_._2).sorted.toSeq == Seq(1L, 2L, 3L, 4L)))
    assert(rows.forall(r => r._1 != r._3), "self-loop after append")
    // old nodes only improve: per node, the post-append cos at each
    // rank dominates the pre-append cos at the same rank
    val before = g0.select("node_id", "nb_rank", "cos")
      .as[(Long, Long, Double)].collect().groupBy(_._1)
    val after = rows.groupBy(_._1)
    before.foreach { case (node, b) =>
      val a = after(node)
      val bByRank = b.map(r => r._2 -> r._3).toMap
      val aByRank = a.map(r => r._2 -> r._4).toMap
      bByRank.foreach { case (rk, cosB) =>
        assert(aByRank(rk) >= cosB - 1e-9,
          s"node $node rank $rk got worse: $cosB -> ${aByRank(rk)}")
      }
    }
  }

  test("knnGraphDelete: tombstoned nodes vanish, survivors backfill, unaffected keep rows") {
    import spark.implicits._
    val rnd = new scala.util.Random(17L)
    val all = (0 until 100)
      .map(i => (i.toLong, Seq.fill(8)(rnd.nextGaussian().toFloat)))
      .toDF("id", "vec")
    val g0 = Similarity.knnGraphBuild(all, k = 4, rounds = 2,
      revCap = 12, lshBits = 2, lshTables = 2)
    val g1 = Similarity.knnGraphDelete(g0, all, col("id") % 7 === 3, k = 4, revCap = 12)
    val rows = g1.select("node_id", "nb_rank", "neighbor_id", "cos")
      .as[(Long, Long, Long, Double)].collect()
    val deleted = (0L until 100L).filter(_ % 7 == 3).toSet
    assert(rows.forall(r => !deleted.contains(r._1)), "deleted node still owns rows")
    assert(rows.forall(r => !deleted.contains(r._3)), "surviving edge points at a tombstone")
    // every survivor regains a full neighbor list on this dense fixture
    val deg = rows.groupBy(_._1).view.mapValues(_.length).toMap
    assert(deg.size == 100 - deleted.size)
    assert(deg.values.forall(_ == 4), s"under-filled survivor: ${deg.filter(_._2 != 4)}")
    // nodes whose pre-delete neighbors all survive keep their rows verbatim
    val before = g0.select("node_id", "nb_rank", "neighbor_id", "cos")
      .as[(Long, Long, Long, Double)].collect().groupBy(_._1)
    val untouched = before.filter { case (n, rs) =>
      !deleted.contains(n) && rs.forall(r => !deleted.contains(r._3)) }
    val after = rows.groupBy(_._1)
    untouched.foreach { case (n, rs) =>
      assert(after(n).toSet == rs.toSet, s"unaffected node $n changed")
    }
  }

  test("knnLayerMemberFilter: layers nest and thin geometrically") {
    import spark.implicits._
    val ids = (0L until 4000L).toDF("id")
    val l1 = ids.where(Similarity.knnLayerMemberFilter(col("id"), 1, 8))
      .as[Long].collect().toSet
    val l2 = ids.where(Similarity.knnLayerMemberFilter(col("id"), 2, 8))
      .as[Long].collect().toSet
    assert(l2.subsetOf(l1), "layer 2 must nest inside layer 1")
    // hash-uniform thinning: ~N/8 and ~N/64 with generous slack
    assert(l1.size > 4000 / 16 && l1.size < 4000 / 4, s"layer-1 size ${l1.size}")
    assert(l2.size > 4000 / 256 && l2.size < 4000 / 16, s"layer-2 size ${l2.size}")
    // level 0 is everything
    assert(ids.where(Similarity.knnLayerMemberFilter(col("id"), 0, 8)).count() == 4000)
  }

  test("knnGraphBuildLayers: top-first, nodes nested, base layer is the flat build") {
    val corpus = clustered(80)
    val layers = Similarity.knnGraphBuildLayers(corpus, k = 3, levels = 1,
      layerFactor = 4, rounds = 2, revCap = 8, lshBits = 2, lshTables = 2)
    assert(layers.length == 2)
    val topNodes = layers.head.select("node_id").distinct().collect().map(_.getLong(0)).toSet
    val baseNodes = layers(1).select("node_id").distinct().collect().map(_.getLong(0)).toSet
    assert(topNodes.subsetOf(baseNodes), "top-layer nodes must exist in the base layer")
    assert(topNodes.size < baseNodes.size, "top layer must be a strict subsample")
    val flat = Similarity.knnGraphBuild(corpus, k = 3, rounds = 2,
      revCap = 8, lshBits = 2, lshTables = 2)
    assert(layers(1).orderBy("node_id", "nb_rank").collect().toSeq ==
      flat.orderBy("node_id", "nb_rank").collect().toSeq,
      "base layer must equal the flat build")
  }

  test("knnGraphServeLayered: in-cluster neighbors, no self, deterministic under repartition") {
    import spark.implicits._
    val corpus = clustered(60)
    val layers = Similarity.knnGraphBuildLayers(corpus, k = 3, levels = 1,
      layerFactor = 4, rounds = 2, revCap = 12, lshBits = 2, lshTables = 2)
    val res = Similarity.knnGraphServeLayered(
      corpus.where(col("id") < 4), layers, corpus, k = 3, beam = 6, hopsPerLayer = 2)
    val rows = res.select("query_id", "neighbor_id").as[(Long, Long)].collect()
    assert(rows.length == 4 * 3)
    assert(rows.forall { case (q, n) => q != n }, "layered serve returned a self-match")
    assert(rows.forall { case (q, n) => q % 2 == n % 2 },
      s"cross-cluster neighbor served: ${rows.mkString(",")}")
    val again = Similarity.knnGraphServeLayered(
      corpus.repartition(7).where(col("id") < 4), layers, corpus.repartition(5),
      k = 3, beam = 6, hopsPerLayer = 2)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect()
    assert(rows.sorted.toSeq == again.sorted.toSeq,
      "layered serve not partitioning-invariant")
  }

  test("knnGraphServeLayered recall matches brute truth on a gaussian corpus") {
    import spark.implicits._
    val rnd = new scala.util.Random(23L)
    val corpus = (0 until 200)
      .map(i => (i.toLong, Seq.fill(8)(rnd.nextGaussian().toFloat)))
      .toDF("id", "vec")
    // isotropic 8-dim gaussians are the graph family's WORST case
    // (no cluster structure for the beam to exploit), so the sanity
    // bound runs with a production-ish beam/hop budget
    val layers = Similarity.knnGraphBuildLayers(corpus, k = 4, levels = 1,
      layerFactor = 8, rounds = 3, revCap = 16, lshBits = 3, lshTables = 2)
    val queries = corpus.where(col("id") % 10 === 0)
    val truth = Similarity.bruteForceTopK(queries, corpus, k = 4)
    val served = Similarity.knnGraphServeLayered(
      queries, layers, corpus, k = 4, beam = 16, hopsPerLayer = 3)
    val rec = Similarity.topKRecall(truth,
        served.select(col("query_id"), col("neighbor_id")))
      .agg(sum("n_hit"), sum("n_truth")).as[(Long, Long)].collect()(0)
    assert(rec._1.toDouble / rec._2 >= 0.8,
      s"layered serve recall ${rec._1}/${rec._2} below 0.8")
  }

  test("knnLayerMemberFilter rejects a layer modulus past the hash range") {
    intercept[IllegalArgumentException] {
      Similarity.knnLayerMemberFilter(col("id"), level = 12, layerFactor = 8)
    }
    intercept[IllegalArgumentException] {
      Similarity.knnLayerMemberFilter(col("id"), level = -1, layerFactor = 8)
    }
  }

  test("knnGraphServe beam is monotone: wider beam never lowers the top-1 cosine") {
    import spark.implicits._
    val corpus = clustered(60)
    val g = Similarity.knnGraphBuild(corpus, k = 3, rounds = 2,
      revCap = 12, lshBits = 2, lshTables = 2)
    def top1(beam: Int) = Similarity.knnGraphServe(
        corpus.where(col("id") === 0), g, corpus,
        k = 1, beam = beam, hops = 2, entryStride = 7L)
      .select("cos").as[Double].collect()(0)
    assert(top1(12) >= top1(3) - 1e-9)
  }
}
