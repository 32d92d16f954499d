package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkTestBase

class GraphSpec extends SparkTestBase {
  import spark.implicits._

  private val S = 1000000000L

  test("pageRank: 2-cycle is the exact fixed point") {
    // a <-> b: each node's sole in-contribution is the other's full
    // rank, so scale is preserved exactly: 0.15S + (85*S) div 100 = S
    val e = Seq((1L, 2L), (2L, 1L)).toDF("s", "d")
    val r = Graph.pageRank(e, col("s"), col("d"), iters = 3)
      .as[(Long, Long)].collect().toMap
    assert(r == Map(1L -> S, 2L -> S))
  }

  test("pageRank: star hub drains, leaves decay — hand-computed") {
    // a -> b, a -> c (b, c dangling): deg(a)=2
    val e = Seq((1L, 2L), (1L, 3L)).toDF("s", "d")
    val base = 150000000L
    // iter1: a=base; b=c = base + 85*(S div 2) div 100
    val l1 = base + 85L * (S / 2) / 100L
    assert(l1 == 575000000L)
    val r1 = Graph.pageRank(e, col("s"), col("d"), iters = 1)
      .as[(Long, Long)].collect().toMap
    assert(r1 == Map(1L -> base, 2L -> l1, 3L -> l1))
    // iter2: a's rank is now base, so leaves get base + 85*(base div 2) div 100
    val l2 = base + 85L * (base / 2) / 100L
    val r2 = Graph.pageRank(e, col("s"), col("d"), iters = 2)
      .as[(Long, Long)].collect().toMap
    assert(r2 == Map(1L -> base, 2L -> l2, 3L -> l2))
  }

  test("pageRank: multigraph semantics — parallel edges contribute independently") {
    // a -> b twice, a -> c once: deg(a)=3, b receives 2 shares
    val e = Seq((1L, 2L), (1L, 2L), (1L, 3L)).toDF("s", "d")
    val base = 150000000L
    val share = S / 3
    val r = Graph.pageRank(e, col("s"), col("d"), iters = 1)
      .as[(Long, Long)].collect().toMap
    assert(r(2L) == base + 85L * (2 * share) / 100L)
    assert(r(3L) == base + 85L * share / 100L)
  }

  test("pageRank: deterministic across partitionings") {
    val e = spark.range(500).select((col("id") % 97).as("s"), (col("id") % 89).as("d"))
      .where(col("s") =!= col("d"))
    val a = Graph.pageRank(e.repartition(1), col("s"), col("d"), iters = 3)
      .as[(Long, Long)].collect().toMap
    val b = Graph.pageRank(e.repartition(7, col("d")), col("s"), col("d"), iters = 3)
      .as[(Long, Long)].collect().toMap
    assert(a == b)
  }

  test("pageRank: edges shuffle once — per-iteration wire is O(nodes), not O(edges)") {
    // Runtime pin of the 100 TB property: the edge table is hash-
    // partitioned by src ONCE (the cache build); afterwards every
    // iteration moves only the skinny (node, rank) state. Measured via
    // stage shuffle metrics with broadcasts off (at scale the edge
    // side never broadcasts).
    import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    val writes = new java.util.concurrent.ConcurrentLinkedQueue[Long]()
    val listener = new SparkListener {
      override def onStageCompleted(sc: SparkListenerStageCompleted): Unit =
        writes.add(sc.stageInfo.taskMetrics.shuffleWriteMetrics.bytesWritten)
    }
    spark.sparkContext.addSparkListener(listener)
    try {
      // ~2M edge rows over 50k src / 10k dst nodes: edge bytes dwarf
      // rank-state bytes, so the assertion below separates the two
      val e = spark.range(2000000)
        .select((col("id") % 50021).as("s"), (col("id") % 9973).as("d"))
        .where(col("s") =!= col("d"))
      Graph.pageRank(e, col("s"), col("d"), iters = 3).collect()
      eventually(writes.size >= 5)
      import scala.jdk.CollectionConverters._
      val ws = writes.asScala.toSeq.sorted(Ordering[Long].reverse)
      // largest stage = the one-time edge repartition; every other
      // stage (incl. all per-iteration ones) must be an order of
      // magnitude smaller — if an iteration re-shuffled edges there
      // would be a second edge-sized write
      assert(ws.head > (4L << 20), s"expected an edge-sized cache-build shuffle, got $ws")
      assert(ws(1) < ws.head / 10, s"a per-iteration stage re-shuffled edge-sized data: $ws")
    } finally {
      spark.sparkContext.removeSparkListener(listener)
      spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
    }
  }

  private def eventually(cond: => Boolean, timeoutMs: Long = 10000): Unit = {
    val deadline = System.currentTimeMillis() + timeoutMs
    while (!cond && System.currentTimeMillis() < deadline) Thread.sleep(100)
    assert(cond, "condition not met within timeout")
  }

  test("pageRankStandard: dangling mass redistributes — hand-computed chain") {
    // 1 -> 2, node 2 dangling. N = 2, D_0 = S.
    // r1(1) = base + 85*(0   + S div 2) div 100 = 575000000
    // r1(2) = base + 85*(S   + S div 2) div 100 = 1425000000
    // total after round 1 = 2S exactly: redistribution conserves mass
    // up to the D mod N floor remainder (zero here)
    val e = Seq((1L, 2L)).toDF("s", "d")
    val base = 150000000L
    val r1 = Graph.pageRankStandard(e, col("s"), col("d"), iters = 1)
      .as[(Long, Long)].collect().toMap
    assert(r1 == Map(1L -> 575000000L, 2L -> 1425000000L))
    assert(r1.values.sum == 2 * S)
    // round 2: D_1 = r1(2) = 1425000000, share = D_1 div 2 = 712500000
    // r2(1) = base + 85*(0 + 712500000) div 100
    // r2(2) = base + 85*(r1(1) + 712500000) div 100
    val r2 = Graph.pageRankStandard(e, col("s"), col("d"), iters = 2)
      .as[(Long, Long)].collect().toMap
    assert(r2(1L) == base + 85L * 712500000L / 100L)
    assert(r2(2L) == base + 85L * (575000000L + 712500000L) / 100L)
  }

  test("pageRankStandard: no dangling nodes == the leaky contract exactly") {
    // 2-cycle plus a chord: every node has out-edges, so D_t = 0 and
    // both variants compute the identical recurrence
    val e = Seq((1L, 2L), (2L, 1L), (1L, 3L), (3L, 2L)).toDF("s", "d")
    val leaky = Graph.pageRank(e, col("s"), col("d"), iters = 3)
      .as[(Long, Long)].collect().toMap
    val std = Graph.pageRankStandard(e, col("s"), col("d"), iters = 3)
      .as[(Long, Long)].collect().toMap
    assert(std == leaky)
  }

  test("pageRankStandard: total rank conserved up to N-bounded floor loss") {
    // star with dangling leaves — the case where the leaky variant
    // bleeds 85% of the leaf mass every round
    val e = Seq((1L, 2L), (1L, 3L), (1L, 4L), (5L, 1L)).toDF("s", "d")
    val n = 5L
    val std = Graph.pageRankStandard(e, col("s"), col("d"), iters = 3)
      .as[(Long, Long)].collect().toMap
    val leaky = Graph.pageRank(e, col("s"), col("d"), iters = 3)
      .as[(Long, Long)].collect().toMap
    // per round, floor losses: the div-100 damping floor (< 1 per
    // node), outdeg division (< deg per node), and D mod N (< N) —
    // at 3 rounds the conserved total can sag only by a few units·N
    val total = std.values.sum
    assert(total <= n * S && total > n * S - 3 * 10 * n,
      s"standard total $total should stay within floor-loss of ${n * S}")
    assert(leaky.values.sum < total,
      "leaky variant must hold strictly less total mass on a dangling graph")
    // determinism across partitionings
    val again = Graph.pageRankStandard(e.repartition(5), col("s"), col("d"), iters = 3)
      .as[(Long, Long)].collect().toMap
    assert(again == std)
  }

  test("triangleStats: K4 has 4 triangles; direction and multiplicity collapse") {
    val k4 = (for {
      u <- 1L to 4L; v <- 1L to 4L if u != v
    } yield (u, v)).toDF("a", "b") // both directions = multiplicity 2 per edge
    val r = Graph.triangleStats(k4, col("a"), col("b"))
      .as[(Long, Long, Long)].head()
    assert(r == ((4L, 6L, 4L)))
  }

  test("triangleStats: path graph has none; self-loops dropped") {
    val e = Seq((1L, 2L), (2L, 3L), (3L, 4L), (2L, 2L)).toDF("a", "b")
    val r = Graph.triangleStats(e, col("a"), col("b"))
      .as[(Long, Long, Long)].head()
    assert(r == ((4L, 3L, 0L)))
  }

  test("triangleStats: skewed hub — counts match the naive closed-wedge formula") {
    // hub 0 adjacent to 1..40, plus ring edges i—(i+1) among 1..40:
    // every ring edge closes with the hub -> 39 triangles
    val hub = (1L to 40L).map(i => (0L, i))
    val ring = (1L to 39L).map(i => (i, i + 1))
    val r = Graph.triangleStats((hub ++ ring).toDF("a", "b"), col("a"), col("b"))
      .as[(Long, Long, Long)].head()
    assert(r == ((41L, 79L, 39L)))
  }

  test("kCore: triangle with pendant — pendant peels, core survives with degrees") {
    val e = Seq((1L, 2L), (2L, 3L), (3L, 1L), (1L, 4L)).toDF("a", "b")
    val r1 = Graph.kCore(e, col("a"), col("b"), k = 2, rounds = 1)
      .as[(Long, Long)].collect().toMap
    // round 1 degrees are over ALL nodes: 1 has {2,3,4}
    assert(r1 == Map(1L -> 3L, 2L -> 2L, 3L -> 2L))
    val r2 = Graph.kCore(e, col("a"), col("b"), k = 2, rounds = 2)
      .as[(Long, Long)].collect().toMap
    // round 2: pendant gone, node 1's in-core degree drops to 2
    assert(r2 == Map(1L -> 2L, 2L -> 2L, 3L -> 2L))
  }

  test("kCore: path graph cascades to empty") {
    val e = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L)).toDF("a", "b")
    // round 1 peels the ends, round 2 peels 2 and 4, round 3 strands 3
    val r2 = Graph.kCore(e, col("a"), col("b"), k = 2, rounds = 2)
      .as[(Long, Long)].collect().toMap
    assert(r2 == Map(3L -> 2L))
    val r3 = Graph.kCore(e, col("a"), col("b"), k = 2, rounds = 3)
      .as[(Long, Long)].collect()
    assert(r3.isEmpty)
  }

  test("kCore: converged peel is a fixpoint and deterministic across partitionings") {
    val e = spark.range(3000)
      .select((col("id") % 101).as("a"), ((col("id") * 13) % 97).as("b"))
      .where(col("a") =!= col("b"))
    val r4 = Graph.kCore(e.repartition(1), col("a"), col("b"), k = 44, rounds = 4)
      .as[(Long, Long)].collect().toMap
    val r5 = Graph.kCore(e.repartition(9, col("b")), col("a"), col("b"), k = 44, rounds = 5)
      .as[(Long, Long)].collect().toMap
    // dense-ish random graph: settled by round 4, so rounds 4 and 5
    // agree under different partitionings — fixpoint + determinism
    assert(r4.nonEmpty && r4 == r5)
  }

  test("labelPropagation: star oscillates deterministically — pinned rounds") {
    val e = Seq((1L, 2L), (1L, 3L), (1L, 4L)).toDF("a", "b")
    val r1 = Graph.labelPropagation(e, col("a"), col("b"), rounds = 1)
      .as[(Long, Long)].collect().toMap
    // center adopts the smallest leaf label (three-way count tie);
    // every leaf adopts the center's label
    assert(r1 == Map(1L -> 2L, 2L -> 1L, 3L -> 1L, 4L -> 1L))
    val r2 = Graph.labelPropagation(e, col("a"), col("b"), rounds = 2)
      .as[(Long, Long)].collect().toMap
    // round 2: center's neighbors all carry 1 -> center 1; leaves see 2
    assert(r2 == Map(1L -> 1L, 2L -> 2L, 3L -> 2L, 4L -> 2L))
  }

  test("labelPropagation: two cliques with a bridge keep distinct communities") {
    val c1 = for { u <- 1L to 4L; v <- (u + 1) to 4L } yield (u, v)
    val c2 = for { u <- 11L to 14L; v <- (u + 1) to 14L } yield (u, v)
    val e = (c1 ++ c2 :+ ((4L, 11L))).toDF("a", "b")
    val r = Graph.labelPropagation(e, col("a"), col("b"), rounds = 3)
      .as[(Long, Long)].collect().toMap
    // each clique converges to its own minimum-id label
    assert((1L to 4L).map(r).toSet == Set(1L))
    assert((12L to 14L).map(r).toSet == Set(11L))
  }

  test("labelPropagation: deterministic across partitionings") {
    val e = spark.range(4000)
      .select((col("id") % 211).as("a"), ((col("id") * 17) % 199).as("b"))
      .where(col("a") =!= col("b"))
    val x = Graph.labelPropagation(e.repartition(1), col("a"), col("b"), rounds = 3)
      .as[(Long, Long)].collect().toMap
    val y = Graph.labelPropagation(e.repartition(7, col("a")), col("a"), col("b"), rounds = 3)
      .as[(Long, Long)].collect().toMap
    assert(x == y)
  }

  test("hits: star graph — hub center, authority leaves, hand-computed") {
    // 1 -> 2, 1 -> 3: node 1 is the only hub, 2/3 the authorities
    val e = Seq((1L, 2L), (1L, 3L)).toDF("s", "d")
    val r = Graph.hits(e, col("s"), col("d"), iters = 2, scale = 1000000L)
      .as[(Long, Long, Long)].collect().map(x => x._1 -> ((x._2, x._3))).toMap
    // round 1: a(2)=a(3)=hub0(1)=1e6, max=1e6 -> auth 1e6 each; a(1)=0
    // h(1)=a(2)+a(3)=2e6, max -> hub(1)=1e6; h(2)=h(3)=0
    // round 2 repeats identically (fixed point)
    assert(r == Map(
      1L -> ((0L, 1000000L)),
      2L -> ((1000000L, 0L)),
      3L -> ((1000000L, 0L))))
  }

  test("hits: 2-cycle — every node both perfect hub and authority") {
    val e = Seq((1L, 2L), (2L, 1L)).toDF("s", "d")
    val r = Graph.hits(e, col("s"), col("d"), iters = 3)
      .as[(Long, Long, Long)].collect().toSeq
    assert(r.toSet == Set((1L, 1000000L, 1000000L), (2L, 1000000L, 1000000L)))
  }

  test("hits: parallel edges collapse (simple-graph semantics)") {
    val dup = Seq((1L, 2L), (1L, 2L), (1L, 3L)).toDF("s", "d")
    val simple = Seq((1L, 2L), (1L, 3L)).toDF("s", "d")
    val a = Graph.hits(dup, col("s"), col("d"), iters = 2)
      .as[(Long, Long, Long)].collect().toSet
    val b = Graph.hits(simple, col("s"), col("d"), iters = 2)
      .as[(Long, Long, Long)].collect().toSet
    assert(a == b)
  }

  test("hits: deterministic across partitionings") {
    val e = spark.range(3000)
      .select((col("id") % 83).as("s"), ((col("id") * 13) % 79).as("d"))
      .where(col("s") =!= col("d"))
    val x = Graph.hits(e.repartition(1), col("s"), col("d"), iters = 2)
      .as[(Long, Long, Long)].collect().toSet
    val y = Graph.hits(e.repartition(9, col("d")), col("s"), col("d"), iters = 2)
      .as[(Long, Long, Long)].collect().toSet
    assert(x == y && x.nonEmpty)
  }

  test("personalizedPageRank: restart mass stays with the seed — hand-computed") {
    // 1 -> 2 -> 3, seed {1}: only node 1 gets base; mass flows down the chain
    val e = Seq((1L, 2L), (2L, 3L)).toDF("s", "d")
    val seeds = Seq(1L).toDF("n")
    val base = 150000000L
    val r1 = Graph.personalizedPageRank(e, col("s"), col("d"), seeds, col("n"), iters = 1)
      .as[(Long, Boolean, Long)].collect().map(x => x._1 -> x._3).toMap
    // r0 = (S, 0, 0); after 1 round: 1 -> base, 2 -> 85*S div 100, 3 -> 0
    assert(r1 == Map(1L -> base, 2L -> 85L * S / 100L, 3L -> 0L))
    val r2 = Graph.personalizedPageRank(e, col("s"), col("d"), seeds, col("n"), iters = 2)
      .as[(Long, Boolean, Long)].collect().map(x => x._1 -> x._3).toMap
    // round 2: 2 <- 85*base div 100; 3 <- 85*(85S div 100) div 100
    assert(r2 == Map(1L -> base,
      2L -> 85L * base / 100L,
      3L -> 85L * (85L * S / 100L) / 100L))
  }

  test("personalizedPageRank: unseeded disconnected component holds zero rank") {
    val e = Seq((1L, 2L), (10L, 11L)).toDF("s", "d")
    val seeds = Seq(1L).toDF("n")
    val r = Graph.personalizedPageRank(e, col("s"), col("d"), seeds, col("n"), iters = 3)
      .as[(Long, Boolean, Long)].collect()
    val m = r.map(x => x._1 -> x._3).toMap
    assert(m(10L) == 0L && m(11L) == 0L && m(1L) > 0L)
    assert(r.count(_._2) == 1) // exactly one flagged seed
  }

  test("personalizedPageRank: seeds outside the graph are ignored") {
    val e = Seq((1L, 2L)).toDF("s", "d")
    val seeds = Seq(1L, 999L).toDF("n")
    val r = Graph.personalizedPageRank(e, col("s"), col("d"), seeds, col("n"), iters = 1)
      .as[(Long, Boolean, Long)].collect()
    assert(r.map(_._1).toSet == Set(1L, 2L))
  }

  test("personalizedPageRank: deterministic across partitionings") {
    val e = spark.range(3000)
      .select((col("id") % 101).as("s"), ((col("id") * 31) % 97).as("d"))
      .where(col("s") =!= col("d"))
    val seeds = spark.range(10).select((col("id") * 11).as("n"))
    def run(d: org.apache.spark.sql.DataFrame) =
      Graph.personalizedPageRank(d, col("s"), col("d"), seeds, col("n"), iters = 3)
        .as[(Long, Boolean, Long)].collect().toSet
    assert(run(e.repartition(1)) == run(e.repartition(7, col("d"))))
  }

  test("linkPrediction: hand-computed jaccard on a path-plus-hub graph") {
    import spark.implicits._
    // square 1-2-3-4-1: each non-adjacent diagonal (1,3) and (2,4)
    // shares BOTH its neighbors. deg all 2 -> jaccard = 2/(2+2-2) = 1
    val e = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 1L)).toDF("a", "b")
    val r = Graph.linkPrediction(e, col("a"), col("b"),
        maxWedgeDegree = 10, topK = 10)
      .as[(Long, Long, Long, Long)].collect()
    assert(r.toSet ==
      Set((1L, 3L, 2L, 1000000L), (2L, 4L, 2L, 1000000L)))
  }

  test("linkPrediction: adjacent pairs excluded, degree cap removes hub wedges") {
    import spark.implicits._
    // star center 0 with leaves 1..5, plus edge 1-2.
    // uncapped: all leaf pairs share neighbor 0; (1,2) is an EDGE ->
    // excluded. jaccard for (i,j) leaves i,j>=3: 1/(1+1-1)=1;
    // pairs with 1 or 2 (deg 2): 1/(2+1-1)=1/2 or 1/(2+2-1)=1/3
    val e = (1L to 5L).map((0L, _)) :+ (1L, 2L)
    val all = Graph.linkPrediction(e.toDF("a", "b"), col("a"), col("b"),
        maxWedgeDegree = 10, topK = 100)
      .as[(Long, Long, Long, Long)].collect()
    assert(!all.exists(p => (p._1, p._2) == ((1L, 2L))))
    assert(all.count(_._4 == 1000000L) == 3) // (3,4),(3,5),(4,5)
    assert(all.length == 9) // C(5,2) leaf pairs minus edge (1,2)
    // cap 4 excludes the hub (deg 5): only wedge center left is 1/2
    // (deg 2) -> candidates are nbr pairs of 1 and of 2: (0,2)-edge?
    // no: (0,2) IS an edge; wedges at 1: (0,2)->edge; at 2: (0,1)->edge
    // -> nothing survives
    val capped = Graph.linkPrediction(e.toDF("a", "b"), col("a"), col("b"),
        maxWedgeDegree = 4, topK = 100).collect()
    assert(capped.isEmpty)
  }

  test("graphProfile: hand-computed reciprocity and degree extremes") {
    import spark.implicits._
    // edges: 1->2, 2->1 (mutual), 1->3, 3->4, 1->3 dup, 5->5 loop
    val e = Seq((1L, 2L), (2L, 1L), (1L, 3L), (3L, 4L), (1L, 3L), (5L, 5L))
      .toDF("a", "b")
    val r = Graph.graphProfile(e, col("a"), col("b"))
      .as[(Long, Long, Long, Long, Long, Long)].collect().head
    // distinct non-loop edges: 4; nodes {1,2,3,4}; mutual ordered: 2
    // reciprocity 500000; out: 1 has 2; in: all 1 -> max 1
    assert(r == ((4L, 4L, 2L, 500000L, 2L, 1L)))
  }

  test("linkPrediction: deterministic top-k across partitionings") {
    val e = spark.range(4000)
      .select((col("id") % 173).as("a"), ((col("id") * 53) % 167).as("b"))
      .where(col("a") =!= col("b"))
    def run(d: org.apache.spark.sql.DataFrame) =
      Graph.linkPrediction(d, col("a"), col("b"), maxWedgeDegree = 30, topK = 25)
        .collect().toSeq
    assert(run(e.repartition(1)) == run(e.repartition(9, col("b"))))
  }
}
