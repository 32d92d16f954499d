package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Graph analytics over extracted relation edges — the natural
  * downstream of the XML relation extraction (reference
  * XMLToCSV.py `--relations`/`--neo4j` produces exactly such node/edge
  * CSVs; see output_relation_csvs, XMLToCSV.py:357-417): once a
  * citation/authorship graph exists as an edge table, the first
  * questions asked of it are centrality and clustering structure.
  *
  * Everything here is 64-bit-integer-exact (scaled fixed-point, floor
  * division) so results are bit-reproducible across engines,
  * partitionings and runs — the same determinism contract as
  * [[Training]] and [[Clustering]].
  */
object Graph {

  /** Data-derived partition count for a persisted adjacency and the
    * per-round skinny-state exchanges. Two constraints, take the max:
    * a SIZE floor (≥ rows/2M, so a 10^10-edge graph splits into
    * thousands of partitions regardless of cluster width) and a
    * PARALLELISM term (up to the scheduler's defaultParallelism once
    * there are ≥50k rows per core to amortize task overhead — an
    * adjacency of a few thousand rows plans 1-task rounds instead of
    * 32 near-empty ones, while a ~1M-row adjacency still fans across
    * the cores; a pure rows/2M rule single-tasked the 0.9M-edge
    * co-shipping graph and went 2.3 s → 10 s). Guide §2: derive
    * partitioning from the data, not from a constant tuned for either
    * local mode or the cluster.
    */
  private def sizedParts(df: DataFrame, rows: Long): Int = {
    val par = df.sparkSession.sparkContext.defaultParallelism.toLong
    math.max(math.max(1L, rows / 2000000L),
      math.min(par, rows / 50000L)).toInt
  }

  /** Run `body` with spark.sql.shuffle.partitions scoped to `parts`
    * (the adjacency's own partition count), so every per-round
    * exchange matches the persisted adjacency's partitioning — the
    * rank/label/liveness tables re-exchange per round (skinny), the
    * edges never do. AQE is ALSO scoped off for actions inside the
    * body: the loop's exchanges are already sized from the data, so
    * adaptive re-planning can only re-decide what is pre-decided,
    * while its per-exchange sub-job materialization serializes the
    * skinny rounds (full-run A/B 2026-08-18: q152 +0.6 s, q178
    * +0.46 s under session AQE with unscoped loops).
    *
    * Isolation (r18): the scoped values live on a CHILD session
    * (`newSession()` — same SparkContext and SharedState, so the same
    * cache manager; its own SQLConf) instead of being set-and-restored
    * on the caller's session, which was not thread-safe on a shared
    * production session (a concurrent query planned mid-scope saw
    * partition counts sized for someone else's graph, and two
    * overlapping scopes raced on save/restore). `body` receives a
    * REBINDER — frames the loop chains from must pass through it so
    * their actions plan under the child conf (a Dataset plans under
    * ITS OWN session, wherever the action is called from) — and the
    * returned frame is re-bound to the caller's session, so
    * downstream consumers keep planning under the caller's
    * (production) settings, exactly as before. ConcurrentScopeSpec
    * pins the no-cross-talk property.
    */
  private def withParts(sess: org.apache.spark.sql.SparkSession, parts: Int)(
      body: (DataFrame => DataFrame) => DataFrame): DataFrame = {
    val child = org.apache.spark.sql.graftbridge.SessionBridge.scoped(sess, Seq(
      "spark.sql.shuffle.partitions" -> parts.toString,
      "spark.sql.adaptive.enabled" -> "false"))
    val rebind = (d: DataFrame) =>
      org.apache.spark.sql.graftbridge.SessionBridge.rebind(d, child)
    org.apache.spark.sql.graftbridge.SessionBridge.rebind(body(rebind), sess)
  }

  /** Integer-exact PageRank over a directed multigraph edge table
    * (parallel edge rows contribute independently; pre-`distinct`
    * upstream for simple-graph semantics).
    *
    * Fixed-point recurrence per node, all floor division:
    *   rank_0      = scale
    *   rank_{t+1}  = (15·scale) div 100
    *               + (85 · Σ_{(u→n)} (rank_t(u) div outdeg(u))) div 100
    * Dangling nodes (no out-edges) absorb rank without redistributing
    * it — mass leaks, matching the "no dangling patch" PageRank
    * variant; both engines compute the identical recurrence so the
    * leak is part of the contract, not noise.
    *
    * Scale shape: the EDGE table (the big thing — 100 TB of edges,
    * rank state is merely O(nodes)) is joined with its out-degree
    * once, hash-partitioned by src and persisted; every iteration
    * reuses that partitioning, so per-round wire traffic is the
    * skinny (node, rank) table plus the map-side-combined
    * contribution aggregate — the edges themselves never move again.
    * The per-edge contribution `rank div d` stays inside whole-stage
    * codegen; nothing wider than three longs crosses any exchange.
    * Overflow headroom: Σ in-contributions ≤ nodes·scale, so with the
    * default scale=1e9 the 85× product stays under 2^63 up to ~10^8
    * nodes; lower `scale` for larger graphs.
    */
  def pageRank(
      edges: DataFrame,
      src: Column,
      dst: Column,
      iters: Int = 3,
      scale: Long = 1000000000L): DataFrame = {
    require(iters > 0, s"iters must be positive, got $iters")
    require(scale > 0, s"scale must be positive, got $scale")
    val e0 = edges.select(src.cast("long").as("src"), dst.cast("long").as("dst"))
    // one narrow count sizes every exchange in the operator; the
    // adjacency join below has exactly one output row per edge, so
    // scoping shuffle partitions BEFORE building it makes the join's
    // own exchange produce the sized hash(src) layout — no staged
    // persist + repartition + eager-count cycle (2 jobs and a full
    // extra materialization saved per call)
    val parts = sizedParts(e0, e0.count())
    withParts(e0.sparkSession, parts) { rb =>
    val e = rb(e0)
    val nodes = e.select(col("src").as("node"))
      .union(e.select(col("dst").as("node")))
      .distinct().persist()
    // (src, dst, d) hash-partitioned ONCE by src at the sized count
    // via the join's own exchange; all rounds reuse that partitioning
    val adj = e.join(e.groupBy("src").agg(count(lit(1)).as("d")), "src")
      .persist()
    val base = 15L * scale / 100L
    var ranks = nodes.select(col("node"), lit(scale).as("rank"))
    for (_ <- 1 to iters) {
      val in = adj
        .join(ranks.withColumnRenamed("node", "src"), "src")
        .select(col("dst").as("node"), expr("rank div d").as("c"))
        .groupBy("node").agg(sum(col("c")).as("s"))
      ranks = nodes.join(in, Seq("node"), "left")
        .select(col("node"),
          (lit(base) + expr("85 * coalesce(s, 0L) div 100")).as("rank"))
    }
    // materialize the final rank table, then release the loop caches —
    // nodes/adj are referenced `iters` times by the lazy chain, so they
    // must stay cached THROUGH evaluation, but leaving them persisted
    // after return accumulates executor-store blocks on every call
    // (the leak the standard variant fixed). The RETURNED ranks stay
    // persisted for the caller to consume and release.
    val out = ranks.persist()
    out.count()
    nodes.unpersist()
    adj.unpersist()
    out
    }
  }

  /** Textbook PageRank: [[pageRank]]'s recurrence plus dangling-mass
    * redistribution — each round, the total rank held by nodes with no
    * out-edges is split evenly over ALL nodes (floor division; the
    * `D mod N` sub-unit remainder is the only mass that still leaks,
    * bounded by N·1 per round at any scale):
    *
    *   rank_{t+1}(n) = (15·scale) div 100
    *                 + (85 · (Σ_{(u→n)} rank_t(u) div outdeg(u)
    *                          + D_t div N)) div 100
    *   with D_t = Σ_{outdeg(u)=0} rank_t(u).
    *
    * Scale shape: identical to [[pageRank]] (edges partitioned by src
    * once and persisted; per-round wire = the skinny rank table) plus,
    * per round, ONE single-row aggregate over the dangling slice of
    * the rank table, broadcast back into the update — a scalar, never
    * a shuffle of anything wide. N is a driver scalar computed once.
    */
  def pageRankStandard(
      edges: DataFrame,
      src: Column,
      dst: Column,
      iters: Int = 3,
      scale: Long = 1000000000L): DataFrame = {
    require(iters > 0, s"iters must be positive, got $iters")
    require(scale > 0, s"scale must be positive, got $scale")
    val e0 = edges.select(src.cast("long").as("src"), dst.cast("long").as("dst"))
    // ONE pass over the edge table builds the node set WITH its
    // dangling flag (max of a per-endpoint has-out marker) — folding
    // what was three edge-table passes (distinct nodes, a distinct
    // src set, and an anti-join) into a single aggregate; at 100 TB
    // of edges that is two full scans saved, and the per-round
    // dangling-mass aggregate becomes a scan of the O(nodes) rank
    // table instead of a join
    // one narrow count sizes every exchange in the operator; the
    // adjacency join below has one output row per edge, so scoping
    // shuffle partitions BEFORE building it makes its own exchange
    // produce the sized hash(src) layout (no staged repartition pass)
    val parts = sizedParts(e0, e0.count())
    withParts(e0.sparkSession, parts) { rb =>
    val e = rb(e0)
    val nodes = e.select(col("src").as("node"), lit(1).as("has_out"))
      .union(e.select(col("dst").as("node"), lit(0).as("has_out")))
      .groupBy("node").agg(max(col("has_out")).as("has_out"))
      .persist()
    val adj = e.join(e.groupBy("src").agg(count(lit(1)).as("d")), "src")
      .persist()
    val nNodes = nodes.count() // O(1) driver scalar, computed once
    val base = 15L * scale / 100L
    var ranks = nodes.select(col("node"), col("has_out"), lit(scale).as("rank"))
    var cached: DataFrame = null // the persisted round table `ranks` aliases
    for (i <- 1 to iters) {
      val dMass = ranks.where(col("has_out") === 0)
        .agg(coalesce(sum(col("rank")), lit(0L)).as("dmass"))
      val in = adj
        .join(ranks.withColumnRenamed("node", "src"), "src")
        .select(col("dst").as("node"), expr("rank div d").as("c"))
        .groupBy("node").agg(sum(col("c")).as("s"))
      // each round reads ranks_t TWICE (dangling aggregate + the
      // contribution join) — materialize per round so the references
      // share one cached O(nodes) table instead of doubling the
      // re-evaluated lineage every iteration (2^iters blowup). Round
      // 1 reads the persisted `nodes` directly (ranks_0 is a literal
      // column over it), so only rounds 2+ pay a materialization.
      val next = nodes.join(in, Seq("node"), "left")
        .crossJoin(broadcast(dMass))
        .select(col("node"), col("has_out"),
          (lit(base) +
            expr(s"(85 * (coalesce(s, 0L) + dmass div ${nNodes}L)) div 100")).as("rank"))
      if (i == iters) ranks = next // final round folds into the output action
      else {
        val m = next.persist()
        m.count()
        if (cached != null) cached.unpersist()
        cached = m
        ranks = m
      }
    }
    // release the loop-invariant caches before returning — each bench
    // round calls this afresh, and un-released persists accumulate in
    // the executor store forever. The RETURNED table stays persisted
    // (materialized below); releasing it is the caller's job once
    // consumed. `cached` is the persisted round-(iters−1) table the
    // final lazy round still references twice — released only after
    // `out` materializes.
    val out = ranks.select(col("node"), col("rank")).persist()
    out.count()
    if (cached != null) cached.unpersist()
    nodes.unpersist()
    adj.unpersist()
    out
    }
  }

  /** Integer-exact HITS (Kleinberg hubs-and-authorities) over the
    * directed simple graph induced by an edge list (self-loops
    * dropped, multiplicity collapsed), for exactly `iters` rounds —
    * the fixed-round contract of [[pageRank]]. Per round, with
    * max-normalization in place of the usual L2 (division by a
    * root is irrational; division by the max is exact):
    *
    *   auth_{t}(n) = (Σ_{(u→n)} hub_{t-1}(u)) · scale div max-over-nodes
    *   hub_{t}(n)  = (Σ_{(n→v)} auth_{t}(v)) · scale div max-over-nodes
    *
    * all floor division, so scores are bit-identical across engines
    * and partitionings. The best authority/hub scores exactly `scale`
    * each round. Overflow headroom: a raw sum is ≤ degree·scale and
    * the normalize multiplies by scale, so with the default scale=10⁶
    * the product stays under 2⁶³ up to in/out-degrees of ~9·10⁶;
    * lower `scale` for hubbier graphs.
    *
    * Scale shape: the edge table is shuffled TWICE total (one copy
    * partitioned by src for the authority half-step, one by dst for
    * the hub half-step) and persisted; per round only the skinny
    * (node, score) table ships to each copy's partitioning and the
    * two sums are map-side combined. The per-round max is a 1-row
    * aggregate broadcast back in. Each RAW half-step sum is eagerly
    * localCheckpoint'ed — the max aggregate and the normalize both
    * reference it, so without truncation the lineage would double
    * every half-step (the kCore plan-blowup shape); the normalized
    * frames are single-read and stay lazy.
    */
  def hits(
      edges: DataFrame,
      src: Column,
      dst: Column,
      iters: Int,
      scale: Long = 1000000L): DataFrame = {
    require(iters >= 1, s"iters must be >= 1, got $iters")
    require(scale > 0, s"scale must be positive, got $scale")
    // persist the deduped edge set once — it feeds THREE consumers
    // (node set, src copy, dst copy) that each re-ran the distinct
    val e = edges.select(src.cast("long").as("src"), dst.cast("long").as("dst"))
      .where(col("src") =!= col("dst")).distinct().persist()
    val parts = sizedParts(e, e.count())
    val nodes0 = e.select(col("src").as("node"))
      .union(e.select(col("dst").as("node"))).distinct().persist()
    val eSrc0 = e.repartition(parts, col("src")).persist()
    val eDst0 = e.repartition(parts, col("dst")).persist()
    // Only the RAW half-step sums are double-read (max + normalize)
    // and need eager truncation; the normalized frames are each read
    // exactly once (by the next half-step's join, or the final
    // output), so they stay LAZY — lineage depth is bounded at two
    // lazy levels by the raw checkpoints, and the loop runs half the
    // eager jobs it would with per-frame checkpoints. The initial
    // frames are literal columns over the persisted node set.
    withParts(e.sparkSession, parts) { rb =>
    // every loop chain roots at one of these — rebound so the joins,
    // checkpoint materializations and the final eager output all plan
    // under the scoped child conf (same shared cache blocks)
    val nodes = rb(nodes0); val eSrc = rb(eSrc0); val eDst = rb(eDst0)
    var hub = nodes.select(col("node"), lit(scale).as("hub"))
    var auth = nodes.select(col("node"), lit(scale).as("auth"))
    for (_ <- 1 to iters) {
      // LAZY checkpoint: the logical plan is already the constant-size
      // LogicalRDD (so the max + normalize double-read can't double the
      // lineage per round), but no dedicated job runs here — the max
      // broadcast below is the first action and materializes the
      // persisted blocks as a side effect. 2 jobs/round saved vs the
      // eager form (q189: 16 → 12 jobs, ~1.8 → ~1.6 s warm).
      val aRaw = eSrc.join(hub.withColumnRenamed("node", "src"), "src")
        .groupBy(col("dst").as("node")).agg(sum("hub").as("a"))
        .localCheckpoint(false) // read twice: max + normalize
      val aMax = aRaw.agg(coalesce(max("a"), lit(0L)).as("am"))
      auth = nodes.join(aRaw, Seq("node"), "left")
        .crossJoin(broadcast(aMax))
        .select(col("node"),
          expr(s"coalesce(a, 0L) * ${scale}L div greatest(am, 1L)").as("auth"))
      val hRaw = eDst.join(auth.withColumnRenamed("node", "dst"), "dst")
        .groupBy(col("src").as("node")).agg(sum("auth").as("h"))
        .localCheckpoint(false)
      val hMax = hRaw.agg(coalesce(max("h"), lit(0L)).as("hm"))
      hub = nodes.join(hRaw, Seq("node"), "left")
        .crossJoin(broadcast(hMax))
        .select(col("node"),
          expr(s"coalesce(h, 0L) * ${scale}L div greatest(hm, 1L)").as("hub"))
    }
    val out = auth.join(hub, "node")
      .select(col("node"), col("auth"), col("hub")).localCheckpoint(true)
    nodes0.unpersist()
    eSrc0.unpersist()
    eDst0.unpersist()
    e.unpersist()
    out
    }
  }

  /** Personalized PageRank: [[pageRank]]'s integer recurrence with the
    * restart mass directed at a SEED set instead of spread uniformly —
    * the "related items" primitive (seeds = one user's items, ranks =
    * proximity of everything else to them):
    *
    *   rank_0(n)     = scale·[n ∈ seeds]
    *   rank_{t+1}(n) = (15·scale·[n ∈ seeds]) div 100
    *                 + (85 · Σ_{(u→n)} rank_t(u) div outdeg(u)) div 100
    *
    * Dangling mass leaks exactly as in [[pageRank]] (the pinned
    * contract there); seeds outside the graph's node set are ignored.
    *
    * Scale shape: identical to [[pageRank]] — edges partitioned by src
    * once and persisted, per-round wire is the skinny rank table — plus
    * a one-time left-join of the node table against the (distinct,
    * typically tiny, broadcastable) seed set to pin the restart flag.
    */
  def personalizedPageRank(
      edges: DataFrame,
      src: Column,
      dst: Column,
      seeds: DataFrame,
      seedCol: Column,
      iters: Int = 3,
      scale: Long = 1000000000L): DataFrame = {
    require(iters > 0, s"iters must be positive, got $iters")
    require(scale > 0, s"scale must be positive, got $scale")
    val e0 = edges.select(src.cast("long").as("src"), dst.cast("long").as("dst"))
    // sized the same way as [[pageRank]]: one narrow count, then the
    // adjacency join's own exchange produces the hash(src) layout
    val parts = sizedParts(e0, e0.count())
    withParts(e0.sparkSession, parts) { rb =>
    val e = rb(e0)
    val nodes = e.select(col("src").as("node"))
      .union(e.select(col("dst").as("node"))).distinct()
    val seedSet = seeds.select(seedCol.cast("long").as("node")).distinct()
    val flagged = nodes
      .join(seedSet.withColumn("f", lit(true)), Seq("node"), "left")
      .select(col("node"), coalesce(col("f"), lit(false)).as("is_seed"))
      .persist()
    val adj = e.join(e.groupBy("src").agg(count(lit(1)).as("d")), "src")
      .persist()
    val base = when(col("is_seed"), lit(15L * scale / 100L)).otherwise(lit(0L))
    var ranks = flagged.select(col("node"),
      when(col("is_seed"), lit(scale)).otherwise(lit(0L)).as("rank"))
    for (_ <- 1 to iters) {
      val in = adj
        .join(ranks.withColumnRenamed("node", "src"), "src")
        .select(col("dst").as("node"), expr("rank div d").as("c"))
        .groupBy("node").agg(sum(col("c")).as("s"))
      ranks = flagged.join(in, Seq("node"), "left")
        .select(col("node"), col("is_seed"),
          (base + expr("85 * coalesce(s, 0L) div 100")).as("rank"))
        .select(col("node"), col("rank"))
    }
    val out = flagged.select(col("node"), col("is_seed"))
      .join(ranks, "node").persist()
    out.count()
    flagged.unpersist()
    adj.unpersist()
    out
    }
  }

  /** One-row shape profile of the DIRECTED simple graph induced by an
    * edge list (self-loops dropped, multiplicity collapsed): node and
    * edge counts, the count of reciprocated directed edges (both u→v
    * and v→u present — each mutual PAIR contributes 2), the exact ppm
    * reciprocity (n_mutual·10⁶ div n_edges, the standard
    * ordered-edge definition), and the max out/in degree — the
    * pre-flight numbers that size every downstream graph job (degree
    * caps, skew salting, wedge bounds).
    *
    * Scale: one distinct over edges, a left-semi self-join on the
    * reversed key for reciprocity (longs only on the wire), two
    * map-side-combined degree aggregates, and five 1-row crossJoins.
    */
  def graphProfile(edges: DataFrame, src: Column, dst: Column): DataFrame = {
    val e = edges.select(src.cast("long").as("s"), dst.cast("long").as("d"))
      .where(col("s") =!= col("d")).distinct().persist()
    val nN = e.select(col("s").as("n")).union(e.select(col("d").as("n")))
      .distinct().agg(count(lit(1)).as("n_nodes"))
    val nE = e.agg(count(lit(1)).as("n_edges"))
    val mutual = e
      .join(e.select(col("d").as("s"), col("s").as("d")), Seq("s", "d"), "left_semi")
      .agg(count(lit(1)).as("n_mutual"))
    val outMax = e.groupBy("s").agg(count(lit(1)).as("od"))
      .agg(coalesce(max("od"), lit(0L)).as("max_out_deg"))
    val inMax = e.groupBy("d").agg(count(lit(1)).as("dd"))
      .agg(coalesce(max("dd"), lit(0L)).as("max_in_deg"))
    val out = nN.crossJoin(nE).crossJoin(mutual).crossJoin(outMax).crossJoin(inMax)
      .select(col("n_nodes"), col("n_edges"), col("n_mutual"),
        when(col("n_edges") === 0, lit(0L))
          .otherwise(expr("n_mutual * 1000000L div n_edges")).as("reciprocity_ppm"),
        col("max_out_deg"), col("max_in_deg"))
      .localCheckpoint(true)
    e.unpersist()
    out
  }

  /** Common-neighbor link prediction over the undirected simple graph
    * induced by an edge list: for every NON-adjacent pair (u, v) with
    * at least one shared neighbor reachable through a wedge center of
    * degree ≤ `maxWedgeDegree`, the shared-neighbor count and the
    * exact ppm neighborhood Jaccard
    *
    *   jaccard_ppm = cn·10⁶ div (deg(u) + deg(v) − cn)
    *
    * ranked to the deterministic global top-k by (jaccard desc,
    * cn desc, u, v) — the "suggest related items" primitive, and the
    * candidate generator for graph-side dedup review.
    *
    * The degree cap is the scale contract, same role as the LSH
    * hot-bucket caps: a raw hub of degree h generates h² wedge
    * candidates, so candidates through uncapped hubs would be
    * quadratic in the hub degree while carrying almost no signal (a
    * shared mega-hub says nothing about affinity). With the cap,
    * total candidates are ≤ Σ_{deg(w)≤cap} deg(w)² ≤ cap·2E — linear
    * in edges. cn is therefore "common neighbors OF DEGREE ≤ cap":
    * exact when the cap exceeds the max degree, a pinned documented
    * statistic otherwise. deg(u)/deg(v) in the Jaccard denominator
    * are UNcapped true degrees.
    *
    * Scale: one distinct over edges, one map-side-combined degree
    * aggregate, the capped wedge self-join (equi-join on the center,
    * only long pairs on the wire), one aggregate keyed by the
    * candidate pair, a left-anti join against the edge set, and a
    * global limit (partial top-k per partition, k rows to the driver).
    */
  def linkPrediction(
      edges: DataFrame,
      a: Column,
      b: Column,
      maxWedgeDegree: Int,
      topK: Int): DataFrame = {
    require(maxWedgeDegree >= 2, s"maxWedgeDegree must be >= 2, got $maxWedgeDegree")
    require(topK >= 1, s"topK must be >= 1, got $topK")
    val und = edges
      .select(least(a.cast("long"), b.cast("long")).as("u"),
        greatest(a.cast("long"), b.cast("long")).as("v"))
      .where(col("u") =!= col("v"))
      .distinct().persist()
    val sym = und.select(col("u").as("node"), col("v").as("nbr"))
      .union(und.select(col("v").as("node"), col("u").as("nbr")))
    val deg = sym.groupBy("node").agg(count(lit(1)).as("deg")).persist()
    val symCapped = sym
      .join(deg.where(col("deg") <= maxWedgeDegree).select("node"), "node")
    val cn = symCapped.as("x").join(symCapped.as("y"),
        col("x.node") === col("y.node") && col("x.nbr") < col("y.nbr"))
      .select(col("x.nbr").as("u"), col("y.nbr").as("v"))
      .groupBy("u", "v").agg(count(lit(1)).as("cn"))
    val out = cn
      .join(und, Seq("u", "v"), "left_anti")
      .join(deg.select(col("node").as("u"), col("deg").as("du")), "u")
      .join(deg.select(col("node").as("v"), col("deg").as("dv")), "v")
      .select(col("u"), col("v"), col("cn"),
        expr("cn * 1000000L div (du + dv - cn)").as("jaccard_ppm"))
      .orderBy(col("jaccard_ppm").desc, col("cn").desc, col("u"), col("v"))
      .limit(topK)
      .localCheckpoint(true)
    und.unpersist()
    deg.unpersist()
    out
  }

  /** Exact triangle count (plus node/edge counts) of the undirected
    * simple graph induced by an edge list: self-loops dropped,
    * direction and multiplicity collapsed.
    *
    * Degree-ordered orientation (Ortmann–Brandes / the MapReduce
    * triangle-counting standard): orient every undirected edge from
    * its (degree, id)-smaller endpoint to the larger, so each
    * triangle is counted exactly once at its lowest-ranked vertex and
    * — the 100 TB point — every wedge-generating vertex has
    * out-degree O(sqrt(edges)) even in power-law graphs (a raw hub of
    * degree h would otherwise generate h² wedge candidates; oriented,
    * its out-neighbors are only its higher-degree peers). The wedge
    * self-join and the closing-edge semi-join are both equi-joins on
    * edge keys; nothing but (long, long) pairs crosses any exchange.
    */
  def triangleStats(edges: DataFrame, a: Column, b: Column): DataFrame = {
    val und = edges
      .select(least(a.cast("long"), b.cast("long")).as("u"),
        greatest(a.cast("long"), b.cast("long")).as("v"))
      .where(col("u") =!= col("v"))
      .distinct().persist()
    val deg = und.select(col("u").as("n")).union(und.select(col("v").as("n")))
      .groupBy("n").agg(count(lit(1)).as("deg"))
    // orientation rank is the pair (deg, id): total, so each edge has
    // a unique direction and each triangle a unique lowest vertex
    val withDeg = und
      .join(deg.select(col("n").as("u"), col("deg").as("du")), "u")
      .join(deg.select(col("n").as("v"), col("deg").as("dv")), "v")
    val oriented = withDeg.select(
        when(col("du") < col("dv") ||
             (col("du") === col("dv") && col("u") < col("v")),
          struct(col("u").as("s"), col("v").as("t"),
            col("dv").as("dt")))
          .otherwise(struct(col("v").as("s"), col("u").as("t"),
            col("du").as("dt"))).as("e"))
      .select(col("e.s").as("s"), col("e.t").as("t"), col("e.dt").as("dt"))
      .persist()
    // wedges at s between rank-ordered out-neighbors (x, y); the
    // closing edge, if present, is oriented x -> y by construction
    val wedges = oriented.as("e1").join(oriented.as("e2"),
        col("e1.s") === col("e2.s") &&
          (col("e1.dt") < col("e2.dt") ||
           (col("e1.dt") === col("e2.dt") && col("e1.t") < col("e2.t"))))
      .select(col("e1.t").as("s"), col("e2.t").as("t"))
    val nTri = wedges.join(oriented.select("s", "t"), Seq("s", "t"))
      .agg(count(lit(1)).as("n_triangles"))
    val nNodes = deg.agg(count(lit(1)).as("n_nodes"))
    val nEdges = und.agg(count(lit(1)).as("n_edges"))
    nNodes.crossJoin(nEdges).crossJoin(nTri)
  }

  /** Synchronous k-core peel of the undirected simple graph induced by
    * an edge list: starting from all nodes, each round simultaneously
    * removes every node whose degree AMONG SURVIVORS is below `k`,
    * for exactly `rounds` rounds. Returns the surviving nodes with
    * their within-survivor degree — when the peel has converged inside
    * `rounds` (round R = round R−1, checkable by re-running with
    * rounds+1), this IS the k-core with in-core degrees; otherwise it
    * is the pinned round-R peel state, bit-identical across engines
    * and partitionings either way (the same fixed-round contract as
    * [[pageRank]]).
    *
    * Scale shape: the symmetric adjacency (2·edges rows of two longs)
    * is shuffled ONCE into an n-partitioned persisted cache; each
    * round ships only the skinny survivor set — once to probe the
    * n-side (co-partitioned with the cache, no adjacency movement)
    * and once hashed by m for the neighbor-liveness semi-join — and
    * the degree count is map-side combined, so per-round exchange
    * volume is O(survivors + live-edge partial counts), never the
    * adjacency itself. Peeling needs O(degeneracy) rounds in the
    * worst case; callers pick `rounds` per graph (social/web graphs
    * settle in a few dozen).
    */
  def kCore(
      edges: DataFrame,
      a: Column,
      b: Column,
      k: Int,
      rounds: Int): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    require(rounds >= 1, s"rounds must be >= 1, got $rounds")
    val und = edges
      .select(least(a.cast("long"), b.cast("long")).as("u"),
        greatest(a.cast("long"), b.cast("long")).as("v"))
      .where(col("u") =!= col("v"))
      .distinct()
    val staged = und.select(col("u").as("n"), col("v").as("m"))
      .union(und.select(col("v").as("n"), col("u").as("m")))
      .persist()
    val parts = sizedParts(staged, staged.count())
    val adj0 = staged.repartition(parts, col("n")).persist()
    adj0.count()
    staged.unpersist()
    withParts(adj0.sparkSession, parts) { rb =>
    val adj = rb(adj0)
    // localCheckpoint, not persist: each round references the survivor
    // frame TWICE (self- and neighbor-liveness), so without lineage
    // truncation the LOGICAL plan doubles per round and Catalyst
    // analysis goes exponential (~0.3 s round 1 → ~9 s round 6 on a
    // 147-node graph — planning, not data). LAZY checkpoints give the
    // same flat LogicalRDD leaf per round (the plan is fixed at
    // creation; only materialization defers), so the whole peel runs
    // as ONE pipelined job instead of `rounds` eager jobs — within it
    // each round's shared RDD computes once (persisted + stage-dedup'd)
    // and both liveness references read the same blocks. q177: 17 → 10
    // jobs. Superseded checkpoint blocks are released by the
    // ContextCleaner.
    var survivors = adj.select(col("n")).distinct()
      .withColumn("deg", lit(0L)).localCheckpoint(false)
    for (r <- 1 to rounds) {
      val alive = survivors.select("n")
      val deg = adj
        .join(alive, "n") // self alive; reuses adj's n-partitioning
        .join(alive.withColumnRenamed("n", "m"), "m") // neighbor alive
        .groupBy("n").agg(count(lit(1)).as("deg"))
      // the LAST round checkpoints EAGERLY: the whole lazy peel chain
      // then materializes in one job HERE, while adj's cached blocks
      // still exist — returning it lazy and unpersisting adj first
      // would make the caller's first action recompute the full
      // adjacency (distinct+union+repartition over all edges) once per
      // round's reference, O(rounds × edges) at scale
      survivors = deg.where(col("deg") >= k).localCheckpoint(r == rounds)
    }
    adj0.unpersist()
    survivors.select(col("n").as("node"), col("deg"))
    }
  }

  /** Synchronous label-propagation community detection: every node
    * starts labeled with its own id; each round, every node
    * simultaneously adopts the most frequent label among its
    * neighbors (ties broken toward the smallest label), for exactly
    * `rounds` rounds. Deterministic by construction — no random tie
    * coin, no visit order — so the result is bit-identical across
    * engines and partitionings; `rounds` is the pinned contract (LPA
    * famously oscillates on bipartite structures, so a fixpoint claim
    * would be unsound in general).
    *
    * Scale shape: the symmetric adjacency is shuffled ONCE into an
    * m-partitioned persisted cache (m is the join key every round —
    * labels are looked up at the NEIGHBOR end); per round, the skinny
    * (node, label) table ships to the cache's partitioning, the
    * (n, label) frequency count is map-side combined, and the argmax
    * is one more aggregate over at most one row per distinct
    * (node, neighbor-label) — no window, no sort. Nothing wider than
    * three longs crosses any exchange.
    */
  def labelPropagation(
      edges: DataFrame,
      a: Column,
      b: Column,
      rounds: Int): DataFrame = {
    require(rounds >= 1, s"rounds must be >= 1, got $rounds")
    val und = edges
      .select(least(a.cast("long"), b.cast("long")).as("u"),
        greatest(a.cast("long"), b.cast("long")).as("v"))
      .where(col("u") =!= col("v"))
      .distinct()
    val staged = und.select(col("u").as("n"), col("v").as("m"))
      .union(und.select(col("v").as("n"), col("u").as("m")))
      .persist()
    val parts = sizedParts(staged, staged.count())
    val adj0 = staged.repartition(parts, col("m")).persist()
    adj0.count()
    staged.unpersist()
    withParts(adj0.sparkSession, parts) { rb =>
    val adj = rb(adj0)
    // Every round's label table is read exactly ONCE (by the next
    // round's join), so the chain stays LAZY: one final job runs the
    // rounds as pipelined shuffle stages instead of paying a
    // materialization job per round (per-round eager truncation is
    // for DOUBLE-referenced round state — the kCore shape; here
    // lineage grows one reference-free level per round). `adj` is the
    // loop-invariant cache the chain reads `rounds` times; it must
    // stay persisted through the final materialization.
    var labels = adj.select(col("n").as("node")).distinct()
      .select(col("node"), col("node").as("label"))
    for (_ <- 1 to rounds) {
      // max(struct(cnt, -label)) = highest count, then smallest label —
      // the deterministic argmax without a window sort
      labels = adj
        .join(labels.withColumnRenamed("node", "m"), "m")
        .groupBy(col("n"), col("label")).agg(count(lit(1)).as("cnt"))
        .groupBy(col("n"))
        .agg(max(struct(col("cnt"), (-col("label")).as("neg"))).as("best"))
        .select(col("n").as("node"), (-col("best.neg")).as("label"))
    }
    val out = labels.persist()
    out.count()
    adj0.unpersist()
    // the RETURNED table stays persisted for the caller to release
    out
    }
  }
}
