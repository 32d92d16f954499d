package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.VecOps

/** Distributed k-means over embedding columns, made INTEGER-EXACT so
  * the whole algorithm — assignment, centroid update, convergence
  * metric — is bit-reproducible across engines and partitionings, and
  * therefore end-to-end oracle-checkable (q101). The trick is running
  * Lloyd's algorithm in a fixed-point space:
  *
  *  - vectors quantize to `array<long>` via `q_i = floor(x_i*scale+0.5)`
  *    (one GLOBAL scale, so squared-L2 geometry is preserved — unlike
  *    the per-vector int8 quantization, which only preserves direction);
  *  - distances are 64-bit-integer squared-L2 (ties to the lowest
  *    centroid ordinal);
  *  - centroid updates are per-dimension truncated-integer means
  *    (`sum div count`, toward zero — both Spark's `div` and DuckDB's
  *    `//` truncate);
  *  - init is deterministic: the k vectors with the smallest ids, in
  *    id order, are centroids 0..k-1.
  *
  * Float k-means diverges across engines on summation order alone;
  * this formulation has no floats anywhere after the initial quantize
  * (whose float→double→floor chain is IEEE-identical everywhere).
  * Quantization moves each coordinate by <1/scale, so cluster
  * structure at scale=1000 is that of 3-decimal-rounded inputs —
  * the standard use (corpus bucketing for curation/mixing, SemDeDup
  * pre-clustering, IVF coarse quantizers) is insensitive to it.
  *
  * Scale shape (the canonical scalable Lloyd's):
  *  - the corpus quantizes once and persists; vectors NEVER shuffle;
  *  - assignment is one codegen'd map pass per iteration — the k·d
  *    centroid table rides into the plan as a literal (k·d·8 bytes;
  *    at the q101 shape 8×64 = 4 KB), so there is no join at all;
  *  - the update aggregates (cluster, dim) partial sums map-side:
  *    each iteration's only exchange carries ≤ k·d rows per input
  *    partition, and the driver collects exactly k·d rows (bounded by
  *    construction — k and d are operator parameters, not data);
  *  - production init for huge k would swap in k-means|| sampling;
  *    first-k init is the deterministic contract the oracle needs.
  *
  * Reference scope: the reference engine has no clustering operator —
  * this is part of the LLM-pipeline extension surface (SURVEY.md
  * §2.11), alongside SemDeDup-style semantic dedup which consumes it.
  */
object Clustering {

  /** Run `iters` assignment passes (with `iters - 1` centroid updates
    * between them) and return the final assignment:
    * `(id long, qv array<long>, cluster int, dist long)` — one row per
    * input vector, `dist` the integer squared-L2 to its centroid.
    * `iters = 1` is pure nearest-init-centroid assignment.
    */
  def kmeansFixedPoint(
      df: DataFrame,
      id: Column,
      vec: Column,
      k: Int,
      iters: Int,
      fpScale: Double = 1000.0): DataFrame =
    runLloyd(df, id, vec, k, iters, fpScale)._1

  /** The trained model alone: centroids in the fixed-point space after
    * `iters` assignment passes, for serving new data via
    * [[assignFixedPoint]] (batch or streaming — the assignment plan is
    * a stateless map, so it drops into `readStream` pipelines as-is).
    */
  def kmeansCentroidsFixedPoint(
      df: DataFrame,
      id: Column,
      vec: Column,
      k: Int,
      iters: Int,
      fpScale: Double = 1000.0): Array[Array[Long]] = {
    val (_, cents, cached) = runLloydCached(df, id, vec, k, iters, fpScale)
    // centroids are already on the driver — release the quantized
    // corpus cache the discarded assignment plan hangs on to (pqTrain
    // calls this once PER SUBSPACE; leaving m caches of the corpus
    // pinned would defeat PQ's whole memory story)
    cached.unpersist()
    cents
  }

  /** Serve-side assignment of (new) vectors to a trained centroid set:
    * quantize with the SAME fpScale the model was trained with, then
    * one zero-shuffle codegen'd map pass (centroids ride as a plan
    * literal). Output: input columns + (cluster int, dist long).
    */
  def assignFixedPoint(
      df: DataFrame,
      vec: Column,
      cents: Array[Array[Long]],
      fpScale: Double = 1000.0): DataFrame = {
    require(cents.nonEmpty, "assignFixedPoint: empty centroid set")
    df.withColumn("__nc",
        VecOps.nearestCentroid(VecOps.fixedPoint(vec, fpScale), typedLit(cents.flatten)))
      .withColumn("cluster", col("__nc.cluster"))
      .withColumn("dist", col("__nc.dist"))
      .drop("__nc")
  }

  /** Product-quantization codebook (Jégou et al. 2011, "Product
    * quantization for nearest neighbor search"): the d-dim fixed-point
    * space splits into `m` contiguous subspaces of d/m dims, each
    * getting its own k-centroid codebook from the SAME integer Lloyd's
    * as [[kmeansFixedPoint]] — so training, encoding, and serving are
    * all bit-reproducible. Returns m × k × (d/m) centroids,
    * subspace-major. A vector encodes to m small ints (codes), a 4-32×
    * compression of the corpus on disk and through every exchange; ADC
    * serving never touches original vectors.
    *
    * Scale: m independent Lloyd's runs over sliced columns — each is
    * the [[kmeansFixedPoint]] plan (zero-shuffle assignment, k·d/m
    * partial-sum exchange); the corpus is scanned once per (subspace,
    * iteration). The model is m·k·(d/m) = k·d longs on the driver —
    * the same size as one k-means model.
    */
  def pqTrain(
      df: DataFrame,
      id: Column,
      vec: Column,
      m: Int,
      k: Int,
      iters: Int,
      fpScale: Double = 1000.0): Array[Array[Array[Long]]] = {
    require(m > 0, s"m must be positive, got $m")
    (0 until m).map { j =>
      kmeansCentroidsFixedPoint(
        df, id, subvector(vec, m, j), k, iters, fpScale)
    }.toArray
  }

  /** Encode vectors against a trained PQ codebook: m nearest-centroid
    * assignments over the sliced fixed-point vector — one codegen'd
    * zero-shuffle map pass (each subspace codebook rides as a plan
    * literal). Output: input columns + `codes` array<int> of length m.
    */
  def pqEncode(
      df: DataFrame,
      vec: Column,
      model: Array[Array[Array[Long]]],
      fpScale: Double = 1000.0): DataFrame = {
    val m = model.length
    require(m > 0, "pqEncode: empty model")
    val codes = (0 until m).map { j =>
      VecOps.nearestCentroid(
        VecOps.fixedPoint(subvector(vec, m, j), fpScale),
        typedLit(model(j).flatten)).getField("cluster")
    }
    df.withColumn("codes", array(codes: _*))
  }

  /** PQ top-k serve (ADC): each query computes its m·k lookup table
    * once (native `pq_lut`), broadcasts against the coded corpus, and
    * ranks by the exact-integer ADC distance (native `pq_adc` — m
    * array lookups per candidate, no vector arithmetic). Ties break
    * by corpus id. Output: (query_id, corpus id column, adc_dist, rank
    * ≤ kNN).
    *
    * Scale shape: the corpus side carries only (id, m ints) — the
    * whole point of PQ: at m=8 that is ~40 bytes per candidate vs
    * 256+ for a float vector; the query side (with LUTs, m·k longs
    * each) broadcasts; ranking is the per-query top-k window over
    * candidates. Compose with the IVF bucketed index for
    * sub-linear candidate sets — this operator is the within-bucket
    * scorer.
    */
  def pqTopK(
      queries: DataFrame,
      queryId: Column,
      queryVec: Column,
      coded: DataFrame,
      codedId: Column,
      model: Array[Array[Array[Long]]],
      kNN: Int,
      fpScale: Double = 1000.0): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val m = model.length
    val flat = model.flatten.flatten
    val q = queries.select(queryId.as("query_id"),
      VecOps.pqLut(VecOps.fixedPoint(queryVec, fpScale), typedLit(flat), m).as("__lut"))
    coded.select(codedId.as("corpus_id"), col("codes"))
      .join(broadcast(q))
      .where(col("query_id") =!= col("corpus_id"))
      .select(col("query_id"), col("corpus_id"),
        VecOps.pqAdc(col("codes"), col("__lut")).as("adc_dist"))
      .withColumn("rank", row_number().over(
        Window.partitionBy("query_id").orderBy(col("adc_dist"), col("corpus_id"))))
      .where(col("rank") <= kNN)
  }

  /** Contiguous subvector j of m: elements [j·d/m, (j+1)·d/m) —
    * `slice` is 1-based. Requires d divisible by m (enforced by the
    * native kernels downstream).
    */
  private def subvector(vec: Column, m: Int, j: Int): Column =
    slice(vec, (size(vec) / m) * j + 1, size(vec) / m)

  private def runLloyd(
      df: DataFrame,
      id: Column,
      vec: Column,
      k: Int,
      iters: Int,
      fpScale: Double): (DataFrame, Array[Array[Long]]) = {
    val (assigned, cents, _) = runLloydCached(df, id, vec, k, iters, fpScale)
    (assigned, cents)
  }

  private def runLloydCached(
      df: DataFrame,
      id: Column,
      vec: Column,
      k: Int,
      iters: Int,
      fpScale: Double): (DataFrame, Array[Array[Long]], DataFrame) = {
    require(k > 0, s"k must be positive, got $k")
    require(iters >= 1, s"iters must be >= 1, got $iters")
    val q = df.select(id.cast("long").as("id"), VecOps.fixedPoint(vec, fpScale).as("qv"))
      .where(col("qv").isNotNull)
      .persist()
    // k rows — bounded by the operator parameter, not the data
    val init = q.orderBy("id").limit(k).select("qv").collect()
    require(init.nonEmpty, "kmeansFixedPoint: empty input")
    var cents: Array[Array[Long]] = init.map(_.getSeq[Long](0).toArray)
    var assigned = assignStep(q, cents)
    var it = 1
    while (it < iters) {
      cents = updateStep(assigned, cents)
      assigned = assignStep(q, cents)
      it += 1
    }
    (assigned, cents, q)
  }

  /** One assignment pass: a single codegen'd map over the persisted
    * quantized corpus; centroids are a plan literal, so no join and no
    * exchange of any kind.
    */
  /** Greedy k-center / farthest-first traversal (Gonzalez 1985,
    * "Clustering to minimize the maximum intercluster distance"):
    * DIVERSITY-aware exemplar selection — each pick is the point
    * whose min integer-squared-L2 distance to everything already
    * selected is LARGEST, the coreset primitive a curation pipeline
    * uses to "cover the embedding space with k exemplars" (top-k by
    * score piles onto one mode; farthest-first provably 2-approximates
    * the optimal k-center cover). Deterministic: the seed is the
    * lowest id, distance ties break to the lowest id. Output
    * (pick_order, id, radius) where radius is the picked point's
    * min-distance to the previously selected set at selection time
    * (seed radius 0) — radius at pick r IS the k-center coverage
    * radius of the first r exemplars, and the sequence is
    * non-increasing.
    *
    * Scale shape: ≤ k map-only corpus scans — the per-row
    * min-distance folds incrementally (`least(prev, d²(v, newest))`,
    * a codegen'd map over the persisted quantized corpus with the
    * newest pick riding as a plan literal), the argmax is a
    * TakeOrdered(1), and driver traffic is ONE (id, vector) row per
    * round. State persists per round, previous round released (the
    * iterative-lineage rule k-means follows). Stops early when the
    * corpus has fewer than k rows.
    */
  def kCenterGreedy(
      df: DataFrame,
      id: Column,
      vec: Column,
      k: Int,
      fpScale: Double = 1000.0): DataFrame = {
    require(k > 0, s"k must be positive, got $k")
    val spark = df.sparkSession
    import spark.implicits._
    var state = df.select(id.cast("long").as("id"),
      VecOps.fixedPoint(vec, fpScale).as("qv")).persist()
    val n = state.count()
    val picks = scala.collection.mutable.ArrayBuffer.empty[(Long, Long, Long)]
    var pickRow = state.orderBy(col("id")).limit(1)
      .select(col("id"), col("qv"), lit(0L).as("mind")).head()
    var round = 0
    while (round < k && round < n) {
      val pid = pickRow.getLong(0)
      val pvec = pickRow.getSeq[Long](1).toArray
      picks += ((round.toLong, pid, pickRow.getLong(2)))
      if (round + 1 < k && round + 1 < n) {
        val d = VecOps.nearestCentroid(col("qv"), typedLit(pvec)).getField("dist")
        val next = state.where(col("id") =!= pid)
          .withColumn("mind", if (round == 0) d else least(col("mind"), d))
          .persist()
        next.count()
        state.unpersist()
        state = next
        pickRow = state.orderBy(col("mind").desc, col("id")).limit(1)
          .select(col("id"), col("qv"), col("mind")).head()
      }
      round += 1
    }
    state.unpersist()
    picks.toSeq.toDF("pick_order", "id", "radius")
  }

  private def assignStep(q: DataFrame, cents: Array[Array[Long]]): DataFrame =
    q.select(col("id"), col("qv"),
        VecOps.nearestCentroid(col("qv"), typedLit(cents.flatten)).as("nc"))
      .select(col("id"), col("qv"),
        col("nc.cluster").as("cluster"), col("nc.dist").as("dist"))

  /** One Lloyd update: per-(cluster, dim) truncated-integer mean.
    * Map-side-combined aggregation; the driver collect is exactly the
    * ≤ k·d aggregated rows. Clusters that lost every member keep their
    * previous centroid (same rule as the oracle's coalesce).
    */
  private def updateStep(assigned: DataFrame, prev: Array[Array[Long]]): Array[Array[Long]] = {
    val next = prev.map(_.clone)
    assigned.select(col("cluster"), posexplode(col("qv")).as(Seq("dim", "v")))
      .groupBy("cluster", "dim")
      .agg(sum("v").as("s"), count(lit(1)).as("n"))
      .collect() // ≤ k·d rows — bounded by operator parameters
      .foreach { r =>
        // Long./ truncates toward zero — the contract DuckDB's // shares
        next(r.getInt(0))(r.getInt(1)) = r.getLong(2) / r.getLong(3)
      }
    next
  }

  /** One PUBLIC Lloyd update for incremental/streaming training:
    * assign `batch` to the nearest of `cents` and return the
    * truncated-integer-mean centroids (clusters that saw no member
    * keep their previous value — [[updateStep]]'s rule). Feeding
    * micro-batches sequentially IS mini-batch k-means; feeding the
    * whole corpus once is exactly one batch Lloyd iteration, which is
    * the q266 equality contract. Same shapes as the batch trainer:
    * zero-shuffle assignment (centroids are a plan literal), k·d
    * map-side-combined partial sums, bounded k·d driver collect.
    */
  def lloydUpdateFixedPoint(
      batch: DataFrame,
      vec: Column,
      cents: Array[Array[Long]],
      fpScale: Double = 1000.0): Array[Array[Long]] = {
    require(cents.nonEmpty, "lloydUpdateFixedPoint: empty centroid set")
    val assigned = batch
      .select(VecOps.fixedPoint(vec, fpScale).as("qv"))
      .where(col("qv").isNotNull)
      .select(col("qv"),
        VecOps.nearestCentroid(col("qv"), typedLit(cents.flatten)).as("nc"))
      .select(col("qv"), col("nc.cluster").as("cluster"))
    updateStep(assigned, cents)
  }

  /** Cluster-quality profile of a trained k-means model — the
    * cohesion-vs-separation gate run before trusting clusters for
    * curation/mixing decisions: per cluster, its size, the integer
    * within-cluster sum of squared distances (inertia), the sum of
    * each member's squared distance to its SECOND-nearest centroid
    * (separation), and the exact ppm cohesion ratio
    *
    *   cohesion_ppm = inertia·10⁶ div separation
    *
    * — a silhouette-flavored statistic in pure integers (a true
    * silhouette divides per point; summing numerators and denominators
    * separately keeps the 64-bit-exact contract). Near 10⁶ means the
    * second choice was just as close (the cluster isn't real);
    * well below means tight and separated.
    *
    * Scale: trains via [[kmeansCentroidsFixedPoint]] (its bounded k·d
    * driver collect per round), then ONE extra zero-shuffle map pass —
    * own distance from the codegen'd nearest-centroid kernel, the
    * second-nearest from k declarative per-centroid squared-L2 columns
    * (k·d work per row, the same constant as assignment) — and one
    * cluster-keyed aggregate.
    */
  def clusterQuality(
      df: DataFrame,
      id: Column,
      vec: Column,
      k: Int,
      iters: Int,
      fpScale: Double = 1000.0): DataFrame = {
    require(k >= 2, s"clusterQuality needs k >= 2, got $k")
    val cents = kmeansCentroidsFixedPoint(df, id, vec, k, iters, fpScale)
    val assigned = assignFixedPoint(
      df.select(id.as("id"), vec.as("v")), col("v"), cents, fpScale)
    val qv = VecOps.fixedPoint(col("v"), fpScale)
    // per-centroid exact squared-L2 as (dist, cid) structs; the
    // second-nearest is the min over the non-own entries
    val dists = array(cents.toIndexedSeq.zipWithIndex.map { case (cv, j) =>
      struct(
        aggregate(zip_with(qv, typedLit(cv), (a, b) => (a - b) * (a - b)),
          lit(0L), (acc, x) => acc + x).as("d"),
        lit(j).as("cid"))
    }: _*)
    assigned
      .withColumn("d2",
        array_min(transform(
          filter(dists, s => s.getField("cid") =!= col("cluster")),
          s => s.getField("d"))))
      .groupBy(col("cluster").cast("long").as("cluster"))
      .agg(count(lit(1)).as("n"), sum("dist").as("inertia"),
        sum("d2").as("separation"))
      .select(col("cluster"), col("n"), col("inertia"), col("separation"),
        // inertia is an n·d·scale²-sized sum — the ppm ratio runs in
        // DECIMAL(38,0) so ANSI mode can't overflow it at volume
        when(col("separation") === 0, lit(1000000L))
          .otherwise(expr(
            "CAST(CAST(inertia AS DECIMAL(38,0)) * 1000000" +
              " div CAST(separation AS DECIMAL(38,0)) AS BIGINT)"))
          .as("cohesion_ppm"))
  }
}
