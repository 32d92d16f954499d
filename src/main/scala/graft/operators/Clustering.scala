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
      fpScale: Double = 1000.0): Array[Array[Long]] =
    runLloyd(df, id, vec, k, iters, fpScale)._2

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

  private def runLloyd(
      df: DataFrame,
      id: Column,
      vec: Column,
      k: Int,
      iters: Int,
      fpScale: Double): (DataFrame, Array[Array[Long]]) = {
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
    (assigned, cents)
  }

  /** One assignment pass: a single codegen'd map over the persisted
    * quantized corpus; centroids are a plan literal, so no join and no
    * exchange of any kind.
    */
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
}
