package graft.dev

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** The embedding-compression LADDER at volume, on an ISOTROPIC corpus
  * (deterministic pseudo-uniform in [-1,1)⁶⁴ — deliberately NOT the
  * clustered IvfPqScaleSmoke corpus, where sign bits degenerate to
  * per-cluster constants): brute float cosine vs int8 vs binary
  * sign-bit vs Matryoshka prefix-16, each serving the same 100
  * queries at k=10 (rerank=100 for the two-stage modes), with
  * recall@10 measured against the brute truth.
  *
  * Usage: runMain graft.dev.AnnLadderSmoke [nVectors]
  *
  * Recorded (local[32], 125 GiB box, n=1M, 64-dim, 100 queries,
  * 2026-08-15 round 14, AFTER unrolling the pair-loop Hamming to
  * scalar bit_count(xor) — the interpreted zip_with form made binary
  * SLOWER than the native-dot brute scan):
  *   brute float cosine:            12.3s   recall 1000/1000 (truth)
  *   int8 quantized brute:          12.8s   recall  986/1000
  *   binary sign (rerank=100):       7.9s   recall  272/1000
  *   matryoshka-16 (isotropic):     14.0s   recall   25/1000
  *   matryoshka-16 (front-loaded):  20.8s   recall  744/1000
  *     (front-loaded = dim d scaled by 8/(8+d) — what MRL training
  *      produces; isotropic data is the explicit non-contract)
  * Reading: isotropic 64-dim is the WORST case for every sub-float
  * rung. Binary is ~1.6× faster at 27% recall@10 — a candidate
  * generator whose recall is bought back with rerank, and whose real
  * win (32× scan I/O) a page-cached inline-compute smoke cannot
  * show. Matryoshka's recall goes 25 → 744 per-mille the moment the
  * embedding is front-loaded, which is its contract (MRL-trained
  * embeddings); its wall here is brute-plus-overhead because the
  * prefix is computed inline — the rung pays off when the prefix is
  * a STORED column and stage 1 reads d'/d of the bytes. int8 keeps
  * ~exact recall at par wall; its 4× win is also storage I/O.
  */
object AnnLadderSmoke {
  def main(args: Array[String]): Unit = {
    val n = if (args.length > 0) args(0).toInt else 1000000
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import graft.operators.Similarity

    // xxhash64-mixed components: a linear-congruential formula here
    // produced near-duplicate vectors (all modes scored 1000/1000 —
    // a degenerate fixture, not a result)
    val vecs = spark.range(n.toLong).select(col("id"),
      expr("""transform(sequence(0, 63), d ->
        CAST(pmod(xxhash64(id, d), 1000) AS DOUBLE) / 500.0 - 1.0)""").as("vec"))
      .persist()
    vecs.count()
    val queries = vecs.where(col("id") % (n / 100) === 7).limit(100).persist()
    val nq = queries.count()

    def timed(name: String)(df: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
      val out = df.persist()
      val t0 = System.nanoTime()
      val rows = out.count()
      println(f"TIME $name: ${(System.nanoTime() - t0) / 1e9}%.1fs ($rows rows, $nq queries)")
      out
    }
    val brute = timed("brute float cosine")(
      Similarity.bruteForceTopK(queries, vecs, k = 10))
    def recall(cand: org.apache.spark.sql.DataFrame): Double =
      Similarity.topKRecall(brute, cand)
        .agg(avg("recall_per_mille")).head().getDouble(0)
    val int8 = timed("int8 quantized brute")(
      Similarity.quantizedTopK(queries, vecs, k = 10))
    println(f"RECALL int8: ${recall(int8)}%.0f/1000")
    val bin = timed("binary sign rerank=100")(
      Similarity.binaryTopK(queries, vecs, k = 10, rerank = 100))
    println(f"RECALL binary: ${recall(bin)}%.0f/1000")
    val mat = timed("matryoshka-16 rerank=100 (isotropic)")(
      Similarity.matryoshkaTopK(queries, vecs, k = 10, rerank = 100, dPrefix = 16))
    println(f"RECALL matryoshka isotropic: ${recall(mat)}%.0f/1000")

    // FRONT-LOADED corpus — what MRL training actually produces
    // (information concentrated in the leading dims; here dim d is
    // scaled by 8/(8+d), so the 16-dim prefix carries most of the
    // cosine mass): the prefix cut becomes a faithful candidate
    // generator, which is the operator's actual contract
    val vecsF = spark.range(n.toLong).select(col("id"),
      expr("""transform(sequence(0, 63), d ->
        (CAST(pmod(xxhash64(id, d), 1000) AS DOUBLE) / 500.0 - 1.0) * 8.0 / (8.0 + d))""").as("vec"))
      .persist()
    vecsF.count()
    val queriesF = vecsF.where(col("id") % (n / 100) === 7).limit(100).persist()
    queriesF.count()
    val bruteF = timed("brute float cosine (front-loaded)")(
      Similarity.bruteForceTopK(queriesF, vecsF, k = 10))
    val matF = timed("matryoshka-16 rerank=100 (front-loaded)")(
      Similarity.matryoshkaTopK(queriesF, vecsF, k = 10, rerank = 100, dPrefix = 16))
    val recF = Similarity.topKRecall(bruteF, matF)
      .agg(avg("recall_per_mille")).head().getDouble(0)
    println(f"RECALL matryoshka front-loaded: $recF%.0f/1000")
    spark.stop()
  }
}
