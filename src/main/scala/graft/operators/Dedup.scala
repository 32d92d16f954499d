package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deduplication operators for training-data pipelines, from exact to
  * near-dup. Designed scale-first:
  *
  *  - exact / fingerprint dedup: one hash-shuffle groupBy, map-side
  *    partial agg; no row ever carries the full text through the
  *    shuffle when `fingerprintOnly` projections are used upstream.
  *  - MinHash-LSH: candidate generation is groupBy(band-hash) — only
  *    documents sharing a band bucket ever meet, so the quadratic
  *    verify step runs per-bucket, not globally. All hashing is
  *    xxhash64 (codegen'd, deterministic across runs and executors).
  *  - SimHash: 64-bit signature via bit-vote aggregation; near-dup =
  *    hamming distance <= k on bucket-joined candidates.
  *  - n-gram Jaccard: exact verify metric, computed only on LSH or
  *    length-bucket candidates.
  */
object Dedup {

  /** Word n-gram shingles of the lowercased text (the unit of
    * near-dup comparison). Returns array<string>, distinct.
    */
  def shingles(text: Column, n: Int = 3): Column = {
    val toks = TextAnalysis.tokens(lower(text))
    val nT = size(toks)
    array_distinct(
      when(nT >= n,
        transform(sequence(lit(0), nT - n), i => concat_ws(" ", slice(toks, i + lit(1), lit(n)))))
        .otherwise(when(nT > 0, array(concat_ws(" ", toks))).otherwise(array())))
  }

  /** Exact dedup: keep the first (minimum id) document per distinct
    * normalized-content fingerprint. One shuffle on the 16-byte md5 —
    * the text itself never shuffles.
    */
  def exactDedup(df: DataFrame, id: Column, text: Column): DataFrame =
    df.select(id.as("doc_id"), TextAnalysis.fingerprint(text).as("fp"))
      .groupBy("fp")
      .agg(min("doc_id").as("keep_id"), count(lit(1)).as("n_dups"))

  /** MinHash signature: array of `k` minima of seeded xxhash64 over the
    * shingle set. Pure built-ins -> whole-stage codegen.
    */
  def minhashSignature(sh: Column, k: Int = 32): Column =
    array((0 until k).map { seed =>
      array_min(transform(sh, s => xxhash64(s, lit(seed))))
    }: _*)

  /** LSH band keys from a MinHash signature: `bands` hashes, each over
    * a contiguous rows-sized slice of the signature. Two docs collide
    * on a band iff that slice matches exactly.
    */
  def lshBands(sig: Column, bands: Int, rows: Int): Column =
    array((0 until bands).map { b =>
      xxhash64(concat_ws(",", transform(slice(sig, b * rows + 1, rows), _.cast("string"))), lit(b))
    }: _*)

  /** MinHash-LSH candidate pairs: explode band keys, self-join within
    * buckets (a < b to emit each pair once), then verify with exact
    * Jaccard over shingle sets. Only bucket-mates are compared — the
    * global cross product never materializes. Skew guard: buckets
    * larger than `maxBucket` are dropped (they are degenerate —
    * near-identical boilerplate — and would otherwise produce a
    * quadratic hot key; at 100 TB this is the difference between a
    * bounded shuffle and a stuck executor).
    */
  def minhashNearDups(
      df: DataFrame,
      id: Column,
      text: Column,
      nShingle: Int = 3,
      k: Int = 32,
      bands: Int = 8,
      threshold: Double = 0.6,
      maxBucket: Int = 1000): DataFrame = {
    val rows = k / bands
    val base = df
      .select(id.as("doc_id"), shingles(text, nShingle).as("sh"))
      .where(size(col("sh")) > 0)
      .withColumn("sig", minhashSignature(col("sh"), k))
      .withColumn("band", explode(lshBands(col("sig"), bands, rows)))

    val bucketed = base.select(col("band"), col("doc_id"), col("sh"))
    val small = bucketed
      .withColumn("bucket_n", count(lit(1)).over(
        org.apache.spark.sql.expressions.Window.partitionBy("band")))
      .where(col("bucket_n") <= maxBucket)
      .drop("bucket_n")

    val a = small.select(col("band"), col("doc_id").as("id_a"), col("sh").as("sh_a"))
    val b = small.select(col("band"), col("doc_id").as("id_b"), col("sh").as("sh_b"))
    a.join(b, Seq("band"))
      .where(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"),
        jaccard(col("sh_a"), col("sh_b")).as("jaccard"))
      .distinct()
      .where(col("jaccard") >= threshold)
  }

  /** Exact Jaccard similarity of two array<string> sets. */
  def jaccard(a: Column, b: Column): Column = {
    val inter = size(array_intersect(a, b)).cast("double")
    val uni = size(array_union(a, b)).cast("double")
    when(uni === 0, 0.0).otherwise(inter / uni)
  }

  /** SimHash-64 signature: per token, xxhash64 votes +1/-1 on each of
    * 64 bit positions; the sign of each accumulated vote is the
    * signature bit. Built-in array aggregate -> codegen, one pass.
    */
  def simhash(text: Column): Column = {
    val toks = TextAnalysis.tokens(lower(text))
    // Bit loop unrolled at plan-build time (64 is a constant), so each
    // vote is a codegen'd when() on a statically-shifted hash.
    val votes = aggregate(
      toks,
      array_repeat(lit(0L), 64),
      (acc, t) => {
        val h = xxhash64(t)
        val bitVotes = array((0 until 64).map { i =>
          when(shiftrightunsigned(h, i).bitwiseAND(lit(1L)) === 1L, lit(1L)).otherwise(lit(-1L))
        }: _*)
        zip_with(acc, bitVotes, (v, b) => v + b)
      })
    (0 until 64).map { i =>
      when(element_at(votes, i + 1) > 0, lit(1L << i)).otherwise(lit(0L))
    }.reduce((a, b) => a.bitwiseOR(b))
  }

  /** Hamming distance between two 64-bit signatures. */
  def hamming(a: Column, b: Column): Column = bit_count(a.bitwiseXOR(b))

  /** SimHash near-dups: bucket by the 4 16-bit chunks of the signature
    * (pigeonhole: any pair within hamming distance 3 shares at least
    * one exact chunk), then verify hamming <= maxDist within buckets.
    */
  def simhashNearDups(df: DataFrame, id: Column, text: Column, maxDist: Int = 3): DataFrame = {
    val sigs = df.select(id.as("doc_id"), simhash(text).as("sig"))
    val chunked = sigs.select(
      col("doc_id"), col("sig"),
      explode(array((0 until 4).map(i =>
        struct(lit(i).as("chunk_i"),
          shiftrightunsigned(col("sig"), i * 16).bitwiseAND(0xFFFFL).as("chunk_v"))): _*)).as("c"))
      .select(col("doc_id"), col("sig"), col("c.chunk_i"), col("c.chunk_v"))
    val a = chunked.select(col("chunk_i"), col("chunk_v"), col("doc_id").as("id_a"), col("sig").as("sig_a"))
    val b = chunked.select(col("chunk_i"), col("chunk_v"), col("doc_id").as("id_b"), col("sig").as("sig_b"))
    a.join(b, Seq("chunk_i", "chunk_v"))
      .where(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"), hamming(col("sig_a"), col("sig_b")).as("dist"))
      .distinct()
      .where(col("dist") <= maxDist)
  }

  /** n-gram Jaccard near-dups with length+language blocking: only
    * documents in the same (lang, length-bucket) block are compared.
    * Exact metric, bounded candidate set; the blocks shuffle once.
    */
  def ngramJaccardNearDups(
      df: DataFrame,
      id: Column,
      text: Column,
      lang: Column,
      nChars: Column,
      n: Int = 3,
      threshold: Double = 0.5,
      bucketWidth: Int = 100): DataFrame = {
    val base = df.select(
      id.as("doc_id"), shingles(text, n).as("sh"),
      lang.as("lang"), floor(nChars / bucketWidth).as("lb"))
      .where(size(col("sh")) > 0)
    val a = base.select(col("lang"), col("lb"), col("doc_id").as("id_a"), col("sh").as("sh_a"))
    val b = base.select(col("lang"), col("lb"), col("doc_id").as("id_b"), col("sh").as("sh_b"))
    a.join(b, Seq("lang", "lb"))
      .where(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"), jaccard(col("sh_a"), col("sh_b")).as("jaccard"))
      .where(col("jaccard") >= threshold)
  }

  /** Embedding near-dups: pairs with cosine similarity above the
    * threshold, candidates restricted by IVF-style coarse buckets
    * (see Similarity.ivfAssign) so the cross product stays per-bucket.
    */
  def embeddingNearDups(
      df: DataFrame,
      id: Column,
      vec: Column,
      threshold: Double,
      nBuckets: Int = 16): DataFrame = {
    val assigned = Similarity.ivfAssign(
      df.select(id.as("doc_id"), vec.as("v")), col("doc_id"), col("v"), nBuckets)
    val a = assigned.select(col("bucket"), col("doc_id").as("id_a"), col("v").as("v_a"))
    val b = assigned.select(col("bucket"), col("doc_id").as("id_b"), col("v").as("v_b"))
    a.join(b, Seq("bucket"))
      .where(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"),
        Similarity.cosine(col("v_a"), col("v_b")).as("cos"))
      .where(col("cos") >= threshold)
  }
}
