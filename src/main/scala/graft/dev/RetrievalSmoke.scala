package graft.dev

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.operators.TextAnalysis

/** Focused volume smoke for the text-scan retrieval/profiling path
  * (BM25, blocklist) — same synthetic corpus as [[ScaleSmoke]], only
  * the stages whose cost is per-document tokenizer CPU, so a scan-
  * level change (e.g. the single-pass `term_freqs` expression) can be
  * re-measured in ~1 min instead of re-running the full 15-min smoke.
  *
  * Usage: runMain graft.dev.RetrievalSmoke [nDocs]
  */
object RetrievalSmoke {
  def main(args: Array[String]): Unit = {
    val nDocs = if (args.nonEmpty) args(0).toLong else 1000000L
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"TIME $label: ${(System.nanoTime() - t0) / 1e9}%.1fs"); r
    }
    def mkCorpus(lo: Long, hi: Long) = {
      val base = spark.range(lo, hi)
        .withColumn("base", when(col("id") % 20 === 1, col("id") - 1).otherwise(col("id")))
      val words = (0 until 45).map { i =>
        val seed = when(col("base") =!= col("id") && lit(i) >= 42, col("id")).otherwise(col("base"))
        concat(lit("w"), pmod(xxhash64(seed * 100 + i), lit(5000)))
      }
      base.select(col("id").as("doc_id"), concat_ws(" ", words: _*).as("text"))
    }
    val docs = mkCorpus(0, nDocs).persist()
    time("corpus materialize")(docs.count())

    val bm = time("bm25TopK (3 terms, zero-explode)")(
      graft.operators.Retrieval.bm25TopK(docs, col("doc_id"), col("text"),
        Seq("w17", "w433", "w2990"), topK = 25).count())
    require(bm == 25L, s"bm25 top-k short: $bm of 25")
    // .where(kept) so column pruning can't elide the scan under count()
    val blk = time("blocklistFilter (map-only scan)")(
      TextAnalysis.blocklistFilter(docs, col("doc_id"), col("text"),
        Seq("w17", "w433", "w2990", "w4444"), maxPerMille = 25L)
        .where(col("kept")).count())
    val mp = time("multiPatternFilter (6-phrase Aho-Corasick scan)")(
      TextAnalysis.multiPatternFilter(docs, col("doc_id"), col("text"),
        Seq("w1 w2", "w42", "w999 w1000", "w123", "w7 w8 w9", "w4999"),
        maxMatches = 0L).where(col("kept")).count())
    val tr = time("trainBatchPerceptron (B=256, 3 rounds)")(
      graft.operators.Training.trainBatchPerceptron(docs, col("doc_id"),
        col("text"), col("doc_id") % 2 === 0, buckets = 256, iters = 3).count())
    // the ASCII common case exercises the NFC short-circuit; accents
    // run the full NFD pass on a 1-in-5 accented slice
    val nf = time("nfcNormalize + stripAccents (1-in-5 accented)")(
      docs.select(
          graft.functions.TextOps.nfcNormalize(
            when(col("doc_id") % 5 === 0,
              concat(col("text"), lit(" café naïve"))).otherwise(col("text"))).as("n"),
          graft.functions.TextOps.stripAccents(col("text")).as("a"))
        .select(sum(length(col("n"))) + sum(length(col("a")))).head().getLong(0))
    val ac = time("applyChanges (1% changeset)")(
      graft.operators.Snapshot.applyChanges(
        docs.select(col("doc_id"), col("text")), col("doc_id"), col("text"),
        docs.where(col("doc_id") % 100 === 0)
          .select(col("doc_id").as("id"),
            when(col("doc_id") % 200 === 0, lit("delete")).otherwise(lit("upsert")).as("op"),
            concat(col("text"), lit(" v2")).as("content"))).count())
    val vocabDf = graft.operators.Training.buildVocab(docs, col("text"),
      maxSize = 10000, minCount = 2L).persist()
    val vc = time("buildVocab (top 10k, minCount 2)")(vocabDf.count())
    require(vc == 5000L, s"expected the 5000-word synthetic vocab, got $vc")
    val sc = time("correctTerms (8 terms, maxDist 2, 5000-token vocab)")(
      graft.operators.Retrieval.correctTerms(vocabDf,
        Seq("w17", "w4333x", "w29900", "wx1", "zqzqzq", "w99q", "w123w", "w4999x"),
        maxDist = 2).count())
    require(sc == 8L, s"correctTerms must emit one row per term, got $sc")
    val qb = time("qualityBlend (2 signals, quartiles)")(
      graft.operators.Sampling.qualityBlend(docs, col("doc_id"),
        Seq(length(col("text")).cast("long"),
          pmod(xxhash64(col("doc_id")), lit(997L))), nBuckets = 4)
        .groupBy("blend").count().count())
    val dc = time("dataCard (5 synthetic sources)")(
      graft.operators.Profiling.dataCard(
        docs.withColumn("src", (col("doc_id") % 5).cast("string"))
          .withColumn("lang", (col("doc_id") % 7).cast("string")),
        col("src"), col("lang"), length(col("text"))).count())
    val sk = time("sourceKeywords (100 sources, top 5, c-TF-IDF)")(
      graft.operators.Profiling.sourceKeywords(
        docs.withColumn("src", (col("doc_id") % 100).cast("string")),
        col("src"), col("text"), topK = 5).count())
    require(sk == 500L, s"expected 100 sources x top 5, got $sk")
    val so = time("crossSourceOverlap (5 synthetic sources)")(
      graft.operators.Profiling.crossSourceOverlap(
        docs.withColumn("src", (col("doc_id") % 5).cast("string")),
        col("src"), col("text"), n = 3, hashKeys = true).count())
    // the build-once / serve-many split: the build pays the one
    // corpus-sized aggregate; each serve should then be near-constant
    // (pruned buckets only), which is the number that matters at 100 TB
    val inv = time("buildInvertedIndex + writeBucketed (64 buckets)") {
      val idx = graft.operators.Retrieval.buildInvertedIndex(
        docs, col("doc_id"), col("text"), nBuckets = 64)
      graft.operators.Scale.writeBucketedSorted(
        idx.postings, "graft_smoke_inv_postings", "bucket", 64, "bucket", "term")
      idx.copy(postings = spark.table("graft_smoke_inv_postings"))
    }
    val sv = time("bm25IndexedTopK (3-query batch vs persisted postings)")(
      graft.operators.Retrieval.bm25IndexedTopK(inv,
        Seq(0L -> Seq("w17", "w433", "w2990"), 1L -> Seq("w1", "w42"),
          2L -> Seq("w999", "w1000", "w4999")), topK = 25).count())
    val sv2 = time("bm25IndexedTopK rep 2 (warm)")(
      graft.operators.Retrieval.bm25IndexedTopK(inv,
        Seq(0L -> Seq("w3", "w44", "w555"), 1L -> Seq("w66", "w777")),
        topK = 25).count())
    val pos = time("buildPositionalIndex + writeBucketed (64 buckets)") {
      val idx = graft.operators.Retrieval.buildPositionalIndex(
        docs, col("doc_id"), col("text"), nBuckets = 64)
      graft.operators.Scale.writeBucketedSorted(
        idx.postings, "graft_smoke_pos_postings", "bucket", 64, "bucket", "term")
      idx.copy(postings = spark.table("graft_smoke_pos_postings"))
    }
    val ph = time("phraseSearch (3 phrases vs persisted positional postings)")(
      graft.operators.Retrieval.phraseSearch(pos,
        Seq(0L -> Seq("w17", "w433"), 1L -> Seq("w1", "w1"),
          2L -> Seq("w999", "w1000", "w2")), topK = 25).count())
    val px = time("proximitySearch (3 queries vs persisted positional postings)")(
      graft.operators.Retrieval.proximitySearch(pos,
        Seq((0L, "w17", "w433", 4), (1L, "w1", "w1", 3), (2L, "w999", "w2", 5)),
        topK = 25).count())
    val rf = time("rrfFuse (indexed BM25 + phrase rankings)") {
      val bm = graft.operators.Retrieval.withRank(
        graft.operators.Retrieval.bm25IndexedTopK(inv,
          Seq(0L -> Seq("w17", "w433"), 1L -> Seq("w999")), topK = 25),
        col("score").desc, col("doc_id"))
      val phr = graft.operators.Retrieval.withRank(
        graft.operators.Retrieval.phraseSearch(pos,
          Seq(0L -> Seq("w17", "w433"), 1L -> Seq("w999", "w1000")), topK = 25),
        col("n_matches").desc, col("doc_id"))
      graft.operators.Retrieval.rrfFuse(Seq(bm, phr), topK = 25).count()
    }
    // index lifecycle: append a 5% delta (lazy union — the delta side
    // re-tokenizes per serve and the union defeats bucket pruning),
    // then COMPACT into a fresh bucketed table — the post-compaction
    // serve must return to the pruned build-shape cost. Tombstone
    // deletion serves from the lazy anti-join.
    val delta = mkCorpus(nDocs, nDocs + nDocs / 20).persist()
    delta.count()
    val appended = graft.operators.Retrieval.appendToInvertedIndex(
      inv, delta, col("doc_id"), col("text"))
    val svL = time("bm25IndexedTopK vs lazy append union (5% delta)")(
      graft.operators.Retrieval.bm25IndexedTopK(appended,
        Seq(0L -> Seq("w17", "w433", "w2990")), topK = 25).count())
    val compacted = time("compactInvertedIndex (union -> bucketed rewrite)")(
      graft.operators.Retrieval.compactInvertedIndex(
        appended, "graft_smoke_inv_compact"))
    val svC = time("bm25IndexedTopK vs compacted table (pruned again)")(
      graft.operators.Retrieval.bm25IndexedTopK(compacted,
        Seq(0L -> Seq("w17", "w433", "w2990")), topK = 25).count())
    val svD = time("removeFromInvertedIndex (2% tombstones) + serve")(
      graft.operators.Retrieval.bm25IndexedTopK(
        graft.operators.Retrieval.removeFromInvertedIndex(compacted,
          docs.where(col("doc_id") % 50 === 0).select("doc_id")),
        Seq(0L -> Seq("w17", "w433", "w2990")), topK = 25).count())
    // per-group budgets: 100 synthetic sources, each with its own
    // exact greedy quota — the (group, shard) windows must stay
    // parallel (no one-task group serialization)
    val tb = time("selectTokenBudgetPerGroup (100 groups, 10k-token quotas)") {
      val sel = graft.operators.Curation.selectTokenBudgetPerGroup(
        docs.withColumn("src", (col("doc_id") % 100).cast("string")),
        col("doc_id"), col("text"), pmod(xxhash64(col("doc_id")), lit(1000L)),
        col("src"), budgetTokens = 10000L, nShards = 16)
      val n = sel.count()
      sel.unpersist()
      n
    }
    println(s"RESULT nDocs=$nDocs bm25Top=$bm blockKept=$blk mpKept=$mp trained=$tr normChars=$nf applied=$ac blends=$qb cardRows=$dc keywords=$sk overlapPairs=$so idxServe=$sv/$sv2 phraseHits=$ph proxHits=$px fused=$rf corrected=$sc lifecycle=$svL/$svC/$svD budgeted=$tb")
    spark.stop()
  }
}
