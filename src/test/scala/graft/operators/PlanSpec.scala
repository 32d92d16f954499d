package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkTestBase

/** Physical-plan assertions: the properties that matter at 100 TB —
  * filters and projections reaching the parquet scan, dimension joins
  * broadcasting, and operators staying within their shuffle budget —
  * pinned as tests so a refactor that silently regresses the plan
  * fails loudly.
  */
class PlanSpec extends SparkTestBase {

  private val sf = "/root/testdata/sf0.001"

  test("filters and column pruning reach the parquet scan") {
    val df = spark.read.parquet(s"$sf/lineitem.parquet")
      .where(col("l_returnflag") === "R" && col("l_quantity") > 40)
      .select("l_orderkey")
    val plan = df.queryExecution.executedPlan.toString
    // (plan toString truncates the PushedFilters list at 100 chars —
    // assert on the filters that fit)
    assert(plan.contains("PushedFilters: [IsNotNull(l_returnflag)"), plan)
    assert(plan.contains("EqualTo(l_returnflag,R)"), plan)
    assert(plan.contains("GreaterThan(l_quantity"), plan)
    // ReadSchema carries only the referenced columns
    val readSchema = plan.linesIterator.find(_.contains("ReadSchema")).getOrElse("")
    assert(readSchema.contains("l_orderkey"), readSchema)
    assert(!readSchema.contains("l_extendedprice"), readSchema)
  }

  test("dimension joins broadcast instead of sort-merging") {
    val q12 = graft.SparkEntry.queries("q12_join_agg")(spark, sf)
    val plan = q12.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), plan)
    assert(!plan.contains("SortMergeJoin"), plan)
  }

  test("contamination: bench side broadcasts, one shuffle total") {
    import spark.implicits._
    val corpus = (0L until 50L).map(i => (i, s"w$i x$i y$i z$i q$i r$i")).toDF("doc_id", "text")
    val bench = Seq((100L, "w1 x1 y1 z1 q1 r1")).toDF("doc_id", "text")
    val result = Dedup.contamination(corpus, col("doc_id"), col("text"),
      bench, col("doc_id"), col("text"), n = 3, minShared = 1L)
    val plan = result.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), plan)
    assert(!plan.contains("SortMergeJoin"), plan)
    // the only exchange is the (doc, bench) count aggregate
    assert(Scale.countShuffles(result) == 1, plan)
  }

  test("keepBest: single hash-shuffle, no window, text never shuffles") {
    import spark.implicits._
    val df = (0L until 50L).map(i => (i, s"text $i", i % 7)).toDF("doc_id", "text", "q")
    val result = Dedup.keepBest(df, col("doc_id"), col("text"), col("q"))
    val plan = result.queryExecution.executedPlan.toString
    assert(Scale.countShuffles(result) == 1, plan)
    assert(!plan.contains("Window"), plan)
    // the shuffle carries fingerprints, not document text
    val exchangeLine = plan.linesIterator.find(_.contains("Exchange hashpartitioning")).getOrElse("")
    assert(exchangeLine.contains("fp"), plan)
  }

  test("c4LineFilter is map-only: zero exchanges") {
    val df = spark.range(20).select(col("id").as("doc_id"),
      concat(lit("A good enough line number "), col("id"), lit(".\nshort")).as("text"))
    val out = TextAnalysis.c4LineFilter(df, col("doc_id"), col("text"))
    assert(Scale.countShuffles(out) == 0, out.queryExecution.executedPlan.toString)
  }

  test("oovRate: vocabulary broadcasts, two aggregate exchanges, no sort-merge join") {
    // parquet source, not spark.range: range's known id-partitioning
    // would elide the per-doc aggregate exchange that a real scan pays
    val df = spark.read.parquet(s"$sf/documents.parquet")
    val out = TextAnalysis.oovRate(df, col("doc_id"), col("text"), vocabSize = 3)
    val plan = out.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), plan)
    assert(!plan.contains("SortMergeJoin"), plan)
    // one exchange for the corpus token counts, one for the per-doc
    // probe aggregate — both map-side-combined; the top-V cut is a
    // TakeOrdered, not a global sort
    assert(Scale.countShuffles(out) == 2, plan)
    assert(!plan.contains("Sort "), plan)
  }

  test("redactPii and hashSplit are map-only: zero exchanges, codegen'd") {
    // spark.range, not a local Seq: literal inputs constant-fold into a
    // LocalTableScan and there is no plan left to assert on
    val df = spark.range(20).select(col("id").as("doc_id"),
      concat(lit("doc "), col("id"), lit(" mail@x.org")).as("text"))
    val redact = TextAnalysis.redactPii(df, col("doc_id"), col("text"))
    assert(Scale.countShuffles(redact) == 0, redact.queryExecution.executedPlan.toString)
    val split = Sampling.hashSplit(df, col("doc_id"), Seq("a" -> 50, "b" -> 50))
    assert(Scale.countShuffles(split) == 0, split.queryExecution.executedPlan.toString)
    // both stay inside whole-stage codegen (no CodegenFallback HOFs) —
    // the "*(n)" prefix is the codegen marker in the plan toString
    assert(redact.queryExecution.executedPlan.toString.startsWith("*("))
    assert(split.queryExecution.executedPlan.toString.startsWith("*("))
  }

  test("repetitionMetrics: aggregate levels only — no window, bounded shuffles") {
    import spark.implicits._
    val df = (0L until 30L).map(i => (i, s"a b a c w$i")).toDF("doc_id", "text")
    val result = TextAnalysis.repetitionMetrics(df, col("doc_id"), col("text"))
    val plan = result.queryExecution.executedPlan.toString
    assert(!plan.contains("Window"), plan)
    // two (doc,gram)->doc aggregate chains + the doc_id join: every
    // exchange carries skinny count rows, never document text
    assert(Scale.countShuffles(result) <= 6, plan)
  }

  test("deterministic sample pushes its bucket filter into the scan stage") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val kept = Sampling.hashSample(docs, col("doc_id"), 1, 10)
    assert(Scale.countShuffles(kept) == 0,
      kept.queryExecution.executedPlan.toString)
    // stratified thresholds fold into the same map-only shape — no
    // join materializes even with many strata
    val strat = Sampling.stratifiedSample(docs, col("doc_id"), col("lang"),
      (0 until 50).map(i => s"l$i" -> i % 10), defaultParts = 100)
    assert(Scale.countShuffles(strat) == 0,
      strat.queryExecution.executedPlan.toString)
  }

  test("IVF serve against the persisted bucketed index: zero corpus-side exchange") {
    import spark.implicits._
    val rnd = new scala.util.Random(3)
    val vecs = (0L until 64L).map(i => (i, Array.fill(8)(rnd.nextFloat()))).toDF("id", "vec")
    val index = Similarity.ivfIndex(vecs, nBuckets = 4)
    Scale.writeBucketed(index.assigned, "graft_ivf_plan_test", "bucket", 4)
    val served = Similarity.IvfIndex(index.cents, spark.table("graft_ivf_plan_test"))
    val queries = vecs.where(col("id") < 3)
    // force SMJ so the assertion is about BUCKETING, not a lucky broadcast
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val serve = Similarity.ivfTopKIndexed(queries, served, k = 3)
      val plan = serve.queryExecution.executedPlan.toString
      // exchange budget: probe window (query side), query side of the
      // bucket join, final ranking window — and NOTHING over the
      // bucketed corpus scan
      assert(Scale.countShuffles(serve) <= 3, plan)
      assert(plan.contains("SelectedBucketsCount"), plan) // bucket pruning metadata present
      // the corpus branch: no Exchange between the bucketed table scan
      // and its join — scan feeds the sort/join directly
      val inline = Similarity.ivfTopKIndexed(queries, index, k = 3)
      assert(Scale.countShuffles(inline) >= Scale.countShuffles(serve) + 2,
        "inline index should pay the assignment+join exchanges the bucketed serve avoids")
    } finally spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
  }

  test("BM25 serve against the persisted bucketed postings: pruned scan, no corpus text") {
    import spark.implicits._
    val df = Seq.tabulate(60)(i => (i.toLong, s"cat dog w$i x")).toDF("doc_id", "text")
    val index = Retrieval.buildInvertedIndex(df, col("doc_id"), col("text"), nBuckets = 8)
    Scale.writeBucketed(index.postings, "graft_inv_plan_test", "bucket", 8)
    val served = index.copy(postings = spark.table("graft_inv_plan_test"))
    val serve = Retrieval.bm25IndexedTopK(served,
      Seq(0L -> Seq("cat"), 1L -> Seq("dog", "x")), topK = 3)
    val plan = serve.queryExecution.executedPlan.toString
    // bucket pruning reaches the postings scan: only the query terms'
    // buckets are read
    assert(plan.contains("SelectedBucketsCount"), plan)
    // the corpus text never enters the serve plan (no text attribute
    // anywhere — the index IS the data)
    assert(!plan.contains("text#"), plan)
    // exchange budget: per-term df aggregate, (query, doc) aggregate,
    // two top-k windows — all over MATCHED postings, none corpus-sized
    assert(Scale.countShuffles(serve) <= 4, plan)
  }

  test("phraseSearch against persisted bucketed positional postings: pruned scan, no corpus text") {
    import spark.implicits._
    val df = Seq.tabulate(60)(i => (i.toLong, s"cat dog cat w$i")).toDF("doc_id", "text")
    val index = Retrieval.buildPositionalIndex(df, col("doc_id"), col("text"), nBuckets = 8)
    Scale.writeBucketed(index.postings, "graft_pos_plan_test", "bucket", 8)
    val served = index.copy(postings = spark.table("graft_pos_plan_test"))
    val serve = Retrieval.phraseSearch(served,
      Seq(0L -> Seq("cat", "dog"), 1L -> Seq("dog", "cat")), topK = 3)
    val plan = serve.queryExecution.executedPlan.toString
    // only the phrase terms' buckets are read
    assert(plan.contains("SelectedBucketsCount"), plan)
    // the corpus text never enters the serve plan
    assert(!plan.contains("text#"), plan)
    // exchange budget: the (query, doc) aggregate + two top-k windows,
    // all over matched postings
    assert(Scale.countShuffles(serve) <= 3, plan)
  }

  test("durable index append: delta postings appended to the bucketed table still serve and prune") {
    import spark.implicits._
    val mk = (r: Range) => r.map(i => (i.toLong, s"cat dog w$i")).toDF("doc_id", "text")
    val base = Retrieval.buildInvertedIndex(mk(0 until 40), col("doc_id"), col("text"), nBuckets = 8)
    Scale.writeBucketedSorted(base.postings, "graft_inv_append_test", "bucket", 8, "bucket", "term")
    val delta = Retrieval.buildInvertedIndex(mk(40 until 60), col("doc_id"), col("text"), nBuckets = 8)
    Scale.appendBucketedSorted(delta.postings, "graft_inv_append_test", "bucket", 8, "bucket", "term")
    val served = graft.operators.Retrieval.InvertedIndex(
      spark.table("graft_inv_append_test"), base.n + delta.n, base.l + delta.l, 8)
    val queries = Seq(0L -> Seq("cat"), 1L -> Seq("dog"))
    val fromTable = Retrieval.bm25IndexedTopK(served, queries, topK = 5)
      .orderBy("query_id", "doc_id").as[(Long, Long, Long, Long)].collect().toSeq
    val rebuilt = Retrieval.buildInvertedIndex(mk(0 until 60), col("doc_id"), col("text"), nBuckets = 8)
    val fromRebuild = Retrieval.bm25IndexedTopK(rebuilt, queries, topK = 5)
      .orderBy("query_id", "doc_id").as[(Long, Long, Long, Long)].collect().toSeq
    assert(fromTable == fromRebuild && fromTable.nonEmpty)
    // pruning survives the append: the serve still selects buckets
    val plan = Retrieval.bm25IndexedTopK(served, queries, topK = 5)
      .queryExecution.executedPlan.toString
    assert(plan.contains("SelectedBucketsCount"), plan)
  }

  test("asofJoinBucketed: heavy window partitions by (key, bucket), never one task") {
    val e = graft.SparkEntry.normalizeTsNanos(spark.read.parquet(s"$sf/events.parquet"))
      .select(col("user_id").as("key"), col("ts").as("time"), col("event_id").as("id"))
    val joined = Relational.asofJoinBucketed(e, e, bucketWidth = 3600L * 1000 * 1000 * 1000)
    val plan = joined.queryExecution.executedPlan.toString
    assert("""hashpartitioning\(key#\d+L, bucket#\d+L""".r.findFirstIn(plan).isDefined, plan)
    assert(!plan.contains("SinglePartition"), plan)
  }

  test("adaptiveQualityFilter broadcasts thresholds; corpus never shuffles") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val kept = TextAnalysis.adaptiveQualityFilter(docs, col("lang"), col("n_chars"), 0.5)
    val plan = kept.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), plan)
    // the only exchange feeds the per-stratum percentile aggregate
    assert(Scale.countShuffles(kept) == 1, plan)
  }

  test("packSequences windows by shard — one exchange, never a global sort") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val packed = TextAnalysis.packSequences(docs, col("doc_id"), col("text"),
      capacity = 2048L, nShards = 8)
    val plan = packed.queryExecution.executedPlan.toString
    assert(Scale.countShuffles(packed) == 1, plan)
    assert(plan.contains("hashpartitioning(shard"), plan) // not a single global partition
  }

  test("incrementalDedup: only fingerprints ride the exchanges, text never") {
    import spark.implicits._
    val batch = (0L until 40L).map(i => (i, s"doc text $i")).toDF("doc_id", "text")
    val known = (0L until 10L).map(i => s"fp$i").toDF("fp")
    val out = Dedup.incrementalDedup(batch, col("doc_id"), col("text"), known)
    // check what actually RIDES each exchange (its output attributes),
    // not the plan string — exchange lines print only partitioning
    val shuffled = Scale.shuffleOutputColumns(out)
    assert(shuffled.nonEmpty, out.queryExecution.executedPlan.toString)
    assert(shuffled.forall(cols => !cols.contains("text")), shuffled.toString)
  }

  test("rankingMetrics: ranking broadcasts into the qrels join; doc ids never key an exchange") {
    import spark.implicits._
    val ranking = Seq.tabulate(20)(i => ((i % 4).toLong, i.toLong, (i / 4 + 1).toLong))
      .toDF("query_id", "doc_id", "rank")
    val qrels = Seq.tabulate(5000)(i => ((i % 4).toLong, i.toLong))
      .toDF("query_id", "doc_id")
    val out = Retrieval.rankingMetrics(ranking, qrels, k = 5)
    out.count()
    assert(out.queryExecution.executedPlan.toString.contains("BroadcastHashJoin"))
    // every exchange carries per-query partial-aggregate rows — raw
    // (query, doc) qrel pairs never shuffle
    val shuffled = Scale.shuffleOutputColumns(out)
    assert(shuffled.forall(cols => !cols.contains("doc_id")), shuffled.toString)
  }

  test("sourceKeywords: document text never rides an exchange") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val out = Profiling.sourceKeywords(docs, col("source"), col("text"), topK = 3)
    out.count()
    val shuffled = Scale.shuffleOutputColumns(out)
    assert(shuffled.nonEmpty)
    assert(shuffled.forall(cols => !cols.contains("text")), shuffled.toString)
  }

  test("trigramCoverage: model joins broadcast; no sort-merge join") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val scored = TextAnalysis.trigramCoverage(
      docs.where(col("doc_id") >= 100), col("doc_id"), col("text"),
      docs.where(col("doc_id") < 100), col("text"), topK = 500)
    val plan = scored.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), plan)
    assert(!plan.contains("SortMergeJoin"), plan)
  }

  test("dedupLines: partial-aggregated first-occurrence pass, no text on the survivor side") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val out = Dedup.dedupLines(docs, col("doc_id"), col("text"))
    val plan = out.queryExecution.executedPlan.toString
    // hot boilerplate lines must collapse map-side, not in a window sort
    assert(plan.contains("partial_min") || plan.contains("HashAggregate"), plan)
    assert(!plan.contains("Window"), plan)
    // the survivor join key is (doc_id, line_idx): the build side that
    // rides its exchange must carry no line text
    val shuffled = Scale.shuffleOutputColumns(out)
    assert(shuffled.exists(cols => !cols.exists(_.contains("line"))), shuffled.toString)
    assert(Scale.countShuffles(out) <= 3, plan)
  }

  test("bpePairCounts: both aggregate levels partial-combine; pair agg sees unique words only") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val out = TextAnalysis.bpePairCounts(docs, col("text"), topK = 20)
    val plan = out.queryExecution.executedPlan.toString
    // two hash-aggregate levels (word freq, pair count) + the top-k
    assert(Scale.countShuffles(out) <= 3, plan)
    assert(!plan.contains("Window"), plan)
    // documents' text never rides an exchange — only words and pairs
    val shuffled = Scale.shuffleOutputColumns(out)
    assert(shuffled.forall(cols => !cols.contains("text")), shuffled.toString)
  }

  test("quantizedTopK: query side broadcasts, corpus never shuffles before ranking") {
    val e = spark.read.parquet(s"$sf/embeddings.parquet")
      .select(col("vec_id").as("id"), col("embedding").as("vec"))
    val out = Similarity.quantizedTopK(e.where(col("id") < 5), e.where(col("id") >= 5), k = 5)
    val plan = out.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastNestedLoopJoin") || plan.contains("BroadcastHashJoin"), plan)
    // only the per-query ranking window shuffles (by query_id — skinny rows)
    assert(Scale.countShuffles(out) == 1, plan)
  }

  test("duplicateSpans: map-side-combined window counts, no window operator") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val out = Dedup.duplicateSpans(docs, col("doc_id"), col("text"), k = 8)
    val plan = out.queryExecution.executedPlan.toString
    assert(!plan.contains("Window"), plan)
    assert(Scale.countShuffles(out) <= 4, plan)
  }

  test("chunking pushes the doc filter into the scan and stays map-only") {
    val docs = spark.read.parquet(s"$sf/documents.parquet").where(col("doc_id") < 50)
    val chunks = TextAnalysis.chunkDocuments(docs, col("doc_id"), col("text"),
      chunkTokens = 40, overlap = 10)
    val plan = chunks.queryExecution.executedPlan.toString
    assert(plan.contains("LessThan(doc_id,50)"), plan) // reaches the parquet scan
    assert(Scale.countShuffles(chunks) == 0, plan)
  }

  test("giniDiversity: two aggregate exchanges, only counts on the wire") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val out = Profiling.giniDiversity(docs, col("source"), col("lang"))
    assert(Scale.countShuffles(out) == 2,
      out.queryExecution.executedPlan.toString)
    assert(Scale.shuffleOutputColumns(out)
      .forall(cols => !cols.exists(_.contains("text"))),
      "document text must never ride a profiling exchange")
  }

  test("weightedSample: one stratum exchange; priority computed map-side") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val out = Sampling.weightedSample(docs, col("doc_id"),
      expr("(n_chars div 100) + 1"), col("lang"), n = 20)
    assert(Scale.countShuffles(out) == 1,
      out.queryExecution.executedPlan.toString)
  }

  test("bm25TopK: corpus never explodes or shuffles; one stats exchange, broadcast back") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val out = Retrieval.bm25TopK(docs, col("doc_id"), col("text"),
      Seq("hash", "join"), topK = 10)
    val plan = out.queryExecution.executedPlan.toString
    assert(!plan.contains("Generate"), plan) // no explode anywhere
    assert(!plan.contains("SortMergeJoin"), plan)
    // the single exchange is the 1-row stats aggregate; the top-K is a
    // TakeOrdered, not a global sort
    assert(Scale.countShuffles(out) == 1, plan)
    assert(plan.contains("TakeOrderedAndProject"), plan)
    assert(Scale.shuffleOutputColumns(out)
      .forall(cols => !cols.exists(_.contains("text"))),
      "document text must never ride the stats exchange")
  }

  test("blocklistFilter and charProfile are map-only: zero exchanges, codegen'd") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val bl = TextAnalysis.blocklistFilter(docs, col("doc_id"), col("text"),
      Seq("slow", "bad"))
    assert(Scale.countShuffles(bl) == 0, bl.queryExecution.executedPlan.toString)
    val cp = TextAnalysis.charProfile(docs, col("doc_id"), col("text"))
    assert(Scale.countShuffles(cp) == 0, cp.queryExecution.executedPlan.toString)
    // the native char_hist_stats expression stays inside whole-stage
    // codegen — the "*(n)" prefix is the codegen marker
    assert(cp.queryExecution.executedPlan.toString.startsWith("*("),
      cp.queryExecution.executedPlan.toString)
  }

  test("zorderBucketStats: one map-side-combined aggregate, z computed in the scan stage") {
    val li = spark.read.parquet(s"$sf/lineitem.parquet")
    val out = Scale.zorderBucketStats(li, col("l_partkey"), col("l_suppkey"))
    val plan = out.queryExecution.executedPlan.toString
    // the bucket aggregate plus the contract's output ordering — the
    // aggregate partial-combines, so the first exchange carries one
    // row per bucket, not per input row
    assert(Scale.countShuffles(out) == 2, plan)
    assert(plan.contains("partial_count"), plan)
    // only (bucket, count, 4 bounds) ride the exchanges — skinny rows
    assert(Scale.shuffleOutputColumns(out).forall(_.size <= 12), plan)
  }

  test("importanceWeights: ratio table broadcasts; text never rides an exchange") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val out = Sampling.importanceWeights(docs, col("doc_id"), col("text"),
      col("lang") === "en", vocabSize = 10)
    val plan = out.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), plan)
    assert(!plan.contains("SortMergeJoin"), plan)
    assert(Scale.shuffleOutputColumns(out)
      .forall(cols => !cols.exists(_.contains("text"))),
      "document text must never ride an importance exchange")
  }

  test("shuffleShards: exactly one data exchange, window partitioned by shard") {
    val docs = spark.read.parquet(s"$sf/documents.parquet").select("doc_id")
    val out = Sampling.shuffleShards(docs, col("doc_id"), seed = 7L, nShards = 8)
    val plan = out.queryExecution.executedPlan.toString
    // permutation = one shuffle keyed by shard + per-shard sort; a
    // global ORDER BY (range exchange, single-partition window) must
    // never appear
    assert(Scale.countShuffles(out) == 1, plan)
    assert(!plan.contains("rangepartitioning"), plan)
    assert(plan.contains("Window"), plan)
  }

  test("hardNegatives / tripletMining: query side broadcasts, corpus never shuffles") {
    import spark.implicits._
    val vecs = (0L until 64L).map(i =>
      (i, Seq.fill(8)((i % 7).toFloat + 1f), (i % 3).toInt)).toDF("id", "vec", "label")
    val hn = Similarity.hardNegatives(vecs.where(col("id") < 2), vecs, k = 3)
    val hnPlan = hn.queryExecution.executedPlan.toString
    assert(hnPlan.contains("BroadcastNestedLoopJoin") || hnPlan.contains("BroadcastHashJoin"), hnPlan)
    assert(!hnPlan.contains("SortMergeJoin") && !hnPlan.contains("CartesianProduct"), hnPlan)
    // only the window's (query, same?, cos, id) rows shuffle — vectors don't
    assert(Scale.shuffleOutputColumns(hn)
      .forall(cols => !cols.exists(c => c.contains("vec"))), hnPlan)
    val tm = Similarity.tripletMining(vecs.where(col("id") < 2), vecs)
    assert(Scale.shuffleOutputColumns(tm)
      .forall(cols => !cols.exists(c => c.contains("vec"))),
      tm.queryExecution.executedPlan.toString)
  }

  test("applyBpe is a pure projection: zero exchanges, no join") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val out = Training.applyBpe(docs, col("doc_id"), col("text"),
      Seq(("e", "s"), ("es", "t")))
    val plan = out.queryExecution.executedPlan.toString
    assert(Scale.countShuffles(out) == 0, plan)
    assert(!plan.contains("Join"), plan)
  }

  test("qualityBlend: assignment is map-only once boundaries are collected") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val out = Sampling.qualityBlend(docs, col("doc_id"),
      Seq(col("n_chars"), length(col("text")).cast("long")), nBuckets = 4)
    // boundary quantiles run eagerly inside the call (value-histogram
    // jobs); the RETURNED frame is a pure comparison-chain projection
    assert(Scale.countShuffles(out) == 0,
      out.queryExecution.executedPlan.toString)
  }

  test("crossSourceOverlap: text never rides an exchange on the hashKeys path") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val out = Profiling.crossSourceOverlap(docs, col("source"), col("text"),
      n = 3, hashKeys = true)
    // the only corpus-sized exchange carries (xxhash64, mask) longs
    assert(Scale.shuffleOutputColumns(out)
      .forall(cols => !cols.exists(c => c.contains("text") || c.contains("sh"))),
      out.queryExecution.executedPlan.toString)
  }

  test("aucExact/prCurve: items shuffle once into the score-domain aggregate") {
    import spark.implicits._
    val df = (0L until 200L).map(i => (i % 17, i % 3 == 0L)).toDF("s", "y")
    // exchange 1: the (score)-keyed count aggregate; exchange 2: the
    // single-partition window/final over the DOMAIN-bounded table
    val auc = Training.aucExact(df, col("s"), col("y"))
    assert(Scale.countShuffles(auc) <= 3, auc.queryExecution.executedPlan.toString)
    val pr = Training.prCurve(df, col("s"), col("y"))
    assert(Scale.countShuffles(pr) <= 2, pr.queryExecution.executedPlan.toString)
  }

  // collect WindowExec nodes, descending AQE wrappers — for pinning
  // that no window runs over corpus ROWS (only over value-domain
  // histograms, i.e. above an aggregate)
  private def windowNodes(df: org.apache.spark.sql.DataFrame)
      : Seq[org.apache.spark.sql.execution.window.WindowExec] = {
    import org.apache.spark.sql.execution.SparkPlan
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
    import org.apache.spark.sql.execution.window.WindowExec
    def scan(p: SparkPlan): Seq[WindowExec] = p match {
      case w: WindowExec => w +: w.children.flatMap(scan)
      case a: AdaptiveSparkPlanExec => scan(a.executedPlan)
      case q: QueryStageExec => scan(q.plan)
      case other => other.children.flatMap(scan)
    }
    scan(df.queryExecution.executedPlan)
  }

  test("rankNormalize: no per-key window over corpus rows — ranks come off the histogram") {
    import spark.implicits._
    val df = (0L until 100L).map(i => (i, s"g${i % 5}", i * 7 % 31)).toDF("i", "k", "s")
    val out = Features.rankNormalize(df, col("i"), col("k"), col("s"))
    val plan = out.queryExecution.executedPlan.toString
    // every window runs over the per-(key, score) histogram — its
    // input never carries the row id, so a handful of sources can't
    // funnel corpus slices through single window tasks
    val wins = windowNodes(out)
    assert(wins.nonEmpty, plan)
    assert(wins.forall(w => !w.child.output.exists(_.name == "id")), plan)
    // histogram agg + window exchange + join back — never more
    assert(Scale.countShuffles(out) <= 4, plan)
  }

  test("gapProfile: median comes off the gap-value histogram, not a per-group row sort") {
    import spark.implicits._
    val ev = (0L until 300L).map(i => (s"g${i % 2}", i % 7, i * 13 % 997, i))
      .toDF("g", "k", "t", "e")
    // localCheckpoint truncates the final lineage, so pin the plans of
    // the two-phase internals by rebuilding them the way the operator
    // does: every window partitioned by g alone must run over
    // AGGREGATED rows — coarse-bucket counts (c) or in-bucket fine
    // counts (fc) — never raw gaps; raw gaps only see the
    // (g, k)-partitioned lead() window
    val out = Analytics.gapProfile(ev, col("g"), col("k"), col("t"), col("e"))
    assert(out.collect().nonEmpty)
    val seq = org.apache.spark.sql.expressions.Window
      .partitionBy("g", "k").orderBy("t", "e")
    val gaps = ev
      .withColumn("nxt", lead(col("t"), 1).over(seq))
      .where(col("nxt").isNotNull)
      .select(col("g"), (col("nxt") - col("t")).as("gap"))
    val coarse = gaps.groupBy(col("g"), expr("gap div 4194304").as("cb"))
      .agg(count(lit(1)).as("c"))
      .withColumn("cum", sum("c").over(
        org.apache.spark.sql.expressions.Window.partitionBy("g").orderBy("cb")))
    val wins = windowNodes(coarse)
    val plan = coarse.queryExecution.executedPlan.toString
    val byGroupOnly = wins.filter(w => !w.child.output.exists(_.name == "k"))
    assert(byGroupOnly.nonEmpty, plan)
    assert(byGroupOnly.forall(w => w.child.output.exists(_.name == "c")), plan)
  }

  test("gapProfile: two-phase median equals a brute-force sort for any coarseBits") {
    import spark.implicits._
    val rng = new scala.util.Random(7)
    val ev = (0L until 500L).map(i =>
      (s"g${i % 3}", i % 11, rng.nextInt(1 << 20).toLong, i)).toDF("g", "k", "t", "e")
    // brute force: per (g, k) consecutive sorted gaps, per g the
    // ceil(n/2)-th smallest
    val rows = ev.as[(String, Long, Long, Long)].collect()
    val byGk = rows.groupBy(r => (r._1, r._2)).values.flatMap { grp =>
      val sorted = grp.sortBy(r => (r._3, r._4))
      sorted.sliding(2).filter(_.size == 2).map(p => (p(0)._1, p(1)._3 - p(0)._3))
    }.toSeq
    val expected = byGk.groupBy(_._1).map { case (g, gs) =>
      val sortedGaps = gs.map(_._2).sorted
      val rank = (sortedGaps.size + 1) / 2
      (g, sortedGaps.size.toLong, sortedGaps(rank - 1), sortedGaps.max)
    }.toSeq.sortBy(_._1)
    for (bits <- Seq(0, 3, 10, 22, 62)) {
      val got = Analytics.gapProfile(ev, col("g"), col("k"), col("t"), col("e"),
        coarseBits = bits)
        .orderBy("g").as[(String, Long, Long, Long)].collect().toSeq
      assert(got == expected, s"coarseBits=$bits: $got vs $expected")
    }
  }

  test("survivorship: one entity-keyed aggregate with map-side partials; no window") {
    import spark.implicits._
    val records = (0L until 200L).map(i =>
      (i, s"name$i", if (i % 3 == 0) null else s"b${i % 7}"))
      .toDF("id", "name", "brand")
    val pairs = (0L until 50L).map(i => (i * 2, i * 2 + 1)).toDF("id_a", "id_b")
    val out = Dedup.survivorship(records, col("id"),
      Seq("name" -> col("name"), "brand" -> col("brand")), pairs)
    val plan = out.queryExecution.executedPlan.toString
    // the per-field keep-best is min-over-structs inside ONE hash
    // aggregate — never a per-entity window over record rows
    assert(!plan.contains("Window"), plan)
    assert(plan.contains("partial_min") || plan.contains("partial_count"), plan)
  }

  test("funnel: each step's frontier is persisted — O(k) event scans, not O(k^2)") {
    import spark.implicits._
    val acc = spark.sparkContext.longAccumulator("eventScans")
    val ev = (0L until 400L).map(i => (i % 40, s"s${i % 4}", i)).toDS()
      .map { r => acc.add(1); r }
      .toDF("u", "st", "t")
    Analytics.funnel(ev, col("u"), col("st"), col("t"),
      Seq("s0", "s1", "s2", "s3")).collect()
    // 4 steps → exactly 4 passes over the event rows (one per step);
    // the unpersisted O(k²) shape would pay 1+2+3+4 = 10 passes
    assert(acc.value <= 400L * 4, s"event rows scanned ${acc.value} times > 4 passes")
  }

  test("selectionAudit / calibrationBins: one group-keyed exchange plus broadcast, no text") {
    import spark.implicits._
    val df = (0L until 100L).map(i => (s"g${i % 4}", i % 3 == 0L)).toDF("g", "sel")
    val audit = Privacy.selectionAudit(df, col("g"), col("sel"))
    val ap = audit.queryExecution.executedPlan.toString
    assert(ap.contains("BroadcastNestedLoopJoin") || ap.contains("BroadcastHashJoin"), ap)
    // grp aggregate (recomputed once inside the 1-row max branch) +
    // the max's single-partition exchange — all keyed by the group
    // domain or 1-row, never the data
    assert(Scale.countShuffles(audit) <= 3, ap)
    val scored = (0L until 100L).map(i => (i * 9973 % 1000001, i % 2 == 0L)).toDF("s", "y")
    val bins = Training.calibrationBins(scored, col("s"), col("y"), nBins = 10)
    assert(Scale.countShuffles(bins) <= 2, bins.queryExecution.executedPlan.toString)
  }

  test("contaminationRate: bench grams broadcast; corpus takes one aggregate exchange") {
    import spark.implicits._
    val corpus = (0L until 50L).map(i => (i, s"a$i b$i c$i d$i e$i")).toDF("id", "text")
    val bench = Seq("a1 b1 c1 d1 e1").toDF("text")
    val out = Dedup.contaminationRate(corpus, col("id"), col("text"),
      bench, col("text"), n = 3)
    val plan = out.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), plan)
    assert(!plan.contains("SortMergeJoin"), plan)
    // corpus-side: only the per-doc count aggregate; bench-side: its
    // own (small) distinct
    assert(Scale.countShuffles(out) <= 3, plan)
  }

  test("transitionMatrix: no exchange wider than the state-pair domain after the key window") {
    import spark.implicits._
    val ev = (0L until 200L).map(i => (i % 9, s"s${i % 4}", i * 13 % 101, i)).toDF("u", "st", "t", "e")
    val out = Relational.transitionMatrix(ev, col("u"), col("st"), col("t"), col("e"))
    // key-window exchange + pair aggregate + pair-domain window
    assert(Scale.countShuffles(out) <= 3, out.queryExecution.executedPlan.toString)
  }

  test("knnLshSeedEdges: bucket-keyed equi-join, never a cartesian or nested loop") {
    import spark.implicits._
    // (the serve/build plans checkpoint per hop/round, so the lazy
    // seed-edge plan is the graph family's pinnable surface)
    val corpus = (0 until 60).map(i => (i.toLong,
      Seq.fill(4)(((i * 31 + 7) % 19 - 9).toFloat))).toDF("id", "vec")
    val edges = Similarity.knnLshSeedEdges(corpus, lshBits = 2, lshTables = 2,
      anchorsPerBucket = 4)
    val plan = edges.queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"), plan)
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan)
    // the anchor cut is a per-bucket bounded topk_pairs aggregate
    // (r18; was a per-bucket window) — never a global sort-limit, and
    // no Window remains anywhere in the seed plan
    assert(plan.contains("topk_pairs"), plan)
    assert(!plan.contains("Window"), plan)
  }

  test("hashedImportanceWeights: fixed-width model broadcasts back; text never rides an exchange") {
    import spark.implicits._
    val docs = (0L until 80L).map(i =>
      (i, s"tok${i % 7} tok${(i + 1) % 5} tail", if (i % 3 == 0) "en" else "de"))
      .toDF("doc_id", "text", "lang")
    val out = Sampling.hashedImportanceWeights(docs, col("doc_id"), col("text"),
      col("lang") === "en", nBuckets = 32, selectN = 5)
    val plan = out.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), plan)
    assert(!plan.contains("SortMergeJoin"), plan)
    // the resample cut is distributed partial top-k, never a global sort
    assert(plan.contains("TakeOrderedAndProject"), plan)
  }
}
