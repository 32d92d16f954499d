package graft.streaming

import java.nio.file.Files
import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.SparkTestBase
import graft.xml.Dtd

class StreamingOpsSpec extends SparkTestBase {

  test("windowedEventStats: tumbling window counts with watermark") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Timestamp, String, Double)]
    val df = mem.toDF().toDF("ts", "event_type", "value")
    val agg = StreamingOps.windowedEventStats(df, "ts", "event_type", "value")
    val q = agg.writeStream.format("memory").queryName("winstats")
      .outputMode("complete").start()
    try {
      mem.addData(
        (Timestamp.valueOf("2024-01-01 10:05:00"), "click", 1.0),
        (Timestamp.valueOf("2024-01-01 10:55:00"), "click", 2.0),
        (Timestamp.valueOf("2024-01-01 11:05:00"), "click", 4.0),
        (Timestamp.valueOf("2024-01-01 10:30:00"), "buy", 8.0))
      q.processAllAvailable()
      val rows = spark.table("winstats")
        .select(date_format(col("window_start"), "HH:mm").as("w"), col("event_type"), col("n"), col("sum_value"))
        .as[(String, String, Long, Double)].collect().toSet
      assert(rows == Set(("10:00", "click", 2L, 3.0), ("11:00", "click", 1L, 4.0), ("10:00", "buy", 1L, 8.0)))
    } finally q.stop()
  }

  test("intervalJoin: inclusive bounds, cross-key isolation, eager inner emission") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    def ts(hms: String) = Timestamp.valueOf(s"2024-01-01 $hms")
    val lMem = MemoryStream[(Long, Long, Timestamp)]
    val rMem = MemoryStream[(Long, Long, Timestamp)]
    val joined = StreamingOps.intervalJoin(
        lMem.toDF().toDF("id", "k", "t"), rMem.toDF().toDF("id", "k", "t"),
        keyCol = "k", tsCol = "t", maxDelay = "1 hour")
      .select(col("l.id").as("lid"), col("r.id").as("rid"))
    val q = joined.writeStream.format("memory").queryName("ij")
      .outputMode("append").start()
    try {
      lMem.addData((1L, 7L, ts("10:00:00")), (2L, 8L, ts("10:00:00")))
      rMem.addData(
        (10L, 7L, ts("10:00:00")), // boundary: exactly at left ts -> in
        (11L, 7L, ts("11:00:00")), // boundary: exactly +1h -> in
        (12L, 7L, ts("11:00:01")), // beyond the delay -> out
        (13L, 7L, ts("09:59:59")), // before the left event -> out
        (14L, 9L, ts("10:30:00"))) // other key -> out
      q.processAllAvailable()
      val rows = spark.table("ij").as[(Long, Long)].collect().toSet
      assert(rows == Set((1L, 10L), (1L, 11L)))
    } finally q.stop()
  }

  test("materializeChanges: latest-op-wins across batches; stale upserts cannot resurrect") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, Long, String, String)]
    val state = StreamingOps.materializeChanges(
      mem.toDF().toDF("id", "seq", "op", "content"))
    val q = state.writeStream.format("memory").queryName("cdc")
      .outputMode("complete").start()
    try {
      mem.addData((1L, 10L, "upsert", "a1"), (2L, 11L, "upsert", "b1"))
      q.processAllAvailable()
      mem.addData(
        (1L, 20L, "upsert", "a2"),   // newer: replaces
        (2L, 21L, "delete", ""),     // tombstone
        (2L, 15L, "upsert", "b-stale"), // ARRIVES LAST, but seq < 21: loses
        (3L, 30L, "upsert", "c1"))
      q.processAllAvailable()
      val rows = spark.table("cdc").select("id", "op", "content")
        .as[(Long, String, String)].collect().toSet
      assert(rows == Set(
        (1L, "upsert", "a2"),
        (2L, "delete", ""),          // the stale upsert did not resurrect 2
        (3L, "upsert", "c1")))
    } finally q.stop()
  }

  test("materializeChanges drained state == batch applyChanges over the same log") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val corpus = Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("doc_id", "text")
    // the change log: the corpus itself as seq-0 upserts, then a release
    val log = corpus.as[(Long, String)].collect().toSeq
      .map { case (i, t) => (i, 0L, "upsert", t) } ++ Seq(
      (2L, 1L, "upsert", "b2"), (3L, 2L, "delete", ""), (4L, 3L, "upsert", "d"))
    val mem = MemoryStream[(Long, Long, String, String)]
    val state = StreamingOps.materializeChanges(
      mem.toDF().toDF("id", "seq", "op", "content"))
    val q = state.writeStream.format("memory").queryName("cdc_eq")
      .outputMode("complete").start()
    try {
      mem.addData(log: _*)
      q.processAllAvailable()
      val streamed = spark.table("cdc_eq").where(col("op") === "upsert")
        .select("id", "content").as[(Long, String)].collect().toMap
      val batch = graft.operators.Snapshot.applyChanges(
          corpus, col("doc_id"), col("text"),
          Seq((2L, "upsert", "b2"), (3L, "delete", null.asInstanceOf[String]),
            (4L, "upsert", "d")).toDF("id", "op", "content"))
        .as[(Long, String)].collect().toMap
      assert(streamed == batch)
      assert(streamed == Map(1L -> "a", 2L -> "b2", 4L -> "d"))
    } finally q.stop()
  }

  test("sessionize: gap-based sessions close on new-session arrival") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[StreamingOps.Event]
    val sessions = StreamingOps.sessionize(mem.toDS(), gapMs = 60000L)
    val q = sessions.writeStream.format("memory").queryName("sessions")
      .outputMode("append").start()
    try {
      // user 1: two events 10s apart (one session), then one 10min later
      // -> first session closes when the late event arrives
      mem.addData(
        StreamingOps.Event(1L, Timestamp.valueOf("2024-01-01 10:00:00"), 1.0),
        StreamingOps.Event(1L, Timestamp.valueOf("2024-01-01 10:00:10"), 2.0))
      q.processAllAvailable()
      mem.addData(StreamingOps.Event(1L, Timestamp.valueOf("2024-01-01 10:10:00"), 4.0))
      q.processAllAvailable()
      val closed = spark.table("sessions").as[StreamingOps.Session].collect()
      assert(closed.length == 1)
      assert(closed.head.nEvents == 2 && closed.head.total == 3.0)
    } finally q.stop()
  }

  test("windowedEventStats append mode: rows older than the watermark are dropped, windows emit once") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    def ts(hms: String) = Timestamp.valueOf(s"2024-01-01 $hms")
    val mem = MemoryStream[(Timestamp, String, Double)]
    val df = mem.toDF().toDF("ts", "event_type", "value")
    val agg = StreamingOps.windowedEventStats(df, "ts", "event_type", "value",
      window_ = "1 hour", watermark = "10 seconds")
    val q = agg.writeStream.format("memory").queryName("winlate")
      .outputMode("append").start()
    try {
      // batch 1: two on-time rows in the 10:00 window
      mem.addData((ts("10:05:00"), "click", 1.0), (ts("10:20:00"), "click", 2.0))
      q.processAllAvailable()
      // batch 2: 11:30 advances the watermark to 11:29:50 at batch end
      mem.addData((ts("11:30:00"), "click", 4.0))
      q.processAllAvailable()
      // batch 3: a LATE row for the already-finalized 10:00 window
      // (10:40 < watermark) — the contract is DROP, not merge: the
      // 10:00 window emits exactly once with the on-time rows only
      mem.addData((ts("10:40:00"), "click", 100.0))
      q.processAllAvailable()
      // advance the watermark past 12:00 so the 11:00 window finalizes
      mem.addData((ts("12:30:00"), "click", 8.0))
      q.processAllAvailable()
      val rows = spark.table("winlate")
        .select(date_format(col("window_start"), "HH:mm").as("w"), col("n"), col("sum_value"))
        .as[(String, Long, Double)].collect().toSet
      assert(rows == Set(("10:00", 2L, 3.0), ("11:00", 1L, 4.0)),
        s"late row leaked into a finalized window: $rows")
    } finally q.stop()
  }

  test("sessionize: a late event older than the watermark is dropped, not a session reopen") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[StreamingOps.Event]
    val sessions = StreamingOps.sessionize(mem.toDS(), gapMs = 60000L)
    val q = sessions.writeStream.format("memory").queryName("sesslate")
      .outputMode("append").start()
    try {
      // user 1: one session of two events
      mem.addData(
        StreamingOps.Event(1L, Timestamp.valueOf("2024-01-01 10:00:00"), 1.0),
        StreamingOps.Event(1L, Timestamp.valueOf("2024-01-01 10:00:10"), 2.0))
      q.processAllAvailable()
      // user 2 at 10:30 pushes the watermark to 10:29:50 -> user 1's
      // event-time timeout fires and their session closes
      mem.addData(StreamingOps.Event(2L, Timestamp.valueOf("2024-01-01 10:30:00"), 7.0))
      q.processAllAvailable()
      // LATE user-1 event at 10:05, far older than the watermark: the
      // contract is DROP — without late filtering this would seed a
      // brand-new user-1 session (state was removed at timeout) that
      // would later emit with total=100
      mem.addData(StreamingOps.Event(1L, Timestamp.valueOf("2024-01-01 10:05:00"), 100.0))
      q.processAllAvailable()
      // flush everything still open
      mem.addData(StreamingOps.Event(2L, Timestamp.valueOf("2024-01-01 11:30:00"), 9.0))
      q.processAllAvailable()
      mem.addData(StreamingOps.Event(3L, Timestamp.valueOf("2024-01-01 12:30:00"), 0.0))
      q.processAllAvailable()
      val user1 = spark.table("sesslate").as[StreamingOps.Session]
        .collect().filter(_.userId == 1L)
      assert(user1.length == 1, s"late event reopened a session: ${user1.toSeq}")
      assert(user1.head.nEvents == 2 && user1.head.total == 3.0)
    } finally q.stop()
  }

  test("sessionizeMicros: session arithmetic is exact at microsecond precision") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    // gap = 100 µs; the ms-domain variant cannot even represent these
    // boundaries (all four events share the same millisecond). Times
    // sit an hour past the epoch — epoch-0 event times collide with
    // the initial watermark's late-row boundary.
    val base = 3600L * 1000000
    def ev(us: Long) = StreamingOps.EventUs(
      1L, new Timestamp((base + us) / 1000), base + us)
    val mem = MemoryStream[StreamingOps.EventUs]
    val sessions = StreamingOps.sessionizeMicros(mem.toDS(), gapUs = 100L)
    val q = sessions.writeStream.format("memory").queryName("sessus")
      .outputMode("append").start()
    try {
      // one batch: [0, 100] (gap exactly 100 -> same session),
      // [201, 250] (gap 101 -> new session), then a far sentinel that
      // closes the second session in-batch — the q261 staging pattern
      mem.addData(ev(0L), ev(100L), ev(201L), ev(250L), ev(1000000L))
      q.processAllAvailable()
      val out = spark.table("sessus").as[StreamingOps.SessionUs]
        .collect().sortBy(_.tStart)
      assert(out.map(s => (s.tStart - base, s.tEnd - base, s.nEvents)).toSeq ==
        Seq((0L, 100L, 2L), (201L, 250L, 2L)),
        s"got ${out.toSeq}")
    } finally q.stop()
  }

  test("streamingKmeansUpdate: one whole-corpus batch equals one batch Lloyd iteration") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    // two clean clusters; init = first-2 rule like the batch trainer
    val pts = (0 until 20).map(i => (i.toLong,
      if (i % 2 == 0) Seq(10.0, 0.0) else Seq(0.0, 10.0 + (i % 3))))
    val batchDf = pts.toDF("id", "vec")
    val init = batchDf
      .select(col("id"), graft.functions.VecOps.fixedPoint(col("vec"), 1000.0).as("qv"))
      .orderBy("id").limit(2).collect().map(_.getSeq[Long](1).toArray)
    val mem = MemoryStream[(Long, Seq[Double])]
    val (writer, model) = StreamingOps.streamingKmeansUpdate(
      mem.toDF().toDF("id", "vec"), init)
    val q = writer.start()
    try {
      mem.addData(pts: _*)
      q.processAllAvailable()
      val streamed = model()
      val batch = graft.operators.Clustering.kmeansCentroidsFixedPoint(
        batchDf, col("id"), col("vec"), k = 2, iters = 2)
      assert(streamed.map(_.toSeq).toSeq == batch.map(_.toSeq).toSeq)
    } finally q.stop()
  }

  test("streamingKmeansUpdate applies micro-batches sequentially (mini-batch semantics)") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val init = Array(Array(0L, 0L))
    val mem = MemoryStream[(Long, Seq[Double])]
    val (writer, model) = StreamingOps.streamingKmeansUpdate(
      mem.toDF().toDF("id", "vec"), init)
    val q = writer.start()
    try {
      // batch 1: centroid -> truncated mean of (2,2),(4,4) = (3000,3000) fp
      mem.addData((0L, Seq(2.0, 2.0)), (1L, Seq(4.0, 4.0)))
      q.processAllAvailable()
      assert(model().head.toSeq == Seq(3000L, 3000L))
      // batch 2 folds AGAINST the updated model, not the init: single
      // cluster, mean of (8,8) alone
      mem.addData((2L, Seq(8.0, 8.0)))
      q.processAllAvailable()
      assert(model().head.toSeq == Seq(8000L, 8000L))
    } finally q.stop()
  }

  test("streamingKnnGraphServe: per-micro-batch beam serve equals the batch serve") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val rnd = new scala.util.Random(19L)
    val corpus = (0 until 60)
      .map(i => (i.toLong, Seq.fill(6)(rnd.nextGaussian().toFloat)))
      .toDF("id", "vec")
    val g = graft.operators.Similarity.knnGraphBuild(corpus, k = 3, rounds = 2,
      revCap = 10, lshBits = 2, lshTables = 2)
    val results = scala.collection.mutable.ArrayBuffer.empty[(Long, Long, Double)]
    val mem = MemoryStream[(Long, Seq[Float])]
    val writer = StreamingOps.streamingKnnGraphServe(
      mem.toDF().toDF("id", "vec"), g, corpus,
      k = 3, beam = 6, hops = 2, entryStride = 7L,
      sink = b => { results ++= b.as[(Long, Long, Double)].collect(); () })
    val q = writer.start()
    try {
      // two separate micro-batches of queries
      mem.addData((0L, corpus.where(col("id") === 0).as[(Long, Seq[Float])].collect()(0)._2))
      q.processAllAvailable()
      mem.addData((5L, corpus.where(col("id") === 5).as[(Long, Seq[Float])].collect()(0)._2))
      q.processAllAvailable()
      val batch = graft.operators.Similarity.knnGraphServe(
          corpus.where(col("id") === 0 || col("id") === 5), g, corpus,
          k = 3, beam = 6, hops = 2, entryStride = 7L)
        .as[(Long, Long, Double)].collect()
      assert(results.toSet == batch.toSet,
        s"streamed ${results.toSet} != batch ${batch.toSet}")
    } finally q.stop()
  }

  test("streamingKnnGraphIngest: micro-batches compose sequential appends into the stored index") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val rnd = new scala.util.Random(23L)
    val all = (0 until 90)
      .map(i => (i.toLong, Seq.fill(6)(rnd.nextGaussian().toFloat)))
      .toDF("id", "vec")
    val old = all.where(col("id") % 3 === 0)
    val g0 = graft.operators.Similarity.knnGraphBuild(old, k = 3, rounds = 2,
      revCap = 8, lshBits = 2, lshTables = 2, anchorsPerBucket = 8)
    val dir = java.nio.file.Files.createTempDirectory("knn_stream_ing").toString + "/idx"
    val idx = graft.operators.Similarity.knnGraphWritePartitioned(spark, g0, old, dir,
      parts = 4, k = 3, lshBits = 2, lshTables = 2, anchorsPerBucket = 8)
    val mem = MemoryStream[(Long, Seq[Float])]
    val writer = StreamingOps.streamingKnnGraphIngest(
      mem.toDF().toDF("id", "vec"), idx, old)
    val q = writer.start()
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.select("node_id", "nb_rank", "neighbor_id", "cos")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
        .sortBy(t => (t._1, t._2)).toSeq
    try {
      val b1 = all.where(col("id") % 3 === 1).as[(Long, Seq[Float])].collect()
      val b2 = all.where(col("id") % 3 === 2).as[(Long, Seq[Float])].collect()
      // the in-memory composition the drain must equal: append b1
      // against the stored base, then b2 against THAT result — batch
      // 2's scoring corpus includes batch 1's vectors (the `known`
      // accumulation under test)
      val expect1 = graft.operators.Similarity.knnGraphAppend(
        g0, all.where(col("id") % 3 =!= 2), col("id") % 3 === 1,
        k = 3, lshBits = 2, lshTables = 2, anchorsPerBucket = 8)
      val expect2 = rows(graft.operators.Similarity.knnGraphAppend(
        expect1, all, col("id") % 3 === 2,
        k = 3, lshBits = 2, lshTables = 2, anchorsPerBucket = 8))
      mem.addData(b1.toSeq)
      q.processAllAvailable()
      mem.addData(b2.toSeq)
      q.processAllAvailable()
      assert(rows(graft.operators.Similarity.knnGraphReadEdges(spark, idx)) == expect2,
        "two-batch streamed ingest must equal the sequential in-memory appends")
    } finally q.stop()
  }

  test("streamingKnnGraphIngest: 8-batch drain keeps per-batch plan depth flat " +
      "and equals the sequential appends (corpus-table-backed state)") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val rnd = new scala.util.Random(29L)
    val all = (0 until 108)
      .map(i => (i.toLong, Seq.fill(6)(rnd.nextGaussian().toFloat)))
      .toDF("id", "vec")
    val old = all.where(col("id") % 9 === 0)
    val g0 = graft.operators.Similarity.knnGraphBuild(old, k = 3, rounds = 2,
      revCap = 8, lshBits = 2, lshTables = 2, anchorsPerBucket = 8)
    val dir = Files.createTempDirectory("knn_stream_ing8").toString + "/idx"
    val idx = graft.operators.Similarity.knnGraphWritePartitioned(spark, g0, old, dir,
      parts = 4, k = 3, lshBits = 2, lshTables = 2, anchorsPerBucket = 8)
    val mem = MemoryStream[(Long, Seq[Float])]
    val q = StreamingOps.streamingKnnGraphIngest(
      mem.toDF().toDF("id", "vec"), idx, old).start()
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.select("node_id", "nb_rank", "neighbor_id", "cos")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
        .sortBy(t => (t._1, t._2)).toSeq
    try {
      // the in-memory composition the 8-batch drain must equal: each
      // batch appends against the graph the PREVIOUS batches produced
      // (localCheckpoint per round — the chained-append lineage is the
      // doubling-loop shape)
      var expected = g0.localCheckpoint(true)
      var planSizes = List.empty[Int]
      for (m <- 1 to 8) {
        val batch = all.where(col("id") % 9 === m)
        expected = graft.operators.Similarity.knnGraphAppend(
          expected, all.where(col("id") % 9 <= m), col("id") % 9 === m,
          k = 3, lshBits = 2, lshTables = 2, anchorsPerBucket = 8)
          .localCheckpoint(true)
        mem.addData(batch.as[(Long, Seq[Float])].collect().toSeq)
        q.processAllAvailable()
        // the frame an ingest batch scores against: its analyzed plan
        // must not grow with the number of batches already ingested —
        // the bounded-state contract (the pre-r17 union accumulator
        // grew by one union node + one checkpoint per batch)
        planSizes ::= graft.operators.Similarity
          .knnGraphIngestScoringCorpus(spark, idx, batch)
          .queryExecution.analyzed.collectLeaves().size +
          graft.operators.Similarity
            .knnGraphIngestScoringCorpus(spark, idx, batch)
            .queryExecution.analyzed.numberedTreeString.linesIterator.size
      }
      assert(planSizes.distinct.size == 1,
        s"per-batch scoring plan must stay constant-depth, got sizes $planSizes")
      assert(rows(graft.operators.Similarity.knnGraphReadEdges(spark, idx))
          == rows(expected),
        "8-batch streamed ingest must equal the sequential in-memory appends")
      // the persisted corpus table now holds base + every batch
      assert(graft.operators.Similarity.knnGraphCorpusRead(spark, idx).count() == 108L)
    } finally q.stop()
  }

  test("streamingExactDedup emits first arrival per fingerprint across batches") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, String)]
    val deduped = StreamingOps.streamingExactDedup(mem.toDF().toDF("doc_id", "text"))
    val q = deduped.writeStream.format("memory").queryName("streamdedup")
      .outputMode("append").start()
    try {
      // batch 1: doc 1 and its normalized duplicate 0 arrive together
      // (smallest id wins), doc 2 distinct
      mem.addData((1L, "Hello  world"), (0L, "hello world"), (2L, "other text"))
      q.processAllAvailable()
      // batch 2: another duplicate of doc 0 (dropped — state remembers
      // the fingerprint), one new doc
      mem.addData((5L, "HELLO WORLD"), (6L, "brand new content"))
      q.processAllAvailable()
      val emitted = spark.table("streamdedup").select("doc_id")
        .as[Long].collect().toSet
      assert(emitted == Set(0L, 2L, 6L))
    } finally q.stop()
  }

  test("streamingTokenBudget: within-batch greedy order, cross-batch spend, key isolation") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, String, Long, Long)]
    val out = StreamingOps.streamingTokenBudget(
      mem.toDF().toDF("doc_id", "key", "score", "n_tokens"), budgetTokens = 10L)
    val q = out.writeStream.format("memory").queryName("streambudget")
      .outputMode("append").start()
    try {
      // batch 1, key a, PREFIX rule in (score desc, id asc) order under
      // budget 10: doc 3 (score 9, n 4) -> cum 4 admit; doc 1 (score 5,
      // n 4) -> cum 8 admit; doc 2 (score 5, n 3) -> cum 11 REJECT and
      // the line is crossed; doc 4 (score 1, n 2) -> cum 13 rejected
      // too (no slipping past a rejected doc — the batch-oracle
      // contract). key b independent: doc 7 -> cum 9 admits.
      mem.addData(
        (1L, "a", 5L, 4L), (2L, "a", 5L, 3L), (3L, "a", 9L, 4L), (4L, "a", 1L, 2L),
        (7L, "b", 2L, 9L))
      q.processAllAvailable()
      val b1 = spark.table("streambudget")
        .as[(Long, String, Long, Long, Long)].collect().toSet
      assert(b1 == Set(
        (3L, "a", 9L, 4L, 4L), (1L, "a", 5L, 4L, 8L),
        (7L, "b", 2L, 9L, 9L)))
      // batch 2: key a's line stays crossed (cum carried forward);
      // key b fits exactly one more token (9 + 1 = 10)
      mem.addData((9L, "a", 100L, 1L), (8L, "b", 3L, 1L))
      q.processAllAvailable()
      val b2 = spark.table("streambudget")
        .as[(Long, String, Long, Long, Long)].collect().toSet -- b1
      assert(b2 == Set((8L, "b", 3L, 1L, 10L)),
        s"cross-batch admission wrong: $b2")
    } finally q.stop()
  }

  test("streamingTransitions: within-batch order, cross-batch bridge, key isolation") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, String, Long, Long)]
    val out = StreamingOps.streamingTransitions(
      mem.toDF().toDF("key", "state", "ts_us", "eid"))
    val q = out.writeStream.format("memory").queryName("streamtrans")
      .outputMode("append").start()
    try {
      // batch 1 — user 1: a(t10) -> b(t20) -> a(t30); user 2: x(t5);
      // ts tie within user 1 would break by eid (none here)
      mem.addData((1L, "b", 20L, 2L), (1L, "a", 10L, 1L), (1L, "a", 30L, 3L),
        (2L, "x", 5L, 9L))
      q.processAllAvailable()
      val b1 = spark.table("streamtrans").as[(String, String)].collect().toSeq
      assert(b1.sorted == Seq(("a", "b"), ("b", "a")))
      // batch 2 — the stored last event bridges: user 1 a -> c;
      // user 2 x -> y; a NEW user 3 emits nothing for its first event
      mem.addData((1L, "c", 40L, 4L), (2L, "y", 6L, 10L), (3L, "z", 1L, 11L))
      q.processAllAvailable()
      val b2 = spark.table("streamtrans").as[(String, String)].collect().toSeq
        .diff(b1)
      assert(b2.sorted == Seq(("a", "c"), ("x", "y")))
    } finally q.stop()
  }

  test("streamingTransitions single-batch drain equals the batch lead() window") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val rnd = new scala.util.Random(47)
    val rows = (0L until 400L).map(i =>
      (i % 13, s"s${rnd.nextInt(4)}", rnd.nextInt(50).toLong, i))
    val mem = MemoryStream[(Long, String, Long, Long)]
    val out = StreamingOps.streamingTransitions(
      mem.toDF().toDF("key", "state", "ts_us", "eid"))
    val q = out.writeStream.format("memory").queryName("streamtrans2")
      .outputMode("append").start()
    try {
      mem.addData(rows: _*) // ONE batch
      q.processAllAvailable()
      val streamed = spark.table("streamtrans2").as[(String, String)]
        .collect().groupBy(identity).view.mapValues(_.length.toLong).toMap
      val batch = graft.operators.Relational.transitionMatrix(
          rows.toDF("key", "state", "ts_us", "eid"),
          col("key"), col("state"), col("ts_us"), col("eid"))
        .as[(String, String, Long, Long)].collect()
        .map { case (f, t, n, _) => (f, t) -> n }.toMap
      assert(streamed == batch)
    } finally q.stop()
  }

  test("streamingTokenBudget single-batch drain equals the batch greedy selection") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val rnd = new scala.util.Random(31)
    val rows = (0L until 200L).map(i =>
      (i, s"k${i % 3}", rnd.nextInt(5).toLong, 1L + rnd.nextInt(9)))
    val mem = MemoryStream[(Long, String, Long, Long)]
    val out = StreamingOps.streamingTokenBudget(
      mem.toDF().toDF("doc_id", "key", "score", "n_tokens"), budgetTokens = 120L)
    val q = out.writeStream.format("memory").queryName("streambudget2")
      .outputMode("append").start()
    try {
      mem.addData(rows: _*)   // ONE batch: drain == batch greedy
      q.processAllAvailable()
      val got = spark.table("streambudget2")
        .as[(Long, String, Long, Long, Long)].collect().toSeq.sortBy(_._1)
      // batch reference: per-key PREFIX cumsum in (score desc, id)
      // order — exactly the oracle's `cum <= budget` window predicate
      val expect = rows.groupBy(_._2).toSeq.flatMap { case (k, g) =>
        var cum = 0L
        g.sortBy { case (id, _, s, _) => (-s, id) }.flatMap { case (id, _, s, n) =>
          cum += n
          if (cum <= 120L) Some((id, k, s, n, cum)) else None
        }
      }.sortBy(_._1)
      assert(got == expect)
    } finally q.stop()
  }

  test("streamingUrlDedup: first canonical-URL arrival wins across batches") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, String)]
    val deduped = StreamingOps.streamingUrlDedup(mem.toDF().toDF("doc_id", "url"))
    val q = deduped.writeStream.format("memory").queryName("streamurldedup")
      .outputMode("append").start()
    try {
      // batch 1: two spellings of the same page arrive together
      // (smallest id wins), one distinct page
      mem.addData(
        (1L, "HTTPS://Example.COM:443/x?utm_source=a"),
        (0L, "https://example.com/x/"),
        (2L, "https://example.com/y"))
      q.processAllAvailable()
      // batch 2: a third spelling (dropped — state remembers the
      // canonical URL), one new page
      mem.addData((5L, "https://example.com/x#top"), (6L, "https://example.com/z"))
      q.processAllAvailable()
      val emitted = spark.table("streamurldedup")
        .as[(Long, String)].collect().toSet
      assert(emitted == Set(
        (0L, "https://example.com/x"),
        (2L, "https://example.com/y"),
        (6L, "https://example.com/z")))
    } finally q.stop()
  }

  test("enrichWithStatic joins a stream against a broadcast dimension in append mode") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val dim = Seq((1L, "EU"), (2L, "US")).toDF("region_id", "region_name")
    val mem = MemoryStream[(Long, Long)]
    val enriched = StreamingOps.enrichWithStatic(
      mem.toDF().toDF("event_id", "region_id"), dim, Seq("region_id"))
    val q = enriched.writeStream.format("memory").queryName("enriched")
      .outputMode("append").start()
    try {
      mem.addData((10L, 1L), (11L, 2L), (12L, 99L)) // 99 has no dim row
      q.processAllAvailable()
      val rows = spark.table("enriched").select("event_id", "region_name")
        .as[(Long, Option[String])].collect().toSet
      assert(rows == Set((10L, Some("EU")), (11L, Some("US")), (12L, None)))
    } finally q.stop()
  }

  test("streamingContamination flags arriving docs sharing shingles with a static bench set") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val bench = Seq((100L, "alpha beta gamma delta epsilon")).toDF("doc_id", "text")
    val benchHashes = StreamingOps.benchShingleHashes(
      bench, col("doc_id"), col("text"), n = 3)
    assert(benchHashes.length == 3) // 5 tokens -> 3 trigram shingles

    val mem = MemoryStream[(Long, String)]
    val tagged = StreamingOps.streamingContamination(
      mem.toDF().toDF("doc_id", "text"), col("doc_id"), col("text"), benchHashes, n = 3)
    val q = tagged.writeStream.format("memory").queryName("contam")
      .outputMode("append").start()
    try {
      mem.addData(
        (1L, "alpha beta gamma delta epsilon"), // all 3 shingles shared
        (2L, "zeta eta theta iota"),            // nothing shared
        (3L, "x alpha beta gamma y"))           // 1 shared trigram
      q.processAllAvailable()
      val rows = spark.table("contam").as[(Long, Long)].collect().toMap
      assert(rows == Map(1L -> 3L, 2L -> 0L, 3L -> 1L))
    } finally q.stop()
  }

  test("streaming contract queries are stable across re-invocation in one session") {
    // the staging symlinks and memory sinks are reused per session —
    // a second invocation must neither double rows (append sink) nor
    // go stale (complete sink)
    val dir = "/root/testdata/sf0.001"
    val d1 = graft.SparkEntry.queries("q73_stream_dedup")(spark, dir).count()
    val d2 = graft.SparkEntry.queries("q73_stream_dedup")(spark, dir).count()
    assert(d1 > 0 && d1 == d2, s"q73 unstable: $d1 vs $d2")
    val w1 = graft.SparkEntry.queries("q72_stream_window_stats")(spark, dir).count()
    val w2 = graft.SparkEntry.queries("q72_stream_window_stats")(spark, dir).count()
    assert(w1 > 0 && w1 == w2, s"q72 unstable: $w1 vs $w2")
    val a1 = graft.SparkEntry.queries("q114_stream_ann")(spark, dir).count()
    val a2 = graft.SparkEntry.queries("q114_stream_ann")(spark, dir).count()
    assert(a1 > 0 && a1 == a2, s"q114 unstable: $a1 vs $a2")
    val h1 = graft.SparkEntry.queries("q120_stream_heavy_hitters")(spark, dir).count()
    val h2 = graft.SparkEntry.queries("q120_stream_heavy_hitters")(spark, dir).count()
    assert(h1 > 0 && h1 == h2, s"q120 unstable: $h1 vs $h2")
  }

  test("streamingAnnServe equals the batch IVF serve on a drained stream") {
    import org.apache.spark.sql.functions._
    val dir = "/root/testdata/sf0.001"
    val served = graft.SparkEntry.queries("q114_stream_ann")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
    val e = spark.read.parquet(s"$dir/embeddings.parquet")
      .select(col("vec_id").as("id"), col("embedding").as("vec"))
    val batch = graft.operators.Similarity
      .ivfTopK(e.where(col("id") >= 5 && col("id") < 10), e, k = 3, nBuckets = 8)
      .orderBy(col("query_id"), col("cos").desc, col("neighbor_id"))
      .select("query_id", "neighbor_id", "cos")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
    assert(served == batch,
      s"streaming serve must equal batch IVF: $served vs $batch")
  }

  test("streamingIvfPqServe equals the batch composed IVF×PQ serve on a drained stream") {
    import org.apache.spark.sql.functions._
    val dir = "/root/testdata/sf0.001"
    val served = graft.SparkEntry.queries("q243_stream_ivf_pq")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
    val e = spark.read.parquet(s"$dir/embeddings.parquet")
      .select(col("vec_id").as("id"), col("embedding").as("vec"))
    val cents = e.where(col("id") < 8)
      .select(col("id").as("cent_id"), col("vec").as("cent_v"))
    val model = graft.operators.Clustering.pqTrain(
      e, col("id"), col("vec"), m = 4, k = 8, iters = 1)
    val idxDir = Files.createTempDirectory("ivfpq_stream_spec").toString + "/idx"
    val idx = graft.operators.Similarity.ivfPqWritePartitioned(e, cents, model, idxDir)
    val batch = graft.operators.Similarity
      .ivfPqTopK(spark, idx, e.where(col("id") >= 5 && col("id") < 10),
        k = 3, nProbe = 1, rerank = 10)
      .orderBy(col("query_id"), col("cos").desc, col("neighbor_id"))
      .select("query_id", "neighbor_id", "cos")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
    assert(served == batch,
      s"streaming composed serve must equal batch: $served vs $batch")
  }

  test("streamingIvfPqServe: candidate join is codes-only; exact vectors join survivors after the cut") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val all = (0L until 32L).map { i =>
      (i, (0 until 8).map(d => ((i * 31 + d * 17) % 13).toDouble - 6.0))
    }.toDF("id", "vec")
    val cents = all.where(col("id") < 4)
      .select(col("id").as("cent_id"), col("vec").as("cent_v"))
    val model = graft.operators.Clustering.pqTrain(all, col("id"), col("vec"), m = 4, k = 4, iters = 1)
    val idxDir = Files.createTempDirectory("ivfpq_twofetch").toString + "/idx"
    graft.operators.Similarity.ivfPqWritePartitioned(all, cents, model, idxDir)
    val coded = spark.read.parquet(idxDir)
      .select(col("bucket").cast("long").as("bucket"), col("neighbor_id"),
        col("codes"), col("c_vec"), col("c_norm"))
    val srcDir = Files.createTempDirectory("ivfpq_twofetch_src")
    val qStream = spark.readStream
      .schema(all.schema).parquet(srcDir.toString)
      .select(col("id"), col("vec"))
    val served = StreamingOps.streamingIvfPqServe(
      qStream, cents, model, coded, k = 3, rerank = 5)
    // the analyzed plan pins the two-fetch shape: the join BELOW the
    // stateful ADC cut carries (bucket, neighbor_id, codes) and NO
    // c_vec; the join ABOVE it fetches c_vec for survivors only
    val lp = served.queryExecution.analyzed
    val fmgws = lp.collect {
      case n if n.nodeName.contains("FlatMapGroupsWithState") => n }.head
    val candJoin = fmgws.collectFirst {
      case j: org.apache.spark.sql.catalyst.plans.logical.Join => j }.get
    val candCols = candJoin.right.output.map(_.name)
    assert(candCols.contains("codes") && !candCols.contains("c_vec"),
      s"candidate join must be codes-only, got $candCols")
    val topJoin = lp.collectFirst {
      case j: org.apache.spark.sql.catalyst.plans.logical.Join
        if j.collectFirst { case n if n.nodeName.contains("FlatMapGroupsWithState") => n }.isDefined
        => j }.get
    assert(topJoin.right.output.map(_.name).contains("c_vec"),
      "survivor join must fetch the exact vectors")
    // and the drained two-fetch serve still equals the batch serve
    all.where(col("id") < 3).write.mode("overwrite").parquet(srcDir.toString)
    val ck = Files.createTempDirectory("ivfpq_twofetch_ck")
    val q = served.writeStream.format("memory").queryName("ivfpq_twofetch")
      .option("checkpointLocation", ck.toString)
      .outputMode("append").start()
    try q.processAllAvailable() finally q.stop()
    val got = StreamingOps.ivfPqTopKOfSurvivors(spark.table("ivfpq_twofetch"), k = 3)
      .orderBy("query_id", "neighbor_id")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
    val idx = graft.operators.Similarity.IvfPqIndex(cents, model, idxDir, 1000.0)
    val want = graft.operators.Similarity
      .ivfPqTopK(spark, idx, all.where(col("id") < 3), k = 3, nProbe = 1, rerank = 5)
      .orderBy("query_id", "neighbor_id")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
    assert(got == want, s"$got vs $want")
  }

  test("streamingIvfPqServe residual=true equals the batch IVFADC serve") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val all = (0L until 32L).map { i =>
      val c = (i % 4).toInt; val j = ((i / 4) % 8).toInt
      val v = Array.fill(8)(0.0)
      v(c) = 40.0; v(4 + (j % 4)) = 1.0 + (j / 4).toDouble
      (i, v.toSeq)
    }.toDF("id", "vec")
    val cents = all.where(col("id") < 4)
      .select(col("id").as("cent_id"), col("vec").as("cent_v"))
    val model = graft.operators.Clustering.pqTrain(
      graft.operators.Similarity.ivfResiduals(all, cents),
      col("id"), col("vec"), m = 4, k = 4, iters = 1)
    val idxDir = Files.createTempDirectory("ivfadc_stream").toString + "/idx"
    val idx = graft.operators.Similarity.ivfPqWritePartitioned(
      all, cents, model, idxDir, residual = true)
    val coded = spark.read.parquet(idxDir)
      .select(col("bucket").cast("long").as("bucket"), col("neighbor_id"),
        col("codes"), col("c_vec"), col("c_norm"))
    val srcDir = Files.createTempDirectory("ivfadc_stream_src")
    all.where(col("id") < 4).write.mode("overwrite").parquet(srcDir.toString)
    val ck = Files.createTempDirectory("ivfadc_stream_ck")
    val served = StreamingOps.streamingIvfPqServe(
      spark.readStream.schema(all.schema).parquet(srcDir.toString)
        .select(col("id"), col("vec")),
      cents, model, coded, k = 3, rerank = 5, residual = true)
    val q = served.writeStream.format("memory").queryName("ivfadc_stream")
      .option("checkpointLocation", ck.toString)
      .outputMode("append").start()
    try q.processAllAvailable() finally q.stop()
    val got = StreamingOps.ivfPqTopKOfSurvivors(spark.table("ivfadc_stream"), k = 3)
      .orderBy("query_id", "neighbor_id")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
    val want = graft.operators.Similarity
      .ivfPqTopK(spark, idx, all.where(col("id") < 4), k = 3, nProbe = 1, rerank = 5)
      .orderBy("query_id", "neighbor_id")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
    assert(got.nonEmpty && got == want, s"$got vs $want")
  }

  test("streamingIvfPqIngest: existing files untouched; drained index serves like batch append") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val all = (0L until 32L).map { i =>
      (i, (0 until 8).map(d => ((i * 29 + d * 13) % 11).toDouble - 5.0))
    }.toDF("id", "vec")
    val cents = all.where(col("id") < 4)
      .select(col("id").as("cent_id"), col("vec").as("cent_v"))
    val model = graft.operators.Clustering.pqTrain(all, col("id"), col("vec"), m = 4, k = 4, iters = 1)
    val dir = Files.createTempDirectory("ivfpq_ingest").toString + "/idx"
    val idx0 = graft.operators.Similarity.ivfPqWritePartitioned(
      all.where(col("id") % 4 =!= 3), cents, model, dir)
    def inventory(): Map[String, String] = {
      val root = new java.io.File(dir)
      root.listFiles().filter(_.getName.startsWith("bucket="))
        .flatMap(d => d.listFiles().filter(_.getName.endsWith(".parquet")).map { f =>
          val h = java.security.MessageDigest.getInstance("MD5")
            .digest(Files.readAllBytes(f.toPath)).map("%02x".format(_)).mkString
          (d.getName + "/" + f.getName) -> h
        }).toMap
    }
    val before = inventory()
    val srcDir = Files.createTempDirectory("ivfpq_ingest_src")
    all.where(col("id") % 4 === 3).write.mode("overwrite").parquet(srcDir.toString)
    val ck = Files.createTempDirectory("ivfpq_ingest_ck")
    val q = StreamingOps.streamingIvfPqIngest(
      spark.readStream.schema(all.schema).parquet(srcDir.toString), idx0)
      .option("checkpointLocation", ck.toString)
      .start()
    try q.processAllAvailable() finally q.stop()
    val after = inventory()
    assert(before.forall { case (f, h) => after.get(f).contains(h) },
      "streamed ingest must not rewrite existing files")
    assert(after.size > before.size, "streamed ingest must add files")
    // serve equality with a from-scratch build over the union
    val scratchDir = Files.createTempDirectory("ivfpq_ingest2").toString + "/idx"
    val scratch = graft.operators.Similarity.ivfPqWritePartitioned(all, cents, model, scratchDir)
    val queries = all.where(col("id") < 5)
    def rows(ix: graft.operators.Similarity.IvfPqIndex) =
      graft.operators.Similarity.ivfPqTopK(spark, ix, queries, k = 3, nProbe = 1, rerank = 32)
        .orderBy("query_id", "neighbor_id").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
    assert(rows(idx0) == rows(scratch))
  }

  test("xmlRecordStream parses arriving one-line records with entity expansion") {
    import spark.implicits._
    val dir = Files.createTempDirectory("xmlstream")
    val checkpoint = Files.createTempDirectory("xmlstream-ck")
    val dtd = Dtd.parseString(
      "<!ELEMENT dblp (article|book)*>\n<!ELEMENT article (title)*>\n" +
        "<!ELEMENT book (title)*>\n<!ELEMENT title (#PCDATA)>\n<!ENTITY uuml \"&#252;\">\n")
    val stream = StreamingOps.xmlRecordStream(spark, dir.toString, dtd)
    val q = stream.writeStream.format("memory").queryName("xmlrecs")
      .option("checkpointLocation", checkpoint.toString)
      .outputMode("append").start()
    try {
      Files.write(dir.resolve("chunk1.xml"),
        ("<article key=\"a/1\"><title>&uuml;ber X</title></article>\n" +
          "<book key=\"b/1\"><title>T</title></book>\n").getBytes("UTF-8"))
      q.processAllAvailable()
      val rows = spark.table("xmlrecs").as[(String, String, Int)].collect().toSet
      assert(rows == Set(("article", "a/1", 1), ("book", "b/1", 1)))
    } finally q.stop()
  }
}
