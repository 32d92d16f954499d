package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{Column, DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

import graft.xml.{Dtd, XmlRecords}

/** Structured Streaming extension (SURVEY.md §2.10 — not in the
  * reference, which is strictly batch): incremental DBLP-style chunks
  * and event streams processed with watermarks, windows, and custom
  * session state.
  */
object StreamingOps {

  // ------------------------------------------------------------------
  // Incremental XML chunk stream
  // ------------------------------------------------------------------

  /** Stream of flattened records from XML chunk files arriving in
    * `dir`. Incremental dumps carry one complete record element per
    * line (the within-file reassembly problem of the batch source
    * does not arise); each line parses independently, so this is an
    * embarrassingly parallel map over the file stream.
    * Returns (recordType, key, nChildren) rows; route to per-type
    * sinks with `partitionBy` or `foreachBatch`.
    */
  def xmlRecordStream(spark: SparkSession, dir: String, dtd: Dtd): DataFrame = {
    import spark.implicits._
    val dtdB = spark.sparkContext.broadcast(dtd)
    spark.readStream
      .text(dir)
      .as[String]
      .flatMap { line =>
        val t = line.trim
        if (t.startsWith("<") && !t.startsWith("<?") && !t.startsWith("<!"))
          XmlRecords.parseRecordString(dtdB.value.expandEntities(t), -1L)
            .map(r => (r.recordType, r.attrs.getOrElse("key", null), r.children.size))
        else None
      }
      .toDF("record_type", "key", "n_children")
  }

  /** Append a micro-batched stream to per-type CSV directories with
    * the engine's dialect — the streaming counterpart of the batch
    * fan-out sink (foreachBatch so each batch reuses the batch
    * writer).
    */
  def csvAppendSink(stream: DataFrame, outDir: String, checkpoint: String) =
    stream.writeStream
      .option("checkpointLocation", checkpoint)
      .outputMode(OutputMode.Append)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        batch.write.mode("append")
          .option("sep", ";").option("quote", "\"").option("escape", "\"")
          .partitionBy("record_type")
          .csv(outDir)
      }

  // ------------------------------------------------------------------
  // Windowed aggregation with watermark
  // ------------------------------------------------------------------

  /** Tumbling-window event counts with late-data tolerance: watermark
    * bounds state so the aggregation runs forever on unbounded input —
    * state for windows older than the watermark is dropped, which is
    * what makes this viable on a 100 TB/day stream.
    */
  def windowedEventStats(
      events: DataFrame,
      tsCol: String,
      typeCol: String,
      valueCol: String,
      window_ : String = "1 hour",
      watermark: String = "2 hours"): DataFrame =
    events
      .withWatermark(tsCol, watermark)
      .groupBy(window(col(tsCol), window_), col(typeCol))
      .agg(count(lit(1)).as("n"), sum(valueCol).as("sum_value"))
      .select(col("window.start").as("window_start"), col(typeCol),
        col("n"), col("sum_value"))

  // ------------------------------------------------------------------
  // Custom session state (flatMapGroupsWithState)
  // ------------------------------------------------------------------

  final case class Event(userId: Long, ts: Timestamp, value: Double)
  final case class SessionState(start: Long, last: Long, n: Int, total: Double)
  final case class Session(userId: Long, startMs: Long, endMs: Long, nEvents: Int, total: Double)

  /** Gap-based sessionization: a session closes when no event arrives
    * within `gapMs`. Idle keys are flushed by EVENT-TIME timeouts (the
    * watermark advancing past last+gap) — deterministic, no wall-clock
    * dependence. State per user is O(1) — the classic
    * flatMapGroupsWithState shape that scales with distinct keys, not
    * events.
    */
  /** Stream-STREAM interval join — the event-matching primitive
    * (view↔click, impression↔conversion): for every left event, the
    * right events with the same key whose timestamp falls in
    * [left.ts, left.ts + maxDelay]. Both sides carry watermarks so
    * the state store evicts rows older than watermark − maxDelay —
    * state is bounded by the delay horizon, not the stream length.
    * INNER join: matches emit as they form (append mode), nothing is
    * withheld on the watermark, so an AvailableNow drain yields the
    * complete batch-equivalent answer.
    */
  def intervalJoin(
      left: DataFrame,
      right: DataFrame,
      keyCol: String,
      tsCol: String,
      maxDelay: String = "1 hour",
      watermark: String = "2 hours"): DataFrame = {
    val l = left.withWatermark(tsCol, watermark).alias("l")
    val r = right.withWatermark(tsCol, watermark).alias("r")
    l.join(r, expr(
      s"l.$keyCol = r.$keyCol AND r.$tsCol >= l.$tsCol AND " +
        s"r.$tsCol <= l.$tsCol + INTERVAL $maxDelay"))
  }

  /** Streaming windowed approx-distinct (HLL++ through the state
    * store) — the cardinality member of the streaming sketch family
    * (Misra–Gries and Count-Min are its frequency siblings): exact
    * `countDistinct` is unsupported in streaming aggregation (it
    * would need unbounded per-window value state), so the HLL sketch
    * IS the streaming-native answer; per-window state is the fixed
    * sketch size regardless of cardinality. Certification happens
    * post-drain against a batch-exact count (the q16 pattern: the
    * estimate participates only in a bound boolean, never in the
    * output).
    */
  def streamingApproxDistinct(
      events: DataFrame,
      tsCol: String,
      valueCol: String,
      window_ : String = "1 hour",
      watermark: String = "2 hours"): DataFrame =
    events
      .withWatermark(tsCol, watermark)
      .groupBy(window(col(tsCol), window_))
      .agg(approx_count_distinct(col(valueCol)).as("n_approx"))
      .select(col("window.start").as("window_start"), col("n_approx"))

  /** Streaming CDC materialization — the streaming counterpart of
    * [[graft.operators.Snapshot.applyChanges]]: a change stream of
    * (id, seq, op, content) rows folds into current-corpus state by
    * LATEST-op-wins per id (`max_by` over the change sequence
    * number, which must be unique per id — a CDC log's LSN).
    * Complete-mode aggregate: state is one (op, content, seq) per
    * live id, merged associatively, so the drained table equals the
    * batch arg_max regardless of how updates were batched. Callers
    * filter `op = 'upsert'` for the live corpus; `delete` rows are
    * tombstones (kept in state so a late stale upsert cannot
    * resurrect a deleted id).
    */
  def materializeChanges(changes: DataFrame): DataFrame =
    changes.groupBy("id").agg(
      max_by(col("op"), col("seq")).as("op"),
      max_by(col("content"), col("seq")).as("content"),
      max(col("seq")).as("seq"))

  /** Streaming exact dedup: emit each document the FIRST time its
    * normalized-content fingerprint arrives; later duplicates are
    * dropped. The incremental-ingest counterpart of
    * [[graft.operators.Dedup.exactDedup]] — the fingerprint is
    * computed relationally (codegen'd md5) before the stateful step,
    * so state holds one boolean per distinct fingerprint, not the
    * text. Within a batch, ties go to the smallest doc id.
    *
    * State is O(distinct content); a production deployment on an
    * unbounded stream bounds it with an event-time TTL (set a
    * watermark and EventTimeTimeout) — dedup then only guards within
    * the TTL horizon, which is the standard tradeoff.
    */
  def streamingExactDedup(docs: DataFrame): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs
      .select(col("doc_id").cast("long"), col("text"),
        graft.operators.TextAnalysis.fingerprint(col("text")).as("fp"))
      .as[(Long, String, String)]
      .groupByKey(_._3)
      .flatMapGroupsWithState[Boolean, (Long, String)](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (fp: String, rows: Iterator[(Long, String, String)], state: GroupState[Boolean]) =>
          if (state.exists) Iterator.empty
          else {
            state.update(true)
            Iterator.single((rows.minBy(_._1)._1, fp))
          }
      }
      .toDF("doc_id", "fp")
  }

  /** Streaming per-key token-budget admission — the ingestion twin of
    * [[graft.operators.Curation.selectTokenBudget]]: documents arrive
    * as a stream already carrying (key, score, n_tokens); each key
    * (source, tenant, language…) holds a fixed token budget, and a
    * document is ADMITTED iff the key's running spend plus its tokens
    * still fits. State per key is ONE long (tokens spent) — never
    * text, never rows — so state scales with distinct keys.
    *
    * Admission is the PREFIX rule — the same contract as the batch
    * operator: the key's cumulative token count advances over EVERY
    * document seen (admitted or not), and a document is admitted iff
    * its inclusive cumulative count fits. So once one document
    * overflows the line, the key is effectively closed (a later small
    * document cannot slip in past a rejected large one) — exactly the
    * `cum <= budget` window predicate of the batch selection, which is
    * what keeps this ORACLE-equal rather than first-fit-approximate.
    *
    * Ordering contract: WITHIN a micro-batch, each key consumes in
    * (score desc, doc_id asc) order — so a single-batch AvailableNow
    * drain equals the per-key batch greedy selection. ACROSS batches,
    * consumption is arrival-time ordered (earlier batches spend
    * first regardless of score) — the honest semantics of an online
    * budget, spec-pinned. State per key is ONE long.
    */
  def streamingTokenBudget(docs: DataFrame, budgetTokens: Long): DataFrame = {
    require(budgetTokens >= 0L, s"budgetTokens must be >= 0, got $budgetTokens")
    val spark = docs.sparkSession
    import spark.implicits._
    docs
      .select(col("doc_id").cast("long"), col("key").cast("string"),
        col("score").cast("long"), col("n_tokens").cast("long"))
      .as[(Long, String, Long, Long)]
      .groupByKey(_._2)
      .flatMapGroupsWithState[Long, (Long, String, Long, Long, Long)](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (key: String, rows: Iterator[(Long, String, Long, Long)], state: GroupState[Long]) =>
          var cum = state.getOption.getOrElse(0L)
          val admitted = rows.toVector
            .sortBy { case (id, _, score, _) => (-score, id) }
            .flatMap { case (id, _, score, n) =>
              cum += n
              if (cum <= budgetTokens) Some((id, key, score, n, cum)) else None
            }
          state.update(cum)
          admitted.iterator
      }
      .toDF("doc_id", "key", "score", "n_tokens", "cum_tokens")
  }

  /** Streaming first-order transition extraction — the ingestion twin
    * of [[graft.operators.Relational.transitionMatrix]]: events arrive
    * as a stream carrying (key, state, ts_us, eid); per key, each
    * event emits a (from_state, to_state) transition from the
    * previously-seen event. State per key is the last (ts_us, eid,
    * state) triple — three scalars, never rows — so state scales with
    * distinct keys.
    *
    * Ordering contract (same shape as [[streamingTokenBudget]]):
    * WITHIN a micro-batch each key consumes in (ts_us, eid) order, so
    * a single-batch AvailableNow drain emits exactly the batch
    * lead()-window transitions — oracle-equal counts. ACROSS batches,
    * transitions chain in arrival order (the stored last event
    * bridges batches); honest online semantics, spec-pinned.
    */
  def streamingTransitions(events: DataFrame): DataFrame = {
    val spark = events.sparkSession
    import spark.implicits._
    events
      .select(col("key").cast("long"), col("state").cast("string"),
        col("ts_us").cast("long"), col("eid").cast("long"))
      .as[(Long, String, Long, Long)]
      .groupByKey(_._1)
      .flatMapGroupsWithState[(Long, Long, String), (String, String)](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (_: Long, rows: Iterator[(Long, String, Long, Long)],
         state: GroupState[(Long, Long, String)]) =>
          val sorted = rows.toVector.sortBy { case (_, _, t, e) => (t, e) }
          var last = state.getOption
          val out = Vector.newBuilder[(String, String)]
          sorted.foreach { case (_, st, t, e) =>
            last.foreach { case (_, _, prev) => out += ((prev, st)) }
            last = Some((t, e, st))
          }
          last.foreach(state.update)
          out.result().iterator
      }
      .toDF("from_state", "to_state")
  }

  /** Streaming URL-keyed dedup — the crawl-ingest counterpart of
    * [[graft.operators.Dedup.urlDedup]]: emit each document the FIRST
    * time its canonical URL arrives; later spellings of the same page
    * (case, default port, fragment, tracking params, trailing slash)
    * are dropped. Canonicalization runs relationally (codegen'd regex
    * chain) BEFORE the stateful step, so state holds one boolean per
    * canonical URL — never the document. Within a batch, ties go to
    * the smallest doc id. Same state-TTL note as
    * [[streamingExactDedup]].
    */
  def streamingUrlDedup(docs: DataFrame): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs
      .select(col("doc_id").cast("long"),
        graft.operators.TextAnalysis.canonicalizeUrl(col("url")).as("cu"))
      .as[(Long, String)]
      .groupByKey(_._2)
      .flatMapGroupsWithState[Boolean, (Long, String)](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (cu: String, rows: Iterator[(Long, String)], state: GroupState[Boolean]) =>
          if (state.exists) Iterator.empty
          else {
            state.update(true)
            Iterator.single((rows.minBy(_._1)._1, cu))
          }
      }
      .toDF("doc_id", "canonical_url")
  }

  // ------------------------------------------------------------------
  // Stream-static composition
  // ------------------------------------------------------------------

  /** Stream-static broadcast enrichment: join an unbounded stream with
    * a bounded dimension table. Broadcasting the static side keeps the
    * stream map-only (append mode, no stream-side shuffle, no state) —
    * the standard shape for attaching dimensions to a firehose.
    */
  def enrichWithStatic(stream: DataFrame, dim: DataFrame, keys: Seq[String]): DataFrame =
    stream.join(broadcast(dim), keys, "left")

  /** Streaming benchmark decontamination: tag each ARRIVING document
    * with how many distinct hashed word shingles it shares with a
    * static benchmark set, fully stateless and append-mode: the
    * benchmark side (small by nature) is materialized ONCE into a
    * literal hash array carried by the plan, so every micro-batch is a
    * map-only pass — no stateful aggregation, no state-store growth.
    * The incremental counterpart of [[graft.operators.Dedup.contamination]];
    * for benchmark sets too large for a plan literal (tens of millions
    * of shingles), switch to [[enrichWithStatic]]-style per-batch
    * broadcast joins instead.
    */
  def streamingContamination(
      stream: DataFrame,
      id: org.apache.spark.sql.Column,
      text: org.apache.spark.sql.Column,
      benchShingles: Array[Long],
      n: Int = 3): DataFrame = {
    val sh = graft.functions.MinHash.shingleHashes(text, n)
    stream.select(id.as("doc_id"),
      size(array_intersect(sh, typedLit(benchShingles))).cast("long").as("n_shared"))
  }

  /** Collect a benchmark corpus's distinct hashed shingles (driver-
    * side array for [[streamingContamination]]'s plan literal).
    */
  def benchShingleHashes(bench: DataFrame, id: org.apache.spark.sql.Column,
      text: org.apache.spark.sql.Column, n: Int = 3): Array[Long] = {
    import bench.sparkSession.implicits._
    graft.operators.Dedup.explodedHashedShingles(bench, id, text, n)
      .select(col("h")).distinct().as[Long].collect()
  }

  /** Streaming ANN serve: an unbounded stream of query vectors
    * (id, vec) answered against a STATIC prebuilt IVF index — the
    * online counterpart of [[graft.operators.Similarity.ivfTopKIndexed]],
    * built so that nothing in the streaming plan is stateful-unbounded:
    *
    *  - coarse assignment is MAP-ONLY: the serve-time centroid table
    *    is small by construction (coarse cells), so it is collected
    *    once into plan-literal vectors and the argmax over
    *    (rounded cos, -cent_id) structs runs as `greatest(...)` —
    *    bit-identical to the batch `max_by` assignment (same `vec_dot`
    *    arithmetic, same round-6, same smallest-id tie-break), with no
    *    stream-side aggregation and no state;
    *  - the candidate scan is a stream-static equi-join on `bucket`
    *    (append-safe; with `index.assigned` persisted bucketed by
    *    `bucket`, no per-batch corpus shuffle);
    *  - per-query top-k ranks in flatMapGroupsWithState that never
    *    stores state: a query's candidates are all derived from its
    *    own input row, hence batch-local — the group ranks what it
    *    sees and emits immediately, so the state store stays empty no
    *    matter how long the stream runs.
    *
    * Emits (query_id, neighbor_id, cos, rank) in append mode. Serving
    * semantics equal the batch path for single-probe queries
    * (`nProbe=1`); multi-probe serving stays batch-side where the
    * probe window is expressible.
    */
  def streamingAnnServe(
      queryStream: DataFrame,
      index: graft.operators.Similarity.IvfIndex,
      k: Int): DataFrame = {
    import graft.operators.Similarity
    require(k >= 1, s"k must be >= 1, got $k")
    val spark = queryStream.sparkSession
    import spark.implicits._
    // driver-bounded by design: coarse level of an IVF index is the
    // SMALL level (hundreds to low thousands of cells); the guard makes
    // exceeding that loud instead of silently bloating the plan
    val cents = index.cents
      .select(col("cent_id").cast("long"), col("cent_v").cast("array<double>"))
      .collect()
      .map(r => (r.getLong(0), r.getSeq[Double](1).toArray))
    require(cents.nonEmpty, "streamingAnnServe: empty centroid table")
    require(cents.length <= 4096,
      s"streamingAnnServe inlines centroids as plan literals; got ${cents.length} cells — " +
        "serve a coarser level or use the batch path")
    val candStructs = cents.map { case (cid, arr) =>
      val c = typedLit(arr)
      struct(
        round(Similarity.cosineFromNorms(
          Similarity.dot(col("q_vec"), c), col("q_norm"), Similarity.norm(c)), 6).as("c"),
        lit(-cid).as("nid"))
    }
    val best = if (candStructs.length == 1) candStructs.head else greatest(candStructs: _*)
    val assignedQ = queryStream
      .select(col("id").cast("long").as("query_id"), col("vec").as("q_vec"))
      .withColumn("q_norm", Similarity.norm(col("q_vec")))
      .withColumn("bucket", -best.getField("nid"))
    val scored = assignedQ.join(index.assigned, Seq("bucket"))
      .where(col("query_id") =!= col("neighbor_id"))
      .select(col("query_id"), col("neighbor_id").cast("long").as("neighbor_id"),
        round(Similarity.cosineFromNorms(
          Similarity.dot(col("q_vec"), col("c_vec")), col("q_norm"), col("c_norm")), 6).as("cos"))
    scored.as[(Long, Long, Double)]
      .groupByKey(_._1)
      .flatMapGroupsWithState[Boolean, (Long, Long, Double, Int)](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (qid: Long, rows: Iterator[(Long, Long, Double)], _: GroupState[Boolean]) =>
          // candidates are batch-local (they come from this query's own
          // row); rank and emit, store nothing — memory bound is the
          // probed bucket's size, the same bound the batch serve has
          rows.toSeq.sortBy(r => (-r._3, r._2)).take(k).zipWithIndex
            .map { case ((_, nid, cos), i) => (qid, nid, cos, i + 1) }.iterator
      }
      .toDF("query_id", "neighbor_id", "cos", "rank")
  }

  /** Streaming serve against the COMPOSED IVF×PQ index — q234's
    * two-stage semantics with a query STREAM, in the batch path's
    * two-fetch shape:
    *
    *  1. each micro-batch query assigns to its nearest coarse bucket
    *     (plan-literal centroids, map-only) and computes its ADC
    *     lookup table once (plan-literal codebook, native `pq_lut`);
    *  2. candidates come from ONE stream-static bucket join against
    *     ONLY the (bucket, neighbor_id, codes) projection of the
    *     coded table — the float vectors do NOT ride the candidate
    *     join (spec-pinned from the executed micro-batch plan) — and
    *     the per-query ADC-top-`rerank` cut runs in a stateless
    *     flatMapGroupsWithState (candidates are batch-local; nothing
    *     is stored — the memory bound is the probed bucket's size,
    *     the batch serve's own bound);
    *  3. ONLY the survivors fetch exact vectors, via a second
    *     stream-static join on (bucket, neighbor_id) — stateless, so
    *     it legally follows the flatMapGroupsWithState — and the
    *     exact rounded cosine is computed per survivor.
    *
    * The emitted stream carries each query's ≤ `rerank` survivors
    * with exact cosines; the final top-`k` cut is the CONSUMER's
    * per-micro-batch step ([[ivfPqTopKOfSurvivors]] — exact, because
    * a query's whole candidate set derives from its single input row
    * and so never spans micro-batches; Spark disallows a second
    * stateful operator after flatMapGroupsWithState, and a serving
    * fleet's final ranker is a separate tier anyway). The k-cut
    * output equals [[graft.operators.Similarity.ivfPqTopK]]
    * row-for-row for the same queries (q243 pins it under the DuckDB
    * gate with q234's oracle).
    */
  def streamingIvfPqServe(
      queryStream: DataFrame,
      cents: DataFrame,
      model: Array[Array[Array[Long]]],
      coded: DataFrame,
      k: Int,
      rerank: Int,
      fpScale: Double = 1000.0,
      residual: Boolean = false): DataFrame = {
    import graft.operators.Similarity
    require(k >= 1, s"k must be >= 1, got $k")
    require(rerank >= k, s"rerank ($rerank) must be >= k ($k)")
    val spark = queryStream.sparkSession
    import spark.implicits._
    val centRows = cents
      .select(col("cent_id").cast("long"), col("cent_v").cast("array<double>"))
      .collect()
      .map(r => (r.getLong(0), r.getSeq[Double](1).toArray))
    require(centRows.nonEmpty, "streamingIvfPqServe: empty centroid table")
    require(centRows.length <= 4096,
      s"streamingIvfPqServe inlines centroids as plan literals; got ${centRows.length}")
    val m = model.length
    val flat = model.flatten.flatten
    val candStructs = centRows.map { case (cid, arr) =>
      val c = typedLit(arr)
      struct(
        round(Similarity.cosineFromNorms(
          Similarity.dot(col("q_vec"), c), col("q_norm"), Similarity.norm(c)), 6).as("c"),
        lit(-cid).as("nid"))
    }
    val best = if (candStructs.length == 1) candStructs.head else greatest(candStructs: _*)
    // residual (IVFADC) indexes LUT the query's per-bucket coarse
    // residual q − c_b (the batch serve's arithmetic verbatim — the
    // chosen bucket's centroid folds out of the same plan literals,
    // map-only); raw indexes LUT the query vector itself
    val lutInput =
      if (residual) {
        val centCases = centRows.map { case (cid, arr) =>
          (cid, zip_with(col("q_vec"), typedLit(arr),
            (a, b) => a.cast("double") - b.cast("double")))
        }
        centCases.tail.foldLeft(
          when(col("bucket") === centCases.head._1, centCases.head._2)) {
          case (acc, (cid, diff)) => acc.when(col("bucket") === cid, diff)
        }
      } else col("q_vec")
    val assignedQ = queryStream
      .select(col("id").cast("long").as("query_id"),
        col("vec").cast("array<double>").as("q_vec"))
      .withColumn("q_norm", Similarity.norm(col("q_vec")))
      .withColumn("bucket", -best.getField("nid"))
      .withColumn("__lut", graft.functions.VecOps.pqLut(
        graft.functions.VecOps.fixedPoint(lutInput, fpScale),
        typedLit(flat), m))
    // stage 2: codes-only candidate join — c_vec/c_norm are pruned
    // from the static scan here, exactly like the batch probe
    val codesOnly = coded.select(col("bucket"), col("neighbor_id"), col("codes"))
    val scored = assignedQ.join(codesOnly, Seq("bucket"))
      .where(col("query_id") =!= col("neighbor_id"))
      .select(col("query_id"), col("bucket"), col("q_vec"), col("q_norm"),
        col("neighbor_id").cast("long").as("neighbor_id"),
        graft.functions.VecOps.pqAdc(col("codes"), col("__lut")).as("adc_dist"))
    val survivors = scored
      .as[(Long, Long, Seq[Double], Double, Long, Long)]
      .groupByKey(_._1)
      .flatMapGroupsWithState[Boolean, (Long, Long, Seq[Double], Double, Long)](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (qid: Long, rows: Iterator[(Long, Long, Seq[Double], Double, Long, Long)],
            _: GroupState[Boolean]) =>
          rows.toSeq.sortBy(r => (r._6, r._5)).take(rerank)
            .map { case (_, bucket, qv, qn, nid, _) => (qid, bucket, qv, qn, nid) }
            .iterator
      }
      .toDF("query_id", "bucket", "q_vec", "q_norm", "neighbor_id")
    // stage 3: exact vectors for survivors only (stateless
    // stream-static join, so it may follow the stateful cut)
    survivors
      .join(coded.select(col("bucket"), col("neighbor_id"),
        col("c_vec"), col("c_norm")), Seq("bucket", "neighbor_id"))
      .select(col("query_id"), col("neighbor_id"),
        round(Similarity.cosineFromNorms(
          Similarity.dot(col("q_vec"), col("c_vec")), col("q_norm"), col("c_norm")), 6)
          .as("cos"))
  }

  /** The consumer-side top-`k` cut over [[streamingIvfPqServe]]'s
    * survivor batches — run per micro-batch (foreachBatch) or on the
    * drained table; exact because a query's survivors never span
    * micro-batches (they derive from its single input row).
    */
  def ivfPqTopKOfSurvivors(batch: DataFrame, k: Int): DataFrame =
    batch.withColumn("rk", row_number().over(
      org.apache.spark.sql.expressions.Window
        .partitionBy("query_id").orderBy(col("cos").desc, col("neighbor_id"))))
      .where(col("rk") <= k)
      .drop("rk")

  /** Streaming mini-batch k-means (Lloyd updates through
    * foreachBatch): each arriving micro-batch of vectors runs one
    * [[graft.operators.Clustering.lloydUpdateFixedPoint]] against the
    * CURRENT centroids, and the updated model becomes current for the
    * next batch — sequential by Structured Streaming's micro-batch
    * ordering guarantee, so the drained model is deterministic for a
    * deterministic batch sequence. A whole-corpus single batch is
    * exactly one batch Lloyd iteration — q266's equality contract
    * with the batch trainer (q101's oracle verbatim).
    *
    * Returns the writer plus a getter for the live model (k·d longs
    * on the driver — the model is operator-parameter-sized, never
    * data-sized; this is the standard online-training shape where the
    * model lives outside the stream).
    */
  def streamingKmeansUpdate(
      vecStream: DataFrame,
      init: Array[Array[Long]],
      fpScale: Double = 1000.0)
      : (org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row],
         () => Array[Array[Long]]) = {
    require(init.nonEmpty, "streamingKmeansUpdate: empty init centroids")
    val model = new java.util.concurrent.atomic.AtomicReference(init)
    val writer = vecStream.writeStream
      .outputMode(OutputMode.Append)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        model.set(graft.operators.Clustering.lloydUpdateFixedPoint(
          batch, col("vec"), model.get, fpScale))
        ()
      }
    (writer, () => model.get)
  }

  /** Streaming serve against a [[graft.operators.Similarity
    * .knnGraphBuild]] k-NN graph — the graph family's streaming twin
    * (q114/q243's sibling). Beam search needs a top-`beam` cut after
    * EVERY hop, and Structured Streaming permits only one stateful
    * operator per query, so the legal shape is micro-batch-granular:
    * each arriving query batch runs the BATCH beam search
    * ([[graft.operators.Similarity.knnGraphServe]] — stream-static by
    * construction: the graph and corpus are the static sides) inside
    * foreachBatch, and the per-batch results land through `sink`.
    * Per-batch cost is exactly the batch serve's (frontier-bounded);
    * nothing is stored between batches, and a single whole-batch
    * drain equals the batch serve row-for-row (q270 pins it with
    * q263's oracle).
    */
  def streamingKnnGraphServe(
      queryStream: DataFrame,
      graph: DataFrame,
      corpus: DataFrame,
      k: Int,
      beam: Int,
      hops: Int,
      entryStride: Long,
      sink: DataFrame => Unit)
      : org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row] =
    queryStream.writeStream
      .outputMode(OutputMode.Append)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        sink(graft.operators.Similarity.knnGraphServe(
          batch, graph, corpus, k, beam, hops, entryStride))
        ()
      }

  /** Streaming LAYERED serve — [[streamingKnnGraphServe]]'s sibling
    * for the SHIPPING hierarchical path, against whatever layer
    * frames the caller read back (typically a [[graft.operators
    * .Similarity.KnnGraphIndex]] store AFTER lifecycle mutations —
    * q284 drains queries against the appended+deleted layered store
    * and must equal q278's batch layered serve, closing the full
    * ingest→mutate→serve loop). Each micro-batch of query vectors
    * runs one batch layered descent; results land through `sink`.
    * State-free: the layers ride the closure as read-back frames, so
    * per-batch cost is the batch's own descent and nothing grows
    * with drain length.
    */
  def streamingKnnGraphServeLayered(
      queryStream: DataFrame,
      layers: Seq[DataFrame],
      corpus: DataFrame,
      k: Int,
      beam: Int,
      hopsPerLayer: Int,
      sink: DataFrame => Unit)
      : org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row] =
    queryStream.writeStream
      .outputMode(OutputMode.Append)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        sink(graft.operators.Similarity.knnGraphServeLayered(
          batch, layers, corpus, k, beam, hopsPerLayer))
        ()
      }

  /** Streaming coded-vector INGEST into a persisted composed
    * [[graft.operators.Similarity.IvfPqIndex]] — q160's postings
    * sibling for the ANN index: each micro-batch of arriving (id,
    * vec) rows pays exactly the batch append's map-only cost (coarse
    * assignment against broadcast centroids, PQ encoding against the
    * plan-literal codebook — residual or raw per the index's flag)
    * and lands via an APPEND write into the same bucket partition
    * directories; existing files are never rewritten (spec-pinned by
    * inventory). The drained index serves exactly like batch
    * [[graft.operators.Similarity.ivfPqAppend]] over the union (q254
    * pins it with q234's oracle verbatim).
    */
  def streamingIvfPqIngest(
      vecStream: DataFrame,
      index: graft.operators.Similarity.IvfPqIndex)
      : org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row] =
    vecStream.writeStream
      .outputMode(OutputMode.Append)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        graft.operators.Similarity.ivfPqAppend(index, batch)
        ()
      }

  /** Streaming vector INGEST into a persisted k-NN GRAPH index —
    * q254's sibling for the graph family: each micro-batch of
    * arriving (id, vec) rows runs [[graft.operators.Similarity
    * .knnGraphAppendPartitioned]]'s algebra against the live stored
    * index (batch signed map-only, seeded through the STORED anchor
    * table, touched-partition-only rewrite — including any persisted
    * hierarchy layers), so the index a serving fleet reads stays
    * current as vectors arrive. A later batch's scoring joins need
    * every previously ingested vector (its candidates expand into
    * earlier arrivals); that role is played by the PERSISTED corpus
    * table the ingest maintains beside the index
    * ([[graft.operators.Similarity.knnGraphCorpusInit]] seeds it with
    * `baseCorpus` once, each batch reads it back and lands in it) —
    * so per-batch state is a constant-depth parquet read, never a
    * driver-side union chain over all prior batches (the pre-r17
    * accumulator, whose plan analysis and caching grew without bound
    * on a long-running stream). A single whole-batch drain equals the
    * batch append exactly (q280 pins it with q268's oracle verbatim);
    * multi-batch drains compose sequentially (batch 2 appends against
    * the already-mutated store — spec-pinned at 8 batches, plan depth
    * flat).
    */
  def streamingKnnGraphIngest(
      vecStream: DataFrame,
      index: graft.operators.Similarity.KnnGraphIndex,
      baseCorpus: DataFrame)
      : org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row] = {
    graft.operators.Similarity.knnGraphCorpusInit(
      baseCorpus.sparkSession, index, baseCorpus.select(col("id"), col("vec")))
    vecStream.writeStream
      .outputMode(OutputMode.Append)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        graft.operators.Similarity.knnGraphIngestBatch(
          batch.sparkSession, index, batch.select(col("id"), col("vec")), batchId)
        ()
      }
  }

  /** Streaming DSIR scoring — the batch
    * [[graft.operators.Sampling.hashedImportanceWeights]]'s production
    * deployment shape: the nBuckets-row hashed-bigram ratio model is
    * trained ONCE on a reference corpus and FROZEN; arriving document
    * batches score against the broadcast model inside foreachBatch
    * (map-only bigram hashing + per-doc aggregation — each document
    * sits wholly inside its micro-batch, so batch-local aggregation is
    * exact) and the per-doc weight rows land through `sink`. Scoring
    * is per-row deterministic given the model, so a whole-corpus drain
    * equals the batch scorer row-for-row (q274 pins it with q265's
    * oracle verbatim — the global resample cut is the caller's
    * post-drain batch step, exactly as production re-cuts per release).
    *
    * Scale shape: state-free (the model rides the closure as a
    * broadcast ≤ nBuckets rows); per-batch cost is the batch's own
    * token volume; nothing corpus-sized is touched after training.
    */
  def streamingDsirScore(
      docStream: DataFrame,
      id: Column,
      text: Column,
      ratio: DataFrame,
      nBuckets: Int,
      sink: DataFrame => Unit)
      : org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row] =
    docStream.writeStream
      .outputMode(OutputMode.Append)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        sink(graft.operators.Sampling.dsirScoreAgainst(
          batch, id, text, ratio, nBuckets))
        ()
      }

  final case class EventUs(userId: Long, ts: Timestamp, tUs: Long)
  final case class SessionUsState(start: Long, last: Long, n: Long)
  final case class SessionUs(userId: Long, tStart: Long, tEnd: Long, nEvents: Long)

  /** [[sessionize]] in the epoch-MICROSECOND integer domain — the
    * contract-exact twin of the batch gap sessionization (q91). The
    * millisecond variant's `Timestamp.getTime` truncates sub-ms
    * precision, and the fixture's event times carry real microseconds,
    * so session arithmetic here runs on the caller-supplied `tUs`
    * (epoch micros; `ts` exists only to carry the watermark, which
    * Spark requires to be a TIMESTAMP). Same state machine: events
    * sort within the batch per key, a gap > `gapUs` closes the open
    * session, idle keys flush via event-time timeout once the
    * watermark passes last + gap.
    *
    * Scale shape: identical to [[sessionize]] — state is one
    * (start, last, n) triple per live key, emission is append-mode
    * closed sessions; nothing about the micros domain changes the
    * shuffle (hash by key) or the state size.
    */
  def sessionizeMicros(
      events: Dataset[EventUs],
      gapUs: Long,
      watermarkDelay: String = "10 seconds"): Dataset[SessionUs] = {
    import events.sparkSession.implicits._
    events
      .withWatermark("ts", watermarkDelay)
      .groupByKey(_.userId)
      .flatMapGroupsWithState[SessionUsState, SessionUs](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (userId: Long, evs: Iterator[EventUs], state: GroupState[SessionUsState]) =>
          if (state.hasTimedOut) {
            val s = state.get
            state.remove()
            Iterator.single(SessionUs(userId, s.start, s.last, s.n))
          } else {
            val sorted = evs.toSeq.sortBy(_.tUs)
            var closed = List.empty[SessionUs]
            var cur = state.getOption
            sorted.foreach { e =>
              cur match {
                case Some(s) if e.tUs - s.last <= gapUs =>
                  cur = Some(SessionUsState(s.start, e.tUs, s.n + 1))
                case Some(s) =>
                  closed ::= SessionUs(userId, s.start, s.last, s.n)
                  cur = Some(SessionUsState(e.tUs, e.tUs, 1L))
                case None =>
                  cur = Some(SessionUsState(e.tUs, e.tUs, 1L))
              }
            }
            cur.foreach { s =>
              state.update(s)
              // timeout must sit beyond the current watermark; the
              // micros → ms division rounds up via the +1
              state.setTimeoutTimestamp(
                math.max(state.getCurrentWatermarkMs() + 1,
                  s.last / 1000L + gapUs / 1000L + 1))
            }
            closed.reverseIterator
          }
      }
  }

  def sessionize(
      events: Dataset[Event],
      gapMs: Long,
      watermarkDelay: String = "10 seconds"): Dataset[Session] = {
    import events.sparkSession.implicits._
    events
      .withWatermark("ts", watermarkDelay)
      .groupByKey(_.userId)
      .flatMapGroupsWithState[SessionState, Session](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (userId: Long, evs: Iterator[Event], state: GroupState[SessionState]) =>
          if (state.hasTimedOut) {
            val s = state.get
            state.remove()
            Iterator.single(Session(userId, s.start, s.last, s.n, s.total))
          } else {
            val sorted = evs.toSeq.sortBy(_.ts.getTime)
            var closed = List.empty[Session]
            var cur = state.getOption
            sorted.foreach { e =>
              val t = e.ts.getTime
              cur match {
                case Some(s) if t - s.last <= gapMs =>
                  cur = Some(SessionState(s.start, t, s.n + 1, s.total + e.value))
                case Some(s) =>
                  closed ::= Session(userId, s.start, s.last, s.n, s.total)
                  cur = Some(SessionState(t, t, 1, e.value))
                case None =>
                  cur = Some(SessionState(t, t, 1, e.value))
              }
            }
            cur.foreach { s =>
              state.update(s)
              // timeout must be beyond the current watermark
              state.setTimeoutTimestamp(
                math.max(state.getCurrentWatermarkMs() + 1, s.last + gapMs))
            }
            closed.reverseIterator
          }
      }
  }
}
