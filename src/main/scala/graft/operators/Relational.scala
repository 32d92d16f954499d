package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Core relational operators re-expressing the reference's row-stream
  * semantics as distributed DataFrame transforms.
  *
  * Reference touchpoints:
  *  - multi-value collapse: /root/reference/XMLToCSV.py:178-179,224-233
  *  - global surrogate ids: /root/reference/XMLToCSV.py:161,180,188
  *  - relation extraction:  /root/reference/XMLToCSV.py:206-221,347-362
  */
object Relational {

  /** A1 — collapse a multi-valued column: sort lexicographically, keep
    * duplicates, join with "|" (XMLToCSV.py:179). `values` must be an
    * array column. Map-side partial aggregation applies when used after
    * groupBy(...).agg(collect_list) — Spark's ObjectHashAggregate
    * handles collect_list with partial merge, so the shuffle carries
    * pre-combined lists, not raw rows.
    */
  def collapseValues(values: Column): Column =
    concat_ws("|", array_sort(values))

  /** A1 in full: group child rows by a parent key and collapse one
    * column into the reference's "|"-joined sorted cell.
    *
    * `spark.graft.collapse.salted=true` switches the SAME contract to
    * the skew-safe two-phase plan ([[Scale.saltedArrayCollapse]]) —
    * the q83-hashKeys pattern: one operator, a conf flag selects the
    * scale plan, output bit-identical (the collapse sorts, so
    * salt-induced arrival order cannot show). Use it when one hot key
    * (a mega-author, a tag with millions of children) would otherwise
    * funnel every value through a single reduce task.
    */
  def arrayCollapse(df: DataFrame, key: Column, value: Column, as: String): DataFrame =
    if (df.sparkSession.conf.getOption("spark.graft.collapse.salted").exists(_.toBoolean)) {
      val keyName = df.select(key).columns.head
      Scale.saltedArrayCollapse(df, key, value, as)
        .withColumnRenamed("key", keyName)
    } else
      df.groupBy(key)
        .agg(collapseValues(collect_list(value.cast("string"))).as(as))

  /** K1 — contiguous, order-preserving surrogate ids starting at
    * `offset`. Implemented with zipWithIndex: one count-per-partition
    * job plus an order-preserving map — no single-partition shuffle, so
    * it scales to arbitrarily many partitions (unlike
    * row_number().over(Window.orderBy(...)) which funnels everything
    * through one task, and unlike monotonically_increasing_id which is
    * non-contiguous and breaks the reference's id-continuation contract,
    * XMLToCSV.py:358-362).
    *
    * The input's partition order defines document order; sort first if
    * a specific order is required.
    */
  def withContiguousId(df: DataFrame, idCol: String = "id", offset: Long = 0L): DataFrame = {
    val spark = df.sparkSession
    val schema = org.apache.spark.sql.types.StructType(
      org.apache.spark.sql.types.StructField(idCol, org.apache.spark.sql.types.LongType, nullable = false) +:
        df.schema.fields)
    val rows = df.rdd.zipWithIndex().map { case (row, i) =>
      org.apache.spark.sql.Row.fromSeq((i + offset) +: row.toSeq)
    }
    spark.createDataFrame(rows, schema)
  }

  /** K1, oracle-friendly variant: deterministic dense ids from an
    * explicit sort order (dense_rank - 1 + offset). Single window over
    * a global order — use only when the order column is needed anyway
    * or data is small; prefer withContiguousId for bulk id assignment.
    */
  def withRankId(df: DataFrame, orderBy: Seq[Column], idCol: String = "id", offset: Long = 0L): DataFrame =
    df.withColumn(idCol, row_number().over(Window.orderBy(orderBy: _*)).cast("long") - 1 + offset)

  /** J1 — explode a (possibly array) relation column into (parentId,
    * value) pairs, dropping nulls/empties. Edge dedup (the reference's
    * per-value id *set*, XMLToCSV.py:217-221) is a distinct on the pair.
    */
  def relationPairs(df: DataFrame, parentId: Column, value: Column): DataFrame = {
    val v = value
    val exploded = df.select(parentId.as("parent_id"), v.as("v"))
    exploded.where(col("v").isNotNull && col("v").cast("string") =!= "").distinct()
  }

  /** J2 — node table: distinct relation values, each assigned a
    * surrogate id continuing after `offset` (the record count,
    * XMLToCSV.py:358-362). Deterministic: ids follow the value sort
    * order (the in-memory dict order of the reference is insertion
    * order — a detail no downstream consumer can rely on, so we pin a
    * sorted order for reproducibility).
    *
    * Id assignment is sort + zipWithIndex ([[withContiguousId]]): the
    * orderBy range-partitions the distinct values, so numbering is
    * parallel across partitions. A row_number() over a global
    * Window.orderBy produces the identical ids but funnels every
    * distinct value through ONE task — on the real DBLP `--relations
    * author:…` that is ~3M rows in a single partition, and at 100× a
    * stuck executor.
    */
  def relationNodes(pairs: DataFrame, offset: Long): DataFrame = {
    val distinctVals = pairs.select(col("v")).distinct()
    withContiguousId(distinctVals.orderBy("v"), "node_id", offset)
      .select(col("node_id"), col("v"))
  }

  /** J3 — edge table: (parent id, node id) via equi-join on the value.
    * The node side is the distinct-values table — small relative to the
    * fact side — so broadcast it; Catalyst falls back to sort-merge
    * automatically if it exceeds the broadcast threshold.
    */
  def relationEdges(pairs: DataFrame, nodes: DataFrame): DataFrame =
    pairs
      .join(broadcast(nodes), "v")
      .select(col("parent_id").as("start_id"), col("node_id").as("end_id"))

  /** Gap-based BATCH sessionization: events of one key belong to the
    * same session while consecutive gaps stay <= `gap` (same time
    * unit as `ts` — pass epoch nanos/micros consistently). Output one
    * row per session: (key, session_idx, n_events, t_start, t_end),
    * session_idx 0-based in time order per key.
    *
    * Shape: the classic lag -> new-session flag -> running sum
    * composition, one exchange by key for the window, then a skinny
    * (key, session_idx) count/min/max aggregate. Ties on ts are safe:
    * equal timestamps have gap 0 and land in the same session
    * whatever order the window visits them, so the output is
    * deterministic even though lag() over ties is not.
    *
    * SKEW BOUND: same as [[asofJoin]] — one hot key serializes
    * through one task. The time-bucketed carry pattern of
    * [[asofJoinBucketed]] applies identically if a bot key dominates
    * (a session can only cross a bucket boundary within `gap` of it,
    * so only boundary-adjacent rows need the cross-bucket stitch).
    *
    * The streaming sibling (unbounded input, event-time timeouts) is
    * [[graft.streaming.StreamingOps]]' gap sessionization; this batch
    * form is the backfill/oracle path.
    */
  def sessionize(df: DataFrame, key: Column, ts: Column, gap: Long): DataFrame = {
    require(gap > 0, s"gap must be positive, got $gap")
    val w = Window.partitionBy("__k").orderBy("__t")
    // rows with a NULL timestamp are dropped explicitly (a session at
    // an unknown time is undefined); without the filter each null row
    // would sort first, open its own ghost session, and shift every
    // real session's index
    df.select(key.as("__k"), ts.cast("long").as("__t"))
      .where(col("__t").isNotNull)
      .withColumn("__new",
        when(lag(col("__t"), 1).over(w).isNull ||
          col("__t") - lag(col("__t"), 1).over(w) > gap, 1L).otherwise(0L))
      .withColumn("session_idx",
        sum(col("__new")).over(w.rowsBetween(Window.unboundedPreceding, 0)) - 1L)
      .groupBy(col("__k").as("key"), col("session_idx"))
      .agg(count(lit(1)).as("n_events"),
        min("__t").as("t_start"), max("__t").as("t_end"))
  }

  /** Skew-proof sessionization: identical output to [[sessionize]],
    * with the per-key window bound replaced by a per-(key, time
    * bucket) bound — the hot-key path (one bot user with a large
    * share of all events no longer serializes through one task).
    *
    * Two levels: (1) sessionize WITHIN each (key, bucket) — local
    * fragments; (2) re-run the same lag/flag/cumsum composition over
    * the per-fragment summaries (t_start, t_end, n) per key. Level 2
    * is exact because a fragment opens a merged session iff its gap
    * from the previous fragment's END exceeds `gap` — true both for
    * within-bucket fragments (by local construction) and across any
    * number of empty buckets (lag skips them). The level-2 window is
    * per key over FRAGMENTS (rows = fragments, not events: bounded by
    * events/bucket fragmentation, in practice ~#buckets), so the
    * hot-key task shrinks from its event count to its fragment count.
    *
    * Fragment ordering is deterministic: equal timestamps share a
    * bucket, so distinct fragments of one key never tie on t_start.
    */
  def sessionizeBucketed(
      df: DataFrame, key: Column, ts: Column, gap: Long, bucketWidth: Long): DataFrame = {
    require(gap > 0, s"gap must be positive, got $gap")
    require(bucketWidth > 0, s"bucketWidth must be positive, got $bucketWidth")
    val wLocal = Window.partitionBy("__k", "__b").orderBy("__t")
    val fragments = df
      .select(key.as("__k"), ts.cast("long").as("__t"))
      .where(col("__t").isNotNull) // same null-ts contract as sessionize
      .withColumn("__b", floor(col("__t") / bucketWidth))
      .withColumn("__new",
        when(lag(col("__t"), 1).over(wLocal).isNull ||
          col("__t") - lag(col("__t"), 1).over(wLocal) > gap, 1L).otherwise(0L))
      .withColumn("__lidx",
        sum(col("__new")).over(wLocal.rowsBetween(Window.unboundedPreceding, 0)))
      .groupBy("__k", "__b", "__lidx")
      .agg(count(lit(1)).as("__n"), min("__t").as("__ts"), max("__t").as("__te"))
    val wFrag = Window.partitionBy("__k").orderBy("__ts")
    fragments
      .withColumn("__open",
        when(lag(col("__te"), 1).over(wFrag).isNull ||
          col("__ts") - lag(col("__te"), 1).over(wFrag) > gap, 1L).otherwise(0L))
      .withColumn("session_idx",
        sum(col("__open")).over(wFrag.rowsBetween(Window.unboundedPreceding, 0)) - 1L)
      .groupBy(col("__k").as("key"), col("session_idx"))
      .agg(sum("__n").as("n_events"),
        min("__ts").as("t_start"), max("__te").as("t_end"))
  }

  /** As-of join: for every left row, the latest right row with
    * right.time <= left.time within the same key — composed as ONE
    * window over the tagged union instead of a range join: both sides
    * shuffle once by key, and the "most recent right" is a running
    * last_value with ignoreNulls. At scale this is strictly better
    * than an inequality join (no range-explosion, no broadcast need).
    *
    * Inputs carry (key, time, id); output is every left row with
    * `asof_id` = matching right id (null when no prior right exists).
    *
    * SKEW BOUND: the window partitions by `key`, so one HOT key (a
    * bot user, a null-ish default id) serializes through a single
    * task — the per-task bound is the largest single key's row count.
    * Fine for human-scale keys; for hot keys use [[asofJoinBucketed]],
    * which spreads each key over time buckets and carries the
    * last-right across buckets via a skinny per-bucket summary.
    */
  def asofJoin(left: DataFrame, right: DataFrame): DataFrame = {
    val tagged = left.select(col("key"), col("time"), col("id"), lit(true).as("is_left"))
      .unionByName(right.select(col("key"), col("time"), col("id"), lit(false).as("is_left")))
    // rights sort before lefts at equal time so an equal-time right
    // matches (ASOF's inclusive <=)
    val w = Window.partitionBy("key")
      .orderBy(col("time"), col("is_left"), col("id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    tagged
      .withColumn("asof_id",
        last(when(!col("is_left"), col("id")), ignoreNulls = true).over(w))
      .where(col("is_left"))
      .select(col("key"), col("time"), col("id"), col("asof_id"))
  }

  /** Skew-proof as-of join: identical semantics (and tie-breaks) to
    * [[asofJoin]], but windowed by (key, time-bucket) so a hot key
    * parallelizes across its time range instead of serializing
    * through one task. Two-level scan:
    *
    *  1. one summary row per (key, bucket) — a skinny map-side-
    *     combined aggregate — feeds a per-key window (bounded by
    *     #buckets, not #rows) that computes each bucket's CARRY: the
    *     last right of any strictly earlier bucket;
    *  2. the carries are UNIONED into the tagged stream as synthetic
    *     rights sorted before every real row of their bucket, and the
    *     heavy running-last window runs per (key, bucket) — a hot
    *     key's rows split across `time div bucketWidth` tasks.
    *
    * No join anywhere (a carry JOIN would either drop null keys on
    * plain equality or, with null-safe keys, defeat exchange reuse —
    * Catalyst rewrites `<=>` keys to coalesce/isnull partitionings):
    * the union costs the fact side exactly ONE exchange, the same
    * hashpartitioning(key, bucket) the window needs, and null
    * keys/times group into ordinary partitions like any value. Pick
    * `bucketWidth` so one key-bucket fits a task comfortably (e.g. a
    * day of a bot's events, not its lifetime).
    */
  def asofJoinBucketed(left: DataFrame, right: DataFrame, bucketWidth: Long): DataFrame = {
    require(bucketWidth > 0, s"bucketWidth must be positive, got $bucketWidth")
    val tagged = left.select(col("key"), col("time"), col("id"), lit(true).as("is_left"))
      .unionByName(right.select(col("key"), col("time"), col("id"), lit(false).as("is_left")))
      .withColumn("bucket", expr(s"time div ${bucketWidth}L"))
    // one summary row per (key, bucket): the bucket's last right as a
    // lexicographic (time, id) max — same tie-break as the window's
    // (time, is_left, id) order restricted to rights; null if none.
    // Null-ID rights are excluded: the running last's ignoreNulls
    // skips them in asofJoin, so a summary that elected one would
    // wrongly erase the bucket's earlier non-null right from the carry
    val summaries = tagged.groupBy("key", "bucket")
      .agg(max(when(!col("is_left") && col("id").isNotNull,
        struct(col("time"), col("id")))).as("last_r"))
    val wCarry = Window.partitionBy("key").orderBy("bucket")
      .rowsBetween(Window.unboundedPreceding, -1)
    val timeType = tagged.schema("time").dataType
    val idType = tagged.schema("id").dataType
    val carryRows = summaries
      .withColumn("carry", last(col("last_r").getField("id"), ignoreNulls = true).over(wCarry))
      .where(col("carry").isNotNull)
      .select(col("key"), lit(null).cast(timeType).as("time"),
        col("carry").cast(idType).as("id"), lit(false).as("is_left"),
        col("bucket"), lit(0).as("ord"))
    // ord sorts the carry row before every real row of its bucket, so
    // the running last picks it up first and in-bucket rights override
    // it — exactly coalesce(bucket-local last, carry)
    val w = Window.partitionBy("key", "bucket")
      .orderBy(col("ord"), col("time"), col("is_left"), col("id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    tagged.withColumn("ord", lit(1)).unionByName(carryRows)
      .withColumn("asof_id", last(when(!col("is_left"), col("id")), ignoreNulls = true).over(w))
      .where(col("is_left"))
      .select(col("key"), col("time"), col("id"), col("asof_id"))
  }

  /** Range join: all (left, right) pairs with the same key whose times
    * differ by at most `window` — WITHOUT an inequality join (which
    * Catalyst can only execute as a broadcast nested loop). The left
    * side explodes to its time bucket plus both neighbors, the join is
    * a plain equi-join on (key, bucket), and the exact predicate
    * filters afterwards; every true pair lands in exactly one of the
    * three buckets, and each bucket is O(events in 2*window), so the
    * candidate set is linear, shuffled by (key, bucket).
    *
    * Inputs carry (key, time, id); times are integral (e.g. epoch µs).
    */
  def rangeJoin(left: DataFrame, right: DataFrame, window: Long): DataFrame = {
    val l = left.select(col("key"), col("time").as("l_time"), col("id").as("l_id"))
      .withColumn("bucket", explode(array(
        expr(s"l_time div ${window}L - 1"),
        expr(s"l_time div ${window}L"),
        expr(s"l_time div ${window}L + 1"))))
    val r = right.select(col("key"), col("time").as("r_time"), col("id").as("r_id"))
      .withColumn("bucket", expr(s"r_time div ${window}L"))
    l.join(r, Seq("key", "bucket"))
      .where(abs(col("l_time") - col("r_time")) <= window)
      .select(col("key"), col("l_id"), col("r_id"), col("l_time"), col("r_time"))
  }

  /** Full relation extraction (J1+J2+J3) for one column. Returns
    * (nodes, edges). `recordCount` continues the id sequence.
    */
  def extractRelation(df: DataFrame, parentId: Column, value: Column, recordCount: Long): (DataFrame, DataFrame) = {
    val pairs = relationPairs(df, parentId, value)
    val nodes = relationNodes(pairs, recordCount)
    (nodes, relationEdges(pairs, nodes))
  }

  /** First-order Markov transition matrix of per-key event sequences:
    * consecutive states within each key's (ts, tiebreak)-ordered
    * stream become (from_state, to_state) transitions, aggregated to
    * a count and an exact ppm row-conditional probability
    * (n·10⁶ div Σ_from) — the behavioral summary a curation pipeline
    * builds from session logs (what follows what, per state).
    *
    * The last event of each key has no successor and contributes
    * nothing. Ordering inside a key must be total — pass a tiebreak
    * column that makes (ts, tiebreak) unique per key, or ties make
    * the successor engine-dependent.
    *
    * Scale: the lead() window is partitioned BY KEY (parallel across
    * keys, no global sort); transitions then take ONE map-side-
    * combined aggregate keyed by the bounded (state, state) domain.
    * The per-from totals are a window over that bounded matrix, not
    * the events.
    */
  def transitionMatrix(
      df: DataFrame,
      key: Column,
      state: Column,
      ts: Column,
      tiebreak: Column): DataFrame = {
    val seq = Window.partitionBy("k").orderBy("t", "tb")
    val trans = df
      .select(key.as("k"), state.as("from_state"), ts.as("t"), tiebreak.as("tb"))
      .withColumn("to_state", lead(col("from_state"), 1).over(seq))
      .where(col("to_state").isNotNull)
      .groupBy("from_state", "to_state").agg(count(lit(1)).as("n"))
    trans
      .withColumn("from_n", sum("n").over(Window.partitionBy("from_state")))
      .select(col("from_state"), col("to_state"), col("n"),
        expr("n * 1000000L div from_n").as("prob_ppm"))
  }
}
