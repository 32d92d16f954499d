package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Event-stream product analytics — the funnel / cohort / cadence
  * queries a usage-data pipeline answers before its events are
  * trusted as training signals (and the skew pre-flight that sizes
  * the jobs that consume them). All statistics are 64-bit-integer
  * exact (ppm floor division, type-1 order statistics) — the same
  * cross-engine determinism contract as the rest of the engine.
  */
object Analytics {

  /** Ordered conversion funnel: for the step sequence s₁…s_k, a user
    * reaches step i when their earliest qualifying sᵢ event occurs
    * STRICTLY AFTER their earliest qualifying s_{i-1} event (the
    * classic strict-order funnel — same-timestamp events do not
    * chain). Output: one row per step with its 1-based index, the
    * users reaching it, and the exact ppm conversion vs step 1.
    *
    * Scale: step 1 is one user-keyed min aggregate; each later step
    * is one equi-join of the event scan against the previous step's
    * (user, ts) table followed by the same min aggregate — k−1 joins
    * total, only (long, long) pairs on the wire, no window over the
    * whole stream. Each step's skinny (user, ts) frontier is
    * PERSISTED before its count and released once the next step is
    * materialized — without that, step i's lazy plan chains all
    * prior joins and each count re-executes them from the event
    * scan, O(k²) passes for a k-step funnel; with it, the event
    * table is scanned exactly k times. The returned frame is k rows
    * of driver-side counts (k is an operator parameter).
    */
  def funnel(
      events: DataFrame,
      user: Column,
      state: Column,
      ts: Column,
      steps: Seq[String]): DataFrame = {
    require(steps.nonEmpty, "funnel needs at least one step")
    require(steps.distinct.size == steps.size, s"duplicate funnel steps: $steps")
    val spark = events.sparkSession
    import spark.implicits._
    val ev = events.select(user.as("u"), state.cast("string").as("st"),
      ts.cast("long").as("t"))
    var reached = ev.where(col("st") === steps.head)
      .groupBy("u").agg(min("t").as("t"))
      .persist()
    val counts = Seq.newBuilder[(Long, String, Long)]
    counts += ((1L, steps.head, reached.count()))
    steps.zipWithIndex.drop(1).foreach { case (s, i) =>
      val prev = reached
      reached = ev.where(col("st") === s)
        .join(prev.select(col("u"), col("t").as("prev_t")), "u")
        .where(col("t") > col("prev_t"))
        .groupBy("u").agg(min("t").as("t"))
        .persist()
      counts += (((i + 1).toLong, s, reached.count()))
      prev.unpersist()
    }
    reached.unpersist()
    val rows = counts.result()
    val n1 = rows.head._3
    rows.map { case (idx, s, n) =>
      (idx, s, n, if (n1 == 0) 0L else n * 1000000L / n1)
    }.toDF("step_idx", "step", "n_users", "conv_ppm")
  }

  /** Retention cohorts: users cohorted by the period of their FIRST
    * event; per (cohort, period offset), the distinct users active in
    * that period and the exact ppm retention vs the cohort's size
    * (offset 0 reads exactly 10⁶). `period` maps an event to its
    * integer period id (e.g. epoch-week) — the caller owns the
    * calendar.
    *
    * Scale: one user-keyed min aggregate (cohort assignment), one
    * map-side distinct on (user, period), one equi-join back on user
    * (longs only), then ONE aggregate keyed by the bounded
    * (cohort, offset) domain; cohort sizes are the offset-0 rows,
    * joined back period-domain-sized.
    */
  def cohortRetention(
      events: DataFrame,
      user: Column,
      period: Column): DataFrame = {
    val ev = events.select(user.as("u"), period.cast("long").as("p"))
    val firstP = ev.groupBy("u").agg(min("p").as("cohort"))
    val active = ev.distinct()
      .join(firstP, "u")
      .select(col("cohort"), (col("p") - col("cohort")).as("offset"), col("u"))
      .groupBy("cohort", "offset").agg(count(lit(1)).as("n_users"))
    val sizes = active.where(col("offset") === 0)
      .select(col("cohort"), col("n_users").as("cohort_n"))
    active.join(sizes, "cohort")
      .select(col("cohort"), col("offset"), col("n_users"),
        expr("n_users * 1000000L div cohort_n").as("retention_ppm"))
  }

  /** Inter-arrival cadence profile: per group (event type, sensor,
    * tenant…), the consecutive per-key gaps' count, exact type-1
    * median (the ⌈n/2⌉-th smallest — element, not interpolation), and
    * maximum. The burstiness numbers that decide watermarking and
    * session-gap parameters.
    *
    * Scale: the lead() window is partitioned by (group, key) —
    * parallel, no global sort. The median is NOT a per-group rank
    * window over raw gaps (a hot group — one event type, 10⁹ gaps —
    * would be a single-task sort), and not even a single-level value
    * histogram (microsecond gaps are near-UNIQUE, so a hot group's
    * value domain is still ~its row count): it is the classic
    * TWO-PHASE exact order statistic. Phase A aggregates counts per
    * (group, gap div 2^coarseBits) bucket and walks the bucket
    * cumulative to find the single bucket holding the ceil(n/2)-th
    * gap (and the residual rank `need` inside it); phase B counts
    * fine values inside that ONE bucket per group and takes the
    * need-th smallest. Any per-group window task is bounded by
    * max(occupied buckets, 2^coarseBits) rows — ~√domain at the
    * default 22 bits (a year of microsecond gaps: ≤ ~2·10⁶ buckets /
    * ≤ 4·10⁶ in-bucket values) — never the group's row count. The
    * skinny (g, gap) pairs persist across the two phases and the
    * 4-column output is checkpointed before release (the
    * coOccurrence lifecycle).
    */
  def gapProfile(
      events: DataFrame,
      group: Column,
      key: Column,
      ts: Column,
      tiebreak: Column,
      coarseBits: Int = 22): DataFrame = {
    require(coarseBits >= 0 && coarseBits <= 62,
      s"coarseBits must be in [0, 62], got $coarseBits")
    // same scoped-AQE-off rationale as Profiling.madProfile: the
    // two-phase kernel's actions are pre-sized skinny exchanges
    Scale.withAqeOff(events.sparkSession) { rb =>
    val width = 1L << coarseBits
    val seq = Window.partitionBy("g", "k").orderBy("t", "tb")
    val gaps = rb(events
      .select(group.as("g"), key.as("k"), ts.cast("long").as("t"), tiebreak.as("tb"))
      .withColumn("nxt", lead(col("t"), 1).over(seq))
      .where(col("nxt").isNotNull)
      .select(col("g"), (col("nxt") - col("t")).as("gap")))
      .persist()
    // phase A: coarse-bucket counts; totals ride the same aggregate
    val coarse = gaps
      .groupBy(col("g"), expr(s"gap div ${width}L").as("cb"))
      .agg(count(lit(1)).as("c"), max("gap").as("mx"))
    val totals = coarse.groupBy("g").agg(
      sum("c").as("n_gaps"), max("mx").as("max_gap"))
    val cumW = Window.partitionBy("g").orderBy("cb")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    // the bucket holding the ceil(n/2)-th gap, and the residual rank
    // inside it (need = rank − gaps in earlier buckets)
    // one aggregate picks the median's bucket AND its residual rank:
    // min_by over the ≥-rank rows IS "the first bucket reaching rank"
    val need = coarse
      .withColumn("cum", sum("c").over(cumW))
      .join(totals.select(col("g"), col("n_gaps")), "g")
      .withColumn("rank", expr("(n_gaps + 1) div 2"))
      .where(col("cum") >= col("rank"))
      .groupBy("g").agg(
        min(col("cb")).as("mb"),
        min_by(col("rank") - (col("cum") - col("c")), col("cb")).as("need"))
    // phase B: fine order statistic inside the selected bucket only
    val med = gaps.join(broadcast(need), "g")
      .where(expr(s"gap div ${width}L") === col("mb"))
      .groupBy("g", "need", "gap").agg(count(lit(1)).as("fc"))
      .withColumn("fcum", sum("fc").over(
        Window.partitionBy("g").orderBy("gap")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .where(col("fcum") >= col("need"))
      .groupBy("g").agg(min("gap").as("median_gap"))
    val out = totals.join(med, "g")
      .select(col("g"), col("n_gaps"), col("median_gap"), col("max_gap"))
      .localCheckpoint(true)
    gaps.unpersist()
    out
    }
  }

  /** Market-basket co-occurrence with exact ppm lift: for item pairs
    * appearing together in at least `minSupport` baskets (after
    * per-basket item dedup), the pair's basket count and
    *
    *   lift_ppm = n_ab·N·10⁶ div (n_a·n_b)
    *
    * (10⁶ = independence; above = genuinely co-bought) — the "people
    * also bought" / curriculum-correlation primitive. The n_ab·N·10⁶
    * product is N²-scale, so the ratio runs in DECIMAL(38,0)
    * (ANSI-safe to N ≈ 10⁹ baskets). Deterministic top-k by
    * (n_ab desc, item_a, item_b).
    *
    * Scale: per-basket distinct is map-side (array dedup inside the
    * basket aggregate); baskets larger than `maxBasket` items are
    * DROPPED before pairing (a k-item basket makes k² pair rows —
    * the cap is the same contract as the LSH hot-bucket guards, and
    * real baskets are small); pair counting is ONE map-side-combined
    * aggregate keyed by the item-pair domain; item counts and the
    * 1-row basket total broadcast back in.
    */
  def coOccurrence(
      df: DataFrame,
      basket: Column,
      item: Column,
      maxBasket: Int,
      minSupport: Long,
      topK: Int): DataFrame = {
    require(maxBasket >= 2, s"maxBasket must be >= 2, got $maxBasket")
    require(minSupport >= 1, s"minSupport must be >= 1, got $minSupport")
    require(topK >= 1, s"topK must be >= 1, got $topK")
    val baskets = df.select(basket.as("b"), item.cast("long").as("i"))
      .groupBy("b").agg(array_sort(collect_set("i")).as("items"))
      .where(size(col("items")) <= maxBasket)
      .persist()
    val nBaskets = baskets.agg(count(lit(1)).as("n_baskets"))
    val itemCounts = baskets.select(explode(col("items")).as("i"))
      .groupBy("i").agg(count(lit(1)).as("n_i"))
    val pairs = baskets
      .select(explode(expr(
        "flatten(transform(items, (x, ix) -> " +
          "transform(slice(items, ix + 2, size(items)), y -> struct(x AS a, y AS b))))"))
        .as("p"))
      .groupBy(col("p.a").as("item_a"), col("p.b").as("item_b"))
      .agg(count(lit(1)).as("n_ab"))
      .where(col("n_ab") >= minSupport)
    val out = pairs
      .join(itemCounts.select(col("i").as("item_a"), col("n_i").as("n_a")), "item_a")
      .join(itemCounts.select(col("i").as("item_b"), col("n_i").as("n_b")), "item_b")
      .crossJoin(broadcast(nBaskets))
      .select(col("item_a"), col("item_b"), col("n_ab"),
        expr("CAST(CAST(n_ab AS DECIMAL(38,0)) * n_baskets * 1000000" +
          " div (CAST(n_a AS DECIMAL(38,0)) * n_b) AS BIGINT)").as("lift_ppm"))
      .orderBy(col("n_ab").desc, col("item_a"), col("item_b"))
      .limit(topK)
      .localCheckpoint(true)
    baskets.unpersist()
    out
  }

  /** Join/aggregation skew pre-flight: the top-k hottest keys of a
    * prospective shuffle key, each with its row count, exact ppm
    * share of all rows, and the salt factor `ceil(count div target)`
    * a salted repartition would need to cap any single (key, salt)
    * task at `targetPerTask` rows. The numbers that decide between a
    * plain shuffle, AQE skew handling, and explicit salting.
    *
    * Scale: ONE map-side-combined count aggregate keyed by the key
    * domain, a 1-row total broadcast in, and a global limit (partial
    * top-k per partition, k rows to the driver).
    */
  /** Join-explosion pre-flight — [[skewProfile]]'s two-sided sibling:
    * the EXACT output cardinality a prospective equi-join would
    * produce (Σ_k n_left(k)·n_right(k)) and the top-k contributing
    * keys, each with its side counts, produced rows, and exact ppm
    * share of the total. The number that decides whether a join is
    * runnable AT ALL before paying for it — a handful of hot keys
    * multiplying into 10¹² rows is visible here for the cost of two
    * count aggregates. Per-key products are n²-scale, so the total
    * and shares run in DECIMAL(38,0) (exact to ~10¹⁸ output rows).
    *
    * Scale: ONE map-side-combined count per side (skinny keys), an
    * equi-join of the two key-domain-sized count tables, a 1-row
    * total broadcast back, and a global top-k.
    */
  def joinPreflight(
      left: DataFrame, leftKey: Column,
      right: DataFrame, rightKey: Column,
      topK: Int): DataFrame = {
    require(topK >= 1, s"topK must be >= 1, got $topK")
    val l = left.select(leftKey.as("key")).groupBy("key")
      .agg(count(lit(1)).as("n_left"))
    val r = right.select(rightKey.as("key")).groupBy("key")
      .agg(count(lit(1)).as("n_right"))
    val prod = l.join(r, "key")
      .withColumn("out_rows",
        expr("CAST(n_left AS DECIMAL(38,0)) * n_right"))
    val total = prod.agg(
      coalesce(sum("out_rows"), expr("CAST(0 AS DECIMAL(38,0))")).as("total_rows"))
    prod.crossJoin(broadcast(total))
      .select(col("key"), col("n_left"), col("n_right"),
        expr("CAST(out_rows AS BIGINT)").as("out_rows"),
        expr("CAST(total_rows AS BIGINT)").as("total_rows"),
        expr("CAST(out_rows * 1000000 div total_rows AS BIGINT)").as("share_ppm"))
      .orderBy(col("out_rows").desc, col("key"))
      .limit(topK)
  }

  def skewProfile(
      df: DataFrame,
      key: Column,
      topK: Int,
      targetPerTask: Long): DataFrame = {
    require(topK >= 1, s"topK must be >= 1, got $topK")
    require(targetPerTask >= 1, s"targetPerTask must be >= 1, got $targetPerTask")
    val counts = df.select(key.as("key")).groupBy("key")
      .agg(count(lit(1)).as("n"))
    val total = counts.agg(sum("n").as("n_total"))
    counts.crossJoin(broadcast(total))
      .select(col("key"), col("n"),
        expr("n * 1000000L div n_total").as("share_ppm"),
        expr(s"(n + ${targetPerTask}L - 1L) div ${targetPerTask}L").as("salt_factor"))
      .orderBy(col("n").desc, col("key"))
      .limit(topK)
  }
}
