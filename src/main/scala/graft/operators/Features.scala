package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Per-key ordered feature engineering over event streams — the
  * classic training-feature shapes (previous value, inter-arrival
  * gap, trailing-window aggregates) computed batch-side with window
  * functions.
  *
  * Values are fixed-pointed to integer units via `floor(value·100)`
  * BEFORE any aggregation. The double×100 product is not exact
  * decimal cents (0.29·100 = 28.999… floors to 28) — the guarantee
  * is ENGINE-IDENTICAL determinism, not true cents: both engines
  * compute the same IEEE-754 product and the same floor, whereas
  * summing raw doubles inside a window frame is NOT deterministic
  * across engines (DuckDB's segment-tree frame sums associate
  * differently than Spark's running frames). Every output column is
  * therefore 64-bit-integer exact and cross-engine reproducible.
  */
object Features {

  /** Trailing-window features per key, ordered by (tsUs, id) — the id
    * tiebreak makes the frame ordering total, so lag/frame contents
    * are deterministic even under timestamp collisions. `tsUs` is the
    * event time as integer epoch-MICROSECONDS (the engine's normalized
    * time convention — callers with raw nanos pass `ts div 1000`):
    *
    *  - `v_c`        current value in cents
    *  - `prev_v_c`   previous row's value (null on the first row)
    *  - `gap_us`     microseconds since the previous row (null first)
    *  - `roll_sum_c` / `roll_n` / `roll_min_c` / `roll_max_c`
    *                 sum / count / min / max over the trailing `n`
    *                 rows (current row inclusive)
    *
    * Scale: ONE hash exchange by key, then a per-partition sort —
    * Spark's standard window execution. Frames are row-bounded
    * (`n−1 PRECEDING`), so state per key is O(n) regardless of key
    * size; skew is bounded by the largest single key's row count,
    * which for user/session keys is naturally capped (a key hot
    * enough to skew a 1000-executor sort is a bot you'd cap upstream
    * with [[Sampling.capPerKey]]).
    */
  def rollingFeatures(
      df: DataFrame,
      key: Column,
      tsUs: Column,
      value: Column,
      id: Column,
      n: Int): DataFrame = {
    require(n >= 1, s"window size must be >= 1, got $n")
    val vc = floor(value * lit(100.0)).cast("long")
    val us = tsUs.cast("long")
    val w = Window.partitionBy(key).orderBy(us.asc, id.asc)
    val frame = w.rowsBetween(-(n - 1), Window.currentRow)
    df.select(
      id.as("id"), key.as("key"), us.as("ts_us"), vc.as("v_c"),
      lag(vc, 1).over(w).as("prev_v_c"),
      (us - lag(us, 1).over(w)).as("gap_us"),
      sum(vc).over(frame).as("roll_sum_c"),
      count(lit(1)).over(frame).as("roll_n"),
      min(vc).over(frame).as("roll_min_c"),
      max(vc).over(frame).as("roll_max_c"))
  }

  /** Leakage-safe (leave-one-out) smoothed target encoding of a
    * categorical column against a boolean target — the standard
    * high-cardinality-categorical feature for quality classifiers.
    * Per row, the row's own label is REMOVED from its category's
    * statistics before encoding (naive target encoding leaks the
    * label into the feature and inflates validation scores):
    *
    *   enc_ppm = ((cat_pos − y)·10⁶ + m·prior_ppm)
    *             div (cat_n − 1 + m)
    *
    * with prior_ppm = (global positives·10⁶) div n and smoothing
    * pseudo-count `m` — all floor division on non-negative longs, so
    * the encoding is 64-bit-integer exact and engine-identical.
    * A category seen once encodes to exactly the prior (its only
    * evidence is the excluded row).
    *
    * Scale: ONE map-side-combined aggregate keyed by category (the
    * category table is bounded by the domain, not the data), joined
    * back broadcast-style, plus a 1-row global aggregate cross-joined
    * in — the fact rows themselves never shuffle.
    */
  def targetEncode(
      df: DataFrame,
      id: Column,
      category: Column,
      target: Column,
      m: Int): DataFrame = {
    require(m >= 1, s"smoothing pseudo-count m must be >= 1, got $m")
    val rows = df.select(id.as("id"), category.as("cat"),
      target.cast("boolean").cast("long").as("y"))
    val prior = rows.agg(
      expr("sum(y) * 1000000L div count(1)").as("prior_ppm"))
    val catAgg = rows.groupBy("cat")
      .agg(count(lit(1)).as("cat_n"), sum("y").as("cat_pos"))
    rows.join(catAgg, "cat")
      .crossJoin(broadcast(prior))
      .select(col("id"), col("cat"), col("y"),
        expr(s"((cat_pos - y) * 1000000L + ${m}L * prior_ppm)" +
          s" div (cat_n - 1L + ${m}L)").as("enc_ppm"))
  }

  /** Hashing-trick featurization (Weinberger et al.): whitespace
    * tokens are hashed into `dim` slots with a signed contribution
    * (sign from the next hash bit makes collisions unbiased in
    * expectation), producing the sparse feature triples
    * (id, slot, value) with exact cancellations dropped.
    *
    * The token hash is the engine's cross-engine string hash (md5
    * first 15 hex digits as a 60-bit non-negative long — the q184
    * content-hash idiom), so slots and signs are bit-identical in any
    * ANSI SQL engine.
    *
    * Scale: tokenize + hash are a map-only explode; the only exchange
    * is ONE map-side-combined aggregate keyed by (id, slot) — output
    * is bounded by docs·dim, independent of token count.
    */
  def hashFeatures(
      df: DataFrame,
      id: Column,
      text: Column,
      dim: Int): DataFrame = {
    require(dim >= 2, s"dim must be >= 2, got $dim")
    val toks = df.select(id.as("id"),
      explode(filter(split(lower(trim(text)), "\\s+"), t => t =!= "")).as("tok"))
    toks
      .withColumn("h", conv(substring(md5(col("tok")), 1, 15), 16, 10).cast("long"))
      .select(col("id"), expr(s"h % ${dim}L").as("slot"),
        // integer div for the sign bit — Column./ is DOUBLE division
        // and a 60-bit hash exceeds the 53-bit mantissa
        when(expr(s"(h div ${dim}L) % 2") === 1, lit(1L))
          .otherwise(lit(-1L)).as("sgn"))
      .groupBy("id", "slot").agg(sum("sgn").as("value"))
      .where(col("value") =!= 0)
  }

  /** Per-group rank normalization of an integer score — the
    * cross-source score calibrator: raw quality scores are not
    * comparable ACROSS sources (each source has its own scale and
    * distribution), so blend pipelines normalize to the within-source
    * percentile first. Min-rank percentile, exact ppm:
    *
    *   pct_ppm = (rank − 1)·10⁶ div (group_n − 1)
    *
    * so each group's minimum scores map to 0 and its maxima to exactly
    * 10⁶; ties share the min-rank percentile (COUNTED, not broken — no
    * sort-order luck), and a single-member group reports 0 (no spread
    * to place the one score in).
    *
    * Scale: blend pipelines have a HANDFUL of sources, so a
    * `Window.partitionBy(key)` over corpus rows would funnel each
    * source's entire slice through one task. Instead the min-rank is
    * an order statistic off the per-(key, score) HISTOGRAM (the
    * q146/q148 machinery): one map-side-combined count aggregate to
    * histogram rows, a cumulative window bounded by each key's score
    * DOMAIN (distinct values, not rows), and a (key, score) equi-join
    * back to the rows — corpus rows only ever cross a hash exchange,
    * never a per-key sort. Domain contract: scores are the engine's
    * INTEGER quality scores (ppm/per-mille scale — ≤ ~10⁶ distinct
    * values per key by construction), so the per-key window stays
    * million-row-bounded; near-unique 64-bit scores would need the
    * two-phase bucket walk [[Analytics.gapProfile]] uses for
    * microsecond gaps.
    */
  def rankNormalize(
      df: DataFrame,
      id: Column,
      key: Column,
      score: Column): DataFrame = {
    val base = df.select(id.as("id"), key.as("key"),
      score.cast("long").as("score"))
    // per-(key, score) histogram; min-rank of a score value is the
    // cumulative count of strictly smaller values + 1
    val hist = base.groupBy("key", "score").agg(count(lit(1)).as("c"))
    val cum = Window.partitionBy("key").orderBy("score")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val ranks = hist
      .withColumn("below", sum("c").over(cum) - col("c"))
      .withColumn("n", sum("c").over(Window.partitionBy("key")))
      .select(col("key").as("r_key"), col("score").as("r_score"),
        when(col("n") === 1, lit(0L))
          .otherwise(expr("below * 1000000L div (n - 1)")).as("pct_ppm"))
    // null-SAFE equi-join (<=>): groupBy already histograms null
    // key/score groups (nulls sort first under the cumulative window,
    // same as the window formulation ranked them), so the join-back
    // must keep those rows too — the operator is row-count-preserving
    // even on dirty input (e.g. score.cast("long") of a bad value)
    base.join(ranks,
      col("key") <=> col("r_key") && col("score") <=> col("r_score"))
      .select(col("id"), col("key"), col("score"), col("pct_ppm"))
  }
}
