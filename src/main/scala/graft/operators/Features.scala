package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Per-key ordered feature engineering over event streams — the
  * classic training-feature shapes (previous value, inter-arrival
  * gap, trailing-window aggregates) computed batch-side with window
  * functions.
  *
  * Values are fixed-pointed to integer cents via `floor(value·100)`
  * BEFORE any aggregation (floor and the ×100 multiply are IEEE-exact
  * and engine-identical; summing raw doubles inside a window frame is
  * NOT — DuckDB's segment-tree frame sums associate differently than
  * Spark's running frames), so every output column is 64-bit-integer
  * exact.
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
    * Scale: ONE hash exchange by group key, then a per-partition sort
    * — Spark's standard window execution, parallel across groups; both
    * the rank and the group count ride the same window partitioning.
    */
  def rankNormalize(
      df: DataFrame,
      id: Column,
      key: Column,
      score: Column): DataFrame = {
    val byScore = Window.partitionBy("key").orderBy("score")
    val byKey = Window.partitionBy("key")
    df.select(id.as("id"), key.as("key"), score.cast("long").as("score"))
      .withColumn("r", rank().over(byScore).cast("long"))
      .withColumn("n", count(lit(1)).over(byKey))
      .select(col("id"), col("key"), col("score"),
        when(col("n") === 1, lit(0L))
          .otherwise(expr("(r - 1) * 1000000L div (n - 1)")).as("pct_ppm"))
  }
}
