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
}
