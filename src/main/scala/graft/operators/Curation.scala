package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Budget-bounded corpus selection — the step between scoring and
  * packing ([[TextAnalysis.packSequences]]): decide WHICH documents a
  * fixed training-token budget buys. Integer-exact and deterministic
  * (a pure function of the data, independent of partitioning and
  * run), so two engines produce the identical selection.
  */
object Curation {

  /** Exact token-budget corpus selection: the greedy prefix of the
    * corpus ordered by (score DESC, id ASC) whose cumulative token
    * count stays within `budgetTokens` — "take the best documents
    * until the token budget is spent", the selection rule behind
    * quality-thresholded pretraining mixes. A document is selected iff
    * its INCLUSIVE cumulative count fits (no partial documents).
    * Returns (doc_id, score, n_tokens, cum_tokens), one row per
    * selected document. The returned frame is persisted (already
    * materialized); release it when consumed.
    *
    * Scale shape — exact global prefix WITHOUT a single-partition
    * window: score range-shards ([[Scale.rangeShardBoundaries]] —
    * deterministic value-histogram boundaries, every distinct score in
    * exactly one shard) give a parallel per-shard cumsum ordered by
    * (score desc, id); the cross-shard offsets are one nShards-row
    * aggregate collected to the driver (bounded by the parameter, not
    * the data) and folded back in as a broadcast-scale when-chain.
    * Total: two skinny exchanges of (score, id, n) — text never
    * shuffles — plus the boundary histogram.
    */
  def selectTokenBudget(df: DataFrame, id: Column, text: Column,
      score: Column, budgetTokens: Long, nShards: Int = 16): DataFrame = {
    require(budgetTokens >= 0L, s"budgetTokens must be >= 0, got $budgetTokens")
    require(nShards >= 2, s"nShards must be >= 2, got $nShards")
    val base = df.select(
        id.cast("long").as("doc_id"),
        score.cast("long").as("score"),
        TextAnalysis.tokenCount(text).cast("long").as("n_tokens"))
    val bounds = Scale.rangeShardBoundaries(base, col("score"), nShards)
    val sharded = Scale.withRangeShard(base, col("score"), bounds).persist()
    // cross-shard prefix: tokens held by STRICTLY higher shards
    // (higher shard index = higher scores = earlier in the greedy
    // order). nShards rows to the driver — parameter-bounded.
    val totals = sharded.groupBy("shard").agg(sum("n_tokens").as("t"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val shardIds = totals.keys.toSeq.sorted
    val offsetOf: Map[Long, Long] = shardIds.map { s =>
      s -> shardIds.filter(_ > s).map(totals).sum
    }.toMap
    val offsetCol = offsetOf.foldLeft(lit(0L)) { case (acc, (s, off)) =>
      when(col("shard") === s, lit(off)).otherwise(acc)
    }
    val w = Window.partitionBy("shard").orderBy(col("score").desc, col("doc_id").asc)
      .rowsBetween(Window.unboundedPreceding, 0)
    val out = sharded
      .withColumn("cum_tokens", offsetCol + sum("n_tokens").over(w))
      .where(col("cum_tokens") <= budgetTokens)
      .select("doc_id", "score", "n_tokens", "cum_tokens")
    // materialize the skinny selection, then release the wide-ish
    // sharded cache eagerly
    out.persist().count()
    sharded.unpersist()
    out
  }

  /** Per-group exact token budgets: [[selectTokenBudget]]'s greedy
    * (score desc, id asc) prefix applied INDEPENDENTLY within every
    * group — "each domain/source gets its own training-token quota",
    * the per-domain cap a pretraining mix applies before blending.
    * Returns (grp, doc_id, score, n_tokens, cum_tokens) with
    * cum_tokens the within-group inclusive prefix. The returned frame
    * is persisted; release it when consumed.
    *
    * Scale shape: same range-shard decomposition as the global op,
    * but the cross-shard offsets CANNOT be a driver collect (groups
    * are data, not a parameter) — they become a ≤ nShards-row window
    * per group over the (group, shard) totals aggregate, entirely
    * distributed. The heavy cumsum windows partition by
    * (group, shard): a group never serializes through one task, it
    * splits across the score shards exactly like the global prefix
    * did. Boundaries come from the GLOBAL score histogram — within
    * any group the shard index still orders scores, which is all the
    * offset decomposition needs; a group whose scores concentrate in
    * one global shard degrades to one window task for that group
    * (the same residual skew the global op has within a shard).
    */
  def selectTokenBudgetPerGroup(df: DataFrame, id: Column, text: Column,
      score: Column, group: Column, budgetTokens: Long,
      nShards: Int = 16): DataFrame = {
    require(budgetTokens >= 0L, s"budgetTokens must be >= 0, got $budgetTokens")
    require(nShards >= 2, s"nShards must be >= 2, got $nShards")
    val base = df.select(
        group.cast("string").as("grp"),
        id.cast("long").as("doc_id"),
        score.cast("long").as("score"),
        TextAnalysis.tokenCount(text).cast("long").as("n_tokens"))
    val bounds = Scale.rangeShardBoundaries(base, col("score"), nShards)
    val sharded = Scale.withRangeShard(base, col("score"), bounds).persist()
    // tokens held by STRICTLY higher shards of the SAME group: a
    // window over at most nShards rows per group — the distributed
    // form of the global op's driver-collected offsets
    val offsets = sharded.groupBy("grp", "shard").agg(sum("n_tokens").as("__t"))
      .withColumn("__off", coalesce(sum(col("__t")).over(
        Window.partitionBy("grp").orderBy(col("shard").desc)
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select(col("grp"), col("shard"), col("__off"))
    val w = Window.partitionBy("grp", "shard")
      .orderBy(col("score").desc, col("doc_id").asc)
      .rowsBetween(Window.unboundedPreceding, 0)
    val out = sharded.join(offsets, Seq("grp", "shard"))
      .withColumn("cum_tokens", col("__off") + sum("n_tokens").over(w))
      .where(col("cum_tokens") <= budgetTokens)
      .select("grp", "doc_id", "score", "n_tokens", "cum_tokens")
    out.persist().count()
    sharded.unpersist()
    out
  }
}
