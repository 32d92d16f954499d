package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Pairwise-preference data preparation — the RLHF/reward-model side
  * of a training-data pipeline. Preference corpora arrive as (winner,
  * loser) comparison rows; before training on them you want per-item
  * strength summaries (win rate, Borda score) and a consistency audit
  * (how much of the comparison set is intransitive — a noisy or
  * adversarial labeler signature).
  *
  * All outputs are 64-bit-integer-exact (ppm-scaled rates, floor
  * division on non-negative operands) — the same cross-engine
  * determinism contract as [[Graph]] and [[Training]].
  */
object Preference {

  /** Per-item comparison summary: wins, losses, exact ppm win rate
    * (wins·10⁶ div (wins+losses)) and Borda score (wins − losses —
    * the exact-arithmetic stand-in for a fitted strength, and the
    * same ranking Bradley–Terry converges to on balanced designs).
    *
    * Scale: one union of two projections and ONE map-side-combined
    * aggregate keyed by item — comparisons never shuffle whole, only
    * partial (item, wins, losses) counts do.
    */
  def winRates(comps: DataFrame, winner: Column, loser: Column): DataFrame =
    comps.select(winner.cast("long").as("item"), lit(1L).as("w"), lit(0L).as("l"))
      .union(comps.select(loser.cast("long").as("item"), lit(0L).as("w"), lit(1L).as("l")))
      .groupBy("item")
      .agg(sum("w").as("wins"), sum("l").as("losses"))
      .select(col("item"), col("wins"), col("losses"),
        expr("wins * 1000000L div (wins + losses)").as("winrate_ppm"),
        (col("wins") - col("losses")).as("borda"))

  /** Majority relation of a comparison set: for every unordered item
    * pair, the direction with strictly more wins (exact-tie pairs
    * carry no majority edge). Output: (a, b) meaning "a majority-beats
    * b", plus per-edge (wins_for, wins_against).
    *
    * Scale: one map-side-combined aggregate keyed by the canonical
    * (lo, hi) pair — no self-join; each comparison row contributes one
    * partial count.
    */
  def majorityEdges(comps: DataFrame, winner: Column, loser: Column): DataFrame =
    comps
      .select(least(winner.cast("long"), loser.cast("long")).as("lo"),
        greatest(winner.cast("long"), loser.cast("long")).as("hi"),
        when(winner.cast("long") < loser.cast("long"), lit(1L)).otherwise(lit(0L)).as("lw"),
        when(winner.cast("long") > loser.cast("long"), lit(1L)).otherwise(lit(0L)).as("hw"))
      .groupBy("lo", "hi")
      .agg(sum("lw").as("lw"), sum("hw").as("hw"))
      .where(col("lw") =!= col("hw"))
      .select(
        when(col("lw") > col("hw"), col("lo")).otherwise(col("hi")).as("a"),
        when(col("lw") > col("hw"), col("hi")).otherwise(col("lo")).as("b"),
        greatest(col("lw"), col("hw")).as("wins_for"),
        least(col("lw"), col("hw")).as("wins_against"))

  /** Preference-consistency audit: counts of compared pairs, exact-tie
    * pairs, majority edges, and intransitive directed 3-cycles
    * (a beats b beats c beats a under the majority relation) — one
    * summary row. Cycles are counted once each at their smallest
    * vertex.
    *
    * Scale: the majority relation is a DISTINCT-pair table (bounded by
    * compared pairs, not comparisons); the cycle count is the standard
    * two-hop equi-join + closing-edge join over it — (long, long)
    * pairs only. On a majority relation dense enough for hub wedges to
    * dominate, pre-orienting by degree ([[Graph.triangleStats]]'s
    * trick) bounds the wedge fan-out at O(√edges); preference majority
    * graphs are pair-sparse (you compare each pair a handful of
    * times), so the direct join is the right default.
    */
  def consistencyAudit(comps: DataFrame, winner: Column, loser: Column): DataFrame = {
    val pairAgg = comps
      .select(least(winner.cast("long"), loser.cast("long")).as("lo"),
        greatest(winner.cast("long"), loser.cast("long")).as("hi"),
        when(winner.cast("long") < loser.cast("long"), lit(1L)).otherwise(lit(0L)).as("lw"),
        when(winner.cast("long") > loser.cast("long"), lit(1L)).otherwise(lit(0L)).as("hw"))
      .groupBy("lo", "hi")
      .agg(sum("lw").as("lw"), sum("hw").as("hw"))
      .persist()
    val nPairs = pairAgg.agg(count(lit(1)).as("n_pairs"))
    val nTies = pairAgg.where(col("lw") === col("hw"))
      .agg(count(lit(1)).as("n_ties"))
    val maj = pairAgg.where(col("lw") =!= col("hw"))
      .select(
        when(col("lw") > col("hw"), col("lo")).otherwise(col("hi")).as("a"),
        when(col("lw") > col("hw"), col("hi")).otherwise(col("lo")).as("b"))
      .persist()
    val nMaj = maj.agg(count(lit(1)).as("n_majority_edges"))
    // directed 3-cycle a→b→c→a counted at its smallest vertex a:
    // a < b and a < c pins exactly one of the three rotations
    val nCycles = maj.as("e1")
      .join(maj.as("e2"), col("e1.b") === col("e2.a"))
      .join(maj.as("e3"),
        col("e2.b") === col("e3.a") && col("e3.b") === col("e1.a"))
      .where(col("e1.a") < col("e1.b") && col("e1.a") < col("e2.b"))
      .agg(count(lit(1)).as("n_cycles"))
    val out = nPairs.crossJoin(nTies).crossJoin(nMaj).crossJoin(nCycles)
    val materialized = out.persist()
    materialized.count()
    pairAgg.unpersist()
    maj.unpersist()
    materialized
  }

  /** Bradley–Terry strength estimation by `iters` rounds of the MM
    * (minorization–maximization) update, in scaled fixed-point
    * arithmetic (scale S, floor division):
    *
    *   w_i⁰    = S
    *   d_iᵗ    = Σ_{j : n_ij>0} (n_ij · S²) div max(w_iᵗ + w_jᵗ, 1)
    *   w_iᵗ⁺¹  = (W_i · S²) div max(d_iᵗ, 1)
    *
    * with W_i = total wins of i and n_ij = games between i and j —
    * Hunter's classic iteration, every step integer, so the learned
    * strengths are bit-identical across engines and partitionings
    * (fixed `iters` is the pinned contract, as in [[Graph.pageRank]]).
    * The max(·,1) guards are exercised only by degenerate inputs
    * (mutually-winless opponents); W_i = 0 correctly pins w_i to 0
    * from round 1. Strengths are identifiable up to scale, so values
    * are comparable WITHIN a run — the ranking is the product.
    *
    * Numeric headroom at the default S = 10⁶: W_i·S² ≤ 2⁶³ needs
    * W_i < 9·10⁶ wins per item, n_ij·S² needs n_ij < 9·10⁶ games per
    * pair, and w stays ≤ 2ᵗ·S after t rounds — far inside long range
    * for any real preference corpus; lower S for more headroom.
    *
    * Scale shape: comparisons collapse ONCE into the aggregated pair
    * matrix (n_ij — bounded by distinct compared pairs, typically
    * orders of magnitude below raw comparisons); per round, the
    * symmetric pair matrix (persisted, partitioned by the first join
    * key) picks up both endpoint strengths via two equi-joins of the
    * skinny (item, w) table, and d_i is a map-side-combined aggregate.
    * The second join re-shuffles the O(pairs) term table each round —
    * inherent to a two-endpoint functional (unlike PageRank's
    * one-endpoint contribution), and priced at pair-matrix size, not
    * comparison count.
    */
  def bradleyTerry(
      comps: DataFrame,
      winner: Column,
      loser: Column,
      iters: Int = 3,
      scale: Long = 1000000L): DataFrame = {
    require(iters >= 1, s"iters must be >= 1, got $iters")
    require(scale > 0, s"scale must be positive, got $scale")
    val s2 = scale * scale
    val pair = comps
      .select(least(winner.cast("long"), loser.cast("long")).as("i"),
        greatest(winner.cast("long"), loser.cast("long")).as("j"))
      .groupBy("i", "j").agg(count(lit(1)).as("n"))
    val sym = pair.select(col("i").as("a"), col("j").as("b"), col("n"))
      .union(pair.select(col("j").as("a"), col("i").as("b"), col("n")))
      .repartition(col("a")).persist()
    val wins = comps.select(winner.cast("long").as("item"))
      .groupBy("item").agg(count(lit(1)).as("wins"))
    val items = sym.select(col("a").as("item")).distinct()
    val stats = items
      .join(wins, Seq("item"), "left")
      .select(col("item"), coalesce(col("wins"), lit(0L)).as("wins"))
      .persist()
    stats.count()
    // localCheckpoint, not persist: each round references w TWICE
    // (both endpoints), so the logical plan would double per round and
    // Catalyst analysis go exponential — same doubling-loop shape (and
    // fix) as kCore/dedupGroups; superseded checkpoint blocks are
    // released by the ContextCleaner. (Lazy checkpoints — pipelining
    // the whole MM loop into the output job — were tried and measured
    // SLOWER here: 2.2 → 2.7 s warm despite 8 → 5 jobs, unlike
    // kCore/hits where the same change helped; kept eager.)
    // (w_0 itself stays lazy: a literal column over the materialized
    // stats cache — its round-1 double read hits the cache, not lineage)
    var w = stats.select(col("item"), lit(scale).as("w"))
    for (_ <- 1 to iters) {
      val d = sym
        .join(w.select(col("item").as("a"), col("w").as("wa")), "a")
        .join(w.select(col("item").as("b"), col("w").as("wb")), "b")
        .select(col("a"),
          expr(s"n * ${s2}L div greatest(wa + wb, 1L)").as("term"))
        .groupBy("a").agg(sum("term").as("d"))
      w = stats
        .join(d.withColumnRenamed("a", "item"), Seq("item"), "left")
        .select(col("item"),
          expr(s"wins * ${s2}L div greatest(coalesce(d, 0L), 1L)").as("w"))
        .localCheckpoint(true)
    }
    val games = sym.groupBy(col("a").as("item")).agg(sum("n").as("games"))
    val out = stats.join(games, "item").join(w, "item")
      .select(col("item"), col("wins"), col("games"), col("w").as("strength"))
      .localCheckpoint(true)
    sym.unpersist()
    stats.unpersist()
    out
  }
}
