package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Inter-annotator agreement — the labeler-QA side of an annotation
  * or preference-collection pipeline: before training on human (or
  * model-judge) labels you measure how much two annotators agree
  * beyond chance, and where they disagree.
  *
  * All statistics are 64-bit-integer-exact (ppm scaling, floor
  * division) — the same cross-engine determinism contract as
  * [[Preference]] and [[Graph]].
  */
object Agreement {

  /** Cohen's kappa over a double-annotated table: one summary row with
    * the item count, raw-agreement count, label-domain size, and the
    * exact ppm-scaled observed agreement, chance agreement, and kappa.
    * With A = agreements, S = Σ_k rowMarginal_k · colMarginal_k:
    *
    *   po_ppm    = A·10⁶ div n
    *   pe_ppm    = S·10⁶ div n²
    *   kappa_ppm = (n·A − S)·10⁶ div (n² − S)
    *
    * — the single-fraction form of (po − pe)/(1 − pe), so kappa is
    * computed in ONE floor division instead of compounding two rounded
    * ppm values. Kappa can be negative (worse-than-chance agreement);
    * the numerator is the only signed term and |n·A − S| ≤ n², so the
    * n²-scale ratios run in DECIMAL(38,0) (exact; DuckDB's BIGINT
    * aggregates are already HUGEINT) — ANSI-safe to n ≈ 10⁹ items.
    * When the marginals force pe = 1 (both annotators constant —
    * n² = S, the 0/0 case) kappa is reported as 0 by convention.
    *
    * Scale: three map-side-combined aggregates, two keyed by the
    * bounded label domain and one global — no join touches the
    * annotation rows themselves, and the marginal product table is
    * |labels| rows.
    */
  def cohenKappa(df: DataFrame, labelA: Column, labelB: Column): DataFrame = {
    val rows = df.select(labelA.as("la"), labelB.as("lb"))
    val totals = rows.agg(
      count(lit(1)).as("n"),
      sum(when(col("la") === col("lb"), 1L).otherwise(0L)).as("n_agree"))
    val ra = rows.groupBy(col("la").as("lab")).agg(count(lit(1)).as("r"))
    val cb = rows.groupBy(col("lb").as("lab")).agg(count(lit(1)).as("c"))
    val marg = ra.join(cb, Seq("lab"), "full_outer")
      .agg(count(lit(1)).as("n_labels"),
        sum(coalesce(col("r"), lit(0L)) * coalesce(col("c"), lit(0L))).as("s"))
    // kappa's numerator n·A − S is the one SIGNED quantity in the
    // engine's integer algebra; integral division of negatives is
    // engine-dependent (truncation vs floor), so divide the absolute
    // value and reapply the sign — exact and engine-identical
    // empty input still yields one aggregate row with n = 0 (and null
    // sums) — guard every /n and /n² so the degenerate summary row is
    // all-zero instead of an ANSI divide-by-zero, matching the pe = 1
    // convention below and graphProfile's n_edges = 0 row
    totals.crossJoin(marg)
      .withColumn("n_agree", coalesce(col("n_agree"), lit(0L)))
      .withColumn("s", coalesce(col("s"), lit(0L)))
      .withColumn("nd", expr("CAST(n AS DECIMAL(38,0))"))
      .select(col("n"), col("n_agree"), col("n_labels"),
        when(col("n") === 0, lit(0L))
          .otherwise(expr("n_agree * 1000000L div n")).as("po_ppm"),
        when(col("n") === 0, lit(0L))
          .otherwise(expr(
            "CAST(CAST(s AS DECIMAL(38,0)) * 1000000 div (nd * nd) AS BIGINT)"))
          .as("pe_ppm"),
        when(col("n") === 0 || expr("nd * nd - s") === 0, lit(0L))
          .otherwise(
            expr("CAST(if(nd * n_agree >= s, 1, -1)" +
              " * (abs(nd * n_agree - s) * 1000000 div (nd * nd - s)) AS BIGINT)"))
          .as("kappa_ppm"))
      .drop("nd")
  }

  /** Fleiss' kappa — [[cohenKappa]]'s MULTI-rater generalization, for
    * the labeling pipelines where each item collects ratings from a
    * varying crowd rather than two fixed annotators. Input is one row
    * per RATING (item, label); rater identity is irrelevant to the
    * statistic (Fleiss needs only per-item category counts). Items
    * with fewer than two ratings carry no agreement evidence and are
    * EXCLUDED entirely (from the marginals too — the generalized
    * free-marginal-consistent convention, documented rather than
    * silent).
    *
    * With n_ij = ratings of item i in category j,
    * A = Σ_i Σ_j n_ij(n_ij−1), P = Σ_i n_i(n_i−1),
    * c_j = Σ_i n_ij, N = Σ c_j, S = Σ_j c_j²:
    *
    *   po_ppm    = A·10⁶ div P        (pooled pairwise agreement)
    *   pe_ppm    = S·10⁶ div N²
    *   kappa_ppm = (A·N² − P·S)·10⁶ div (P·(N² − S))
    *
    * — the single-fraction form of (po − pe)/(1 − pe), one floor
    * division, sign handled explicitly like [[cohenKappa]]. A·N²·10⁶
    * is N³·r-scale (r = max ratings/item), so DECIMAL(38,0) is exact
    * to N ≈ 10⁹ ratings for crowd-sized r. Degenerate cases report 0:
    * no multi-rated items (P = 0) and constant labels (N² = S, the
    * pe = 1 convention).
    *
    * Scale: one (item, label)-keyed count (map-side combined), one
    * item-keyed and one label-keyed aggregate over that bounded
    * table, then a 1-row cross of the three totals.
    */
  def fleissKappa(df: DataFrame, item: Column, label: Column): DataFrame = {
    val nij = df.select(item.as("it"), label.as("lab"))
      .groupBy("it", "lab").agg(count(lit(1)).as("nij"))
    val perItem = nij.groupBy("it").agg(
      sum("nij").as("ni"),
      sum(expr("nij * (nij - 1)")).as("ai"))
      .where(col("ni") >= 2)
    val itemTotals = perItem.agg(
      count(lit(1)).as("n_items"),
      coalesce(sum("ni"), lit(0L)).as("n_ratings"),
      coalesce(sum("ai"), lit(0L)).as("a"),
      coalesce(sum(expr("ni * (ni - 1)")), lit(0L)).as("p"))
    val labelTotals = nij
      .join(perItem.select("it"), "it") // only multi-rated items
      .groupBy("lab").agg(sum("nij").as("cj"))
      .agg(coalesce(sum(expr("CAST(cj AS DECIMAL(38,0)) * cj")),
        expr("CAST(0 AS DECIMAL(38,0))")).as("s"))
    itemTotals.crossJoin(labelTotals)
      .withColumn("nd", expr("CAST(n_ratings AS DECIMAL(38,0))"))
      .select(col("n_items"), col("n_ratings"),
        when(col("p") === 0, lit(0L))
          .otherwise(expr("a * 1000000L div p")).as("po_ppm"),
        when(col("n_ratings") === 0, lit(0L))
          .otherwise(expr("CAST(s * 1000000 div (nd * nd) AS BIGINT)")).as("pe_ppm"),
        when(col("p") === 0 || expr("nd * nd - s") === 0, lit(0L))
          .otherwise(expr(
            "CAST(if(a * nd * nd >= CAST(p AS DECIMAL(38,0)) * s, 1, -1)" +
              " * (abs(a * nd * nd - CAST(p AS DECIMAL(38,0)) * s) * 1000000" +
              " div (CAST(p AS DECIMAL(38,0)) * (nd * nd - s))) AS BIGINT)"))
          .as("kappa_ppm"))
      .drop("nd")
  }

  /** Confusion matrix of the two annotators: one row per observed
    * (label_a, label_b) pair with its count and its ppm share of all
    * items — the drill-down behind a weak kappa (WHICH labels get
    * confused).
    *
    * Scale: ONE map-side-combined aggregate keyed by the label pair
    * (bounded by the squared label domain) plus a 1-row total
    * broadcast back in.
    */
  def confusionMatrix(df: DataFrame, labelA: Column, labelB: Column): DataFrame = {
    val rows = df.select(labelA.as("label_a"), labelB.as("label_b"))
    val total = rows.agg(count(lit(1)).as("n_total"))
    rows.groupBy("label_a", "label_b").agg(count(lit(1)).as("n"))
      .crossJoin(broadcast(total))
      .select(col("label_a"), col("label_b"), col("n"),
        expr("n * 1000000L div n_total").as("share_ppm"))
  }
}
