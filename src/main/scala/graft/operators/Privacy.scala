package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Privacy risk profiling and local-DP collection — the release-gate
  * side of a training-data pipeline: before shipping a corpus that
  * carries person-linked attributes you quantify re-identification
  * risk (k-anonymity / l-diversity over the quasi-identifier
  * projection), and when collecting sensitive boolean signals you
  * privatize at the row level (randomized response) and debias the
  * aggregate.
  *
  * Everything is integer-exact and seed-deterministic (the modular
  * Knuth multiplicative hash shared with [[Sampling]]) so both the
  * privatized rows and the debiased estimates are bit-reproducible
  * across engines.
  */
object Privacy {

  /** k-anonymity / l-diversity profile: one row per equivalence class
    * of the quasi-identifier projection, with its size, the number of
    * distinct sensitive values it contains, and the two standard risk
    * flags — `class_size >= k` (an attacker matching the
    * quasi-identifiers still faces ≥ k candidates) and
    * `n_sensitive >= l` (the class doesn't leak its sensitive value
    * by uniformity).
    *
    * Scale: ONE aggregate keyed by the quasi-identifier tuple;
    * count-distinct of the sensitive column is Spark's partial
    * two-phase distinct aggregate, so nothing but (quasi, sensitive)
    * pairs and partial counts cross the exchange. Classes are the
    * output — bounded by the quasi-identifier domain, not the data.
    */
  def kAnonymityProfile(
      df: DataFrame,
      quasi: Seq[Column],
      sensitive: Column,
      k: Int,
      l: Int): DataFrame = {
    require(quasi.nonEmpty, "need at least one quasi-identifier column")
    require(k >= 1, s"k must be >= 1, got $k")
    require(l >= 1, s"l must be >= 1, got $l")
    df.groupBy(quasi: _*)
      .agg(count(lit(1)).as("class_size"),
        countDistinct(sensitive).as("n_sensitive"))
      .withColumn("k_anonymous", col("class_size") >= k)
      .withColumn("l_diverse", col("n_sensitive") >= l)
  }

  /** Per-row randomized response (Warner): with probability 3/4 report
    * the true boolean, otherwise report a fair coin — both coins
    * drawn from the seeded modular Knuth hash of the row id, so the
    * privatized column is deterministic given (id, seed) yet
    * distributionally correct. Adds `reported` next to the input
    * columns.
    *
    * Plausible deniability: any individual's reported value is wrong
    * with probability 1/8, giving ε = ln(7) local DP for the boolean.
    */
  def randomizedResponse(
      df: DataFrame,
      id: Column,
      value: Column,
      seed: Long): DataFrame = {
    val h = knuthHash(id, seed)
    // shiftright = exact div-4 on the non-negative hash (Column./ is
    // double division — never use it for integer arithmetic)
    df.withColumn("reported",
      when(h % 4 < 3, value).otherwise(shiftright(h, 2) % 2 === 1))
  }

  /** Debiased group-level estimate over a randomized-response
    * collection: per group, the row count, the privatized true-count,
    * and the exact unbiased estimator of the real true-count scaled
    * by 6 (E[reported] = 3/4·T + 1/8·n ⟹ 6·T̂ = 8·reported − n; kept
    * ×6 so the estimate stays in exact integer arithmetic — divide by
    * 6 downstream if an approximate scalar is wanted).
    *
    * Scale: the privatization is a map-only projection; the estimate
    * is ONE map-side-combined aggregate keyed by group.
    */
  def rrEstimate(
      df: DataFrame,
      id: Column,
      value: Column,
      group: Column,
      seed: Long): DataFrame =
    randomizedResponse(df, id, value, seed)
      .groupBy(group.as("grp"))
      .agg(count(lit(1)).as("n"),
        sum(col("reported").cast("long")).as("reported_true"))
      .select(col("grp"), col("n"), col("reported_true"),
        (lit(8L) * col("reported_true") - col("n")).as("est_true_x6"))

  /** The two-round modular Knuth multiplicative hash shared with the
    * sampling family (Sampling.scala) — non-negative, overflow-free
    * (EVERY operand — id term AND seed — reduced into [0, 1e9+7)
    * before each multiply, so no long product exceeds ~2.6e18 even
    * for negative ids or |seed| near Long.MaxValue), and expressible
    * verbatim in ANSI SQL for the oracle.
    */
  private def knuthHash(id: Column, seed: Long): Column = {
    val m = 1000000007L
    val seedR = ((seed % m) + m) % m
    val idR = pmod(id.cast("long") % m, lit(m))
    ((idR * 2654435761L % m + seedR) % m) * 2654435761L % m
  }

  /** Selection-rate fairness audit of a boolean decision (a quality
    * filter, a sampling gate, a classifier cut) across a group key:
    * per group, the population, selected count, exact ppm selection
    * rate, and the disparate-impact ratio against the HIGHEST-rate
    * group (rate·10⁶ div max_rate — the four-fifths-rule statistic:
    * parity_ppm < 800000 flags the group). The max-rate group itself
    * reads exactly 10⁶. An all-zero decision (max rate 0) reports
    * parity 0 for every group rather than 0/0.
    *
    * Scale: ONE map-side-combined aggregate keyed by the group
    * domain, a 1-row max over that bounded table broadcast back in.
    * Exactness note: rates are floored to ppm BEFORE the parity
    * ratio (parity compares the two published rates, not the raw
    * fractions) — the audit is over the numbers a datacard reports.
    */
  def selectionAudit(
      df: DataFrame,
      group: Column,
      selected: Column): DataFrame = {
    val rates = df
      .select(group.as("grp"),
        selected.cast("boolean").cast("long").as("sel"))
      .groupBy("grp")
      .agg(count(lit(1)).as("n"), sum("sel").as("n_sel"))
      .select(col("grp"), col("n"), col("n_sel"),
        expr("n_sel * 1000000L div n").as("rate_ppm"))
    val maxRate = rates.agg(max("rate_ppm").as("max_rate_ppm"))
    rates.crossJoin(broadcast(maxRate))
      .select(col("grp"), col("n"), col("n_sel"), col("rate_ppm"),
        when(col("max_rate_ppm") === 0, lit(0L))
          .otherwise(expr("rate_ppm * 1000000L div max_rate_ppm"))
          .as("parity_ppm"))
  }
}
