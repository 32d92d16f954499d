package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Scale-out utilities: the explicit knobs for the two failure modes a
  * 1000-executor job hits that local tests never do — skewed keys and
  * repeated shuffles of the same join key.
  */
object Scale {

  /** Skew-safe array collapse: two-phase aggregation through a salt.
    * A plain groupBy(key).agg(collect_list(...)) sends EVERY value of a
    * hot key to one task (collect_list has no partial-merge reduction
    * in size); salting spreads phase one over `nSalts` tasks and phase
    * two only merges `nSalts` pre-combined lists per key.
    * Result is identical to [[Relational.arrayCollapse]] (the collapse
    * sorts, so salt-induced order differences cannot show).
    */
  def saltedArrayCollapse(
      df: DataFrame,
      key: Column,
      value: Column,
      as: String,
      nSalts: Int = 16): DataFrame =
    df.select(key.as("k"), value.cast("string").as("v"))
      .withColumn("salt", pmod(xxhash64(col("v")), lit(nSalts)))
      .groupBy(col("k"), col("salt"))
      .agg(collect_list(col("v")).as("vs"))
      .groupBy(col("k"))
      .agg(concat_ws("|", array_sort(flatten(collect_list(col("vs"))))).as(as))
      .withColumnRenamed("k", "key")

  /** Write a DataFrame as a bucketed+sorted table: joins and
    * aggregations on the bucket key then run exchange-free (the classic
    * pre-shuffle trade — pay the shuffle once at write, never again).
    */
  def writeBucketed(df: DataFrame, table: String, bucketCol: String, nBuckets: Int): Unit =
    df.write
      .mode(SaveMode.Overwrite)
      .bucketBy(nBuckets, bucketCol)
      .sortBy(bucketCol)
      .option("path", s"${df.sparkSession.conf.get("spark.sql.warehouse.dir")}/$table")
      .saveAsTable(table)

  /** True if the executed plan of `df` contains a shuffle exchange —
    * the assertion primitive for co-located-join tests. Collects
    * [[ShuffleExchangeLike]] nodes (covering hash, range, and
    * single-partition exchanges) instead of substring-matching the plan
    * string, and descends into AQE's re-planned subtrees where the
    * exchange hides behind an AdaptiveSparkPlanExec wrapper.
    */
  def hasShuffle(df: DataFrame): Boolean = countShuffles(df) > 0

  /** Number of shuffle exchanges in the physical plan (descending into
    * AQE wrappers) — the unit plan-assertion tests budget shuffles
    * with, since every exchange is the thing that hurts at 100 TB.
    */
  def countShuffles(df: DataFrame): Int =
    shuffleOutputColumns(df).size

  /** The output column names of every shuffle exchange in the plan,
    * one Seq per exchange — what actually RIDES each shuffle. The
    * exchange's plan line prints only partitioning expressions, so
    * "no text on the wire" assertions must check these attributes,
    * not the plan string.
    */
  def shuffleOutputColumns(df: DataFrame): Seq[Seq[String]] = {
    import org.apache.spark.sql.execution.SparkPlan
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeLike
    def scan(p: SparkPlan): Seq[Seq[String]] = p match {
      case s: ShuffleExchangeLike => s.output.map(_.name) +: s.children.flatMap(scan)
      case a: AdaptiveSparkPlanExec => scan(a.executedPlan)
      case q: QueryStageExec => scan(q.plan)
      case other => other.children.flatMap(scan)
    }
    scan(df.queryExecution.executedPlan)
  }
}
